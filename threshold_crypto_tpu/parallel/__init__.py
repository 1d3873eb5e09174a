"""Multi-chip scaling: device meshes, sharded protocol ops, collectives.

`parallel.mesh`      — mesh construction + placement helpers.
`parallel.sharded`   — mesh-sharded sign/verify (DP, no collectives) and
                       combine (GSPMD-partitioned per-device MSM partials +
                       collective tree reduction).
`parallel.multihost` — multi-process runtime wiring (jax.distributed),
                       global meshes, dealer-broadcast of protocol bytes.
"""

from . import mesh  # noqa: F401
from . import multihost  # noqa: F401
from . import sharded  # noqa: F401

from .mesh import (  # noqa: F401
    SHARE_AXIS,
    batch_spec,
    make_mesh,
    repl_spec,
    replicate,
    shard_batch,
)
from .sharded import (  # noqa: F401
    sharded_combine,
    sharded_rlc_aggregate,
    sharded_sign,
    sharded_verify,
    sharded_verify_rlc,
)
