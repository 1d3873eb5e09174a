"""Batch-first device operations: the TPU hot paths of the protocol layer.

`ops.fr`        — batched scalar-field kernels (Horner, Lagrange).
`ops.threshold` — batched group/pairing protocol ops (sign, verify,
                  combine, commit).

These are pure jittable functions over limb arrays / point pytrees; the
object-level API in `threshold_crypto_tpu.lib` calls into them for batch
work, and `threshold_crypto_tpu.parallel` shards them over device meshes.
"""

from . import fr  # noqa: F401
from . import threshold  # noqa: F401

from .fr import (  # noqa: F401
    fr_from_device,
    fr_from_plain,
    fr_to_device,
    fr_to_plain,
    interpolate_at_zero,
    lagrange_coeffs_at_zero,
    poly_eval,
)
from .threshold import (  # noqa: F401
    affine_to_jacobian,
    bivar_commit_batch,
    bivar_commit_eval_batch,
    bivar_commit_row_batch,
    bivar_row_batch,
    ciphertext_verify_batch,
    combine_batch,
    combine_batch_stepwise,
    commit_batch,
    decrypt_share_batch,
    derive_shares,
    encrypt_batch,
    encrypt_batch_pallas,
    encrypt_begin_batch,
    encrypt_finish_batch,
    jacobian_to_affine,
    powers_batch,
    set_aot_cache,
    sign_batch,
    rlc_exponents,
    verify_batch,
    verify_batch_pallas,
    verify_batch_stepwise,
    verify_batch_pallas_jit,
    verify_with_hash_batch,
    verify_sig_shares_rlc,
    verify_sig_shares_rlc_pallas,
    verify_sig_shares_rlc_stepwise,
    verify_dec_share_batch,
)
