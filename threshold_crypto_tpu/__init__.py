"""threshold_crypto_tpu — a TPU-native pairing-based threshold cryptosystem.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
crate ``threshold_crypto`` 0.4.0 (reference at /root/reference):

* BLS signatures and Boldyreva threshold signatures,
* Baek–Zhang threshold encryption,
* Shamir secret sharing, Feldman commitments and DKG building blocks,
* the complete BLS12-381 arithmetic stack (fields, curves, pairing) built
  in-repo: a host (Python-int) oracle engine plus batched multi-limb JAX /
  Pallas kernels for TPU, sharded over device meshes for scale.

Protocol objects here are scalar-path (one key, one signature); the batched
TPU compute paths live in :mod:`threshold_crypto_tpu.device` and the mesh
parallelism in :mod:`threshold_crypto_tpu.parallel`.
"""

from .backend import FromBytesError, get_backend, set_backend, using
from .error import (
    DegreeTooHigh,
    DuplicateEntry,
    NotEnoughShares,
    ThresholdCryptoError,
)
from .hashing import hash_g1_g2, hash_g2, sha3_256, xor_with_hash
from .into_fr import into_fr, into_fr_plus_1
from .lib import (
    Ciphertext,
    DecryptionShare,
    PublicKey,
    PublicKeySet,
    PublicKeyShare,
    SecretKey,
    SecretKeySet,
    SecretKeyShare,
    Signature,
    SignatureShare,
    interpolate,
)
from .lib import PK_SIZE as _pk_size_fn
from .lib import SIG_SIZE as _sig_size_fn
from .serde_impl import SerdeSecret, deserialize, serialize

# Constant-style accessors (sizes depend on the active backend, like the
# reference's cfg-gated PK_SIZE/SIG_SIZE consts).
PK_SIZE = 48
SIG_SIZE = 96


def pk_size() -> int:
    return _pk_size_fn()


def sig_size() -> int:
    return _sig_size_fn()


__all__ = [
    "Ciphertext",
    "DecryptionShare",
    "DegreeTooHigh",
    "DuplicateEntry",
    "FromBytesError",
    "NotEnoughShares",
    "PK_SIZE",
    "PublicKey",
    "PublicKeySet",
    "PublicKeyShare",
    "SIG_SIZE",
    "SecretKey",
    "SecretKeySet",
    "SecretKeyShare",
    "SerdeSecret",
    "Signature",
    "SignatureShare",
    "ThresholdCryptoError",
    "deserialize",
    "get_backend",
    "hash_g1_g2",
    "hash_g2",
    "interpolate",
    "into_fr",
    "into_fr_plus_1",
    "pk_size",
    "serialize",
    "set_backend",
    "sha3_256",
    "sig_size",
    "using",
    "xor_with_hash",
]

__version__ = "0.1.0"
