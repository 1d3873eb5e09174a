"""Basic public-key crypto: one key pair signing and encrypting.

Python re-design of the reference scenario `examples/basic_pkc.rs:31-57`:
Alice signs a message and verifies it, then Bob encrypts a message to
Alice's public key and Alice decrypts it.

Run: python examples/basic_pkc.py  (host path — no JAX/TPU required)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import threshold_crypto_tpu as tc
from threshold_crypto_tpu.utils.rng import OsRng


def main() -> None:
    rng = OsRng()

    # Alice generates a key pair and publishes her public key.
    sk = tc.SecretKey.random(rng)
    pk = sk.public_key()
    print(f"Alice's public key: {pk.to_bytes().hex()[:32]}… ({tc.pk_size()} B)")

    # Alice signs; anyone can verify against her public key.
    msg = b"a message worth signing"
    sig = sk.sign(msg)
    assert pk.verify(sig, msg), "signature must verify"
    assert not pk.verify(sig, b"another message"), "wrong message must fail"
    print(f"signature verified ({tc.sig_size()} B)")

    # Bob encrypts a message to Alice; only Alice can decrypt it.
    secret = b"the crown jewels are in the vault"
    ct = pk.encrypt(secret, rng)
    assert ct.verify(), "honest ciphertext must pass the CCA gate"
    assert sk.decrypt(ct) == secret
    print("encrypt/decrypt round-trip ok")

    # A tampered ciphertext is rejected before any decryption happens.
    tampered = tc.Ciphertext(ct.u, bytes([ct.v[0] ^ 1]) + ct.v[1:], ct.w)
    assert not tampered.verify()
    print("tampered ciphertext rejected")


if __name__ == "__main__":
    main()
