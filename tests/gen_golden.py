"""Regenerate tests/fixtures/golden.json — the frozen wire-behavior contract.

Every entry freezes an output of the deterministic pipelines whose bit-parity
with the reference cannot be re-proved inside this environment (no Rust
toolchain): hash_g2 (`/root/reference/src/lib.rs:691-694`), seeded keygen
(`/root/reference/src/lib.rs:1066-1081`), xor_with_hash
(`/root/reference/src/lib.rs:710-715`), and the serde byte formats
(`/root/reference/src/serde_impl.rs:369-417`).  The current outputs are
oracle-cross-checked (host/sampling vs native C++, serde sizes vs the
reference's constants); freezing them makes any behavioral drift a loud
test failure and gives reviewers a stable contract to diff.

Run only to intentionally re-freeze:  python tests/gen_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build():
    import threshold_crypto_tpu as tc
    from threshold_crypto_tpu import hashing, serde_impl
    from threshold_crypto_tpu.utils.rng import ChaChaRng

    out = {}

    with tc.using("bls12_381"):
        # --- hash_g2 on fixed messages (compressed G2 bytes) ---------------
        out["hash_g2"] = {
            m.decode(): hashing.hash_g2(m).to_compressed().hex()
            for m in [b"", b"abc", b"threshold_crypto_tpu golden", b"x" * 200]
        }

        # --- deterministic keygen from a seeded ChaCha rng -----------------
        rng = ChaChaRng(bytes(range(32)))
        sks = tc.SecretKeySet.random(3, rng)
        pks = sks.public_keys()
        out["seeded_keygen"] = {
            "threshold": 3,
            "public_key_set": serde_impl.serialize(pks).hex(),
            "secret_key_share_0": serde_impl.serialize(
                serde_impl.SerdeSecret(sks.secret_key_share(0))
            ).hex(),
            "master_pk": pks.public_key().to_bytes().hex(),
        }

        # --- xor_with_hash keyed by a fixed G1 element ---------------------
        g1 = tc.SecretKey(7).public_key().el
        out["xor_with_hash"] = {
            "key_g1": g1.to_compressed().hex(),
            "data": bytes(range(64)).hex(),
            "out": hashing.xor_with_hash(g1, bytes(range(64))).hex(),
        }

        # --- serde bytes of every public type ------------------------------
        sk = tc.SecretKey(12345)
        pk = sk.public_key()
        sig = sk.sign(b"golden message")
        ct = pk.encrypt_with_rng(ChaChaRng(bytes(32)), b"golden plaintext")
        dk = sks.secret_key_share(1)
        dshare = dk.decrypt_share(ct)
        out["serde"] = {
            "secret_key": serde_impl.serialize(
                serde_impl.SerdeSecret(sk)
            ).hex(),
            "public_key": serde_impl.serialize(pk).hex(),
            "signature": serde_impl.serialize(sig).hex(),
            "ciphertext": serde_impl.serialize(ct).hex(),
            "decryption_share": serde_impl.serialize(dshare).hex(),
            "sig_bytes": sig.to_bytes().hex(),
            "pk_bytes": pk.to_bytes().hex(),
        }

    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(build(), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")
