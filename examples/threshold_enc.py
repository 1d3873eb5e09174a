"""Threshold encryption: a "secret society" decryption meeting.

Python re-design of the reference scenario `examples/threshold_enc.rs`:
a trusted dealer creates a 3-actor society with threshold t=1; anyone can
encrypt to the master public key; any 2 (= t+1) actors can jointly decrypt,
1 cannot, and cheaters presenting wrong shares are caught by
`verify_decryption_share`.

Run: python examples/threshold_enc.py  (host path — no JAX/TPU required)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import threshold_crypto_tpu as tc
from threshold_crypto_tpu.error import NotEnoughShares
from threshold_crypto_tpu.utils.rng import OsRng


class Actor:
    def __init__(self, ident, sk_share, pk_share):
        self.id = ident
        self.sk_share = sk_share
        self.pk_share = pk_share
        self.msg_inbox = None


class SecretSociety:
    """Trusted dealer + membership (mirrors the reference's SecretSociety)."""

    def __init__(self, n_actors, threshold, rng):
        sk_set = tc.SecretKeySet.random(threshold, rng)
        self.pk_set = sk_set.public_keys()
        self.actors = [
            Actor(i, sk_set.secret_key_share(i), self.pk_set.public_key_share(i))
            for i in range(n_actors)
        ]

    def publish_public_key(self):
        return self.pk_set.public_key()

    def start_decryption_meeting(self):
        return DecryptionMeeting(self.pk_set)


class DecryptionMeeting:
    """Collects decryption shares; validates each against the ciphertext."""

    def __init__(self, pk_set):
        self.pk_set = pk_set
        self.ciphertext = None
        self.dec_shares = {}

    def accept_decryption_share(self, actor):
        ct = actor.msg_inbox
        if ct is None:
            return False
        if self.ciphertext is None:
            self.ciphertext = ct
        elif self.ciphertext != ct:
            return False  # actors must agree on the ciphertext
        share = actor.sk_share.decrypt_share(ct)
        if share is None:
            return False  # invalid ciphertext
        if not actor.pk_share.verify_decryption_share(share, ct):
            return False  # cheater: share does not match the commitment
        self.dec_shares[actor.id] = share
        return True

    def decrypt_message(self):
        return self.pk_set.decrypt(self.dec_shares, self.ciphertext)


def main() -> None:
    rng = OsRng()
    society = SecretSociety(3, 1, rng)
    pk = society.publish_public_key()

    msg = b"let's get pizza"
    ct = pk.encrypt(msg, rng)
    for actor in society.actors:
        actor.msg_inbox = ct

    alice, bob, clara = society.actors

    # One share (== threshold) is not enough.
    meeting = society.start_decryption_meeting()
    assert meeting.accept_decryption_share(alice)
    try:
        meeting.decrypt_message()
        raise AssertionError("decryption must fail with t shares")
    except NotEnoughShares:
        print("1 of 3 shares: NotEnoughShares (as required)")

    # Two distinct shares decrypt.
    assert meeting.accept_decryption_share(bob)
    assert meeting.decrypt_message() == msg
    print("2 of 3 shares: decrypted:", meeting.decrypt_message().decode())

    # Any other pair decrypts to the same plaintext.
    meeting2 = society.start_decryption_meeting()
    assert meeting2.accept_decryption_share(bob)
    assert meeting2.accept_decryption_share(clara)
    assert meeting2.decrypt_message() == msg
    print("a different pair decrypts identically")


if __name__ == "__main__":
    main()
