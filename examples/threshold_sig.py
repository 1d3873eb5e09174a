"""Threshold signatures: a 3-node chat network with signing consensus.

Python re-design of the reference scenario `examples/threshold_sig.rs`:
each chat message needs `threshold + 1` validator signature shares before
the network can combine them into one master signature and append the
message to the chat log. The combined signature is *unique*: any qualified
subset of validators produces the identical bytes.

Run: python examples/threshold_sig.py  (host path — no JAX/TPU required)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import threshold_crypto_tpu as tc
from threshold_crypto_tpu.utils.rng import OsRng


class Node:
    """A validator: signs every message it receives with its key share."""

    def __init__(self, ident, sk_share, pk_share):
        self.id = ident
        self.sk_share = sk_share
        self.pk_share = pk_share
        self.pending = {}  # msg -> SignatureShare

    def recv(self, msg: bytes):
        self.pending[msg] = self.sk_share.sign(msg)


class ChatNetwork:
    def __init__(self, n_nodes, threshold, rng):
        sk_set = tc.SecretKeySet.random(threshold, rng)
        self.pk_set = sk_set.public_keys()
        self.threshold = threshold
        self.nodes = [
            Node(i, sk_set.secret_key_share(i), self.pk_set.public_key_share(i))
            for i in range(n_nodes)
        ]
        self.chat_log = []

    def step(self):
        """One round of consensus: combine shares for any message that has
        more than `threshold` VALID shares; append to the log."""
        by_msg = {}
        for node in self.nodes:
            for msg, share in node.pending.items():
                # validators check each other's shares before combining
                if self.pk_set.public_key_share(node.id).verify(share, msg):
                    by_msg.setdefault(msg, {})[node.id] = share
        for msg, shares in by_msg.items():
            if len(shares) > self.threshold:
                sig = self.pk_set.combine_signatures(shares)
                assert self.pk_set.public_key().verify(sig, msg)
                self.chat_log.append((msg, sig))
                for node in self.nodes:
                    node.pending.pop(msg, None)


def main() -> None:
    rng = OsRng()
    network = ChatNetwork(3, 1, rng)
    node1, node2, node3 = network.nodes

    greeting = b"hey, this is alice"

    # One signature share (== threshold): consensus does not append.
    node1.recv(greeting)
    network.step()
    assert network.chat_log == []
    print("1 share: message not committed")

    # A second share: threshold + 1 shares -> combined and appended.
    node2.recv(greeting)
    network.step()
    assert len(network.chat_log) == 1
    msg, sig = network.chat_log[0]
    print("2 shares: committed:", msg.decode())

    # Uniqueness: a different validator pair yields the same signature bytes.
    other = tc.deserialize(tc.PublicKeySet, tc.serialize(network.pk_set))
    shares = {1: node2.sk_share.sign(greeting), 2: node3.sk_share.sign(greeting)}
    sig2 = other.combine_signatures(shares)
    assert sig2.to_bytes() == sig.to_bytes()
    print("signature is unique across validator subsets")


if __name__ == "__main__":
    main()
