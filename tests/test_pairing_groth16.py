"""Pairing + Groth16 verification oracle tests.

The golden test verifies the reference repo's bundled Proof-of-Twitter proof
(packages/rust-verifier/tests/data/proof_of_twitter) against the vkey embedded
in sample_verifier.rs — read directly from the read-only reference mount.
"""

import json
import re
from pathlib import Path

import pytest

from zkemail_tpu.core.curve import G1, G2, pairing, multi_pairing_is_one
from zkemail_tpu.core.field import R
from zkemail_tpu.prover.containers import Proof, VerifyingKey, verify

REF = Path("/root/reference/packages/rust-verifier")


def test_bilinearity():
    p, q = G1.generator(), G2.generator()
    assert pairing(p.mul(6), q) == pairing(p, q.mul(2)) ** 3
    assert multi_pairing_is_one([(p.mul(5), q.mul(7)), (p.mul(35).neg(), q)])


def test_subgroups():
    p, q = G1.generator(), G2.generator()
    assert p.mul(R).inf
    assert q.mul(R).inf
    assert q.in_subgroup()


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_verify_proof_of_twitter():
    src = (REF / "src/sample_verifier.rs").read_text()
    # the first big u8 array literal is the embedded compressed vkey
    arr = re.search(r"\[\s*((?:\d+\s*,\s*)+\d+)\s*,?\s*\]\s*\.as_slice", src)
    vk_bytes = bytes(int(x) for x in arr.group(1).replace("\n", "").split(","))
    vk = VerifyingKey.from_ark_bytes(vk_bytes)
    assert len(vk.ic) == 4  # nPublic = 3

    proof = Proof.from_snarkjs(
        json.loads((REF / "tests/data/proof_of_twitter/proof.json").read_text())
    )
    publics = [
        int(x)
        for x in json.loads(
            (REF / "tests/data/proof_of_twitter/public.json").read_text()
        )
    ]
    assert verify(vk, proof, publics), "golden proof must verify"
    # negative: tamper with a public input
    bad = list(publics)
    bad[0] = (bad[0] + 1) % R
    assert not verify(vk, proof, bad)
