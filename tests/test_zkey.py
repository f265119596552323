"""snarkjs .zkey container round-trip (prover/zkey.py).

Oracle: the snarkjs bin-file layout (chunked-zkey.ts consumers); without a
node runtime in the image the check is a full write -> read -> prove ->
verify round trip plus byte-level layout assertions.
"""

import random
import struct

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.prover.containers import verify
from zkemail_tpu.prover.groth16 import prove
from zkemail_tpu.prover.setup import groth16_setup
from zkemail_tpu.prover.zkey import read_zkey, write_zkey


def _toy():
    cs = ConstraintSystem("zkeytoy")
    x = cs.add_input("x", ())
    x2 = cs.mul(x, x)
    y = cs.define(x2 + x + 3)
    cs.mark_public(y)
    return cs.compile()


def test_zkey_roundtrip_and_prove():
    cc = _toy()
    pk = groth16_setup(cc, seed=9)
    blob = write_zkey(pk, cc)

    # container layout: magic, version, groth16 prover type
    assert blob[:4] == b"zkey"
    version, n_sections = struct.unpack_from("<II", blob, 4)
    assert version == 1 and n_sections == 9
    stype, size = struct.unpack_from("<IQ", blob, 12)
    assert stype == 1 and size == 4

    pk2, coeffs = read_zkey(blob)
    assert pk2.n_public == pk.n_public
    assert pk2.domain_log2 == pk.domain_log2
    assert pk2.alpha_g1 == pk.alpha_g1
    assert pk2.beta_g2 == pk.beta_g2
    assert pk2.vk.ic == pk.vk.ic

    # A/B coefficient stream matches the circuit's R1CS
    rows_a, cols_a, vals_a = cc.A
    assert coeffs["A"][0] == [int(r) for r in rows_a]
    assert coeffs["A"][1] == [int(c) for c in cols_a]
    assert coeffs["A"][2] == [int(v) for v in vals_a]
    assert len(coeffs["B"][0]) == len(cc.B[0])

    # prove under the re-imported key; verify under the original vkey
    w = cc.eval_witness({"x": jnp.asarray(np.array([5], dtype=np.int32))}, 1)
    proof, publics = prove(pk2, cc, w[:, :, 0], rng=random.Random(7))
    assert publics == [5 * 5 + 5 + 3]
    assert verify(pk.vk, proof, publics)
    assert verify(pk2.vk, proof, publics)


def test_zkey_rejects_garbage():
    import pytest

    with pytest.raises(ValueError, match="magic"):
        read_zkey(b"nope" + bytes(100))
