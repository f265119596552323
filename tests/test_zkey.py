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

    # A/B coefficient stream: the circuit's R1CS followed by the snarkjs-style
    # materialized instance rows (A row nC+s, col s, value 1) that pin
    # max(row)+1 = nC + nPublic + 1 for authoritative re-import inference
    rows_a, cols_a, vals_a = cc.A
    n_r1cs = len(rows_a)
    npub1 = pk.n_public + 1
    assert coeffs["A"][0][:n_r1cs] == [int(r) for r in rows_a]
    assert coeffs["A"][1][:n_r1cs] == [int(c) for c in cols_a]
    assert coeffs["A"][2][:n_r1cs] == [int(v) for v in vals_a]
    assert coeffs["A"][0][n_r1cs:] == [cc.n_constraints + s for s in range(npub1)]
    assert coeffs["A"][1][n_r1cs:] == list(range(npub1))
    assert coeffs["A"][2][n_r1cs:] == [1] * npub1
    assert len(coeffs["B"][0]) == len(cc.B[0])
    assert pk2.n_constraints == cc.n_constraints

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


def test_zkey_import_with_materialized_instance_rows():
    """Some snarkjs-convention zkeys materialize the virtual instance rows
    (matrix A, row nC+s, col s, value 1) directly in the coefficient
    section. read_zkey must detect and fold them out of n_constraints, and
    proving under such a key must still verify — compute_h SETs the instance
    rows, so both conventions evaluate identically (zkey.py module doc)."""
    import struct as _struct

    from zkemail_tpu.prover import zkey as Z

    cc = _toy()
    pk = groth16_setup(cc, seed=9)
    blob = write_zkey(pk, cc)

    # locate section 4 and rebuild it with appended instance rows
    assert blob[:4] == b"zkey"
    _v, n_sections = _struct.unpack_from("<II", blob, 4)
    off = 12
    parts = [blob[:12]]
    for _ in range(n_sections):
        stype, size = _struct.unpack_from("<IQ", blob, off)
        payload = blob[off + 12 : off + 12 + size]
        if stype == 4:
            n_coeffs = _struct.unpack_from("<I", payload, 0)[0]
            extra = b""
            n_pub1 = pk.n_public + 1
            for s in range(n_pub1):
                extra += _struct.pack(
                    "<III", 0, pk.n_constraints + s, s
                ) + Z._fr_bytes(1)
            payload = (
                _struct.pack("<I", n_coeffs + n_pub1) + payload[4:] + extra
            )
        parts.append(_struct.pack("<IQ", stype, len(payload)) + payload)
        off += 12 + size
    blob2 = b"".join(parts)

    pk2, coeffs = Z.read_zkey(blob2)
    # the materialized rows are detected and folded out
    assert pk2.n_constraints == pk.n_constraints
    # ...but remain present in the parsed A matrix (harmless duplicates of
    # what compute_h SETs)
    assert max(coeffs["A"][0]) == pk.n_constraints + pk.n_public

    w = cc.eval_witness({"x": jnp.asarray(np.array([5], dtype=np.int32))}, 1)
    proof, publics = prove(pk2, cc, w[:, :, 0], rng=random.Random(7))
    assert verify(pk.vk, proof, publics)
    assert verify(pk2.vk, proof, publics)
