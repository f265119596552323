"""End-to-end Groth16: tiny circuit -> setup -> TPU-path prove -> oracle verify.

The full chain exercised: constraint builder, witness evaluator, QAP matvec,
NTT h-polynomial, Pippenger MSMs, proof assembly — verified by the pure-
Python pairing oracle (the arkworks-verifier role of packages/rust-verifier).
"""

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.circuits.gadgets import basic as B
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.prover.containers import verify
from zkemail_tpu.prover.groth16 import prove
from zkemail_tpu.prover.setup import groth16_setup


def build_toy():
    """x (private), y (public): prove knowledge of x with x^3 + x + 5 == y."""
    cs = ConstraintSystem("toy")
    x = cs.add_input("x", ())
    x2 = cs.mul(x, x)
    x3 = cs.mul(x2, x)
    y = cs.define(x3 + x + 5)
    cs.mark_public(y)
    return cs.compile()


def test_groth16_end_to_end():
    cc = build_toy()
    pk = groth16_setup(cc, seed=42)
    w = cc.eval_witness({"x": jnp.asarray([3], dtype=jnp.int32)}, 1)
    witness = w[:, :, 0]
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(witness))]
    assert cc.check_satisfied_host(vals)

    proof, publics = prove(pk, cc, witness)
    assert publics == [3**3 + 3 + 5]
    assert verify(pk.vk, proof, publics), "proof must verify"
    # tampered public input must fail
    assert not verify(pk.vk, proof, [publics[0] + 1])


def test_groth16_bits_circuit():
    """A slightly bigger circuit with bit decomposition + comparator."""
    cs = ConstraintSystem("bits")
    x = cs.add_input("x", ())
    bits = B.num2bits(cs, x, 16)
    lt = B.less_than(cs, x, 1000, 16)
    cs.mark_public(lt)
    cc = cs.compile()
    pk = groth16_setup(cc, seed=7)
    w = cc.eval_witness({"x": jnp.asarray([999], dtype=jnp.int32)}, 1)
    witness = w[:, :, 0]
    proof, publics = prove(pk, cc, witness)
    assert publics == [1]
    assert verify(pk.vk, proof, publics)


def test_groth16_prove_batch():
    """prove_batch: one device program proving B witnesses; all verify."""
    from zkemail_tpu.prover.groth16 import prove_batch

    cc = build_toy()
    pk = groth16_setup(cc, seed=42)
    xs = [3, 11, 250]
    w = cc.eval_witness({"x": jnp.asarray(xs, dtype=jnp.int32)}, len(xs))
    proofs = prove_batch(pk, cc, w)
    assert len(proofs) == len(xs)
    for x, (proof, publics) in zip(xs, proofs):
        assert publics == [x**3 + x + 5]
        assert verify(pk.vk, proof, publics), f"batch proof for x={x} must verify"
    # proofs are independently blinded: same statement twice -> distinct A
    w2 = cc.eval_witness({"x": jnp.asarray([3, 3], dtype=jnp.int32)}, 2)
    (p1, _), (p2, _) = prove_batch(pk, cc, w2)
    assert p1.a != p2.a
