"""Constraint-builder + witness-evaluator smoke tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.circuits.builder import LC, ConstraintSystem
from zkemail_tpu.circuits.gadgets import basic as B
from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB


def run(cc, inputs, batch=1):
    w = cc.eval_witness(inputs, batch)
    vals = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    return w, [int(v) for v in vals]


def test_mul_and_define():
    cs = ConstraintSystem("t")
    x = cs.add_input("x", ())
    y = cs.add_input("y", ())
    z = cs.mul(x, y)
    out = cs.define(z + 7)
    cs.mark_public(out)
    cc = cs.compile()
    w, vals = run(cc, {"x": jnp.asarray([[5]])[0], "y": jnp.asarray([6])})
    assert cc.check_satisfied_host(vals)
    # public slot 1 holds out = 37
    assert vals[1] == 37


def test_bad_witness_rejected():
    cs = ConstraintSystem("t")
    x = cs.add_input("x", ())
    z = cs.mul(x, x)
    cs.mark_public(z)
    cc = cs.compile()
    w, vals = run(cc, {"x": jnp.asarray([3])})
    assert cc.check_satisfied_host(vals)
    vals_bad = list(vals)
    vals_bad[1] = 10  # z should be 9
    assert not cc.check_satisfied_host(vals_bad)


def test_num2bits_roundtrip():
    cs = ConstraintSystem("t")
    x = cs.add_input("x", (3,))
    bits = B.num2bits(cs, x, 8)
    back = B.bits2num(cs, bits)
    cc = cs.compile()
    w, vals = run(cc, {"x": jnp.asarray([[0], [77], [255]])[:, 0][:, None] * jnp.ones((3, 1), jnp.int32) if False else jnp.asarray([[0], [77], [255]], dtype=jnp.int32)})
    assert cc.check_satisfied_host(vals)


def test_num2bits_field_value():
    # decompose a 121-bit value provided as an fr input
    cs = ConstraintSystem("t")
    x = cs.add_input("x", (), dtype="fr")
    bits = B.num2bits(cs, x, 121)
    cc = cs.compile()
    big = (1 << 120) + 12345
    fr_limbs = LB.ints_to_limbs(np.array([big], dtype=object))[:, 0][:, None, None] if False else LB.ints_to_limbs(np.array([[big]], dtype=object))
    w, vals = run(cc, {"x": jnp.asarray(fr_limbs)})
    assert cc.check_satisfied_host(vals)


def test_is_zero_and_is_equal():
    cs = ConstraintSystem("t")
    x = cs.add_input("x", (4,))
    z = B.is_zero(cs, x)
    cs.mark_public(z)
    cc = cs.compile()
    w, vals = run(cc, {"x": jnp.asarray([[0], [1], [255], [0]], dtype=jnp.int32)})
    assert cc.check_satisfied_host(vals)
    assert vals[1:5] == [1, 0, 0, 1]


def test_less_than():
    cs = ConstraintSystem("t")
    a = cs.add_input("a", (3,))
    b = cs.add_input("b", (3,))
    lt = B.less_than(cs, a, b, 10)
    cs.mark_public(lt)
    cc = cs.compile()
    w, vals = run(
        cc,
        {
            "a": jnp.asarray([[3], [7], [1000]], dtype=jnp.int32),
            "b": jnp.asarray([[5], [7], [999]], dtype=jnp.int32),
        },
    )
    assert cc.check_satisfied_host(vals)
    assert vals[1:4] == [1, 0, 0]


def test_mux1():
    cs = ConstraintSystem("t")
    s = cs.add_input("s", (2,))
    out = B.mux1(cs, s, 42, 13)
    cs.mark_public(out)
    cc = cs.compile()
    w, vals = run(cc, {"s": jnp.asarray([[1], [0]], dtype=jnp.int32)})
    assert cc.check_satisfied_host(vals)
    assert vals[1:3] == [42, 13]


def test_batch_dimension():
    cs = ConstraintSystem("t")
    x = cs.add_input("x", (2,))
    z = cs.mul(x, x)
    cc = cs.compile()
    xs = jnp.asarray([[1, 2, 3], [4, 5, 6]], dtype=jnp.int32)  # (2, B=3)
    w = cc.eval_witness({"x": xs}, batch=3)
    for b in range(3):
        vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, b]))]
        assert cc.check_satisfied_host(vals)
