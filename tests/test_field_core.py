"""Golden tests: JAX limb field arithmetic vs Python-int reference."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB

RNG = random.Random(1234)


def rand_elems(p, n):
    return [RNG.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("spec,pf", [(LB.FQ_SPEC, F.FQ), (LB.FR_SPEC, F.FR)])
def test_roundtrip_conversion(spec, pf):
    xs = rand_elems(pf.p, 17) + [0, 1, pf.p - 1]
    limbs = LB.ints_to_limbs(xs)
    back = LB.limbs_to_ints(limbs)
    assert [int(b) for b in back] == xs


@pytest.mark.parametrize("spec,pf", [(LB.FQ_SPEC, F.FQ), (LB.FR_SPEC, F.FR)])
def test_add_sub_neg(spec, pf):
    n = 64
    a = rand_elems(pf.p, n)
    b = rand_elems(pf.p, n)
    a[0], b[0] = pf.p - 1, pf.p - 1  # overflow edge
    a[1], b[1] = 0, 0
    al, bl = jnp.asarray(LB.ints_to_limbs(a)), jnp.asarray(LB.ints_to_limbs(b))
    got_add = LB.limbs_to_ints(np.asarray(LB.add(spec, al, bl)))
    got_sub = LB.limbs_to_ints(np.asarray(LB.sub(spec, al, bl)))
    got_neg = LB.limbs_to_ints(np.asarray(LB.neg(spec, al)))
    for i in range(n):
        assert int(got_add[i]) == (a[i] + b[i]) % pf.p
        assert int(got_sub[i]) == (a[i] - b[i]) % pf.p
        assert int(got_neg[i]) == (-a[i]) % pf.p


@pytest.mark.parametrize("spec,pf", [(LB.FQ_SPEC, F.FQ), (LB.FR_SPEC, F.FR)])
def test_mont_mul(spec, pf):
    n = 64
    a = rand_elems(pf.p, n)
    b = rand_elems(pf.p, n)
    a[0], b[0] = pf.p - 1, pf.p - 1
    a[1], b[1] = 0, 123
    # Montgomery form inputs
    am = [pf.to_mont(x) for x in a]
    bm = [pf.to_mont(x) for x in b]
    al, bl = jnp.asarray(LB.ints_to_limbs(am)), jnp.asarray(LB.ints_to_limbs(bm))
    got = LB.limbs_to_ints(np.asarray(LB.mont_mul(spec, al, bl)))
    for i in range(n):
        assert int(got[i]) == pf.to_mont(a[i] * b[i] % pf.p), i


@pytest.mark.parametrize("spec,pf", [(LB.FQ_SPEC, F.FQ), (LB.FR_SPEC, F.FR)])
def test_to_from_mont(spec, pf):
    xs = rand_elems(pf.p, 8)
    xl = jnp.asarray(LB.ints_to_limbs(xs))
    m = LB.to_mont(spec, xl)
    got_m = LB.limbs_to_ints(np.asarray(m))
    for i, x in enumerate(xs):
        assert int(got_m[i]) == pf.to_mont(x)
    back = LB.limbs_to_ints(np.asarray(LB.from_mont(spec, m)))
    for i, x in enumerate(xs):
        assert int(back[i]) == x


def test_pow_and_inv():
    pf, spec = F.FR, LB.FR_SPEC
    xs = rand_elems(pf.p, 4)
    xm = jnp.asarray(LB.ints_to_limbs([pf.to_mont(x) for x in xs]))
    # pow: x^12345
    got = LB.limbs_to_ints(np.asarray(LB.pow_const(spec, xm, 12345)))
    for i, x in enumerate(xs):
        assert int(got[i]) == pf.to_mont(pow(x, 12345, pf.p))
    # inverse
    got_inv = LB.limbs_to_ints(np.asarray(LB.inv(spec, xm)))
    for i, x in enumerate(xs):
        assert int(got_inv[i]) == pf.to_mont(pf.inv(x))


def test_batch_inv():
    pf, spec = F.FR, LB.FR_SPEC
    xs = rand_elems(pf.p, 33)
    xs[5] = 0  # zero maps to zero
    xm = jnp.asarray(LB.ints_to_limbs([pf.to_mont(x) for x in xs]))
    got = LB.limbs_to_ints(np.asarray(LB.batch_inv(spec, xm)))
    for i, x in enumerate(xs):
        expect = 0 if x == 0 else pf.to_mont(pf.inv(x))
        assert int(got[i]) == expect, i


def test_fr_root_of_unity():
    w = F.fr_nth_root(4)  # 16th root
    assert pow(w, 16, F.R) == 1
    assert pow(w, 8, F.R) != 1
    assert pow(F.FR_ROOT_OF_UNITY, 1 << F.FR_TWO_ADICITY, F.R) == 1
    assert pow(F.FR_MULT_GENERATOR, (F.R - 1) // 2, F.R) == F.R - 1
