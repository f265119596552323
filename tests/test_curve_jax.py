"""Batched JAX group law vs Python reference points."""

import jax
import jax.numpy as jnp
import numpy as np

from zkemail_tpu.core import curve_jax as CJ
from zkemail_tpu.core.curve import G1, G2
from zkemail_tpu.core.field import FQ
from zkemail_tpu.core.towers import Fq2


def g1_to_dev(points: list[G1]):
    fq = CJ.FQ_OPS
    xs = fq.from_ints([p.x if not p.inf else 0 for p in points])
    ys = fq.from_ints([p.y if not p.inf else 1 for p in points])
    zs = fq.from_ints([0 if p.inf else 1 for p in points])
    return {"x": xs, "y": ys, "z": zs}


def g1_from_dev(p) -> list[G1]:
    fq = CJ.FQ_OPS
    aff = CJ.ec_to_affine(fq, p)
    xs = fq.to_ints(aff["x"])
    ys = fq.to_ints(aff["y"])
    infs = np.asarray(aff["inf"])
    return [
        G1.identity() if infs[i] else G1(int(xs[i]), int(ys[i]))
        for i in range(len(infs))
    ]


def g2_to_dev(points: list[G2]):
    fq = CJ.FQ_OPS
    x0 = fq.from_ints([p.x.c0 if not p.inf else 0 for p in points])
    x1 = fq.from_ints([p.x.c1 if not p.inf else 0 for p in points])
    y0 = fq.from_ints([p.y.c0 if not p.inf else 1 for p in points])
    y1 = fq.from_ints([p.y.c1 if not p.inf else 0 for p in points])
    z0 = fq.from_ints([0 if p.inf else 1 for p in points])
    z1 = fq.from_ints([0 for _ in points])
    return {"x": (x0, x1), "y": (y0, y1), "z": (z0, z1)}


def g2_from_dev(p) -> list[G2]:
    ops = CJ.FQ2_OPS
    fq = CJ.FQ_OPS
    aff = CJ.ec_to_affine(ops, p)
    x0, x1 = fq.to_ints(aff["x"][0]), fq.to_ints(aff["x"][1])
    y0, y1 = fq.to_ints(aff["y"][0]), fq.to_ints(aff["y"][1])
    infs = np.asarray(aff["inf"])
    out = []
    for i in range(len(infs)):
        if infs[i]:
            out.append(G2.identity())
        else:
            out.append(G2(Fq2(int(x0[i]), int(x1[i])), Fq2(int(y0[i]), int(y1[i]))))
    return out


def test_g1_add_double_identity():
    g = G1.generator()
    pts_a = [g, g.mul(2), g.mul(5), G1.identity(), g.mul(7), g.mul(7)]
    pts_b = [g, g, g.mul(3), g.mul(9), G1.identity(), g.mul(7).neg()]
    expect = [a.add(b) for a, b in zip(pts_a, pts_b)]
    ops = CJ.FQ_OPS
    out = CJ.ec_add(ops, g1_to_dev(pts_a), g1_to_dev(pts_b))
    got = g1_from_dev(out)
    assert got == expect

    dbl = CJ.ec_double(ops, g1_to_dev(pts_a))
    got_dbl = g1_from_dev(dbl)
    assert got_dbl == [a.add(a) for a in pts_a]


def test_g1_scalar_mul():
    g = G1.generator()
    scalars = [1, 2, 12345, 0]
    nbits = 14
    bits = np.zeros((nbits, len(scalars)), dtype=np.int32)
    for j, s in enumerate(scalars):
        for i in range(nbits):
            bits[i, j] = (s >> (nbits - 1 - i)) & 1
    base = g1_to_dev([g] * len(scalars))
    out = CJ.ec_scalar_mul_bits(CJ.FQ_OPS, base, jnp.asarray(bits))
    got = g1_from_dev(out)
    assert got == [g.mul(s) for s in scalars]


def test_g2_add_double():
    g = G2.generator()
    pts_a = [g, g.mul(3), G2.identity(), g.mul(4)]
    pts_b = [g, g.mul(2), g.mul(5), g.mul(4).neg()]
    expect = [a.add(b) for a, b in zip(pts_a, pts_b)]
    ops = CJ.FQ2_OPS
    out = CJ.ec_add(ops, g2_to_dev(pts_a), g2_to_dev(pts_b))
    got = g2_from_dev(out)
    assert got == expect
    dbl = CJ.ec_double(ops, g2_to_dev(pts_a))
    assert g2_from_dev(dbl) == [a.add(a) for a in pts_a]
