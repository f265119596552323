"""Batched BN254 point arithmetic in JAX — branch-free complete formulas.

TPU-first design: Renes–Costello–Batina complete projective addition for
a = 0 curves (Alg. 7/9) — no exceptional cases, so a whole batch of point
ops runs as straight-line VPU code with identity/doubling handled uniformly.
This is the group-law layer under the Pippenger MSM (ops/msm.py).

Points are pytrees {x, y, z} of field coordinates; a coordinate is an
(L, ...) limb array for Fq (G1) or a (c0, c1) tuple of them for Fq2 (G2).
Identity is (0, 1, 0).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import field as F
from . import limbs as LB
from .towers import XI

L = F.LIMBS


class FqOps:
    """Vectorized Fq operations (G1 coordinate field)."""

    name = "fq"
    fs = LB.FQ_SPEC

    def mul(self, a, b):
        return LB.mont_mul(self.fs, a, b)

    def mul_pack(self, pairs):
        """Batch independent products into ONE Montgomery multiply.

        Key to compact scan bodies (one fused CIOS instead of nested loops)
        and full VPU lanes in the EC formulas."""
        shape = None
        for a, b in pairs:
            s = jnp.broadcast_shapes(a.shape, b.shape)
            shape = s if shape is None else jnp.broadcast_shapes(shape, s)
        a_st = jnp.stack([jnp.broadcast_to(a, shape) for a, _ in pairs], axis=1)
        b_st = jnp.stack([jnp.broadcast_to(b, shape) for _, b in pairs], axis=1)
        out = LB.mont_mul(self.fs, a_st, b_st)
        return [out[:, i] for i in range(len(pairs))]

    def sqr(self, a):
        return LB.mont_mul(self.fs, a, a)

    def add(self, a, b):
        return LB.add(self.fs, a, b)

    def sub(self, a, b):
        return LB.sub(self.fs, a, b)

    def neg(self, a):
        return LB.neg(self.fs, a)

    def mul_b3(self, a):
        # 3b = 9 for y^2 = x^3 + 3:  9a = 8a + a
        a2 = self.add(a, a)
        a4 = self.add(a2, a2)
        a8 = self.add(a4, a4)
        return self.add(a8, a)

    def zero(self, shape):
        return LB.zeros(shape)

    def one(self, shape):
        return LB.constant(self.fs, 1, shape)

    def select(self, cond, a, b):
        return LB.select(cond, a, b)

    def is_zero(self, a):
        return LB.is_zero(a)

    def inv(self, a):
        return LB.inv(self.fs, a)

    def batch_shape(self, a):
        return a.shape[1:]

    def from_ints(self, values, mont=True):
        import numpy as np

        vals = np.asarray(values, dtype=object)
        if mont:
            flat = [F.FQ.to_mont(int(v)) for v in vals.reshape(-1)]
            vals = np.array(flat, dtype=object).reshape(vals.shape)
        return jnp.asarray(LB.ints_to_limbs(vals))

    def to_ints(self, a, mont=True):
        import numpy as np

        out = LB.limbs_to_ints(np.asarray(a))
        if mont:
            flat = [F.FQ.from_mont(int(v)) for v in np.asarray(out, dtype=object).reshape(-1)]
            out = np.array(flat, dtype=object).reshape(out.shape)
        return out


class Fq2Ops:
    """Vectorized Fq2 = Fq[u]/(u^2+1) operations (G2 coordinate field)."""

    name = "fq2"
    fs = LB.FQ_SPEC

    def mul(self, a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = LB.mont_mul(self.fs, a0, b0)
        t1 = LB.mont_mul(self.fs, a1, b1)
        s = LB.mont_mul(self.fs, LB.add(self.fs, a0, a1), LB.add(self.fs, b0, b1))
        c0 = LB.sub(self.fs, t0, t1)
        c1 = LB.sub(self.fs, LB.sub(self.fs, s, t0), t1)
        return (c0, c1)

    def mul_pack(self, pairs):
        """Karatsuba-batched Fq2 products: one Fq multiply for all pairs."""
        fq_pairs = []
        shape = None
        for (a0, a1), (b0, b1) in pairs:
            s = jnp.broadcast_shapes(a0.shape, b0.shape)
            shape = s if shape is None else jnp.broadcast_shapes(shape, s)
        for (a0, a1), (b0, b1) in pairs:
            sa = LB.add(self.fs, a0, a1)
            sb = LB.add(self.fs, b0, b1)
            fq_pairs += [
                (jnp.broadcast_to(a0, shape), jnp.broadcast_to(b0, shape)),
                (jnp.broadcast_to(a1, shape), jnp.broadcast_to(b1, shape)),
                (jnp.broadcast_to(sa, shape), jnp.broadcast_to(sb, shape)),
            ]
        a_st = jnp.stack([p[0] for p in fq_pairs], axis=1)
        b_st = jnp.stack([p[1] for p in fq_pairs], axis=1)
        out = LB.mont_mul(self.fs, a_st, b_st)
        res = []
        for i in range(len(pairs)):
            t0, t1, s = out[:, 3 * i], out[:, 3 * i + 1], out[:, 3 * i + 2]
            c0 = LB.sub(self.fs, t0, t1)
            c1 = LB.sub(self.fs, LB.sub(self.fs, s, t0), t1)
            res.append((c0, c1))
        return res

    def sqr(self, a):
        a0, a1 = a
        s = LB.mont_mul(self.fs, LB.add(self.fs, a0, a1), LB.sub(self.fs, a0, a1))
        m = LB.mont_mul(self.fs, a0, a1)
        return (s, LB.add(self.fs, m, m))

    def add(self, a, b):
        return (LB.add(self.fs, a[0], b[0]), LB.add(self.fs, a[1], b[1]))

    def sub(self, a, b):
        return (LB.sub(self.fs, a[0], b[0]), LB.sub(self.fs, a[1], b[1]))

    def neg(self, a):
        return (LB.neg(self.fs, a[0]), LB.neg(self.fs, a[1]))

    # 3 * b2 = 9/(9+u), a fixed Fq2 constant
    _B3 = None

    @classmethod
    def b3_const(cls):
        if cls._B3 is None:
            b3 = XI.inv() * 9
            cls._B3 = (b3.c0, b3.c1)
        return cls._B3

    def mul_b3(self, a):
        k0, k1 = self.b3_const()
        shape = a[0].shape[1:]
        c = (
            LB.constant(self.fs, k0, ()),
            LB.constant(self.fs, k1, ()),
        )
        c = (c[0].reshape((L,) + (1,) * len(shape)), c[1].reshape((L,) + (1,) * len(shape)))
        return self.mul(a, c)

    def zero(self, shape):
        return (LB.zeros(shape), LB.zeros(shape))

    def one(self, shape):
        return (LB.constant(self.fs, 1, shape), LB.zeros(shape))

    def select(self, cond, a, b):
        return (LB.select(cond, a[0], b[0]), LB.select(cond, a[1], b[1]))

    def is_zero(self, a):
        return LB.is_zero(a[0]) & LB.is_zero(a[1])

    def inv(self, a):
        a0, a1 = a
        norm = LB.add(
            self.fs, LB.mont_mul(self.fs, a0, a0), LB.mont_mul(self.fs, a1, a1)
        )
        ninv = LB.inv(self.fs, norm)
        return (
            LB.mont_mul(self.fs, a0, ninv),
            LB.neg(self.fs, LB.mont_mul(self.fs, a1, ninv)),
        )

    def batch_shape(self, a):
        return a[0].shape[1:]

    def from_ints(self, c0_vals, c1_vals, mont=True):
        fq = FqOps()
        return (fq_from(fq, c0_vals, mont), fq_from(fq, c1_vals, mont))


def fq_from(fq, vals, mont=True):
    import numpy as np

    arr = np.asarray(vals, dtype=object)
    if mont:
        flat = [F.FQ.to_mont(int(v)) for v in arr.reshape(-1)]
        arr = np.array(flat, dtype=object).reshape(arr.shape)
    return jnp.asarray(LB.ints_to_limbs(arr))


FQ_OPS = FqOps()
FQ2_OPS = Fq2Ops()


# ---------------------------------------------------------------------------
# Complete group law (RCB 2015, a = 0)
# ---------------------------------------------------------------------------

def ec_identity(ops, shape):
    return {"x": ops.zero(shape), "y": ops.one(shape), "z": ops.zero(shape)}


def ec_is_identity(ops, p):
    return ops.is_zero(p["z"])


def ec_neg(ops, p):
    return {"x": p["x"], "y": ops.neg(p["y"]), "z": p["z"]}


def ec_select(ops, cond, p, q):
    return {
        "x": ops.select(cond, p["x"], q["x"]),
        "y": ops.select(cond, p["y"], q["y"]),
        "z": ops.select(cond, p["z"], q["z"]),
    }


def _fused_ok(ops, p, q) -> bool:
    """True when a fully-fused Pallas EC-add kernel should serve this add:
    tracing (or on an accelerator), enough lanes to fill a tile, and the
    Pallas path verified. The composed path costs ~9x in HBM round-trips
    (measured 425 ns vs ~50 ns per lane-add at 0.5M lanes for G1); the G2
    kernel fuses the 42 Karatsuba CIOS multiplies the same way."""
    import jax as _jax

    from . import limbs as _LB

    px = p["x"][0] if ops.name == "fq2" else p["x"]
    qx = q["x"][0] if ops.name == "fq2" else q["x"]
    if not (
        isinstance(px, _jax.core.Tracer)
        or isinstance(qx, _jax.core.Tracer)
        or _jax.default_backend() != "cpu"
    ):
        return False
    shape = jnp.broadcast_shapes(px.shape[1:], qx.shape[1:])
    n = 1
    for d in shape:
        n *= d
    # G1 keeps the 1024-lane floor (below it the composed path's small
    # mont_mul scans are cheap and the warm compiled programs predate the
    # change). Fq2 uses the fused kernel at ANY lane count: a composed Fq2
    # add inlines ~18 small lax.scan CIOS chains, and a rows program whose
    # correction/tail lanes fall below the floor never finished compiling
    # on the tunneled TPU (measured r5: fq2@2^12 cols > 25 min, killed;
    # all-fused graphs compile in minutes). The kernel pow2-pads tiles, so
    # small batches just ride one padded tile.
    min_lanes = 1 if ops.name == "fq2" else 1024
    return n >= min_lanes and _LB._use_pallas()


_G2_FUSED_STATE = {"checked": False, "ok": False}


def _g2_fused_ok() -> bool:
    """One-time smoke compile of the fused G2 kernel (mirrors
    limbs._use_pallas for mont_mul): its 18-product CIOS waves hold ~3x the
    G1 kernel's VMEM working set, so a TPU generation where Mosaic cannot
    fit it degrades to the composed Fq2 path instead of crashing the first
    MSM mid-prove (ADVICE r4)."""
    if not _G2_FUSED_STATE["checked"]:
        _G2_FUSED_STATE["checked"] = True
        try:
            from ..ops import pallas_field as PF

            ident = ec_identity(FQ2_OPS, (1024,))
            out = PF.ec_add_g2(ident, ident)
            np.asarray(out["x"][0])
            _G2_FUSED_STATE["ok"] = True
        except Exception:
            _G2_FUSED_STATE["ok"] = False
    return _G2_FUSED_STATE["ok"]


def ec_add_signed(ops, p, q, neg):
    """p + (neg != 0 ? -q : q) — the MSM inner op, with the negation fused
    into the Pallas EC-add kernel on TPU (zero extra HBM traffic)."""
    if _fused_ok(ops, p, q) and (ops.name == "fq" or _g2_fused_ok()):
        from ..ops import pallas_field as PF

        fused = PF.ec_add_g1 if ops.name == "fq" else PF.ec_add_g2
        return fused(p, q, neg)
    q = ec_select(ops, neg != 0, ec_neg(ops, q), q)
    return ec_add(ops, p, q)


def ec_add(ops, p, q):
    """Complete projective addition, RCB Algorithm 7 (a=0).

    Restructured into two *batched* multiplication waves (6 independent
    products each) via ops.mul_pack — one fused CIOS per wave instead of 12
    sequential multiplies: far smaller scan bodies and full VPU lanes. On
    TPU with batches >= 1024 lanes the whole formula instead runs as ONE
    fused Pallas kernel (ops/pallas_field.ec_add_g1 / ec_add_g2).
    """
    if _fused_ok(ops, p, q) and (ops.name == "fq" or _g2_fused_ok()):
        from ..ops import pallas_field as PF

        fused = PF.ec_add_g1 if ops.name == "fq" else PF.ec_add_g2
        return fused(p, q)
    x1, y1, z1 = p["x"], p["y"], p["z"]
    x2, y2, z2 = q["x"], q["y"], q["z"]
    # wave 1: all products of the input coordinates
    t0, t1, t2, m3, m4, m5 = ops.mul_pack(
        [
            (x1, x2),
            (y1, y2),
            (z1, z2),
            (ops.add(x1, y1), ops.add(x2, y2)),
            (ops.add(y1, z1), ops.add(y2, z2)),
            (ops.add(x1, z1), ops.add(x2, z2)),
        ]
    )
    t3 = ops.sub(ops.sub(m3, t0), t1)  # X1Y2 + Y1X2
    t4 = ops.sub(ops.sub(m4, t1), t2)  # Y1Z2 + Z1Y2
    f5 = ops.sub(ops.sub(m5, t0), t2)  # X1Z2 + Z1X2
    t0_3 = ops.add(ops.add(t0, t0), t0)  # 3 X1X2
    t2_b3 = ops.mul_b3(t2)
    y3_b3 = ops.mul_b3(f5)
    z3a = ops.add(t1, t2_b3)
    t1m = ops.sub(t1, t2_b3)
    # wave 2
    a1, a2, a3, a4, a5, a6 = ops.mul_pack(
        [
            (t4, y3_b3),
            (t3, t1m),
            (y3_b3, t0_3),
            (t1m, z3a),
            (t0_3, t3),
            (z3a, t4),
        ]
    )
    x3 = ops.sub(a2, a1)
    y3 = ops.add(a4, a3)
    z3 = ops.add(a6, a5)
    return {"x": x3, "y": y3, "z": z3}


def ec_double(ops, p):
    """Complete projective doubling, RCB Algorithm 9 (a=0), batched waves."""
    x, y, z = p["x"], p["y"], p["z"]
    t0, t1, t2, txy = ops.mul_pack([(y, y), (y, z), (z, z), (x, y)])
    z3a = ops.add(t0, t0)
    z3a = ops.add(z3a, z3a)
    z3a = ops.add(z3a, z3a)  # 8 Y^2
    t2b = ops.mul_b3(t2)
    y3s = ops.add(t0, t2b)
    t0m = ops.sub(ops.sub(ops.sub(t0, t2b), t2b), t2b)  # t0 - 3*b3*Z^2
    m1, m2, m3, m4 = ops.mul_pack(
        [(t2b, z3a), (t1, z3a), (t0m, y3s), (t0m, txy)]
    )
    y3 = ops.add(m1, m3)
    x3 = ops.add(m4, m4)
    z3 = m2
    return {"x": x3, "y": y3, "z": z3}


def ec_scalar_mul_bits(ops, p, scalar_bits: jnp.ndarray):
    """Batched double-and-add: scalar_bits (nbits, ...) int32 MSB-first."""
    import jax

    def body(acc, bit):
        acc = ec_double(ops, acc)
        added = ec_add(ops, acc, p)
        acc = ec_select(ops, jnp.broadcast_to(bit, ops.batch_shape(acc["z"]) if False else bit.shape), added, acc)
        return acc, None

    init = ec_identity(ops, ops.batch_shape(p["x"] if ops.name == "fq" else p["x"][0]))
    acc, _ = jax.lax.scan(body, init, scalar_bits)
    return acc


def ec_to_affine(ops, p):
    """Normalize projective -> affine (identity maps to (0, 0))."""
    zinv = ops.inv(p["z"])
    return {
        "x": ops.mul(p["x"], zinv),
        "y": ops.mul(p["y"], zinv),
        "inf": ec_is_identity(ops, p),
    }
