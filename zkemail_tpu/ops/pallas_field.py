"""Pallas TPU kernel: fused CIOS Montgomery multiplication for BN254.

The single hottest primitive in the prover — every EC add in the Pippenger
MSM (ops/msm.py) and every butterfly in the NTT (ops/ntt.py) bottoms out in
``limbs.mont_mul``.  The pure-JAX path expresses the 22-iteration CIOS loop
as a ``lax.scan``, which XLA lowers to a while-loop whose (L+1, n)
accumulator round-trips HBM every iteration.  This kernel instead runs the
whole pipeline — 22 CIOS iterations, carry propagation, conditional
subtraction — as straight-line VPU code on (8, 128) int32 registers, so each
product costs exactly one HBM read of the two operands and one write of the
result (speed-of-light for this memory/ALU-bound op).

Layout: a field element batch is (L=22, n) int32 (12-bit limbs, batch on the
lane axis).  The kernel tiles n as (n // 1024) grid steps x (L, 8, 128)
VMEM blocks — each limb row is exactly one native int32 vreg.

Replaces the role wasmcurves' field arithmetic plays under snarkjs
(packages/helpers/src/chunked-zkey.ts:76-91); validated limb-exactly against
``core.limbs.mont_mul`` and python ints (tests/test_pallas_field.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import field as F
from ..core import limbs as LB

L = F.LIMBS
W = F.LIMB_BITS
MASK = F.LIMB_MASK

# lanes per grid step: 8 sublanes x 128 lanes = one int32 vreg per limb row
_SUB = 8
_LANE = 128
_TILE = _SUB * _LANE


def _cios_body(a, b, p_ints, n0inv):
    """Unrolled CIOS on lists of same-shape int32 arrays. Returns L limbs."""
    zero = jnp.zeros_like(a[0])
    t = [zero] * (L + 1)
    for i in range(L):
        ai = a[i]
        t = [t[j] + ai * b[j] for j in range(L)] + [t[L]]
        m = ((t[0] & MASK) * n0inv) & MASK
        t = [t[j] + m * p_ints[j] for j in range(L)] + [t[L]]
        carry = t[0] >> W  # low W bits are zero by construction
        t = t[1:] + [zero]
        t[0] = t[0] + carry
    # carry propagate
    out = []
    carry = None
    for i in range(L + 1):
        v = t[i] if carry is None else t[i] + carry
        out.append(v & MASK)
        carry = v >> W
    # conditional subtract p (value < 2p so limb L is zero after propagation)
    s = []
    borrow = jnp.zeros_like(out[0])
    for i in range(L):
        d = out[i] - p_ints[i] - borrow
        borrow = (d < 0).astype(jnp.int32)
        s.append(d + (borrow << W))
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, out[i], s[i]) for i in range(L)]


def _make_kernel_unrolled(p_limbs: tuple, n0inv: int):
    """Straight-line CIOS kernel (interpret/test mode: loops are slow to
    interpret, and the MLIR-size concern below only applies to compiles)."""
    p_ints = [int(x) for x in p_limbs]

    def kernel(a_ref, b_ref, p_ref, out_ref):
        del p_ref
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        r = _cios_body(a, b, p_ints, n0inv)
        for i in range(L):
            out_ref[i] = r[i]

    return kernel


def _make_kernel(p_limbs: tuple, n0inv: int):
    """Looped CIOS kernel.

    The limb loop is a lax.fori_loop over vectorized (L+1, SUB, LANE) state —
    NOT unrolled: every pallas_call site embeds its kernel body in the MLIR
    shipped to the (tunneled) compiler, and the prover has >100 call sites;
    the unrolled ~2000-op body overflowed the remote compile request
    (HTTP 413).  The loop body is ~20 vector ops on full vregs, so the MXU/VPU
    cost is identical.
    """
    p_ints = [int(x) for x in p_limbs]

    def kernel(a_ref, b_ref, p_ref, out_ref):
        b = b_ref[...]  # (L, SUB, LANE) int32
        pcol = p_ref[...]  # (L, 1, LANE) broadcast modulus limbs

        def body(i, t):
            # static-slice concats only: Mosaic has no value scatter/roll
            ai = a_ref[pl.ds(i, 1)]  # dynamic ref read: (1, SUB, LANE)
            t = jnp.concatenate([t[:L] + ai * b, t[L:]], axis=0)
            m = ((t[0] & MASK) * (n0inv & MASK)) & MASK
            t = jnp.concatenate([t[:L] + m[None] * pcol, t[L:]], axis=0)
            carry = t[0] >> W  # low W bits zero by construction
            hi = jnp.zeros_like(t[:1])
            t = jnp.concatenate([(t[1:2] + carry[None]), t[2:], hi], axis=0)
            return t

        t0 = jnp.zeros((L + 1,) + b.shape[1:], dtype=jnp.int32)
        t = jax.lax.fori_loop(0, L, body, t0)
        # carry propagate + conditional subtract (value < 2p): unrolled but
        # cheap (3 ops per limb)
        tl = [t[i] for i in range(L + 1)]
        out = []
        carry = None
        for i in range(L + 1):
            v = tl[i] if carry is None else tl[i] + carry
            out.append(v & MASK)
            carry = v >> W
        s = []
        borrow = jnp.zeros_like(out[0])
        for i in range(L):
            d = out[i] - p_ints[i] - borrow
            borrow = (d < 0).astype(jnp.int32)
            s.append(d + (borrow << W))
        keep = borrow.astype(jnp.bool_)
        for i in range(L):
            out_ref[i] = jnp.where(keep, out[i], s[i])

    return kernel


@functools.lru_cache(maxsize=None)
def _mont_mul_call(field_name: str, n_tiles: int, interpret: bool):
    fs = LB.FieldSpec.make(field_name)
    make = _make_kernel_unrolled if interpret else _make_kernel
    kernel = make(fs.p_limbs, fs.n0inv)
    spec = pl.BlockSpec(
        (L, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    p_spec = pl.BlockSpec(
        (L, 1, _LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_tiles * _SUB, _LANE), jnp.int32),
        grid=(n_tiles,),
        in_specs=[spec, spec, p_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * _TILE * (2 * L * L + 6 * L),
            bytes_accessed=3 * n_tiles * _TILE * L * 4,
            transcendentals=0,
        ),
    )
    jitted = jax.jit(call)

    def run(a3, b3):
        p_arr = jnp.broadcast_to(
            jnp.asarray(fs.np_p).reshape(L, 1, 1), (L, 1, _LANE)
        )
        return jitted(a3, b3, p_arr)

    return run


def _pad_tiles(n: int) -> int:
    """Lane count padded to a power-of-two multiple of the tile.

    Every distinct tile count is a separate Mosaic kernel compile shipped
    through the (slow) tunnel; power-of-two padding collapses the set of
    tile counts any program can produce to ~a dozen, shared across ALL call
    sites and cached persistently. Wastes at most 2x lanes on kernels that
    run at ~12-50 ns/lane — compile latency dominates by minutes."""
    t = -(-n // _TILE)
    return _TILE * (1 << max(0, (t - 1).bit_length()))


def mont_mul_flat(fs: LB.FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Montgomery product on flat (L, n) int32 batches via the Pallas kernel.

    Pads n up to a power-of-two tile multiple; exact for canonical inputs.
    """
    n = a.shape[1]
    n_pad = _pad_tiles(n)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n)))
        b = jnp.pad(b, ((0, 0), (0, n_pad - n)))
    a3 = a.reshape(L, n_pad // _LANE, _LANE)
    b3 = b.reshape(L, n_pad // _LANE, _LANE)
    out = _mont_mul_call(fs.name, n_pad // _TILE, interpret)(a3, b3)
    return out.reshape(L, n_pad)[:, :n]


def mont_mul(fs: LB.FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``limbs.mont_mul`` with broadcasting over batch dims."""
    batch_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch_shape)
    b = jnp.broadcast_to(b, (L,) + batch_shape)
    n = 1
    for d in batch_shape:
        n *= d
    out = mont_mul_flat(fs, a.reshape(L, n), b.reshape(L, n), interpret)
    return out.reshape((L,) + batch_shape)


# ---------------------------------------------------------------------------
# Fused complete EC addition (G1 / Fq): the prover's hottest composite op
# ---------------------------------------------------------------------------
#
# The composed curve_jax.ec_add costs ~2 pallas mont_mul round-trips plus
# ~12 separate XLA elementwise field ops — every intermediate makes an HBM
# round-trip, measured ~425 ns per lane-add vs ~48 ns of actual multiply
# work. This kernel runs the ENTIRE RCB complete addition (a=0, Alg. 7) —
# 12 CIOS multiplies, the b3 chains, all adds/subs, and the optional
# conditional negation of the addend — in Vv registers: one HBM read of the
# six input coordinate arrays and one write of three outputs.

def _addm(x, y, p_ints):
    """x + y mod p on limb lists (canonical in -> canonical out)."""
    t = [x[i] + y[i] for i in range(L)]
    out = []
    carry = None
    for i in range(L):
        v = t[i] if carry is None else t[i] + carry
        out.append(v & MASK)
        carry = v >> W
    # value < 2p: single conditional subtract
    s = []
    borrow = jnp.zeros_like(out[0])
    for i in range(L):
        d = out[i] - p_ints[i] - borrow
        borrow = (d < 0).astype(jnp.int32)
        s.append(d + (borrow << W))
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, out[i], s[i]) for i in range(L)]


def _subm(x, y, p_ints):
    """x - y mod p on limb lists (offset by +p; arithmetic-shift carries)."""
    t = [x[i] - y[i] + p_ints[i] for i in range(L)]
    out = []
    carry = None
    for i in range(L):
        v = t[i] if carry is None else t[i] + carry
        out.append(v & MASK)
        carry = v >> W  # arithmetic shift: carry may be -1
    s = []
    borrow = jnp.zeros_like(out[0])
    for i in range(L):
        d = out[i] - p_ints[i] - borrow
        borrow = (d < 0).astype(jnp.int32)
        s.append(d + (borrow << W))
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, out[i], s[i]) for i in range(L)]


def _mul6_fori(pairs, p_ints, n0inv):
    """Six independent Montgomery products as ONE stacked fori-loop CIOS.

    pairs: list of 6 (a_limb_list, b_limb_list). Stacking the pairs into a
    (L, 6, ...) array and looping the 22 CIOS iterations in a fori_loop
    keeps the kernel body ~6x smaller than six unrolled CIOS bodies —
    load-bearing: each extra kilobyte of kernel MLIR multiplies across the
    pallas call sites shipped through the tunnel compiler, and the fully
    unrolled variant OOM-killed the compile helper."""
    a = jnp.stack([jnp.stack(pa, axis=0) for pa, _ in pairs], axis=1)  # (L, 6, ...)
    b = jnp.stack([jnp.stack(pb, axis=0) for _, pb in pairs], axis=1)
    pcol = jnp.asarray(np.array(p_ints, np.int32)).reshape(
        (L,) + (1,) * (a.ndim - 1)
    )

    def body(i, t):
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)  # (1, 6, ...)
        t = jnp.concatenate([t[:L] + ai * b, t[L:]], axis=0)
        m = ((t[0] & MASK) * (n0inv & MASK)) & MASK
        t = jnp.concatenate([t[:L] + m[None] * pcol, t[L:]], axis=0)
        carry = t[0] >> W  # low W bits zero by construction
        hi = jnp.zeros_like(t[:1])
        t = jnp.concatenate([(t[1:2] + carry[None]), t[2:], hi], axis=0)
        return t

    t0 = jnp.zeros((L + 1,) + a.shape[1:], jnp.int32)
    t = jax.lax.fori_loop(0, L, body, t0)
    tl = [t[i] for i in range(L + 1)]
    out = []
    carry = None
    for i in range(L + 1):
        v = tl[i] if carry is None else tl[i] + carry
        out.append(v & MASK)
        carry = v >> W
    s = []
    borrow = jnp.zeros_like(out[0])
    for i in range(L):
        d = out[i] - p_ints[i] - borrow
        borrow = (d < 0).astype(jnp.int32)
        s.append(d + (borrow << W))
    keep = borrow.astype(jnp.bool_)
    res = [jnp.where(keep, out[i], s[i]) for i in range(L)]  # (6, ...) each
    return [[res[i][j] for i in range(L)] for j in range(6)]


def _ec_add_math(x1, y1, z1, x2, y2, z2, negm, p_ints, n0inv):
    """The fused kernel's math on limb LISTS of same-shape int32 arrays —
    pure jnp (also runs eagerly for CPU tests). The 12 multiplies run as
    TWO stacked fori-loop waves of six (_mul6_fori).
    Returns (x3, y3, z3) limb lists."""
    # conditional negate: p - y2 (exact p folds to 0 via the cond-sub)
    zero = [jnp.zeros_like(y2[0]) for _ in range(L)]
    ny2 = _subm(zero, y2, p_ints)
    y2 = [jnp.where(negm, ny2[i], y2[i]) for i in range(L)]

    def add(a, b):
        return _addm(a, b, p_ints)

    def sub(a, b):
        return _subm(a, b, p_ints)

    def mul_b3(a):  # 3b = 9: 8a + a
        a2 = add(a, a)
        a4 = add(a2, a2)
        a8 = add(a4, a4)
        return add(a8, a)

    # RCB Algorithm 7 (a = 0), mirroring curve_jax.ec_add exactly
    t0, t1, t2, m3, m4, m5 = _mul6_fori(
        [
            (x1, x2),
            (y1, y2),
            (z1, z2),
            (add(x1, y1), add(x2, y2)),
            (add(y1, z1), add(y2, z2)),
            (add(x1, z1), add(x2, z2)),
        ],
        p_ints,
        n0inv,
    )
    t3 = sub(sub(m3, t0), t1)
    t4 = sub(sub(m4, t1), t2)
    f5 = sub(sub(m5, t0), t2)
    t0_3 = add(add(t0, t0), t0)
    t2_b3 = mul_b3(t2)
    y3_b3 = mul_b3(f5)
    z3a = add(t1, t2_b3)
    t1m = sub(t1, t2_b3)
    a1, a2, a3, a4, a5, a6 = _mul6_fori(
        [
            (t4, y3_b3),
            (t3, t1m),
            (y3_b3, t0_3),
            (t1m, z3a),
            (t0_3, t3),
            (z3a, t4),
        ],
        p_ints,
        n0inv,
    )
    x3 = sub(a2, a1)
    y3 = add(a4, a3)
    z3 = add(a6, a5)
    return x3, y3, z3


def _make_ec_add_kernel(p_limbs: tuple, n0inv: int):
    p_ints = [int(x) for x in p_limbs]

    def kernel(x1r, y1r, z1r, x2r, y2r, z2r, negr, oxr, oyr, ozr):
        def rd(ref):
            return [ref[i] for i in range(L)]

        negm = negr[0] != 0  # (SUB, LANE) bool
        x3, y3, z3 = _ec_add_math(
            rd(x1r), rd(y1r), rd(z1r), rd(x2r), rd(y2r), rd(z2r),
            negm, p_ints, n0inv,
        )
        for i in range(L):
            oxr[i] = x3[i]
            oyr[i] = y3[i]
            ozr[i] = z3[i]

    return kernel


def ec_add_g1_eager_math(p, q, neg):
    """Eager-math mirror of ec_add_g1 for CPU tests: same limb math, no
    pallas_call, no giant-graph compile. p/q: {"x","y","z"} (L, n)."""
    fs = LB.FieldSpec.make("Fq")
    p_ints = [int(x) for x in fs.p_limbs]

    def split(c):
        return [c[i] for i in range(L)]

    negm = jnp.asarray(neg) != 0
    x3, y3, z3 = _ec_add_math(
        split(p["x"]), split(p["y"]), split(p["z"]),
        split(q["x"]), split(q["y"]), split(q["z"]),
        negm, p_ints, fs.n0inv,
    )
    return {
        "x": jnp.stack(x3, axis=0),
        "y": jnp.stack(y3, axis=0),
        "z": jnp.stack(z3, axis=0),
    }


@functools.lru_cache(maxsize=None)
def _ec_add_call(n_tiles: int, interpret: bool):
    fs = LB.FieldSpec.make("Fq")
    kernel = _make_ec_add_kernel(fs.p_limbs, fs.n0inv)
    spec = pl.BlockSpec(
        (L, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    nspec = pl.BlockSpec(
        (1, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, n_tiles * _SUB, _LANE), jnp.int32)
    call = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n_tiles,),
        in_specs=[spec] * 6 + [nspec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * _TILE * 12 * (2 * L * L + 6 * L),
            bytes_accessed=9 * n_tiles * _TILE * L * 4,
            transcendentals=0,
        ),
    )
    # interpret mode (CPU tests) runs the kernel eagerly: jitting it would
    # hand XLA:CPU the ~4500-op unrolled body, a multi-minute compile
    return call if interpret else jax.jit(call)


def ec_add_g1_flat(p3, q3, neg, interpret: bool = False):
    """Fused complete G1 add of flat (L, n) coordinate dicts.

    p3/q3: {"x","y","z"} of (L, n) int32 mont limbs; neg: (n,) int32 — the
    addend q is negated where neg != 0. Returns the sum as a coord dict."""
    n = p3["x"].shape[1]
    n_pad = _pad_tiles(n)

    def prep(c):
        if n_pad != n:
            c = jnp.pad(c, ((0, 0), (0, n_pad - n)))
        return c.reshape(L, n_pad // _LANE, _LANE)

    negp = jnp.pad(neg.astype(jnp.int32), ((0, n_pad - n),)) if n_pad != n else neg.astype(jnp.int32)
    neg3 = negp.reshape(1, n_pad // _LANE, _LANE)
    args = [prep(p3[k]) for k in ("x", "y", "z")] + [prep(q3[k]) for k in ("x", "y", "z")]
    ox, oy, oz = _ec_add_call(n_pad // _TILE, interpret)(*args, neg3)
    out = {
        "x": ox.reshape(L, n_pad)[:, :n],
        "y": oy.reshape(L, n_pad)[:, :n],
        "z": oz.reshape(L, n_pad)[:, :n],
    }
    return out


def ec_add_g1(p, q, neg=None, interpret: bool = False):
    """Drop-in fused complete add for G1 point pytrees of any batch shape.

    neg (optional): int array broadcastable to the batch shape — lanes with
    neg != 0 add the NEGATED q (the MSM's signed-digit path, fused so the
    negation costs zero extra HBM traffic)."""
    batch_shape = jnp.broadcast_shapes(p["x"].shape[1:], q["x"].shape[1:])
    n = 1
    for d in batch_shape:
        n *= d

    def flat(c):
        return jnp.broadcast_to(c, (L,) + batch_shape).reshape(L, n)

    p3 = {k: flat(p[k]) for k in ("x", "y", "z")}
    q3 = {k: flat(q[k]) for k in ("x", "y", "z")}
    if neg is None:
        negf = jnp.zeros((n,), jnp.int32)
    else:
        negf = jnp.broadcast_to(neg, batch_shape).reshape(n).astype(jnp.int32)
    out = ec_add_g1_flat(p3, q3, negf, interpret)
    return {k: v.reshape((L,) + batch_shape) for k, v in out.items()}
