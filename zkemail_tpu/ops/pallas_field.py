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


def _mul6_fori(pairs, p_ints, n0inv, pcol=None, a_scratch=None):
    """K independent Montgomery products as ONE stacked fori-loop CIOS.

    pairs: list of K (a_limb_list, b_limb_list) — K=6 for the two G1 waves,
    K=18/6/18 for the three G2 Karatsuba waves. Stacking the pairs into a
    (L, K, ...) array and looping the 22 CIOS iterations in a fori_loop
    keeps the kernel body ~Kx smaller than K unrolled CIOS bodies —
    load-bearing: each extra kilobyte of kernel MLIR multiplies across the
    pallas call sites shipped through the tunnel compiler, and the fully
    unrolled variant OOM-killed the compile helper.

    pcol: the modulus limb column as an ARRAY (L, ..., LANE). Inside a
    pallas kernel it MUST come from a kernel input ref (pallas rejects
    kernels that capture non-scalar constants); None (eager/test paths
    outside pallas) builds it from p_ints.

    a_scratch: a VMEM scratch REF of shape (L, >=K, SUB, LANE). Inside a
    pallas kernel the loop's per-limb read of the stacked operand must be a
    dynamic REF read (a_ref[pl.ds(i, 1)], the proven mont-kernel pattern) —
    Mosaic has no dynamic_slice on VALUES — so the stacked a is staged
    through this scratch once before the loop. None (eager paths) uses the
    plain value dynamic_slice."""
    a = jnp.stack([jnp.stack(pa, axis=0) for pa, _ in pairs], axis=1)  # (L, 6, ...)
    b = jnp.stack([jnp.stack(pb, axis=0) for _, pb in pairs], axis=1)
    K = a.shape[1]
    if pcol is None:
        pcol = jnp.asarray(np.array(p_ints, np.int32)).reshape(
            (L,) + (1,) * (a.ndim - 1)
        )
    else:
        pcol = pcol.reshape((L,) + (1,) * (a.ndim - 2) + (pcol.shape[-1],))

    if a_scratch is None:
        def get_ai(i):
            return jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)  # (1, K, ...)
    else:
        a_scratch[:, :K] = a

        def get_ai(i):
            return a_scratch[pl.ds(i, 1), :K]

    def body(i, t):
        ai = get_ai(i)
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
    res = [jnp.where(keep, out[i], s[i]) for i in range(L)]  # (K, ...) each
    return [[res[i][j] for i in range(L)] for j in range(len(pairs))]


def _ec_add_math(x1, y1, z1, x2, y2, z2, negm, p_ints, n0inv, pcol=None,
                 a_scratch=None):
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
        pcol,
        a_scratch,
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
        pcol,
        a_scratch,
    )
    x3 = sub(a2, a1)
    y3 = add(a4, a3)
    z3 = add(a6, a5)
    return x3, y3, z3


def _make_ec_add_kernel(p_limbs: tuple, n0inv: int):
    p_ints = [int(x) for x in p_limbs]

    def kernel(x1r, y1r, z1r, x2r, y2r, z2r, negr, pr, oxr, oyr, ozr, sref):
        def rd(ref):
            return [ref[i] for i in range(L)]

        negm = negr[0] != 0  # (SUB, LANE) bool
        x3, y3, z3 = _ec_add_math(
            rd(x1r), rd(y1r), rd(z1r), rd(x2r), rd(y2r), rd(z2r),
            negm, p_ints, n0inv, pcol=pr[...], a_scratch=sref,
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
    p_spec = pl.BlockSpec(
        (L, 1, _LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, n_tiles * _SUB, _LANE), jnp.int32)
    call = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n_tiles,),
        in_specs=[spec] * 6 + [nspec, p_spec],
        out_specs=(spec, spec, spec),
        scratch_shapes=[pltpu.VMEM((L, 6, _SUB, _LANE), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * _TILE * 12 * (2 * L * L + 6 * L),
            bytes_accessed=9 * n_tiles * _TILE * L * 4,
            transcendentals=0,
        ),
    )
    # interpret mode (CPU tests) runs the kernel eagerly: jitting it would
    # hand XLA:CPU the ~4500-op unrolled body, a multi-minute compile
    jitted = call if interpret else jax.jit(call)

    def run(*args):
        # modulus limbs as a kernel INPUT — pallas rejects kernels that
        # capture non-scalar constants (same pattern as _mont_mul_call)
        p_arr = jnp.broadcast_to(
            jnp.asarray(fs.np_p).reshape(L, 1, 1), (L, 1, _LANE)
        )
        return jitted(*args, p_arr)

    return run


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


# ---------------------------------------------------------------------------
# Fused complete EC addition (G2 / Fq2): the b2 query's hot op
# ---------------------------------------------------------------------------
#
# Same RCB complete addition, over Fq2 = Fq[u]/(u^2+1). Each Fq2 product is
# 3 Fq Montgomery multiplies (Karatsuba), so the 12 formula multiplies plus
# the two b3-constant multiplies run as THREE stacked fori-loop CIOS waves
# (18 + 6 + 18 products). The composed Fq2 path costs ~2.7x the G1 field
# work with an HBM round-trip per intermediate; this kernel does one read
# of the 12 input coordinate components and one write of 6 outputs.
# Replaces the wasmcurves G2 MSM role under snarkjs.groth16.fullProve
# (packages/helpers/src/chunked-zkey.ts:76-91) for the proof's B point.

def _fq2_mul_wave(pairs2, p_ints, n0inv, pcol=None, a_scratch=None):
    """K independent Fq2 Karatsuba products via ONE 3K-wide CIOS wave.

    pairs2: [((a0, a1), (b0, b1)), ...] where each component is a limb list.
    c0 = a0 b0 - a1 b1,  c1 = (a0 + a1)(b0 + b1) - a0 b0 - a1 b1."""
    fqp = []
    for (a0, a1), (b0, b1) in pairs2:
        fqp.append((a0, b0))
        fqp.append((a1, b1))
        fqp.append((_addm(a0, a1, p_ints), _addm(b0, b1, p_ints)))
    res = _mul6_fori(fqp, p_ints, n0inv, pcol, a_scratch)
    out = []
    for i in range(len(pairs2)):
        t0, t1, s = res[3 * i], res[3 * i + 1], res[3 * i + 2]
        c0 = _subm(t0, t1, p_ints)
        c1 = _subm(_subm(s, t0, p_ints), t1, p_ints)
        out.append((c0, c1))
    return out


@functools.lru_cache(maxsize=None)
def _g2_b3_mont_limbs():
    """Per-limb Python ints of b3 = 3*b2 = 9/(9+u) in Montgomery form."""
    from ..core.towers import XI

    b3 = XI.inv() * 9
    out = []
    for comp in (b3.c0, b3.c1):
        m = F.FQ.to_mont(int(comp))
        out.append(tuple((m >> (W * i)) & MASK for i in range(L)))
    return tuple(out)


def _ec_add_g2_math(p1, q2, negm, p_ints, n0inv, pcol=None, a_scratch=None):
    """Fused-kernel math on Fq2 limb lists: p1/q2 are ((x0,x1),(y0,y1),
    (z0,z1)) with each component a list of L same-shape int32 arrays.
    Mirrors curve_jax.ec_add over FQ2_OPS bit-exactly."""
    (x1, y1, z1) = p1
    (x2, y2, z2) = q2

    def f2add(a, b):
        return (_addm(a[0], b[0], p_ints), _addm(a[1], b[1], p_ints))

    def f2sub(a, b):
        return (_subm(a[0], b[0], p_ints), _subm(a[1], b[1], p_ints))

    # conditional negate: both components (exact p folds to 0 via cond-sub)
    zero = [jnp.zeros_like(y2[0][0]) for _ in range(L)]
    ny0 = _subm(zero, y2[0], p_ints)
    ny1 = _subm(zero, y2[1], p_ints)
    y2 = (
        [jnp.where(negm, ny0[i], y2[0][i]) for i in range(L)],
        [jnp.where(negm, ny1[i], y2[1][i]) for i in range(L)],
    )

    t0, t1, t2, m3, m4, m5 = _fq2_mul_wave(
        [
            (x1, x2),
            (y1, y2),
            (z1, z2),
            (f2add(x1, y1), f2add(x2, y2)),
            (f2add(y1, z1), f2add(y2, z2)),
            (f2add(x1, z1), f2add(x2, z2)),
        ],
        p_ints,
        n0inv,
        pcol,
        a_scratch,
    )
    t3 = f2sub(f2sub(m3, t0), t1)
    t4 = f2sub(f2sub(m4, t1), t2)
    f5 = f2sub(f2sub(m5, t0), t2)
    t0_3 = f2add(f2add(t0, t0), t0)
    # b3-constant multiplies (b3 is a full Fq2 element for G2, not 9)
    k0, k1 = _g2_b3_mont_limbs()
    b3c = (
        [jnp.full_like(t2[0][0], k0[i]) for i in range(L)],
        [jnp.full_like(t2[0][0], k1[i]) for i in range(L)],
    )
    t2_b3, y3_b3 = _fq2_mul_wave(
        [(t2, b3c), (f5, b3c)], p_ints, n0inv, pcol, a_scratch
    )
    z3a = f2add(t1, t2_b3)
    t1m = f2sub(t1, t2_b3)
    a1, a2, a3, a4, a5, a6 = _fq2_mul_wave(
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
        pcol,
        a_scratch,
    )
    x3 = f2sub(a2, a1)
    y3 = f2add(a4, a3)
    z3 = f2add(a6, a5)
    return x3, y3, z3


def _make_ec_add_g2_kernel(p_limbs: tuple, n0inv: int):
    p_ints = [int(x) for x in p_limbs]

    def kernel(
        x10r, x11r, y10r, y11r, z10r, z11r,
        x20r, x21r, y20r, y21r, z20r, z21r,
        negr, pr, ox0r, ox1r, oy0r, oy1r, oz0r, oz1r, sref,
    ):
        def rd(ref):
            return [ref[i] for i in range(L)]

        negm = negr[0] != 0
        x3, y3, z3 = _ec_add_g2_math(
            ((rd(x10r), rd(x11r)), (rd(y10r), rd(y11r)), (rd(z10r), rd(z11r))),
            ((rd(x20r), rd(x21r)), (rd(y20r), rd(y21r)), (rd(z20r), rd(z21r))),
            negm, p_ints, n0inv, pcol=pr[...], a_scratch=sref,
        )
        for i in range(L):
            ox0r[i] = x3[0][i]
            ox1r[i] = x3[1][i]
            oy0r[i] = y3[0][i]
            oy1r[i] = y3[1][i]
            oz0r[i] = z3[0][i]
            oz1r[i] = z3[1][i]

    return kernel


def ec_add_g2_eager_math(p, q, neg):
    """Eager-math mirror of ec_add_g2 for CPU tests: same limb math, no
    pallas_call. p/q: {"x","y","z"} of (c0, c1) tuples of (L, n) arrays."""
    fs = LB.FieldSpec.make("Fq")
    p_ints = [int(x) for x in fs.p_limbs]

    def split2(c):
        return ([c[0][i] for i in range(L)], [c[1][i] for i in range(L)])

    negm = jnp.asarray(neg) != 0
    x3, y3, z3 = _ec_add_g2_math(
        (split2(p["x"]), split2(p["y"]), split2(p["z"])),
        (split2(q["x"]), split2(q["y"]), split2(q["z"])),
        negm, p_ints, fs.n0inv,
    )

    def join(c):
        return (jnp.stack(c[0], axis=0), jnp.stack(c[1], axis=0))

    return {"x": join(x3), "y": join(y3), "z": join(z3)}


@functools.lru_cache(maxsize=None)
def _ec_add_g2_call(n_tiles: int, interpret: bool):
    fs = LB.FieldSpec.make("Fq")
    kernel = _make_ec_add_g2_kernel(fs.p_limbs, fs.n0inv)
    spec = pl.BlockSpec(
        (L, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    nspec = pl.BlockSpec(
        (1, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    p_spec = pl.BlockSpec(
        (L, 1, _LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, n_tiles * _SUB, _LANE), jnp.int32)
    call = pl.pallas_call(
        kernel,
        out_shape=(shape,) * 6,
        grid=(n_tiles,),
        in_specs=[spec] * 12 + [nspec, p_spec],
        out_specs=(spec,) * 6,
        scratch_shapes=[pltpu.VMEM((L, 18, _SUB, _LANE), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * _TILE * 42 * (2 * L * L + 6 * L),
            bytes_accessed=18 * n_tiles * _TILE * L * 4,
            transcendentals=0,
        ),
    )
    jitted = call if interpret else jax.jit(call)

    def run(*args):
        p_arr = jnp.broadcast_to(
            jnp.asarray(fs.np_p).reshape(L, 1, 1), (L, 1, _LANE)
        )
        return jitted(*args, p_arr)

    return run


def ec_add_g2_flat(p3, q3, neg, interpret: bool = False):
    """Fused complete G2 add of flat (L, n) Fq2 coordinate dicts."""
    n = p3["x"][0].shape[1]
    n_pad = _pad_tiles(n)

    def prep(c):
        if n_pad != n:
            c = jnp.pad(c, ((0, 0), (0, n_pad - n)))
        return c.reshape(L, n_pad // _LANE, _LANE)

    negp = (
        jnp.pad(neg.astype(jnp.int32), ((0, n_pad - n),))
        if n_pad != n
        else neg.astype(jnp.int32)
    )
    neg3 = negp.reshape(1, n_pad // _LANE, _LANE)
    args = [
        prep(p3[k][c]) for k in ("x", "y", "z") for c in (0, 1)
    ] + [prep(q3[k][c]) for k in ("x", "y", "z") for c in (0, 1)]
    ox0, ox1, oy0, oy1, oz0, oz1 = _ec_add_g2_call(n_pad // _TILE, interpret)(
        *args, neg3
    )

    def unp(c):
        return c.reshape(L, n_pad)[:, :n]

    return {
        "x": (unp(ox0), unp(ox1)),
        "y": (unp(oy0), unp(oy1)),
        "z": (unp(oz0), unp(oz1)),
    }


def ec_add_g2(p, q, neg=None, interpret: bool = False):
    """Drop-in fused complete add for G2 point pytrees of any batch shape.

    Coordinates are (c0, c1) tuples of (L, ...) limb arrays; neg as in
    ec_add_g1 (lanes with neg != 0 add the negated q)."""
    batch_shape = jnp.broadcast_shapes(p["x"][0].shape[1:], q["x"][0].shape[1:])
    n = 1
    for d in batch_shape:
        n *= d

    def flat(c):
        return jnp.broadcast_to(c, (L,) + batch_shape).reshape(L, n)

    p3 = {k: (flat(p[k][0]), flat(p[k][1])) for k in ("x", "y", "z")}
    q3 = {k: (flat(q[k][0]), flat(q[k][1])) for k in ("x", "y", "z")}
    if neg is None:
        negf = jnp.zeros((n,), jnp.int32)
    else:
        negf = jnp.broadcast_to(neg, batch_shape).reshape(n).astype(jnp.int32)
    out = ec_add_g2_flat(p3, q3, negf, interpret)
    return {
        k: tuple(c.reshape((L,) + batch_shape) for c in v)
        for k, v in out.items()
    }
