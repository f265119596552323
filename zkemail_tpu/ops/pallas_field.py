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


def mont_mul_flat(fs: LB.FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Montgomery product on flat (L, n) int32 batches via the Pallas kernel.

    Pads n up to a multiple of 1024 lanes; exact for canonical (< p) inputs.
    """
    n = a.shape[1]
    n_pad = -(-n // _TILE) * _TILE
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
