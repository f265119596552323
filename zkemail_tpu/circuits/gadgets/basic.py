"""Basic constraint gadgets: bit decomposition, comparators, muxes.

Semantic parity targets: circomlib bitify/comparators/mux1 as used throughout
/root/reference/packages/circuits (e.g. email-verifier.circom:58, sha.circom).
Each gadget emits R1CS rows and registers vectorized witness steps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core import field as F
from ...core import limbs as LB
from ..builder import LC, ConstraintSystem, Env, PreparedLC, SignalVec, _from_mont_dev

L = F.LIMBS


def num2bits(cs: ConstraintSystem, x, n_bits: int) -> SignalVec:
    """Decompose x into n_bits little-endian bits (constrained booleans).

    Witness extracts bits from the limb representation, so it works for any
    field value < 2^n_bits (circomlib Num2Bits semantics).
    """
    x = LC.of(x)
    shape = x.shape
    bits = cs.alloc((n_bits,) + shape, "bits")
    cs.enforce_bit(bits)
    # sum 2^i b_i == x
    acc = LC([], 0)
    for i in range(n_bits):
        acc = acc + bits[i] * (1 << i)
    cs.enforce_equal(acc, x)

    prep = PreparedLC(x, shape)

    def step(env, prep=prep, n_bits=n_bits):
        vals = prep.eval_std(env)  # (L, n, B)
        b = vals.shape[-1]
        if not isinstance(vals, jax.core.Tracer):
            # eager: one host copy, then the n_bits loop is numpy (the jnp
            # version costs ~2 dispatches per bit — dominant at 254 bits)
            v = np.asarray(vals)
            outs = [
                (v[i // F.LIMB_BITS] >> (i % F.LIMB_BITS)) & 1
                for i in range(n_bits)
            ]
            small = np.stack(outs, axis=0).reshape(-1, b)
            out = np.zeros((L,) + small.shape, dtype=np.int32)
            out[0] = small
            return out
        outs = []
        for i in range(n_bits):
            limb, off = divmod(i, F.LIMB_BITS)
            outs.append((vals[limb] >> off) & 1)
        bitsv = jnp.stack(outs, axis=0)  # (n_bits, n, B)
        small = bitsv.reshape(-1, b)
        return jnp.stack(
            [small] + [jnp.zeros_like(small)] * (L - 1), axis=0
        )

    cs.set_witness(bits, step, "num2bits")
    return bits


def bits2num(cs: ConstraintSystem, bits: SignalVec) -> SignalVec:
    """Recombine little-endian bits into a number (circomlib Bits2Num)."""
    n_bits = bits.shape[0]
    acc = LC([], 0)
    for i in range(n_bits):
        acc = acc + bits[i] * (1 << i)
    return cs.define(acc, "bits2num")


def is_zero(cs: ConstraintSystem, x) -> SignalVec:
    """out = (x == 0), via the inverse hint (circomlib IsZero)."""
    x = LC.of(x)
    shape = x.shape
    inv = cs.alloc(shape, "isz_inv")
    out = cs.alloc(shape, "isz_out")
    # x * inv = 1 - out ;  x * out = 0
    cs.enforce(x, inv, 1 - LC.of(out))
    cs.enforce(x, out, LC([], 0))

    prep = PreparedLC(x, shape)

    def step_inv(env, prep=prep):
        if prep.host_eligible(env):
            # host bigint inverse: one pow(v, -1, p) per element beats the
            # 254-round Fermat limb ladder by ~100x on the eager path
            # (measured: is_zero.inv was 60% of full-model witness time)
            vals = prep.eval_ints(env)
            flat = vals.reshape(-1)
            inv_flat = np.array(
                [pow(int(v), -1, F.R) if int(v) % F.R else 0 for v in flat],
                dtype=object,
            ).reshape(vals.shape)
            return LB.ints_to_limbs(inv_flat)
        invm = LB.inv(LB.FR_SPEC, prep.eval_mont(env))  # 0 -> 0
        return _from_mont_dev(invm)

    def step_out(env, prep=prep):
        vals = prep.eval_std(env)
        z = LB.is_zero(vals).astype(jnp.int32)
        return jnp.stack([z] + [jnp.zeros_like(z)] * (L - 1), axis=0)

    cs.set_witness(inv, step_inv, "is_zero.inv")
    cs.set_witness(out, step_out, "is_zero.out")
    return out


def is_equal(cs: ConstraintSystem, a, b) -> SignalVec:
    return is_zero(cs, LC.of(a) - LC.of(b))


def less_than(cs: ConstraintSystem, a, b, n_bits: int) -> SignalVec:
    """a < b for values < 2^n_bits (circomlib LessThan)."""
    diff = LC.of(a) + (1 << n_bits) - LC.of(b)
    bits = num2bits(cs, diff, n_bits + 1)
    out = cs.define(1 - bits[n_bits].lc(), "lt")
    return out


def greater_than(cs: ConstraintSystem, a, b, n_bits: int) -> SignalVec:
    return less_than(cs, b, a, n_bits)


def less_eq_than(cs: ConstraintSystem, a, b, n_bits: int) -> SignalVec:
    return less_than(cs, a, LC.of(b) + 1, n_bits)


def greater_eq_than(cs: ConstraintSystem, a, b, n_bits: int) -> SignalVec:
    return less_than(cs, LC.of(b), LC.of(a) + 1, n_bits)


def mux1(cs: ConstraintSystem, sel, a, b) -> SignalVec:
    """sel ? a : b  (sel boolean)."""
    t = cs.mul(LC.of(sel), LC.of(a) - LC.of(b), "mux_t")
    return cs.define(t + LC.of(b), "mux1")


def assert_equal_when(cs: ConstraintSystem, cond, a, b):
    """cond * (a - b) == 0."""
    cs.enforce(LC.of(cond), LC.of(a) - LC.of(b), LC([], 0))
