"""Backend-adaptive scan.

On TPU, `lax.scan` compiles the body once on the fast hardware compiler.  On
the CPU backend (tests / virtual-device meshes), XLA's CPU pipeline takes
minutes to compile bodies that contain nested field-arithmetic loops — so we
run the same body as a Python loop instead, which dispatches the shape-
canonicalized cached kernels from core.limbs (sub-millisecond per op).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_tracer_tree(tree) -> bool:
    return any(
        isinstance(x, jax.core.Tracer) for x in jax.tree_util.tree_leaves(tree)
    )


# When True, maybe_scan unrolls even while TRACING (the Python loop inlines
# the body into the trace). XLA:CPU compiles field-arithmetic SCAN bodies
# 10-50x slower than the equivalent flat graph (tests/test_sharded_prove
# gating; the multichip dryrun measured 25+ min vs minutes unrolled) — the
# dryrun flips this around its small jitted sharded step. Never needed on
# the TPU toolchain.
FORCE_UNROLL = False


def maybe_scan(body, init, xs, length: int | None = None, force_scan: bool = False):
    """lax.scan on TPU / inside jit; Python loop on eager CPU.

    body(carry, x) -> (carry, out); returns (carry, stacked_outs).
    """
    use_scan = not FORCE_UNROLL and (
        force_scan
        or jax.default_backend() != "cpu"
        or _is_tracer_tree(init)
        or _is_tracer_tree(xs)
    )
    if use_scan:
        return jax.lax.scan(body, init, xs, length=length)

    leaves = jax.tree_util.tree_leaves(xs)
    n = length if length is not None else (leaves[0].shape[0] if leaves else 0)
    carry = init
    outs = []
    for i in range(n):
        xi = jax.tree_util.tree_map(lambda a: a[i], xs) if leaves else None
        carry, out = body(carry, xi)
        if out is not None:
            outs.append(out)
    if not outs:
        return carry, None
    stacked = jax.tree_util.tree_map(lambda *els: jnp.stack(els, axis=0), *outs)
    return carry, stacked


def maybe_fori(n: int, body, init):
    """fori_loop inside jit / on TPU; Python loop on eager CPU.

    body(i, carry) -> carry.
    """
    if jax.default_backend() != "cpu" or _is_tracer_tree(init):
        return jax.lax.fori_loop(0, n, body, init)
    carry = init
    for i in range(n):
        carry = body(i, carry)
    return carry


_JIT_CACHE: dict = {}


def jit_on_accel(fn, key=None):
    """jit when the default backend is an accelerator; raw call on CPU.

    Accelerator eager mode pays a (possibly tunneled) RPC per op — the whole
    pipeline must compile to one executable; CPU eager instead reuses the
    small cached kernels and avoids XLA-CPU's slow big-graph compiles.
    """
    if jax.default_backend() == "cpu":
        return fn
    k = key or id(fn)
    if k not in _JIT_CACHE:
        _JIT_CACHE[k] = jax.jit(fn)
    return _JIT_CACHE[k]
