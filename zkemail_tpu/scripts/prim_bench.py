"""Primitive throughput microbenchmarks on the attached accelerator.

Measures the building blocks the MSM/NTT designs trade off between —
fused CIOS mont_mul, complete EC add, XLA scatter-add/set, gather, and
select-accumulate — so kernel-level design choices (bucket layout, window
width, scatter vs select) are driven by measured rates, not guesses.

    python -m zkemail_tpu.scripts.prim_bench --n 1048576
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20, help="lane count")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.getcwd(), ".cache", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import numpy as np

    from zkemail_tpu.core import curve_jax as CJ
    from zkemail_tpu.core import field as F
    from zkemail_tpu.core import limbs as LB

    L = F.LIMBS
    n = args.n
    rng = np.random.default_rng(0)
    out = {}

    def bench(name, fn, *xs, work=None):
        f = jax.jit(fn)
        r = jax.block_until_ready(f(*xs))  # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            r = jax.block_until_ready(f(*xs))
            ts.append(time.time() - t0)
        t = min(ts)
        rate = (work or n) / t
        out[name] = {"s": round(t, 4), "rate_per_s": f"{rate:.3e}"}
        print(f"# {name}: {t*1e3:8.2f} ms  ->  {rate:.3e} /s", file=sys.stderr, flush=True)
        return r

    a = jnp.asarray(rng.integers(0, F.LIMB_MASK + 1, size=(L, n), dtype=np.int32))
    b = jnp.asarray(rng.integers(0, F.LIMB_MASK + 1, size=(L, n), dtype=np.int32))
    bench("mont_mul", lambda x, y: LB.mont_mul(LB.FQ_SPEC, x, y), a, b)

    pt = {k: jnp.asarray(rng.integers(0, F.LIMB_MASK + 1, size=(L, n), dtype=np.int32))
          for k in ("x", "y", "z")}
    pt2 = {k: jnp.asarray(rng.integers(0, F.LIMB_MASK + 1, size=(L, n), dtype=np.int32))
           for k in ("x", "y", "z")}
    bench("ec_add_g1", lambda p, q: CJ.ec_add(CJ.FQ_OPS, p, q), pt, pt2)
    bench("ec_double_g1", lambda p: CJ.ec_double(CJ.FQ_OPS, p), pt)

    # scatter-set of k indices into a (L, m) table, batched like the bucket
    # table update (advanced-index scatter)
    for k in (1 << 14, 1 << 17):
        m = 1 << 17
        idx = jnp.asarray(rng.integers(0, m, size=k, dtype=np.int32))
        upd = jnp.asarray(rng.integers(0, F.LIMB_MASK + 1, size=(L, k), dtype=np.int32))
        tab = jnp.zeros((L, m), dtype=jnp.int32)
        bench(f"scatter_set_k{k}", lambda t, i, u: t.at[:, i].set(u), tab, idx, upd,
              work=k)
        bench(f"scatter_add_k{k}", lambda t, i, u: t.at[:, i].add(u), tab, idx, upd,
              work=k)
        bench(f"gather_k{k}", lambda t, i: t[:, i], tab, idx, work=k)

    # select-accumulate: ec_add with per-lane identity masking (the
    # scatter-free bucket alternative)
    mask = jnp.asarray(rng.integers(0, 2, size=n, dtype=np.int32) == 1)
    def sel_add(p, q, msk):
        added = CJ.ec_add(CJ.FQ_OPS, p, q)
        return CJ.ec_select(CJ.FQ_OPS, msk, p, added)
    bench("ec_select_add_g1", sel_add, pt, pt2, mask)

    # masked tree-reduction over the point axis: the inner loop of the
    # scatter-free bit-plane MSM (log2(n) halving rounds, n-1 adds total)
    def tree_reduce(p, msk):
        q = CJ.ec_select(CJ.FQ_OPS, msk, p, CJ.ec_identity(CJ.FQ_OPS, (n,)))
        nn = n
        while nn > 1:
            half = nn // 2
            lo = {k: v[:, :half] for k, v in q.items()}
            hi = {k: v[:, half : 2 * half] for k, v in q.items()}
            q = CJ.ec_add(CJ.FQ_OPS, lo, hi)
            nn = half
        return q
    bench("ec_tree_reduce_g1", tree_reduce, pt, mask, work=n)

    # sort / argsort of n int32 keys (sorted-MSM design space)
    keys = jnp.asarray(rng.integers(0, 1 << 20, size=n, dtype=np.int32))
    bench("sort_i32", jnp.sort, keys)
    bench("argsort_i32", jnp.argsort, keys)
    vals = jnp.asarray(rng.integers(0, 1 << 20, size=n, dtype=np.int32))
    bench("sort_kv_i32", lambda k, v: jax.lax.sort((k, v), num_keys=1), keys, vals)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
