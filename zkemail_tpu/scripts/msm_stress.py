"""MSM stress harness: reproduce/bound the CRS-scale TPU MSM in isolation.

Round-2's bench crashed the TPU worker ("kernel fault") inside the first
CRS-sized `_msm_call` (prover/groth16.py) at the full640 EmailVerifier
scale — 1.31M G1 points, batch 4 — before any proof was ever measured.
This harness runs exactly that call shape on synthetic points/scalars so
the failure can be bisected without paying the 8-minute witness phase:

    python -m zkemail_tpu.scripts.msm_stress --n 1310234 --batch 4
    ZKEMAIL_PALLAS=0 python -m zkemail_tpu.scripts.msm_stress ...
    python -m zkemail_tpu.scripts.msm_stress --kind g2 --threads 64

Synthetic coordinates are random 12-bit limbs: not valid curve points, but
the complete RCB formulas are branch-free so the executed program (and any
Mosaic/XLA fault) is identical to the real CRS path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1310234, help="point count")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--kind", choices=["g1", "g2"], default="g1")
    ap.add_argument("--threads", type=int, default=0, help="override T (0=auto)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunked", action="store_true",
                    help="use msm_multi_chunked (bounded dispatches)")
    ap.add_argument("--cbits", type=int, default=8)
    ap.add_argument("--algo", choices=["bucket", "sort"], default="bucket",
                    help="sort = the production sort/telescope MSM")
    ap.add_argument("--rows", type=int, default=0,
                    help="sort path row-chunk override (0 = default)")
    ap.add_argument("--cols", type=int, default=0,
                    help="sort path column width override (0 = default)")
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
    from zkemail_tpu.ops.msm import msm_multi

    L = F.LIMBS
    rng = np.random.default_rng(args.seed)

    def rand_limbs(shape):
        return rng.integers(0, F.LIMB_MASK + 1, size=shape, dtype=np.int32)

    n, bsz = args.n, args.batch
    print(f"# backend={jax.default_backend()} kind={args.kind} n={n} "
          f"batch={bsz} pallas={os.environ.get('ZKEMAIL_PALLAS', 'auto')}",
          file=sys.stderr, flush=True)

    if args.kind == "g1":
        ops = CJ.FQ_OPS
        pts = {k: jnp.asarray(rand_limbs((L, n))) for k in ("x", "y", "z")}
    else:
        ops = CJ.FQ2_OPS
        pts = {
            k: (jnp.asarray(rand_limbs((L, n))), jnp.asarray(rand_limbs((L, n))))
            for k in ("x", "y", "z")
        }
    scal = jnp.asarray(rand_limbs((L, bsz, n)))
    # top limb must keep the value < 2^254-ish so digit extraction is sane
    scal = scal.at[L - 1].set(scal[L - 1] & 0x3)

    if args.algo == "sort":
        import sys as _sys
        from zkemail_tpu.ops.msm_sort import msm_sorted

        def fn(q, s):
            return msm_sorted(
                ops, q, s, row_chunk=args.rows, col_chunk=args.cols,
                progress=lambda m: print(f"# {m}", file=_sys.stderr, flush=True),
            )
    elif args.chunked:
        import sys as _sys
        from zkemail_tpu.ops.msm import msm_multi_chunked

        def fn(q, s):
            return msm_multi_chunked(
                ops, q, s, chunk=args.threads, c_bits=args.cbits,
                progress=lambda m: print(f"# {m}", file=_sys.stderr, flush=True),
            )
    else:
        fn = jax.jit(lambda q, s: msm_multi(ops, q, s, chunk=args.threads, c_bits=args.cbits))
    t0 = time.time()
    out = jax.block_until_ready(fn(pts, scal))
    compile_s = time.time() - t0
    print(f"# first call (compile+run) {compile_s:.1f}s", file=sys.stderr, flush=True)
    x0 = np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"# first transfer ok (checksum {int(x0.sum()) & 0xFFFFFFFF})",
          file=sys.stderr, flush=True)
    times = []
    for i in range(args.reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(pts, scal))
        times.append(time.time() - t0)
        print(f"# rep {i} {times[-1]:.2f}s", file=sys.stderr, flush=True)
    x0 = np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(json.dumps({
        "metric": "msm_stress_s",
        "value": round(min(times), 3),
        "unit": "s/call",
        "detail": {
            "kind": args.kind, "n": n, "batch": bsz,
            "compile_s": round(compile_s, 1),
            "times": [round(t, 3) for t in times],
            "out_checksum": int(x0.sum()) & 0xFFFFFFFF,
        },
    }))


if __name__ == "__main__":
    main()
