"""TPU microbench: fused Pallas complete point-add vs the XLA path, and the
64k-point G1 MSM end-to-end.  Run on a real TPU:

    python experiments/bench_point_kernel.py [N_LANES ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_zkmpc_tpu"))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]
    from zkmpc_tpu.ops import curve as C
    from zkmpc_tpu.ops import msm_pippenger as MP
    from zkmpc_tpu.ops import pallas_point as PPT
    from zkmpc_tpu.ops.limbs import FR, FpArray
    from zkmpc_tpu.spec import curves as SC

    print(f"backend: {jax.default_backend()}  pallas: {PPT.enabled()}")

    base = C.SWPoint.g1_from_affine_ints(
        [SC.g1_mul(SC.G1_GEN, k) for k in range(2, 34)])

    for n in sizes:
        reps_idx = jnp.arange(n) % 32
        p = jax.tree_util.tree_map(lambda l: jnp.take(l, reps_idx, 0), base)
        q = jax.tree_util.tree_map(lambda l: jnp.take(l, (reps_idx + 7) % 32, 0),
                                   base)

        def chain_xla(p, q, steps=8):
            acc = p
            for _ in range(steps):
                out, h, r = C._sw_add_core(acc, q)
                out = C.SWPoint.select(q.inf, acc, out)
                acc = C._tighten_pt(out) if hasattr(C, "_tighten_pt") else \
                    C.SWPoint(out.x.tighten(), out.y.tighten(),
                              out.z.tighten(), out.inf)
            return acc.x.limbs

        def chain_pallas(p, q, steps=8):
            acc = p
            for _ in range(steps):
                acc = PPT.sw_add_complete_pallas(acc, q, "mosaic")
            return acc.x.limbs

        def chain_complete_xla(p, q, steps=8):
            # force the XLA path by calling the internals directly
            acc = p
            for _ in range(steps):
                out, h, r = C._sw_add_core(acc, q)
                h0 = h.is_zero()
                r0 = r.is_zero()
                finite = (~acc.inf) & (~q.inf)
                is_dbl = finite & h0 & r0
                is_neg = finite & h0 & (~r0)
                out = C.SWPoint.select(is_dbl, C.sw_double(acc), out)
                out = C.SWPoint(out.x, out.y, out.z, out.inf | is_neg)
                out = C.SWPoint.select(q.inf, acc, out)
                out = C.SWPoint.select(acc.inf, q, out)
                acc = C.SWPoint(out.x.tighten(), out.y.tighten(),
                                out.z.tighten(), out.inf)
            return acc.x.limbs

        jx = jax.jit(chain_complete_xla)
        jp = jax.jit(chain_pallas)
        t0 = time.time()
        tx = bench(jx, p, q)
        cx = time.time() - t0
        t0 = time.time()
        tp = bench(jp, p, q)
        cp = time.time() - t0
        print(f"n={n}: complete-add chain(8)  xla {tx*1e3:.2f}ms "
              f"(compile {cx:.0f}s)  pallas {tp*1e3:.2f}ms (compile {cp:.0f}s)"
              f"  speedup {tx/tp:.2f}x")
        # correctness spot check
        ox = jx(p, q)
        op = jp(p, q)
        assert (np.asarray(ox) == np.asarray(op)).all(), "mismatch!"

    # end-to-end MSM
    n = 65536
    ks = np.arange(2, 2 + n, dtype=np.int64)
    pts = jax.tree_util.tree_map(
        lambda l: jnp.take(l, jnp.arange(n) % 32, 0), base)
    sc = FpArray.from_int(FR, np.asarray(
        [int(x) % FR.p for x in ks], dtype=object))
    f = jax.jit(lambda P, s: MP.sw_msm_bucketed(P, s).x.limbs)
    t0 = time.time()
    t = bench(f, pts, sc, reps=3)
    print(f"msm 64k: {t*1e3:.2f}ms (first+compile {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
