"""Benchmark: the BASELINE.md metrics on TPU.

Prints ONE JSON line.  Headline = collaborative Groth16 prove of the REAL
PedersenComCircuit (in-circuit commitment, MPC bit-decomposed witness;
the reference proves its 2,543-constraint version in 6.572 s at 3 parties,
`docs/benchmark.md:52-58`).  The `extras` field carries the other BASELINE
metrics, each with its own vs_baseline:
  - equality_zero / bit_decomposition / less_than single-op wall-clock
    (reference: 211 ms / 479 ms / 1.092 s at 3 parties,
    `docs/benchmark.md:25-29`)
  - SHE preprocessing wall-clock (reference Groth16-path init: 1.5 s,
    `docs/benchmark.md:5-7`)

Timing protocol: 20 steady-state reps per metric, median reported,
IQR printed to stderr (the round-2 bench took a median of 3 — too few).
"""

import json
import os
import pickle
import statistics
import sys
import time

import numpy as np

BASELINE_PROVE_S = 6.572
BASELINE_EQZ_S = 0.211
BASELINE_BITDEC_S = 0.479
BASELINE_LT_S = 1.092
BASELINE_PREPROC_S = 1.5
N_PARTIES = 3
REPS = 20
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _timed(step, args, label, reps=REPS):
    import jax
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out)
    print(f"# {label} first call (compile+run): {time.time() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = step(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    times.sort()
    med = statistics.median(times)
    q1 = times[len(times) // 4]
    q3 = times[(3 * len(times)) // 4]
    print(f"# {label}: median {med * 1e3:.2f}ms  IQR [{q1 * 1e3:.2f}, "
          f"{q3 * 1e3:.2f}]ms over {reps} reps", file=sys.stderr)
    return med, out


def bench_pedersen_prove():
    import jax
    from zkmpc_tpu.snark import driver, groth16

    dpk = driver.cached_pedersen_dpk(N_PARTIES, cache_dir=CACHE)
    fn, args = driver.make_pedersen_prove_fn_dpk(dpk, N_PARTIES)
    step = jax.jit(fn)
    t, out = _timed(step, args, "pedersen_prove")
    proof_ints = driver.proof_arrays_to_ints(
        [jax.device_get(o) for o in out])
    ok = groth16.verify(dpk.pk.vk, driver.expected_pedersen_instance(N_PARTIES),
                        proof_ints)
    assert ok, "benchmark proof failed verification!"
    n_cons = dpk.pk.num_constraints
    return {"metric": f"mpc_groth16_prove_pedersen_com_{n_cons}c_"
                      f"{N_PARTIES}party",
            "value": round(t, 4), "unit": "s",
            "vs_baseline": round(BASELINE_PROVE_S / t, 2)}


def bench_bit_protocols():
    import jax
    from zkmpc_tpu.mpc import bits as B
    from zkmpc_tpu.mpc.share import MpcContext, MpcFp, SHARED, mpc_scope
    from zkmpc_tpu.ops.limbs import FR, FpArray
    from zkmpc_tpu.parallel.transport import StackedTransport

    def deal(v):
        arr = np.zeros((N_PARTIES,), dtype=object)
        arr[0] = v
        return FpArray.from_int(FR, arr).limbs

    def eqz(limbs, key):
        with mpc_scope(MpcContext(StackedTransport(N_PARTIES),
                                  backend="semi")):
            x = MpcFp(FpArray(limbs, FR, 2), SHARED)
            return B.equality_zero(x, key).value.limbs

    def bitdec(limbs, key):
        with mpc_scope(MpcContext(StackedTransport(N_PARTIES),
                                  backend="semi")):
            x = MpcFp(FpArray(limbs, FR, 2), SHARED)
            return B.bit_decomposition(x, key).value.limbs

    def lt(limbs_a, limbs_b, key):
        with mpc_scope(MpcContext(StackedTransport(N_PARTIES),
                                  backend="semi")):
            a = MpcFp(FpArray(limbs_a, FR, 2), SHARED)
            b = MpcFp(FpArray(limbs_b, FR, 2), SHARED)
            return B.less_than(a, b, key).value.limbs

    key = jax.random.PRNGKey(17)
    out = []
    for name, fn, args, base in (
            ("equality_zero", eqz, (deal(0), key), BASELINE_EQZ_S),
            ("bit_decomposition", bitdec, (deal(123456789), key),
             BASELINE_BITDEC_S),
            ("less_than", lt, (deal(5), deal(9), key), BASELINE_LT_S)):
        t, _ = _timed(jax.jit(fn), args, name)
        out.append({"metric": f"{name}_1op_{N_PARTIES}party",
                    "value": round(t, 5), "unit": "s",
                    "vs_baseline": round(base / t, 1)})
    return out


def bench_preprocessing():
    import jax
    from zkmpc_tpu.she import bgv, preprocessing as PP

    def run(seed):
        params = bgv.SheParams(8)
        ctx = PP.make_dealer(params, N_PARTIES, jax.random.PRNGKey(seed))
        PP.initialize(ctx, jax.random.PRNGKey(seed + 1))
        PP.pair(ctx, jax.random.PRNGKey(seed + 2))
        PP.triple(ctx, jax.random.PRNGKey(seed + 3))

    run(100)                         # warm the compile caches
    times = []
    for i in range(5):
        t0 = time.time()
        run(200 + 10 * i)
        times.append(time.time() - t0)
    t = statistics.median(times)
    print(f"# she_preprocessing: median {t:.3f}s over 5 reps",
          file=sys.stderr)
    return {"metric": f"she_preprocessing_init_pair_triple_{N_PARTIES}party",
            "value": round(t, 3), "unit": "s",
            "vs_baseline": round(BASELINE_PREPROC_S / t, 2)}


def main():
    import jax
    from zkmpc_tpu.utils import cachedir
    cachedir.configure(jax)

    headline = bench_pedersen_prove()
    extras = bench_bit_protocols()
    extras.append(bench_preprocessing())
    headline["extras"] = extras
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
