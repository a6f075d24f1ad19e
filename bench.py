"""Benchmark: collaborative Groth16 prove wall-clock on TPU.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Baseline: the reference's MPC proving time for PedersenComCircuit —
2,543 constraints in 6.572 s at 3 parties (BASELINE.md / docs/benchmark.md).
We prove a 3-party circuit with the same constraint count (wide mul gates +
batched Beaver round + QAP witness map + 4 MSMs + proof reveal) and report
wall-clock per prove, excluding one-time setup/compilation.
"""

import json
import os
import pickle
import sys
import time

BASELINE_S = 6.572
N_CONSTRAINTS = 2543
N_PARTIES = 3
CACHE = os.path.join(os.path.dirname(__file__), ".bench_cache")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_zkmpc_tpu"))

    from zkmpc_tpu.snark import driver

    n_gates = (N_CONSTRAINTS - 1) // 1  # one constraint per gate + 1 binder
    n_gates = N_CONSTRAINTS - 1

    os.makedirs(CACHE, exist_ok=True)
    pk_path = os.path.join(CACHE, f"pk_{n_gates}_{N_PARTIES}.pkl")
    if os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            pk = pickle.load(f)
    else:
        t0 = time.time()
        pk = driver.synthesize(n_gates, N_PARTIES)
        print(f"# setup (host, one-time): {time.time()-t0:.1f}s",
              file=sys.stderr)
        with open(pk_path, "wb") as f:
            pickle.dump(pk, f)

    fn, args = driver.make_prove_fn(pk, N_PARTIES)
    step = jax.jit(fn)

    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out)
    print(f"# first call (compile+run): {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = step(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    t = sorted(times)[len(times) // 2]

    # sanity: decode + verify the proof once
    proof_ints = driver.proof_arrays_to_ints([jax.device_get(o) for o in out])
    from zkmpc_tpu.snark import groth16
    ok = groth16.verify(pk.vk, driver.expected_instance(n_gates), proof_ints)
    assert ok, "benchmark proof failed verification!"

    print(json.dumps({
        "metric": f"mpc_groth16_prove_{N_CONSTRAINTS}c_{N_PARTIES}party",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / t, 2),
    }))


if __name__ == "__main__":
    main()
