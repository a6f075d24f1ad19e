"""Benchmark: collaborative Groth16 prove wall-clock on TPU.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Baseline: the reference's MPC proving time for PedersenComCircuit —
2,543 constraints in 6.572 s at 3 parties (BASELINE.md / docs/benchmark.md).
We prove a 3-party circuit with the same constraint count (wide mul gates +
batched Beaver round + QAP witness map + 4 MSMs + group-Beaver assembly +
proof reveal) and report wall-clock per prove, excluding one-time
setup/compilation (the reference's numbers likewise exclude indexing/setup).
"""

import json
import os
import pickle
import sys
import time

import numpy as np

BASELINE_S = 6.572
N_CONSTRAINTS = 2543
N_PARTIES = 3
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _dpk_to_host(dpk):
    import jax

    def pt(p):
        from zkmpc_tpu.ops.fp2 import Fp2Array
        if p is None:
            return None
        def f(c):
            if isinstance(c, Fp2Array):
                return ("fp2", np.asarray(jax.device_get(c.c0.limbs)),
                        np.asarray(jax.device_get(c.c1.limbs)))
            return ("fp", np.asarray(jax.device_get(c.limbs)))
        return (f(p.x), f(p.y), f(p.z), np.asarray(jax.device_get(p.inf)))
    return dict(pk=dpk.pk,
                pts={k: pt(getattr(dpk, k)) for k in
                     ("a_query", "b_g1_query", "b_g2_query", "h_query",
                      "l_query", "alpha_g1", "beta_g1", "beta_g2",
                      "delta_g1", "delta_g2")})


def _dpk_from_host(doc):
    from zkmpc_tpu.ops.curve import SWPoint
    from zkmpc_tpu.ops.fp2 import Fp2Array
    from zkmpc_tpu.ops.limbs import FQ, FpArray
    from zkmpc_tpu.snark.groth16 import DeviceProvingKey

    def coord(c):
        if c[0] == "fp2":
            return Fp2Array(FpArray(c[1], FQ, 2), FpArray(c[2], FQ, 2))
        return FpArray(c[1], FQ, 2)

    def pt(t):
        if t is None:
            return None
        return SWPoint(coord(t[0]), coord(t[1]), coord(t[2]), t[3])
    dpk = DeviceProvingKey.__new__(DeviceProvingKey)
    dpk.pk = doc["pk"]
    for k, v in doc["pts"].items():
        setattr(dpk, k, pt(v))
    return dpk


def main():
    import jax

    # Cache dir keyed by host CPU fingerprint: AOT artifacts from a different
    # machine segfault on load (see tests/conftest.py).
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            fp = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        fp = ""
    suffix = hashlib.sha1(fp.encode()).hexdigest()[:12]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(f"~/.cache/jax_zkmpc_tpu_{suffix}"))

    from zkmpc_tpu.snark import driver, groth16

    n_gates = (N_CONSTRAINTS - 1)

    os.makedirs(CACHE, exist_ok=True)
    pk_path = os.path.join(CACHE, f"dpk_{n_gates}_{N_PARTIES}.pkl")
    if os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            dpk = _dpk_from_host(pickle.load(f))
    else:
        t0 = time.time()
        cs = driver.synthesize_cs(n_gates, N_PARTIES)
        dpk = groth16.device_setup(cs, seed=1)
        print(f"# setup (device-assisted, one-time): {time.time()-t0:.1f}s",
              file=sys.stderr)
        with open(pk_path, "wb") as f:
            pickle.dump(_dpk_to_host(dpk), f)

    fn, args = driver.make_prove_fn_dpk(dpk, N_PARTIES)
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

    # sanity: decode + verify the proof once (vanilla pairing verifier)
    proof_ints = driver.proof_arrays_to_ints([jax.device_get(o) for o in out])
    ok = groth16.verify(dpk.pk.vk, driver.expected_instance(n_gates), proof_ints)
    assert ok, "benchmark proof failed verification!"

    print(json.dumps({
        "metric": f"mpc_groth16_prove_{N_CONSTRAINTS}c_{N_PARTIES}party",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / t, 2),
    }))


if __name__ == "__main__":
    main()
