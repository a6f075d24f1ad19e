"""Intra-party multi-chip sharding: MSM and four-step NTT over a 'chips'
mesh axis (SURVEY.md §2.4 / §7 step 9 — the reference never shards a single
FFT/MSM across devices; here each party's pod slice does)."""

import random

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, PartitionSpec as PS

from zkmpc_tpu import params
from zkmpc_tpu.ops import curve as C
from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FR, FQ, FpArray
from zkmpc_tpu.ops.ntt import Domain
from zkmpc_tpu.parallel import sharded
from zkmpc_tpu.spec import curves as S

pytestmark = pytest.mark.slow  # compile-heavy prover tier

NCHIPS = 4
P = params.FR_MODULUS


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("chips",))


def test_sharded_fft_matches_local():
    n = 64
    rng = np.random.RandomState(0)
    coeffs = [int(x) for x in rng.randint(1, 1 << 30, size=n)]
    x = FpArray.from_int(FR, np.asarray(coeffs, dtype=object))
    want = [int(v) for v in Domain(FR, n).fft(x).to_ints()]

    mesh = _mesh(NCHIPS)

    def step(limbs):
        out = sharded.sharded_fft(FR, n, FpArray(limbs, FR, 2),
                                  "chips", n_chips=NCHIPS)
        return out.tighten().limbs

    f = jax.jit(jax.shard_map(step, mesh=mesh, in_specs=PS("chips"),
                              out_specs=PS("chips")))
    got = [int(v) % P for v in FpArray(f(x.limbs), FR, 2).to_ints()]
    assert got == want


def test_sharded_ifft_roundtrip():
    n = 32
    rng = np.random.RandomState(1)
    vals = [int(x) for x in rng.randint(1, 1 << 30, size=n)]
    x = FpArray.from_int(FR, np.asarray(vals, dtype=object))
    mesh = _mesh(NCHIPS)

    def step(limbs):
        ev = sharded.sharded_fft(FR, n, FpArray(limbs, FR, 2),
                                 "chips", n_chips=NCHIPS)
        back = sharded.sharded_ifft(FR, n, ev, "chips", n_chips=NCHIPS)
        return back.tighten().limbs

    f = jax.jit(jax.shard_map(step, mesh=mesh, in_specs=PS("chips"),
                              out_specs=PS("chips")))
    got = [int(v) % P for v in FpArray(f(x.limbs), FR, 2).to_ints()]
    assert got == [v % P for v in vals]


def test_sharded_msm_matches_host():
    n = 16
    rng = random.Random(2)
    pts = [S.g1_mul(S.G1_GEN, rng.randrange(1, 500)) for _ in range(n)]
    sc = [rng.randrange(P) for _ in range(n)]
    acc = None
    for q, k in zip(pts, sc):
        acc = S.g1_add(acc, S.g1_mul(q, k))

    pb = C.SWPoint.g1_from_affine_ints(pts)
    s = FpArray.from_int(L.FR, np.asarray(sc, dtype=object))
    mesh = _mesh(NCHIPS)

    def step(px, py, pz, pinf, s_limbs):
        p = C.SWPoint(FpArray(px, FQ, pb.x.bound),
                      FpArray(py, FQ, pb.y.bound),
                      FpArray(pz, FQ, pb.z.bound), pinf)
        out = sharded.sharded_sw_msm(p, FpArray(s_limbs, FR, s.bound),
                                     "chips")
        return out.x.limbs, out.y.limbs, out.z.limbs, out.inf

    # the fold after all_gather is value-replicated across chips but JAX's
    # static varying-axis checker can't prove it; skip the check
    f = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(PS("chips"), PS("chips"), PS("chips"), PS("chips"),
                  PS("chips")),
        out_specs=(PS(), PS(), PS(), PS()), check_vma=False))
    ox, oy, oz, oinf = f(pb.x.limbs, pb.y.limbs, pb.z.limbs, pb.inf, s.limbs)
    got_pt = C.SWPoint(FpArray(ox, FQ, 4), FpArray(oy, FQ, 4),
                       FpArray(oz, FQ, 4), oinf)
    assert got_pt.to_affine_ints()[0] == acc
