"""Bucketed Pippenger MSM vs the spec oracle (incl. infinity, duplicates,
zero and p-1 scalars, and party-batched scalars)."""

import random

import jax
import numpy as np
import pytest

from zkmpc_tpu import params
from zkmpc_tpu.ops import curve as C
from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FpArray
from zkmpc_tpu.ops.msm_pippenger import sw_msm_bucketed
from zkmpc_tpu.spec import curves as S

P = params.FR_MODULUS


def _expected(pts, scalars):
    acc = None
    for q, k in zip(pts, scalars):
        if q is not None:
            acc = S.g1_add(acc, S.g1_mul(q, k))
    return acc


def test_bucketed_msm_g1():
    rng = random.Random(1)
    g = S.G1_GEN
    n = 37
    pts = [S.g1_mul(g, rng.randrange(1, 1000)) for _ in range(n - 3)] + \
        [None, g, g]  # infinity + duplicate bases
    sc = [rng.randrange(P) for _ in range(n - 3)] + [7, 0, P - 1]
    pb = C.SWPoint.g1_from_affine_ints(pts)
    s = FpArray.from_int(L.FR, np.asarray(sc, dtype=object))
    out = jax.jit(sw_msm_bucketed)(pb, s).to_affine_ints()[0]
    assert out == _expected(pts, sc)

    # party-batched scalars [2, n]
    s2 = FpArray.from_int(L.FR, np.asarray([sc, sc[::-1]], dtype=object))
    out2 = jax.jit(sw_msm_bucketed)(pb, s2).to_affine_ints()
    assert out2 == [_expected(pts, sc), _expected(pts, sc[::-1])]


def test_bucketed_msm_g2():
    g = S.G2_GEN
    n = 20
    rng = random.Random(3)
    pts = [S.g2_mul(g, rng.randrange(1, 50)) for _ in range(n)]
    sc = [rng.randrange(P) for _ in range(n)]
    pb = C.SWPoint.g2_from_affine_ints(pts)
    s = FpArray.from_int(L.FR, np.asarray(sc, dtype=object))
    out = jax.jit(sw_msm_bucketed)(pb, s).to_affine_ints()[0]
    acc = None
    for q, k in zip(pts, sc):
        acc = S.g2_add(acc, S.g2_mul(q, k))
    assert out == acc
