"""Curve kernel tests against the pure-Python spec backend."""

import random

import jax
import numpy as np
import pytest

from zkmpc_tpu import params
from zkmpc_tpu.ops import curve as C
from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FpArray
from zkmpc_tpu.spec import curves as S


def rand_scalars(n, seed, p=params.FR_MODULUS):
    rng = random.Random(seed)
    vals = [0, 1, 2, p - 1] + [rng.randrange(p) for _ in range(n)]
    return vals[:n]


def test_g1_double_add():
    g = S.G1_GEN
    pts = [g, S.g1_mul(g, 5), S.g1_mul(g, 12345), None]
    p = C.SWPoint.g1_from_affine_ints(pts)
    d = C.sw_double(p)
    expect = [S.g1_add(t, t) if t else None for t in pts]
    assert d.to_affine_ints() == expect

    q = C.SWPoint.g1_from_affine_ints(pts[::-1])
    s = C.sw_add_unsafe(p, q)
    expect = [S.g1_add(a, b) for a, b in zip(pts, pts[::-1])]
    # middle pair is (12345G, 5G): fine; pairs with None exercise inf handling;
    # index 1/2 equal-pairs would be unsafe but they are distinct points here.
    assert s.to_affine_ints() == expect


def test_g1_add_complete_cases():
    g = S.G1_GEN
    a = [g, g, g, None, S.g1_mul(g, 7)]
    b = [g, S.g1_neg(g), S.g1_mul(g, 3), S.g1_mul(g, 9), None]
    pa = C.SWPoint.g1_from_affine_ints(a)
    pb = C.SWPoint.g1_from_affine_ints(b)
    out = C.sw_add_complete(pa, pb)
    expect = [S.g1_add(x, y) for x, y in zip(a, b)]
    assert out.to_affine_ints() == expect


def test_g1_scalar_mul():
    g = S.G1_GEN
    scalars = rand_scalars(6, 3)
    pts = [g, S.g1_mul(g, 3), g, g, S.g1_mul(g, 11), g]
    p = C.SWPoint.g1_from_affine_ints(pts)
    s = FpArray.from_int(L.FR, np.asarray(scalars, dtype=object))
    out = jax.jit(C.sw_scalar_mul)(p, s)
    expect = [S.g1_mul(pt, k) for pt, k in zip(pts, scalars)]
    assert out.to_affine_ints() == expect


def test_g1_tree_reduce():
    g = S.G1_GEN
    # include duplicates and negations to exercise complete addition
    pts = [g, g, S.g1_neg(g), S.g1_mul(g, 4), S.g1_mul(g, 5)]
    p = C.SWPoint.g1_from_affine_ints(pts)
    out = C.sw_tree_reduce(p)
    expect = None
    for t in pts:
        expect = S.g1_add(expect, t)
    assert out.to_affine_ints() == [expect]


def test_g2_ops():
    g = S.G2_GEN
    pts = [g, S.g2_mul(g, 5), None]
    p = C.SWPoint.g2_from_affine_ints(pts)
    d = C.sw_double(p)
    expect = [S.g2_add(t, t) if t else None for t in pts]
    assert d.to_affine_ints() == expect

    scalars = [7, 123456789, 5]
    s = FpArray.from_int(L.FR, np.asarray(scalars, dtype=object))
    out = jax.jit(C.sw_scalar_mul)(p, s)
    expect = [S.g2_mul(t, k) if t else None for t, k in zip(pts, scalars)]
    assert out.to_affine_ints() == expect


def test_te_ops():
    g = S.TE_GEN
    pts = [g, S.te_add(g, g), S.te_scalar_mul(g, 9)]
    p = C.TEPoint.from_affine_ints(pts)
    d = C.te_add(p, p)
    expect = [S.te_add(t, t) for t in pts]
    assert d.to_affine_ints() == expect

    scalars = rand_scalars(3, 5, p=params.ED_FR_MODULUS)
    s = FpArray.from_int(L.EDFR, np.asarray(scalars, dtype=object))
    out = jax.jit(C.te_scalar_mul)(p, s)
    expect = [S.te_scalar_mul(t, k) for t, k in zip(pts, scalars)]
    assert out.to_affine_ints() == expect

    r = C.te_tree_reduce(p)
    expect = S.TE_NEUTRAL
    for t in pts:
        expect = S.te_add(expect, t)
    assert r.to_affine_ints() == [expect]
