"""Golden tests for the packed Montgomery limb arithmetic against Python ints."""

import random

import numpy as np
import pytest

from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FpArray

SPECS = [L.FR, L.FQ, L.EDFR, L.MNT4Q]


def rand_ints(p, k, seed):
    rng = random.Random(seed)
    special = [0, 1, 2, p - 1, p - 2, p // 2]
    vals = special + [rng.randrange(p) for _ in range(k - len(special))]
    return np.asarray(vals[:k], dtype=object)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(spec):
    xs = rand_ints(spec.p, 16, 1)
    a = FpArray.from_int(spec, xs)
    back = a.to_ints()
    assert (back == xs).all()


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_mul(spec):
    p = spec.p
    xs = rand_ints(p, 24, 2)
    ys = rand_ints(p, 24, 3)
    a = FpArray.from_int(spec, xs)
    b = FpArray.from_int(spec, ys)
    assert ((a + b).to_ints() == (xs + ys) % p).all()
    assert ((a - b).to_ints() == (xs - ys) % p).all()
    assert ((b - a).to_ints() == (ys - xs) % p).all()
    assert ((a * b).to_ints() == (xs * ys) % p).all()
    assert ((-a).to_ints() == (-xs) % p).all()
    assert (a.smul(7).to_ints() == (xs * 7) % p).all()
    assert (a.square().to_ints() == (xs * xs) % p).all()


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_chained_lazy_ops(spec):
    """Long chains of adds/subs/muls must stay correct through auto-tighten."""
    p = spec.p
    xs = rand_ints(p, 8, 4)
    a = FpArray.from_int(spec, xs)
    acc = a
    ref = xs.copy()
    for i in range(12):
        acc = acc + acc
        ref = ref * 2 % p
    for i in range(5):
        acc = acc * a - a + acc.smul(3)
        ref = (ref * xs - xs + ref * 3) % p
    assert (acc.to_ints() == ref).all()


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pow_inv(spec):
    p = spec.p
    xs = rand_ints(p, 8, 5)
    a = FpArray.from_int(spec, xs)
    assert (a.pow_const(5).to_ints() ==
            np.asarray([pow(int(x), 5, p) for x in xs], dtype=object)).all()
    inv = a.inv().to_ints()
    for x, ix in zip(xs, inv):
        if int(x) % p == 0:
            assert int(ix) == 0
        else:
            assert int(x) * int(ix) % p == 1


@pytest.mark.parametrize("spec", [L.FR, L.FQ], ids=lambda s: s.name)
def test_canon_iszero_equals(spec):
    p = spec.p
    a = FpArray.from_int(spec, np.asarray([0, 1, p - 1, 5], dtype=object))
    b = FpArray.from_int(spec, np.asarray([0, 2, p - 1, 5], dtype=object))
    assert list(np.asarray(a.is_zero())) == [True, False, False, False]
    assert list(np.asarray(a.equals(b))) == [True, False, True, True]
    # zero reached via arithmetic (redundant forms) must still read as zero
    z = a - a
    assert bool(np.asarray(z.is_zero()).all())
    z2 = a * FpArray.zeros(spec, ())
    assert bool(np.asarray(z2.is_zero()).all())


@pytest.mark.parametrize("spec", [L.FR], ids=lambda s: s.name)
def test_select_and_shapes(spec):
    p = spec.p
    xs = rand_ints(p, 12, 6)
    ys = rand_ints(p, 12, 7)
    a = FpArray.from_int(spec, xs)
    b = FpArray.from_int(spec, ys)
    cond = np.asarray([i % 2 == 0 for i in range(12)])
    sel = FpArray.select(jnp_arr(cond), a, b).to_ints()
    expect = np.where(cond, xs, ys)
    assert (sel == expect).all()
    # reshape / getitem
    m = a.reshape(3, 4)
    assert m.shape == (3, 4)
    assert (m[1].to_ints() == xs.reshape(3, 4)[1]).all()


def jnp_arr(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


@pytest.mark.parametrize("spec", [L.FR], ids=lambda s: s.name)
def test_jit(spec):
    import jax

    p = spec.p
    xs = rand_ints(p, 16, 8)
    ys = rand_ints(p, 16, 9)
    a = FpArray.from_int(spec, xs)
    b = FpArray.from_int(spec, ys)

    @jax.jit
    def f(a, b):
        return a * b + a - b

    out = f(a, b).to_ints()
    assert (out == (xs * ys + xs - ys) % p).all()
