"""MPC bit-protocol tests (the port of the reference's
`mpc-algebra/examples/algebra.rs` bitwise conformance suite)."""

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc import bits as B
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport

P = FR.p
H = (P - 1) // 2


def fr(vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def scoped():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def opened_ints(x):
    arr = np.asarray(x.reveal().to_ints())
    return [int(v) for v in arr.reshape(arr.shape[0], -1)[0]]


def test_sqrt_public():
    import random
    rng = random.Random(5)
    vals = [rng.randrange(1, P) for _ in range(4)]
    squares = [v * v % P for v in vals]
    r = B.sqrt_public(fr(squares)).to_ints()
    for s, got in zip(squares, r):
        assert int(got) * int(got) % P == s


def test_bit_rand_and_boolean_ops():
    with scoped():
        b = B.bit_rand(jax.random.PRNGKey(0), FR, (16,))
        vals = opened_ints(b)
        assert all(v in (0, 1) for v in vals)
        assert 0 < sum(vals) < 16  # not constant (whp)

        x = king_share(fr([0, 0, 1, 1]), jax.random.PRNGKey(1))
        y = king_share(fr([0, 1, 0, 1]), jax.random.PRNGKey(2))
        assert opened_ints(B.b_and(x, y)) == [0, 0, 0, 1]
        assert opened_ints(B.b_or(x, y)) == [0, 1, 1, 1]
        assert opened_ints(B.b_xor(x, y)) == [0, 1, 1, 0]
        assert opened_ints(B.b_not(x)) == [1, 1, 0, 0]
        assert opened_ints(B.kary_and(x)) == [0]
        assert opened_ints(B.kary_or(x)) == [1]


def test_rand_number_bitwise():
    with scoped():
        bits, val = B.rand_number_bitwise(
            jax.random.PRNGKey(3), FR, (2,), attempts=8)
        bvals = np.asarray(bits.reveal().to_ints())[0]
        vvals = opened_ints(val)
        for row, v in zip(bvals, vvals):
            recon = sum(int(b) << i for i, b in enumerate(row))
            assert recon == v
            assert 0 <= v < P


def test_equality_zero():
    with scoped():
        x = king_share(fr([0, 1, P - 1, 0]), jax.random.PRNGKey(4))
        z = B.equality_zero(x, jax.random.PRNGKey(5), attempts=8)
        assert opened_ints(z) == [1, 0, 0, 1]


def test_half_test_and_less_than():
    with scoped():
        vals = [0, 1, H, H + 1, P - 1]
        x = king_share(fr(vals), jax.random.PRNGKey(6))
        got = B.is_smaller_or_equal_than_mod_minus_one_div_two(
            x, jax.random.PRNGKey(7), attempts=8)
        assert opened_ints(got) == [1 if v <= H else 0 for v in vals]

    with scoped():
        # signed interpretation: values > H are negative
        xs = [3, 5, P - 2, H, 7]
        ys = [5, 3, 2, H, 7]
        x = king_share(fr(xs), jax.random.PRNGKey(8))
        y = king_share(fr(ys), jax.random.PRNGKey(9))
        lt = B.less_than(x, y, jax.random.PRNGKey(10), attempts=8)

        def signed(v):
            return v if v <= H else v - P
        expect = [1 if signed(a) < signed(b) else 0 for a, b in zip(xs, ys)]
        assert opened_ints(lt) == expect


def test_bit_decomposition():
    with scoped():
        vals = [0, 1, 5, P - 1, 123456789]
        x = king_share(fr(vals), jax.random.PRNGKey(11))
        bits = B.bit_decomposition(x, jax.random.PRNGKey(12), attempts=8)
        got = np.asarray(bits.reveal().to_ints())[0]
        for v, row in zip(vals, got):
            recon = sum(int(b) << i for i, b in enumerate(row))
            assert recon == v, (v, recon)
