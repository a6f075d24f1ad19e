"""MPC share-engine tests: stacked and mesh transports must agree with plain
field semantics (the port of the reference's `mpc-algebra/examples/algebra.rs`
conformance suite, growing as protocols land)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkmpc_tpu.mpc import share as MS
from zkmpc_tpu.mpc.share import (DummyTripleSource, MpcContext, MpcFp,
                                 king_share, mpc_scope, rand_shared)
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import MeshTransport, StackedTransport

P = FR.p
N_PARTIES = 3


def fp(*vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def stacked_ctx(backend="semi"):
    t = StackedTransport(N_PARTIES)
    alpha = None
    if backend == "spdz":
        from zkmpc_tpu.mpc.rand import uniform_fp
        alpha = uniform_fp(jax.random.PRNGKey(99), FR, (N_PARTIES,))
    return MpcContext(t, backend=backend, alpha_share=alpha,
                      mac_check_key=jax.random.PRNGKey(7))


def test_king_share_reveal_stacked():
    with mpc_scope(stacked_ctx()):
        v = fp(5, 7, 123456789)
        sh = king_share(v, jax.random.PRNGKey(0))
        assert sh.is_shared()
        # shares should not individually equal the value (party 1 share random)
        opened = sh.reveal().to_ints()
        assert (opened[0] == np.asarray([5, 7, 123456789], dtype=object)).all()


def test_add_mul_semantics_stacked():
    with mpc_scope(stacked_ctx()):
        x = king_share(fp(3, 10), jax.random.PRNGKey(1))
        y = king_share(fp(4, 20), jax.random.PRNGKey(2))
        c = MpcFp.const(FR, 5)

        z = (x + y).reveal().to_ints()[0]
        assert list(z) == [7, 30]
        z = (x - y).reveal().to_ints()[0]
        assert list(z) == [(3 - 4) % P, (10 - 20) % P]
        z = (x + c).reveal().to_ints()[0]           # leader-shift add
        assert list(z) == [8, 15]
        z = (x * c).reveal().to_ints()[0]           # scale by public
        assert list(z) == [15, 50]
        z = (x * y).reveal().to_ints()[0]           # Beaver mul
        assert list(z) == [12, 200]
        z = MS.beaver_inv(x).reveal().to_ints()[0]  # Beaver inverse
        assert [int(v) * w % P for v, w in zip(z, [3, 10])] == [1, 1]


def test_rand_shared_sums_consistently():
    with mpc_scope(stacked_ctx()):
        r = rand_shared(jax.random.PRNGKey(3), FR, (4,))
        opened = r.reveal().to_ints()
        # replicated across parties after reveal
        assert (opened[0] == opened[1]).all()


def test_spdz_macs_stacked():
    c = stacked_ctx("spdz")
    with mpc_scope(c):
        x = king_share(fp(3), jax.random.PRNGKey(1))
        y = king_share(fp(4), jax.random.PRNGKey(2))
        z = x * y + MpcFp.const(FR, 10)
        opened = z.reveal().to_ints()[0]
        assert int(opened[0]) == 22
        # drain the accumulated MAC check: must open to zero
        resid = c.drain_mac_check()
        assert resid is not None
        total = MpcFp(resid, MS.SHARED, resid).value  # raw sum over parties
        s = MS._sum_fp(
            FpArray(total.limbs, FR, total.bound).reshape((-1,)))
        assert bool(np.asarray(s.is_zero()).all())


def test_spdz_mac_detects_tamper():
    c = stacked_ctx("spdz")
    with mpc_scope(c):
        x = king_share(fp(3), jax.random.PRNGKey(1))
        # party 1 tampers with its share (adds 1)
        bad = FpArray(x.value.limbs.at[1, 0, 0].add(1), FR, x.value.bound)
        x_bad = MpcFp(bad, MS.SHARED, x.mac)
        opened = x_bad.reveal()
        resid = c.drain_mac_check()
        s = MS._sum_fp(FpArray(resid.limbs, FR, resid.bound).reshape((-1,)))
        assert not bool(np.asarray(s.is_zero()).all())


def test_mesh_matches_stacked():
    """The same protocol under shard_map over a 3-device mesh must produce
    the same opened values as plain field arithmetic."""
    devices = jax.devices()[:N_PARTIES]
    mesh = jax.sharding.Mesh(np.asarray(devices), ("parties",))
    t = MeshTransport(N_PARTIES, "parties")

    # per-party shares of x=[6, 9] and y=[7, 11]: deal on host
    rng = np.random.default_rng(0)

    def deal(vals):
        shares = []
        rem = list(vals)
        for i in range(N_PARTIES - 1):
            r = [int(rng.integers(0, 1 << 60)) for _ in vals]
            shares.append(r)
            rem = [(a - b) % P for a, b in zip(rem, r)]
        shares.insert(0, rem)
        return np.asarray(
            [[int(v) for v in row] for row in shares], dtype=object)

    xs = deal([6, 9])
    ys = deal([7, 11])
    x_limbs = FpArray.from_int(FR, xs).limbs  # [P, 2, nl]
    y_limbs = FpArray.from_int(FR, ys).limbs

    from jax.sharding import PartitionSpec as PS
    smap = functools.partial(jax.shard_map, mesh=mesh,
                             in_specs=PS("parties"), out_specs=PS("parties"))

    def proto(xl, yl):
        xl = xl.reshape(xl.shape[1:])  # drop party block dim of size 1
        yl = yl.reshape(yl.shape[1:])
        with mpc_scope(MpcContext(t, backend="semi")):
            x = MpcFp(FpArray(xl, FR, 2), MS.SHARED)
            y = MpcFp(FpArray(yl, FR, 2), MS.SHARED)
            z = x * y + x - y
            opened = z.reveal()
            return opened.limbs[None]

    out = jax.jit(smap(proto))(x_limbs, y_limbs)
    vals = FpArray(np.asarray(out)[0], FR, 2 * N_PARTIES).to_ints()
    assert list(vals) == [(6 * 7 + 6 - 7) % P, (9 * 11 + 9 - 11) % P]
