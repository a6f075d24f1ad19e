"""Multiplicative sharing (`MulFieldShare`, reference additive.rs:258-347)
and cross-field modulus conversion (reference mpc_primitives.rs:75-87)."""

import jax
import jax.numpy as jnp
import numpy as np

from zkmpc_tpu.mpc.mul_share import MpcMulFp
from zkmpc_tpu.mpc.share import (MpcContext, MpcFp, king_share,
                                 modulus_conversion, mpc_scope)
from zkmpc_tpu.ops.limbs import (EDFR, FR, MNT4Q, FpArray, fp_from_digits,
                                 int_to_limbs)
from zkmpc_tpu.parallel.transport import MeshTransport, StackedTransport

N_PARTIES = 3


def fp(spec, *vals):
    return FpArray.from_int(spec, np.asarray(vals, dtype=object))


def stacked_ctx():
    return MpcContext(StackedTransport(N_PARTIES))


# ---------------------------------------------------------------- MpcMulFp


def test_mul_share_from_public_reveal():
    with mpc_scope(stacked_ctx()):
        v = fp(FR, 5, 7, 123456789)
        x = MpcMulFp.from_public(v)
        assert x.is_shared()
        # non-leader factors are 1, so individual factors differ from value
        assert list(x.reveal().to_ints()[0]) == [5, 7, 123456789]


def test_mul_share_local_mul_and_inv():
    with mpc_scope(stacked_ctx()):
        p = FR.p
        x = MpcMulFp.from_public(fp(FR, 3, 10))
        y = MpcMulFp.from_public(fp(FR, 4, 20))
        # shared*shared multiply is LOCAL (no triples, no communication)
        assert list((x * y).reveal().to_ints()[0]) == [12, 200]
        assert list(x.square().reveal().to_ints()[0]) == [9, 100]
        inv = x.inv().reveal().to_ints()[0]
        assert [v * w % p for v, w in zip(inv, [3, 10])] == [1, 1]
        # scale by public constant hits the leader factor only
        z = x.scale(fp(FR, 5, 5)).reveal().to_ints()[0]
        assert list(z) == [15, 50]


def test_mul_share_randomized_factors():
    """Wrap raw random factors; reveal must equal their product."""
    with mpc_scope(stacked_ctx()):
        from zkmpc_tpu.mpc.rand import uniform_fp
        f = uniform_fp(jax.random.PRNGKey(3), FR, (N_PARTIES, 4))
        x = MpcMulFp.from_shares(f)
        got = list(x.reveal().to_ints()[0])
        ints = f.to_ints()
        want = [int(np.prod([1], dtype=object)) for _ in range(4)]
        for j in range(4):
            acc = 1
            for i in range(N_PARTIES):
                acc = acc * int(ints[i][j]) % FR.p
            want[j] = acc
        assert got == want


def test_mul_share_add_unsupported():
    with mpc_scope(stacked_ctx()):
        x = MpcMulFp.from_public(fp(FR, 3))
        try:
            _ = x + x
            assert False, "add must raise"
        except NotImplementedError:
            pass


def test_mul_share_mesh():
    import functools
    from jax.sharding import Mesh
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as PS

    devs = np.asarray(jax.devices()[:N_PARTIES])
    mesh = Mesh(devs, ("parties",))
    t = MeshTransport(N_PARTIES, "parties")

    factors = np.asarray([[2], [3], [5]], dtype=object)
    f = FpArray.from_int(FR, factors)

    def body(limbs):
        with mpc_scope(MpcContext(t)):
            x = MpcMulFp.from_shares(
                FpArray(limbs.reshape(limbs.shape[1:]), FR, 2))
            return x.reveal().limbs

    out = jax.jit(shard_map(body, mesh=mesh,
                            in_specs=PS("parties"),
                            out_specs=PS("parties")))(f.limbs)
    opened = np.asarray(FpArray(out, FR, 2).to_ints()).reshape(-1)
    assert int(opened[0]) == 30


# ------------------------------------------------------- modulus conversion


def test_fp_from_digits_roundtrip():
    # narrow -> wide: exact embed
    val = 0x1234_5678_9ABC_DEF0_1357
    digits = int_to_limbs(val, FR.nlimbs)
    out = fp_from_digits(MNT4Q, np.broadcast_to(digits, (2, FR.nlimbs)))
    assert list(out.to_ints()) == [val, val]
    # wide -> narrow: reduces mod p
    big = MNT4Q.p - 12345
    d2 = int_to_limbs(big, MNT4Q.nlimbs)
    out2 = fp_from_digits(FR, d2)
    assert int(out2.to_ints()) == big % FR.p


def test_modulus_conversion_shared():
    with mpc_scope(stacked_ctx()):
        p2 = EDFR.p
        vals = [5, p2 - 1, p2 + 17, FR.p - 1]   # includes values >= p2
        x = king_share(fp(FR, *vals), jax.random.PRNGKey(0))
        y = modulus_conversion(x, EDFR, jax.random.PRNGKey(1))
        assert y.is_shared() and y.spec is EDFR
        got = list(y.reveal().to_ints()[0])
        assert got == [v % p2 for v in vals]


def test_modulus_conversion_public():
    with mpc_scope(stacked_ctx()):
        x = MpcFp.const(FR, [7, 1 << 60])
        y = modulus_conversion(x, MNT4Q, jax.random.PRNGKey(1))
        assert not y.is_shared()
        assert list(y.reveal().to_ints()[0]) == [7, 1 << 60]
