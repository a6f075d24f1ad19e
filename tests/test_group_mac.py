"""SPDZ group MACs (reference `SpdzGroupShare`, `share/spdz.rs:278-489`):
mac'd point shares survive linear ops + public scaling, reveal queues the
residue, and tampered shares fail the check.
"""

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc import group as G
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, PUBLIC, SHARED, mpc_scope
from zkmpc_tpu.ops.curve import SWPoint
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.spec import curves as SC


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def spdz_scope(n=3):
    from zkmpc_tpu.mpc import rand as R
    alpha = R.uniform_fp(jax.random.PRNGKey(42), FR, (n,))
    return mpc_scope(MpcContext(StackedTransport(n), backend="spdz",
                                alpha_share=alpha))


def test_group_mac_reveal_ok():
    with spdz_scope() as c:
        gen = SWPoint.g1_from_affine_ints([SC.G1_GEN])[0]
        P = G.with_mac_from_public(gen)
        # linear ops: P + P, scale by public 5, minus P
        five = MpcFp(fr(5), PUBLIC)
        Q = (P + P).scale_public(five) - P     # = 9*G
        opened = Q.reveal()
        aff = opened.to_affine_ints()[0]
        assert (int(aff[0]), int(aff[1])) == SC.g1_mul(SC.G1_GEN, 9)
        c.assert_group_macs()


def test_group_mac_detects_tamper():
    with spdz_scope() as c:
        gen = SWPoint.g1_from_affine_ints([SC.G1_GEN])[0]
        P = G.with_mac_from_public(gen)
        # tamper: party 1 adds G to its share without updating the mac
        from zkmpc_tpu.ops.curve import sw_add_complete
        import jax.numpy as jnp
        t_mask = jnp.arange(3).reshape(3) == 1
        bumped = sw_add_complete(P.point, G.M._bcast_sw(gen, P.point.shape))
        tampered = SWPoint.select(
            jnp.broadcast_to(t_mask.reshape(3, *(1,) * (len(P.point.shape) - 1)),
                             P.point.shape), bumped, P.point)
        P2 = G.MpcSWPoint(tampered, SHARED, P.mac)
        P2.reveal()
        with pytest.raises(AssertionError):
            c.assert_group_macs()


def test_mpc_msm_carries_mac():
    with spdz_scope() as c:
        from zkmpc_tpu.mpc.share import king_share
        bases_aff = [SC.g1_mul(SC.G1_GEN, i + 1) for i in range(4)]
        bases = SWPoint.g1_from_affine_ints(bases_aff)
        scalars = king_share(fr([2, 3, 4, 5]), jax.random.PRNGKey(0))
        out = G.mpc_msm(bases, scalars)
        assert out.mac is not None
        opened = out.reveal()
        aff = opened.to_affine_ints()[0]
        exp = None
        for s, b in zip((2, 3, 4, 5), bases_aff):
            t = SC.g1_mul(b, s)
            exp = t if exp is None else SC.g1_add(exp, t)
        assert (int(aff[0]), int(aff[1])) == exp
        c.assert_group_macs()
