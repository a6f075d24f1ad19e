"""MPC Pedersen commitment / CRH / ElGamal tests against spec oracles."""

import jax
import numpy as np

from zkmpc_tpu import params
from zkmpc_tpu.crypto import elgamal, pedersen
from zkmpc_tpu.mpc import bits as B
from zkmpc_tpu.mpc import te as TE
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.spec import curves as SC

P = FR.p


def fr(vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def scoped():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def test_mpc_te_add_and_select():
    with scoped():
        g = SC.TE_GEN
        g2 = SC.te_add(g, g)
        pt = TE.MpcTEPoint.from_public_affine([g, g2])
        s = pt.add(pt)
        got = s.reveal_affine_ints()
        assert got == [SC.te_add(g, g), SC.te_add(g2, g2)]

        bit = king_share(fr([0, 1]), jax.random.PRNGKey(0))
        sel = TE.select_base(bit, (np.asarray([g[0], g[0]], dtype=object),
                                   np.asarray([g[1], g[1]], dtype=object)))
        got = sel.reveal_affine_ints()
        assert got == [SC.TE_NEUTRAL, g]


def test_scalar_mul_bits():
    with scoped():
        val = 0b1011001
        bits = [(val >> i) & 1 for i in range(7)]
        b = king_share(fr(bits), jax.random.PRNGKey(1))
        out = TE.scalar_mul_bits(SC.TE_GEN, b)
        got = out.reveal_affine_ints()[0]
        assert got == SC.te_scalar_mul(SC.TE_GEN, val)


def test_pedersen_commit_matches_spec():
    pp = pedersen.PedersenParams.sample()
    m_int = 123456789
    r_int = 0b110101
    with scoped():
        m = king_share(fr([m_int]), jax.random.PRNGKey(2))
        r_bits = king_share(fr([[(r_int >> i) & 1 for i in range(6)]]),
                            jax.random.PRNGKey(3))
        c = pedersen.commit(pp, m, r_bits, jax.random.PRNGKey(4))
        got = c.reveal_affine_ints()[0]
    assert got == pedersen.commit_public_ints(pp, m_int, r_int)


def test_elgamal_roundtrip():
    keys = elgamal.keygen(5)
    msg = SC.te_scalar_mul(SC.TE_GEN, 424242)
    with scoped():
        r_int = 0b10110
        r_bits = king_share(fr([(r_int >> i) & 1 for i in range(5)]),
                            jax.random.PRNGKey(6))
        m_pt = TE.MpcTEPoint.from_public_affine([msg])
        # broadcast msg point to scalar batch shape ()
        m_pt = TE._index(m_pt, 0)
        c1, c2 = elgamal.encrypt_shared(keys.pk, m_pt, r_bits)
        c1_xy = c1.reveal_affine_ints()[0]
        c2_xy = c2.reveal_affine_ints()[0]
    # matches spec encryption with same randomness
    e1, e2 = elgamal.encrypt_ints(keys.pk, msg, r_int)
    assert (c1_xy, c2_xy) == (e1, e2)
    # and decrypts to the message
    assert elgamal.decrypt_ints(keys, c1_xy, c2_xy) == msg
