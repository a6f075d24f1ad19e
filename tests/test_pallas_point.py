"""Fused Pallas complete point-add kernel vs the XLA path (interpret mode;
the Mosaic path is exercised on real TPU by bench.py / the MSM)."""

import numpy as np

from zkmpc_tpu.ops import curve as C
from zkmpc_tpu.ops import pallas_point as PPT
from zkmpc_tpu.spec import curves as SC


def _pts(ks):
    return C.SWPoint.g1_from_affine_ints(
        [SC.g1_mul(SC.G1_GEN, k) for k in ks])


def _with_inf(pt, mask):
    import jax.numpy as jnp
    return C.SWPoint(pt.x, pt.y, pt.z, jnp.asarray(mask, bool))


def test_pallas_point_add_all_cases():
    # lanes: [generic, generic, dbl (p==q), neg (q=-p), q at inf, p at inf,
    #         both inf, generic]
    p = _pts([2, 3, 5, 7, 11, 13, 17, 19])
    q_raw = _pts([10, 20, 5, 7, 30, 40, 50, 60])
    q = C.SWPoint(q_raw.x, q_raw.y, q_raw.z, q_raw.inf)
    # lane 3: q = -p
    import jax.numpy as jnp
    neg = C.sw_neg(p)
    sel = jnp.asarray([i == 3 for i in range(8)], bool)
    q = C.SWPoint.select(sel, neg, q)
    p = _with_inf(p, [0, 0, 0, 0, 0, 1, 1, 0])
    q = _with_inf(q, [0, 0, 0, 0, 1, 0, 1, 0])

    ref = C.sw_add_complete(p, q)          # XLA path (pallas off on CPU)
    got = PPT.sw_add_complete_pallas(p, q, "interpret")

    ra = ref.to_affine_ints()
    ga = got.to_affine_ints()
    assert len(ra) == len(ga) == 8
    for i, (r, g) in enumerate(zip(ra, ga)):
        assert r == g, f"lane {i}: {r} != {g}"
    # spot-check the host oracle on the non-exceptional lanes
    assert ga[0] == SC.g1_mul(SC.G1_GEN, 12)
    assert ga[2] == SC.g1_mul(SC.G1_GEN, 10)   # doubling case
    assert ga[3] is None                        # p + (-p) = infinity
    assert ga[6] is None                        # inf + inf


def test_pallas_point_add_batch_padding():
    # non-pow2 batch exercises the padded-lane (infinity) path
    p = _pts(list(range(2, 2 + 5)))
    q = _pts(list(range(100, 105)))
    ref = C.sw_add_complete(p, q)
    got = PPT.sw_add_complete_pallas(p, q, "interpret")
    assert ref.to_affine_ints() == got.to_affine_ints()


def _pts_g2(ks):
    return C.SWPoint.g2_from_affine_ints(
        [SC.g2_mul(SC.G2_GEN, k) for k in ks])


def test_pallas_point_add_g2():
    # G2 (Fp2 coords): generic, doubling, negation, and infinity lanes
    import jax.numpy as jnp
    p = _pts_g2([2, 3, 5, 7])
    q_raw = _pts_g2([10, 3, 7, 8])
    sel = jnp.asarray([i == 2 for i in range(4)], bool)
    q = C.SWPoint.select(sel, C.sw_neg(p), q_raw)
    p = _with_inf(p, [0, 0, 0, 1])
    q = _with_inf(q, [0, 0, 0, 0])

    ref = C.sw_add_complete(p, q)
    got = PPT.sw_add_complete_pallas(p, q, "interpret")
    ra, ga = ref.to_affine_ints(), got.to_affine_ints()
    assert ra == ga
    assert ga[0] == SC.g2_mul(SC.G2_GEN, 12)
    assert ga[1] == SC.g2_mul(SC.G2_GEN, 6)    # doubling case (p == q == 3G)
    assert ga[2] is None                        # p + (-p)
    assert ga[3] == SC.g2_mul(SC.G2_GEN, 8)    # p at infinity -> q
