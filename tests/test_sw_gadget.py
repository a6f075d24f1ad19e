"""In-circuit short-Weierstrass gadget (reference
`r1cs_helper/groups/curves/short_weierstrass/{mod,non_zero_affine}.rs`):
lambda-formula add/double/scalar-mul over circuit wires, with shared (MPC)
witness points, checked against the plain affine oracle.
"""

import jax
import numpy as np

from zkmpc_tpu.circuits.sw_gadget import (SWCurveParams, SWNonZeroAffineVar)
from zkmpc_tpu.mpc.share import (MpcContext, MpcFp, SHARED, king_share,
                                 mpc_scope)
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark.gadgets import Boolean, FpVar
from zkmpc_tpu.snark.r1cs import ConstraintSystem

P = FR.p
# toy SW curve over Fr through (2, 3):  y^2 = x^3 + 5x + b,  b = 9 - 8 - 10
# (a != 0 and a generic point: the a=0 curve's (2,3) is the classic order-6
# torsion point, which breaks the incomplete chord formulas immediately)
CURVE = SWCurveParams(5, -9, P)
G = (2, 3)


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def shared_scalar(v, key):
    x = king_share(fr([v]), key)

    def f(fp):
        return FpArray(fp.limbs[..., 0, :], fp.spec, fp.bound)

    return MpcFp(f(x.value), x.visibility,
                 None if x.mac is None else f(x.mac))


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def open_var(v: FpVar) -> int:
    val = v.value
    if val.visibility == SHARED:
        val = val.open()
    return int(np.asarray(val.value.to_ints()).reshape(-1)[0]) % P


def test_on_curve_and_add_double():
    assert CURVE.is_on_curve(G)
    G2 = CURVE.add(G, G)
    G3 = CURVE.add(G2, G)
    with scope():
        cs = ConstraintSystem(FR)
        g = SWNonZeroAffineVar.constant(cs, G, CURVE)
        g2 = g.double()
        g3 = g2.add_unchecked(g)
        assert (open_var(g2.x), open_var(g2.y)) == G2
        assert (open_var(g3.x), open_var(g3.y)) == G3
        g5 = g2.double_and_add(g)   # 2*(2G) + G (distinct points throughout)
        assert (open_var(g5.x), open_var(g5.y)) == CURVE.mul(G, 5)
        assert cs.is_satisfied_ints()


def test_shared_witness_point_on_curve_check():
    G5 = CURVE.mul(G, 5)
    with scope():
        cs = ConstraintSystem(FR)
        x = shared_scalar(G5[0], jax.random.PRNGKey(0))
        y = shared_scalar(G5[1], jax.random.PRNGKey(1))
        pt = SWNonZeroAffineVar.new_witness(cs, x, y, CURVE)
        q = pt.add_unchecked(SWNonZeroAffineVar.constant(cs, G, CURVE))
        assert (open_var(q.x), open_var(q.y)) == CURVE.mul(G, 6)
        assert cs.is_satisfied_ints()
        # negative: off-curve shared point violates the curve equation
        cs2 = ConstraintSystem(FR)
        xb = shared_scalar(G5[0], jax.random.PRNGKey(2))
        yb = shared_scalar(G5[1] + 1, jax.random.PRNGKey(3))
        SWNonZeroAffineVar.new_witness(cs2, xb, yb, CURVE)
        assert not cs2.is_satisfied_ints()


def test_scalar_mul_le_shared_bits():
    k = 11
    expect = CURVE.mul(G, k)
    offset = CURVE.mul(G, 1000)
    nbits = 5
    with scope():
        cs = ConstraintSystem(FR)
        bits = [Boolean.new_witness(cs, shared_scalar((k >> i) & 1,
                                                      jax.random.PRNGKey(i)))
                for i in range(nbits)]
        g = SWNonZeroAffineVar.constant(cs, G, CURVE)
        r = g.scalar_mul_le(bits, offset)
        assert (open_var(r.x), open_var(r.y)) == expect
        assert cs.is_satisfied_ints()
