"""In-circuit twisted-Edwards + Pedersen commitment gadgets.

Mirrors the reference's TE curve gadget + Pedersen commitment gadget
(`mpc-algebra/src/r1cs_helper/groups/curves/twisted_edwards/mod.rs:273`,
`commitment/pedersen/constraints.rs`): curve points are (x, y) FpVar pairs
over Fr; addition is enforced with the complete Edwards formulas; the
commitment folds message/randomness bits against public generator multiples
with conditional adds.
"""

from __future__ import annotations

import numpy as np

from .. import params
from ..snark.gadgets import Boolean, FpVar
from ..snark.r1cs import LC, ConstraintSystem
from ..spec import curves as SC

ED_D = params.ED_D
P = params.FR_MODULUS


class TEAffineVar:
    """Affine TE point as circuit wires."""

    __slots__ = ("x", "y")

    def __init__(self, x: FpVar, y: FpVar):
        self.x = x
        self.y = y

    @classmethod
    def constant(cls, cs: ConstraintSystem, xy):
        return cls(FpVar.constant(cs, int(xy[0])), FpVar.constant(cs, int(xy[1])))

    @classmethod
    def neutral(cls, cs: ConstraintSystem):
        return cls.constant(cs, SC.TE_NEUTRAL)

    def add(self, other: "TEAffineVar") -> "TEAffineVar":
        """Complete Edwards addition with witness allocation:
        x3 (1 + d x1 x2 y1 y2) = x1 y2 + y1 x2
        y3 (1 - d x1 x2 y1 y2) = y1 y2 + x1 x2      (a = -1)."""
        cs = self.x.cs
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        u = x1 * x2             # witness + constraint
        v = y1 * y2
        t = u * v               # x1x2y1y2
        xy = x1 * y2
        yx = y1 * x2
        dt = t.scale(ED_D)
        one = FpVar.constant(cs, 1)
        denom_x = one + dt
        denom_y = one - dt
        # witness values for x3, y3 via MPC inversion-free select: compute with
        # field inverse on shares (Beaver inverse)
        from ..mpc.share import beaver_inv, MpcFp, PUBLIC
        inv_dx = _inv_wire(denom_x)
        inv_dy = _inv_wire(denom_y)
        x3_val = (xy.value + yx.value) * inv_dx
        y3_val = (v.value + u.value) * inv_dy
        x3 = FpVar.new_witness(cs, x3_val)
        y3 = FpVar.new_witness(cs, y3_val)
        cs.enforce(x3.lc, denom_x.lc, xy.lc + yx.lc)
        cs.enforce(y3.lc, denom_y.lc, v.lc + u.lc)
        return TEAffineVar(x3, y3)

    def conditionally_add_constant(self, bit: Boolean, xy) -> "TEAffineVar":
        """self + (bit ? constant point : neutral)."""
        cs = self.x.cs
        cx = FpVar.conditionally_select(
            bit, FpVar.constant(cs, int(xy[0])), FpVar.constant(cs, 0))
        cy = FpVar.conditionally_select(
            bit, FpVar.constant(cs, int(xy[1])), FpVar.constant(cs, 1))
        return self.add(TEAffineVar(cx, cy))

    def double(self) -> "TEAffineVar":
        """Complete formulas double correctly."""
        return self.add(self)

    @staticmethod
    def conditionally_select(bit: Boolean, a: "TEAffineVar",
                             b: "TEAffineVar") -> "TEAffineVar":
        return TEAffineVar(FpVar.conditionally_select(bit, a.x, b.x),
                           FpVar.conditionally_select(bit, a.y, b.y))

    def conditionally_add(self, bit: Boolean, other: "TEAffineVar"
                          ) -> "TEAffineVar":
        """self + (bit ? other : neutral) for a *variable* other point."""
        cs = self.x.cs
        sel = TEAffineVar.conditionally_select(
            bit, other, TEAffineVar.neutral(cs))
        return self.add(sel)

    def scalar_mul_le(self, bits: list) -> "TEAffineVar":
        """Variable-base double-and-add over Boolean bits (LSB first) — the
        gadget equivalent of ark's `CurveVar::scalar_mul_le` used by the
        reference's in-circuit ElGamal (`werewolf.rs:520-534`)."""
        cs = self.x.cs
        acc = TEAffineVar.neutral(cs)
        cur = self
        for bit in bits:
            acc = acc.conditionally_add(bit, cur)
            cur = cur.double()
        return acc

    def enforce_equal(self, other: "TEAffineVar"):
        self.x.enforce_equal(other.x)
        self.y.enforce_equal(other.y)


def _inv_wire(v: FpVar):
    from ..mpc.share import beaver_inv, PUBLIC
    val = v.value
    if val.visibility == PUBLIC:
        return MpcFpInvPublic(val)
    return beaver_inv(val)


def MpcFpInvPublic(val):
    from ..mpc.share import MpcFp, PUBLIC
    return MpcFp(val.value.inv(), PUBLIC)


def pedersen_com_circuit(cs: ConstraintSystem, x: FpVar, r_bools: list,
                         commitment_xy, pp, key, nbits: int | None = None
                         ) -> None:
    """`PedersenComCircuit` (`src/circuits/pedersen_revised.rs:193-240`):
    enforce that commit(x, r) equals the public commitment point.

    x: allocated FpVar (shared or public); r_bools: randomness-bit Booleans
    (empty list = default/zero randomness, as the reference's
    `PedersenRandomness::default()` in the player-commitment checks);
    commitment_xy: public affine point.
    """
    m_bits = x.to_bits(key, nbits)
    com = pedersen_commit_gadget(cs, m_bits, r_bools, pp)
    cx = FpVar.new_input(cs, _pub_fp(cs, int(commitment_xy[0])))
    cy = FpVar.new_input(cs, _pub_fp(cs, int(commitment_xy[1])))
    com.x.enforce_equal(cx)
    com.y.enforce_equal(cy)


def _pub_fp(cs: ConstraintSystem, v: int):
    from ..mpc.share import MpcFp
    return MpcFp.const(cs.spec, v)


def pedersen_commit_gadget(cs: ConstraintSystem, m_bits: list, r_bits: list,
                           pp) -> TEAffineVar:
    """C = sum m_i G_i + sum r_j 2^j H as circuit wires.

    m_bits/r_bits: lists of Booleans; pp: crypto.pedersen.PedersenParams.
    """
    acc = TEAffineVar.neutral(cs)
    for i, bit in enumerate(m_bits):
        acc = acc.conditionally_add_constant(bit, pp.generators[i])
    h = pp.blind_base
    for j, bit in enumerate(r_bits):
        acc = acc.conditionally_add_constant(bit, h)
        h = SC.te_add(h, h)
    return acc


def pedersen_crh_gadget(cs: ConstraintSystem, in_bits: list, cp
                        ) -> TEAffineVar:
    """Pedersen CRH in-circuit: H(x) = sum x_i G_i, no blinding (reference
    `crh/pedersen/constraints.rs`); cp: crypto.pedersen.CrhParams."""
    acc = TEAffineVar.neutral(cs)
    for i, bit in enumerate(in_bits):
        acc = acc.conditionally_add_constant(bit, cp.generators[i])
    return acc


def pedersen_two_to_one_crh_gadget(cs: ConstraintSystem, left_bits: list,
                                   right_bits: list, cp) -> TEAffineVar:
    """TwoToOneCRH gadget: concat left/right bit wires, then the windowed
    CRH (reference `crh/pedersen/constraints.rs:93-121`)."""
    assert len(left_bits) == len(right_bits)
    return pedersen_crh_gadget(cs, list(left_bits) + list(right_bits), cp)
