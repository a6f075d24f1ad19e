"""In-circuit short-Weierstrass curve gadget.

Mirrors the reference's SW gadget layer
(`mpc-algebra/src/r1cs_helper/groups/curves/short_weierstrass/mod.rs:947`,
`non_zero_affine.rs`) — ark-style `NonZeroAffineVar` lambda-formula
arithmetic over circuit wires, generic over any short-Weierstrass curve
y^2 = x^3 + a x + b whose base field equals the circuit field, with MPC
(shared) witness allocation exactly like the TE gadget
(`circuits/pedersen_gadget.py`).

The reference uses these SW vars only as pairing-var scaffolding (bls12 /
mnt4 / mnt6 group vars; SURVEY.md §2 "r1cs_helper: groups") — its application
circuits commit/encrypt on the twisted-Edwards curve.  We keep the same
split: TE gadgets carry the werewolf circuits; this module provides the SW
var parity surface (add_unchecked / double / double_and_add /
conditionally_select / scalar_mul_le) for curves over the circuit field.

Incomplete (lambda) formulas, like ark's `NonZeroAffineVar`: callers must
keep points nonzero and distinct-or-equal as each formula requires; the
scalar ladder uses ark's offset trick (accumulate from a public offset point,
subtract it at the end) so the accumulator never passes through infinity.
"""

from __future__ import annotations

from ..snark.gadgets import Boolean, FpVar
from ..snark.r1cs import ConstraintSystem
from .pedersen_gadget import _inv_wire


class SWCurveParams:
    """y^2 = x^3 + a x + b over the circuit field (coefficients as ints)."""

    __slots__ = ("a", "b", "p")

    def __init__(self, a: int, b: int, p: int):
        self.a = a % p
        self.b = b % p
        self.p = p

    def is_on_curve(self, xy) -> bool:
        x, y = int(xy[0]) % self.p, int(xy[1]) % self.p
        return (y * y - (x * x * x + self.a * x + self.b)) % self.p == 0

    # -- plain affine oracle ops (host ints), for offsets and tests --
    def add(self, P1, P2):
        p = self.p
        x1, y1 = int(P1[0]) % p, int(P1[1]) % p
        x2, y2 = int(P2[0]) % p, int(P2[1]) % p
        if (x1, y1) == (x2, y2):
            lam = (3 * x1 * x1 + self.a) * pow(2 * y1, p - 2, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def neg(self, P1):
        return (int(P1[0]) % self.p, (-int(P1[1])) % self.p)

    def mul(self, P1, k: int):
        acc = None
        cur = P1
        while k:
            if k & 1:
                acc = cur if acc is None else self.add(acc, cur)
            cur = self.add(cur, cur)
            k >>= 1
        return acc


class SWNonZeroAffineVar:
    """Nonzero SW affine point as circuit wires (ark `NonZeroAffineVar`)."""

    __slots__ = ("x", "y", "params")

    def __init__(self, x: FpVar, y: FpVar, params: SWCurveParams):
        self.x = x
        self.y = y
        self.params = params

    @classmethod
    def constant(cls, cs: ConstraintSystem, xy, params: SWCurveParams):
        return cls(FpVar.constant(cs, int(xy[0])),
                   FpVar.constant(cs, int(xy[1])), params)

    @classmethod
    def new_witness(cls, cs: ConstraintSystem, x_val, y_val,
                    params: SWCurveParams):
        """Allocate a (possibly shared) point and enforce the curve equation
        y^2 = x^3 + a x + b (ark's on-curve check for witness points)."""
        x = FpVar.new_witness(cs, x_val)
        y = FpVar.new_witness(cs, y_val)
        x2 = x * x
        x3 = x2 * x
        one = FpVar.constant(cs, 1)
        rhs = x3 + x.scale(params.a) + one.scale(params.b)
        y.mul_equals(y, rhs)
        return cls(x, y, params)

    def negate(self) -> "SWNonZeroAffineVar":
        return SWNonZeroAffineVar(self.x, -self.y, self.params)

    def add_unchecked(self, other: "SWNonZeroAffineVar"
                      ) -> "SWNonZeroAffineVar":
        """Chord addition (requires x1 != x2):
        lam (x2 - x1) = y2 - y1;  x3 = lam^2 - x1 - x2;
        y3 = lam (x1 - x3) - y1   (`non_zero_affine.rs` add_unchecked)."""
        cs = self.x.cs
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        dx = x2 - x1
        dy = y2 - y1
        lam_val = dy.value * _inv_wire(dx)
        lam = FpVar.new_witness(cs, lam_val)
        cs.enforce(lam.lc, dx.lc, dy.lc)
        lam2 = lam * lam
        x3 = lam2 - x1 - x2
        y3_val = lam.value * (x1.value - x3.value) - y1.value
        y3 = FpVar.new_witness(cs, y3_val)
        cs.enforce(lam.lc, x1.lc - x3.lc, y3.lc + y1.lc)
        return SWNonZeroAffineVar(x3, y3, self.params)

    def double(self) -> "SWNonZeroAffineVar":
        """Tangent doubling (requires y != 0):
        lam 2y = 3 x^2 + a;  x3 = lam^2 - 2x;  y3 = lam (x - x3) - y."""
        cs = self.x.cs
        x1, y1 = self.x, self.y
        x1sq = x1 * x1
        num = x1sq.scale(3) + FpVar.constant(cs, 1).scale(self.params.a)
        den = y1.scale(2)
        lam_val = num.value * _inv_wire(den)
        lam = FpVar.new_witness(cs, lam_val)
        cs.enforce(lam.lc, den.lc, num.lc)
        lam2 = lam * lam
        x3 = lam2 - x1.scale(2)
        y3_val = lam.value * (x1.value - x3.value) - y1.value
        y3 = FpVar.new_witness(cs, y3_val)
        cs.enforce(lam.lc, x1.lc - x3.lc, y3.lc + y1.lc)
        return SWNonZeroAffineVar(x3, y3, self.params)

    def double_and_add(self, other: "SWNonZeroAffineVar"
                       ) -> "SWNonZeroAffineVar":
        """2*self + other with one shared lambda chain (ark's
        `double_and_add` constraint saver): (self + other) + self."""
        return self.add_unchecked(other).add_unchecked(self)

    @staticmethod
    def conditionally_select(bit: Boolean, a: "SWNonZeroAffineVar",
                             b: "SWNonZeroAffineVar") -> "SWNonZeroAffineVar":
        return SWNonZeroAffineVar(
            FpVar.conditionally_select(bit, a.x, b.x),
            FpVar.conditionally_select(bit, a.y, b.y), a.params)

    def enforce_equal(self, other: "SWNonZeroAffineVar"):
        self.x.enforce_equal(other.x)
        self.y.enforce_equal(other.y)

    def scalar_mul_le(self, bits: list, offset_xy) -> "SWNonZeroAffineVar":
        """Double-and-add over Boolean bits (LSB first) with ark's offset
        trick: acc starts at the public `offset_xy` point so the incomplete
        formulas never see the point at infinity; the offset is subtracted
        at the end (`short_weierstrass/mod.rs` scalar-mul strategy).
        Returns self * sum(bits_i 2^i).  Caller must ensure the scalar is
        nonzero and pick a generic offset (no x-collision with any
        intermediate) — random offsets satisfy this with overwhelming
        probability."""
        cs = self.x.cs
        params = self.params
        acc = SWNonZeroAffineVar.constant(cs, offset_xy, params)
        cur = self
        for i, bit in enumerate(bits):
            with_base = acc.add_unchecked(cur)
            acc = SWNonZeroAffineVar.conditionally_select(bit, with_base, acc)
            if i + 1 < len(bits):
                cur = cur.double()
        minus_off = SWNonZeroAffineVar.constant(
            cs, params.neg(offset_xy), params)
        return acc.add_unchecked(minus_off)
