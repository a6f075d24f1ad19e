"""Twisted-Edwards points with secret-shared coordinates.

The reference's `wire/edwards2.rs` insight, re-done in tensors: ed-on-bls12-377
lives over Fr — the *same* field that is secret-shared — so complete extended
TE addition is just MPC field arithmetic (Beaver muls on coordinate shares).
This is how Pedersen commitments and ElGamal run on shared data without any
group-share/modulus mismatch:

- ``select_base(bit, P)``: bit * P for a shared {0,1} bit and public point is
  *local* (affine in the bit).
- ``add``: one batched round of Beaver multiplications (8 muls, HWCD08 a=-1
  complete formulas).
- ``scalar_mul_bits``: sum_j bits_j * (2^j * base) via select + log-depth
  tree (the fixed-base double-and-add of `wire/edwards2.rs:1155-1291`, but
  round-parallel).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import params
from ..ops.limbs import FR, FpArray
from ..spec import curves as SC
from .share import MpcFp, PUBLIC, SHARED

_2D = params.ED_D * 2 % params.FR_MODULUS


class MpcTEPoint:
    """Batch of TE points in extended coordinates with MpcFp coordinates."""

    __slots__ = ("x", "y", "t", "z")

    def __init__(self, x: MpcFp, y: MpcFp, t: MpcFp, z: MpcFp):
        self.x = x
        self.y = y
        self.t = t
        self.z = z

    @property
    def shape(self):
        return self.x.shape

    @classmethod
    def neutral(cls, shape=()):
        zero = MpcFp.const(FR, 0)
        one = MpcFp.const(FR, 1)

        def bc(w):
            return _bcast(w, shape)
        return cls(bc(zero), bc(one), bc(zero), bc(one))

    @classmethod
    def from_public_affine(cls, xy_list):
        xs = np.asarray([t[0] for t in xy_list], dtype=object)
        ys = np.asarray([t[1] for t in xy_list], dtype=object)
        ts = np.asarray([t[0] * t[1] % FR.p for t in xy_list], dtype=object)
        ones = np.asarray([1] * len(xy_list), dtype=object)
        return cls(MpcFp.const(FR, xs), MpcFp.const(FR, ys),
                   MpcFp.const(FR, ts), MpcFp.const(FR, ones))

    def add(self, other: "MpcTEPoint") -> "MpcTEPoint":
        """Complete unified addition; 8 Beaver muls, all in one batch/round."""
        a = (self.y - self.x) * (other.y - other.x)
        b = (self.y + self.x) * (other.y + other.x)
        c = self.t * other.t * MpcFp.const(FR, _2D)
        d = (self.z * other.z).double()
        e = b - a
        f = d - c
        g = d + c
        h = b + a
        return MpcTEPoint(e * f, g * h, e * h, f * g)

    def neg(self):
        return MpcTEPoint(-self.x, self.y, -self.t, self.z)

    def reveal_affine_ints(self):
        """Open and normalize to affine ints; returns one entry per batch
        element (party 0's replicated copy in stacked mode)."""
        from ..parallel import transport as T
        x = self.x.reveal()
        y = self.y.reveal()
        z = self.z.reveal()
        zi = z.inv()
        ax = np.asarray((x * zi).to_ints())
        ay = np.asarray((y * zi).to_ints())
        if T.current().kind == "stacked":
            ax = ax.reshape(ax.shape[0], -1)[0]
            ay = ay.reshape(ay.shape[0], -1)[0]
        return [(int(a), int(b)) for a, b in
                zip(ax.reshape(-1), ay.reshape(-1))]


def _bcast(w: MpcFp, shape):
    if not shape:
        return w

    def f(fp: FpArray):
        tgt = fp.limbs.shape[:-1] + tuple(shape) + (fp.limbs.shape[-1],)
        src = fp.limbs.reshape(
            fp.limbs.shape[:-1] + (1,) * len(shape) + (fp.limbs.shape[-1],))
        return FpArray(jnp.broadcast_to(src, tgt), fp.spec, fp.bound)
    return MpcFp(f(w.value), w.visibility,
                 None if w.mac is None else f(w.mac))


def select_base(bit: MpcFp, base_xy, shape=None) -> MpcTEPoint:
    """bit * P for shared bit and public affine point(s): affine in the bit.

    base_xy: (x, y) int pair or arrays matching bit's batch shape.
    Coordinates: (bit*x, 1 + bit*(y-1), bit*t, 1).
    """
    p = FR.p
    bx = np.asarray(base_xy[0], dtype=object)
    by = np.asarray(base_xy[1], dtype=object)
    bt = np.vectorize(lambda a, b: int(a) * int(b) % p, otypes=[object])(bx, by)
    gx = MpcFp.const(FR, bx)
    gym1 = MpcFp.const(FR, (np.vectorize(
        lambda v: (int(v) - 1) % p, otypes=[object])(by)))
    gt = MpcFp.const(FR, bt)
    one = MpcFp.const(FR, 1)
    x = bit * gx
    y = bit * gym1 + one
    t = bit * gt
    z = _bcast(one, bit.shape)
    return MpcTEPoint(x, y, t, z)


def tree_sum(points: MpcTEPoint) -> MpcTEPoint:
    """Sum over the last batch axis with log-depth complete adds."""
    p = points
    while p.shape[-1] > 1:
        n = p.shape[-1]
        half = n // 2
        a = _slice(p, 0, half)
        b = _slice(p, half, 2 * half)
        s = a.add(b)
        if n % 2:
            s = _concat(s, _slice(p, 2 * half, n))
        p = s
    return _index(p, 0)


def _apply(pt: MpcTEPoint, f) -> MpcTEPoint:
    return MpcTEPoint(f(pt.x), f(pt.y), f(pt.t), f(pt.z))


def _slice(pt, a, b):
    from .bits import _slice_last
    return _apply(pt, lambda w: _slice_last(w, a, b))


def _concat(p1, p2):
    from .bits import _concat_last
    return MpcTEPoint(_concat_last(p1.x, p2.x), _concat_last(p1.y, p2.y),
                      _concat_last(p1.t, p2.t), _concat_last(p1.z, p2.z))


def _index(pt, i):
    from .bits import _index_last
    return _apply(pt, lambda w: _index_last(w, i))


def scalar_mul_bits(base_xy, bits: MpcFp) -> MpcTEPoint:
    """sum_j bits_j * (2^j * base) for shared bits [.., nbits], public base."""
    nbits = bits.shape[-1]
    pows = []
    cur = base_xy
    for _ in range(nbits):
        pows.append(cur)
        cur = SC.te_add(cur, cur)
    xs = np.asarray([t[0] for t in pows], dtype=object)
    ys = np.asarray([t[1] for t in pows], dtype=object)
    sel = select_base(bits, (xs, ys))
    return tree_sum(sel)
