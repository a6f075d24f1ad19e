"""Batched elliptic-curve point arithmetic on TPU.

- Short-Weierstrass (a=0) Jacobian points for BLS12-377 G1 (over Fq) and G2
  (over Fq2), generic over the coordinate field via duck typing.  Replaces the
  reference's arkworks `ec/src/models/short_weierstrass_jacobian.rs` scalar
  loops with structure-of-arrays limb tensors.
- Twisted Edwards extended coordinates (a=-1) for ed-on-bls12-377 with
  *complete* unified addition (HWCD08 add-2008-hwcd-3) — no exceptional cases,
  ideal for SIMD.  Replaces `ec/src/models/twisted_edwards_extended.rs`.

Exceptional-case policy for SW addition: `add_unsafe` assumes the two finite
inputs are neither equal nor negatives (infinity is handled via an explicit
mask).  Inside double-and-add ladders this is provably safe for all bit
positions except the topmost (see `scalar_mul`); tree reductions and the final
ladder step use `add_complete`, which pays for exact zero tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from .fp2 import Fp2Array
from .limbs import EDFR, FQ, FR, FpArray


def _field_select(cond, a, b):
    return type(a).select(cond, a, b)


@jax.tree_util.register_pytree_node_class
class SWPoint:
    """Batch of Jacobian points (X, Y, Z) with an explicit infinity mask.

    Infinity has inf=True (coords arbitrary).  The curve has a=0.
    """

    __slots__ = ("x", "y", "z", "inf")

    def __init__(self, x, y, z, inf):
        self.x = x
        self.y = y
        self.z = z
        self.inf = inf

    def tree_flatten(self):
        return (self.x, self.y, self.z, self.inf), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.x.shape

    def __getitem__(self, idx):
        return SWPoint(self.x[idx], self.y[idx], self.z[idx], self.inf[idx])

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return SWPoint(self.x.reshape(*shape), self.y.reshape(*shape),
                       self.z.reshape(*shape), self.inf.reshape(shape))

    def tighten(self):
        return SWPoint(self.x.tighten(), self.y.tighten(), self.z.tighten(),
                       self.inf)

    @staticmethod
    def select(cond, a: "SWPoint", b: "SWPoint"):
        return SWPoint(_field_select(cond, a.x, b.x),
                       _field_select(cond, a.y, b.y),
                       _field_select(cond, a.z, b.z),
                       jnp.where(cond, a.inf, b.inf))

    @staticmethod
    def concat(points, axis=0):
        cls0 = type(points[0].x)
        # coord limb arrays have a trailing limb axis: shift negative axes
        caxis = axis - 1 if axis < 0 else axis
        return SWPoint(cls0.concat([p.x for p in points], caxis),
                       cls0.concat([p.y for p in points], caxis),
                       cls0.concat([p.z for p in points], caxis),
                       jnp.concatenate([p.inf for p in points], axis))

    # ------------------------------------------------------------ constructors

    @classmethod
    def g1_from_affine_ints(cls, xy_list):
        """[(x, y) or None, ...] -> batched G1 points."""
        xs = np.asarray([0 if t is None else t[0] for t in xy_list], dtype=object)
        ys = np.asarray([1 if t is None else t[1] for t in xy_list], dtype=object)
        inf = jnp.asarray([t is None for t in xy_list])
        x = FpArray.from_int(FQ, xs)
        y = FpArray.from_int(FQ, ys)
        z = FpArray.ones(FQ, (len(xy_list),))
        return cls(x, y, z, inf)

    @classmethod
    def g2_from_affine_ints(cls, xy_list):
        """[((x0,x1),(y0,y1)) or None, ...] -> batched G2 points."""
        def comp(i, j, default):
            return np.asarray(
                [default if t is None else t[i][j] for t in xy_list], dtype=object)
        inf = jnp.asarray([t is None for t in xy_list])
        x = Fp2Array(FpArray.from_int(FQ, comp(0, 0, 0)),
                     FpArray.from_int(FQ, comp(0, 1, 0)))
        y = Fp2Array(FpArray.from_int(FQ, comp(1, 0, 1)),
                     FpArray.from_int(FQ, comp(1, 1, 0)))
        z = Fp2Array(FpArray.ones(FQ, (len(xy_list),)),
                     FpArray.zeros(FQ, (len(xy_list),)))
        return cls(x, y, z, inf)

    @classmethod
    def infinity_like(cls, other: "SWPoint"):
        if isinstance(other.x, FpArray):
            one = FpArray.ones(other.x.spec, other.shape)
        else:
            one = Fp2Array.ones(other.shape)
        return cls(one, one, one, jnp.ones(other.shape, dtype=bool))

    # ---------------------------------------------------------------- to host

    def to_affine_ints(self):
        """Host-side: canonical affine coordinates (None for infinity)."""
        zinv = self.z.inv()
        zinv2 = zinv.square()
        ax = self.x * zinv2
        ay = self.y * zinv2 * zinv
        xs, ys = ax.to_ints(), ay.to_ints()
        inf = np.asarray(jax.device_get(self.inf))
        out = []
        for i in range(xs.reshape(-1).size):
            if inf.reshape(-1)[i]:
                out.append(None)
            else:
                out.append((xs.reshape(-1)[i], ys.reshape(-1)[i]))
        return out


def sw_double(p: SWPoint) -> SWPoint:
    """dbl-2009-l (a=0).  Correctly keeps infinity at infinity."""
    a = p.x.square()
    b = p.y.square()
    c = b.square()
    d = ((p.x + b).square() - a - c).double()
    e = a.smul(3)
    f = e.square()
    x3 = f - d.double()
    y3 = e * (d - x3) - c.smul(8)
    z3 = (p.y * p.z).double()
    return SWPoint(x3.tighten(), y3.tighten(), z3.tighten(), p.inf)


def _sw_add_core(p: SWPoint, q: SWPoint):
    """add-2007-bl for two finite points; returns result + (h, r) for case tests."""
    z1z1 = p.z.square()
    z2z2 = q.z.square()
    u1 = p.x * z2z2
    u2 = q.x * z1z1
    s1 = p.y * q.z * z2z2
    s2 = q.y * p.z * z1z1
    h = u2 - u1
    i = h.double().square()
    j = h * i
    r = (s2 - s1).double()
    v = u1 * i
    x3 = r.square() - j - v.double()
    y3 = r * (v - x3) - (s1 * j).double()
    z3 = ((p.z + q.z).square() - z1z1 - z2z2) * h
    return SWPoint(x3.tighten(), y3.tighten(), z3.tighten(),
                   p.inf & q.inf), h, r


def sw_add_unsafe(p: SWPoint, q: SWPoint) -> SWPoint:
    """Addition assuming finite inputs are neither equal nor negations."""
    out, _, _ = _sw_add_core(p, q)
    out = SWPoint.select(q.inf, p, out)
    out = SWPoint.select(p.inf, q, out)
    return out


def sw_add_complete(p: SWPoint, q: SWPoint) -> SWPoint:
    """Addition handling all cases (doubling, negation, infinity).

    Large coordinate batches (Fp for G1, Fp2 for G2) route to the fused
    Mosaic kernel (`pallas_point.sw_add_complete_pallas`): one kernel
    instead of ~40 HLOs, with every intermediate VMEM-resident."""
    if isinstance(p.x, (FpArray, Fp2Array)):
        from . import pallas_point as PPT
        mode = PPT.enabled()
        if mode is not None:
            batch = np.broadcast_shapes(p.x.shape, q.x.shape)
            size = int(np.prod(batch, dtype=np.int64)) if batch else 1
            if size >= PPT.MIN_PALLAS_POINT_BATCH:
                return PPT.sw_add_complete_pallas(p, q, mode)
    out, h, r = _sw_add_core(p, q)
    h0 = h.is_zero()
    r0 = r.is_zero()
    finite = (~p.inf) & (~q.inf)
    is_dbl = finite & h0 & r0
    is_neg = finite & h0 & (~r0)
    out = SWPoint.select(is_dbl, sw_double(p), out)
    out = SWPoint(out.x, out.y, out.z, out.inf | is_neg)
    out = SWPoint.select(q.inf, p, out)
    out = SWPoint.select(p.inf, q, out)
    return out


def sw_neg(p: SWPoint) -> SWPoint:
    return SWPoint(p.x, -p.y, p.z, p.inf)


def scalar_bits(scalars: FpArray, nbits: int):
    """Canonical little-endian bits [..., nbits] (uint32 0/1) of field scalars."""
    limbs = scalars.int_limbs()  # [..., n] of 15-bit limbs (integer value)
    shifts = jnp.arange(15, dtype=jnp.uint32)
    bits = (limbs[..., :, None] >> shifts) & 1  # [..., n, 15]
    bits = bits.reshape(bits.shape[:-2] + (-1,))
    return bits[..., :nbits]


def _pvary_tree(tree, ref):
    """Promote every leaf of `tree` to carry at least the varying manual axes
    of `ref` (shard_map vma discipline); no-op outside shard_map / on older
    jax without typeof/pvary."""
    try:
        want = jax.typeof(ref).vma
    except Exception:
        return tree
    if not want:
        return tree

    def fix(leaf):
        missing = tuple(want - jax.typeof(leaf).vma)
        return jax.lax.pvary(leaf, missing) if missing else leaf
    return jax.tree_util.tree_map(fix, tree)


def _coord_bound2(f):
    """Force bound metadata to 2 (sound for any value < 2p) for scan carries."""
    if isinstance(f, FpArray):
        assert f.bound <= 2
        return FpArray(f.limbs, f.spec, 2)
    return Fp2Array(_coord_bound2(f.c0), _coord_bound2(f.c1))


def _point_bound2(p):
    if isinstance(p, SWPoint):
        return SWPoint(_coord_bound2(p.x), _coord_bound2(p.y),
                       _coord_bound2(p.z), p.inf)
    return TEPoint(_coord_bound2(p.x), _coord_bound2(p.y),
                   _coord_bound2(p.t), _coord_bound2(p.z))


def sw_scalar_mul(points: SWPoint, scalars: FpArray, nbits: int | None = None
                  ) -> SWPoint:
    """Batched double-and-add: out_i = scalars_i * points_i.

    Safe for arbitrary canonical scalars: all ladder steps below the top bit
    provably avoid SW exceptional cases (acc = (s mod 2^b)*P, base = 2^b*P can
    only collide when b = nbits-1), and the top step uses `sw_add_complete`.
    """
    nbits = nbits or scalars.spec.p.bit_length()
    bits = scalar_bits(scalars, nbits)  # [..., nbits]
    bits_t = jnp.moveaxis(bits, -1, 0)  # [nbits, ...]
    acc0 = _point_bound2(SWPoint.infinity_like(points))
    base0 = _point_bound2(points.tighten())
    # under shard_map the accumulator must carry the union of the inputs'
    # varying axes from step 0, or the scan carry types mismatch (the body
    # mixes in the per-party bits / point shares via select)
    acc0 = _pvary_tree(_pvary_tree(acc0, bits_t), points.inf)
    base0 = _pvary_tree(base0, bits_t)

    def body(carry, bit):
        acc, base = carry
        added = sw_add_unsafe(acc, base)
        acc = SWPoint.select(bit > 0, added, acc)
        base = sw_double(base)
        return (acc, base), None

    (acc, base), _ = jax.lax.scan(body, (acc0, base0), bits_t[:nbits - 1])
    added = sw_add_complete(acc, base)
    acc = SWPoint.select(bits_t[nbits - 1] > 0, added, acc)
    return acc


def sw_tree_reduce(points: SWPoint) -> SWPoint:
    """Sum a batch of points along axis 0 with complete additions."""
    n = points.shape[0]
    # pad to a power of two with infinities
    pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
    if pow2 != n:
        pad = _bcast_point(SWPoint.infinity_like(points[0:1]), pow2 - n)
        points = SWPoint.concat([points.tighten(), pad], axis=0)
    while points.shape[0] > 1:
        half = points.shape[0] // 2
        points = sw_add_complete(points[:half], points[half:])
    return points[0]


def _bcast_point(p: SWPoint, n: int):
    shape = (n,) + p.shape[1:]
    return SWPoint(p.x.broadcast_to(shape), p.y.broadcast_to(shape),
                   p.z.broadcast_to(shape), jnp.broadcast_to(p.inf, shape))


# ---------------------------------------------------------------------------
# Twisted Edwards (a=-1): ed-on-bls12-377, base field = BLS12-377 Fr
# ---------------------------------------------------------------------------

_ED_D = params.ED_D
_ED_2D = 2 * params.ED_D


@jax.tree_util.register_pytree_node_class
class TEPoint:
    """Extended twisted Edwards coordinates (X:Y:T:Z), T = XY/Z.  Complete."""

    __slots__ = ("x", "y", "t", "z")

    def __init__(self, x, y, t, z):
        self.x = x
        self.y = y
        self.t = t
        self.z = z

    def tree_flatten(self):
        return (self.x, self.y, self.t, self.z), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.x.shape

    def __getitem__(self, idx):
        return TEPoint(self.x[idx], self.y[idx], self.t[idx], self.z[idx])

    @classmethod
    def neutral(cls, shape=()):
        return cls(FpArray.zeros(FR, shape), FpArray.ones(FR, shape),
                   FpArray.zeros(FR, shape), FpArray.ones(FR, shape))

    @classmethod
    def from_affine_ints(cls, xy_list):
        xs = np.asarray([t[0] for t in xy_list], dtype=object)
        ys = np.asarray([t[1] for t in xy_list], dtype=object)
        ts = np.asarray([t[0] * t[1] % FR.p for t in xy_list], dtype=object)
        n = len(xy_list)
        return cls(FpArray.from_int(FR, xs), FpArray.from_int(FR, ys),
                   FpArray.from_int(FR, ts), FpArray.ones(FR, (n,)))

    def to_affine_ints(self):
        zinv = self.z.inv()
        ax = (self.x * zinv).to_ints()
        ay = (self.y * zinv).to_ints()
        return [(int(x), int(y)) for x, y in zip(ax.reshape(-1), ay.reshape(-1))]

    def tighten(self):
        return TEPoint(self.x.tighten(), self.y.tighten(), self.t.tighten(),
                       self.z.tighten())

    @staticmethod
    def select(cond, a: "TEPoint", b: "TEPoint"):
        return TEPoint(FpArray.select(cond, a.x, b.x),
                       FpArray.select(cond, a.y, b.y),
                       FpArray.select(cond, a.t, b.t),
                       FpArray.select(cond, a.z, b.z))


def te_add(p: TEPoint, q: TEPoint) -> TEPoint:
    """Unified complete addition, add-2008-hwcd-3 (a=-1)."""
    a = (p.y - p.x) * (q.y - q.x)
    b = (p.y + p.x) * (q.y + q.x)
    # 2d * T1 * T2: smul is limited to small ints, so use a precomputed const
    c = p.t * q.t * _te_two_d()
    d = (p.z * q.z).double()
    e = b - a
    f = d - c
    g = d + c
    h = b + a
    return TEPoint((e * f).tighten(), (g * h).tighten(),
                   (e * h).tighten(), (f * g).tighten())


def te_double(p: TEPoint) -> TEPoint:
    return te_add(p, p)


def te_neg(p: TEPoint) -> TEPoint:
    return TEPoint(-p.x, p.y, -p.t, p.z)


from .limbs import int_to_limbs as _int_to_limbs

# host-side constant limbs (Montgomery form of 2d); safe to materialize
# inside any trace, unlike caching a device array
_TE_TWO_D_LIMBS = _int_to_limbs(_ED_2D * (FR.R % FR.p) % FR.p, FR.nlimbs)


def _te_two_d():
    return FpArray(jnp.asarray(_TE_TWO_D_LIMBS), FR, 1)


def te_scalar_mul(points: TEPoint, scalars: FpArray, nbits: int | None = None
                  ) -> TEPoint:
    """Batched complete double-and-add over the TE curve."""
    nbits = nbits or EDFR.p.bit_length()
    bits = scalar_bits(scalars, nbits)
    bits_t = jnp.moveaxis(bits, -1, 0)
    acc0 = _point_bound2(TEPoint.neutral(points.shape))
    base0 = _point_bound2(points.tighten())

    def body(carry, bit):
        acc, base = carry
        added = te_add(acc, base)
        acc = TEPoint.select(bit > 0, added, acc)
        base = te_double(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (acc0, base0), bits_t)
    return acc


def te_tree_reduce(points: TEPoint) -> TEPoint:
    n = points.shape[0]
    pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
    if pow2 != n:
        pad = TEPoint.neutral((pow2 - n,) + points.shape[1:])
        points = TEPoint(FpArray.concat([points.x, pad.x]),
                         FpArray.concat([points.y, pad.y]),
                         FpArray.concat([points.t, pad.t]),
                         FpArray.concat([points.z, pad.z]))
    while points.shape[0] > 1:
        half = points.shape[0] // 2
        points = te_add(points[:half], points[half:])
    return points[0]
