"""Multi-scalar multiplication kernels.

Replaces the reference's Pippenger `VariableBaseMSM::multi_scalar_mul`
(`arkworks/algebra/ec/src/msm/variable_base.rs:12`) — the hottest op in
Groth16/KZG commitments (SURVEY.md §3.1-3.2 hot loops).

v1 strategy: fully-batched double-and-add ladder over all points in parallel
(one `lax.scan` over scalar bits; every step is a wide vectorized point op)
followed by a log-depth complete-addition tree reduction.  This is O(bits * N)
point-operation *lanes* but only ~2*bits sequential steps, which maps cleanly
onto the VPU.  A windowed/bucketed Pallas kernel is the planned next
optimization (sorted buckets + segment reduction).
"""

from __future__ import annotations

import jax.numpy as jnp

from .curve import (SWPoint, TEPoint, sw_add_complete, sw_scalar_mul,
                    te_add, te_scalar_mul)
from .fp2 import Fp2Array
from .limbs import FpArray


def _bcast_sw(points: SWPoint, shape) -> SWPoint:
    def bc(f):
        if isinstance(f, FpArray):
            return f.broadcast_to(shape)
        return Fp2Array(f.c0.broadcast_to(shape), f.c1.broadcast_to(shape))
    return SWPoint(bc(points.x), bc(points.y), bc(points.z),
                   jnp.broadcast_to(points.inf, shape))


def sw_msm(points: SWPoint, scalars: FpArray, nbits: int | None = None) -> SWPoint:
    """points: [N] (or broadcastable), scalars: [..., N] -> SWPoint [...].

    Dispatches to the bucketed Pippenger kernel for nontrivial sizes; tiny
    inputs use the simple ladder (less fixed overhead, simpler graph)."""
    N = scalars.shape[-1]
    if N >= 16 and len(points.shape) == 1:
        from .msm_pippenger import sw_msm_bucketed
        return sw_msm_bucketed(points, scalars, nbits=nbits)
    shape = scalars.shape
    pts = _bcast_sw(points, shape)
    prods = sw_scalar_mul(pts, scalars, nbits)
    return _sw_reduce_last(prods)


def sw_msm_multi(points_list, scalars_list, nbits: int | None = None):
    """Fuse k MSMs over DIFFERENT base sets into ONE bucketed kernel call.

    points_list[j]: SWPoint [N_j] public bases; scalars_list[j]:
    FpArray [..., N_j] with a common leading batch shape.  Shorter MSMs pad
    with (infinity, 0) pairs.  Returns a list of k SWPoint [...] results.

    Compile-size: one Pippenger construct (~18k XLA ops) instead of k — the
    Groth16 prover's four G1 query MSMs were ~40% of its traced graph."""
    from .msm_pippenger import sw_msm_bucketed

    k = len(points_list)
    if k == 1:
        return [sw_msm(points_list[0], scalars_list[0], nbits=nbits)]
    Nmax = max(p.shape[0] for p in points_list)
    if Nmax < 16:
        # tiny MSMs (test-sized circuits): the simple ladders compile in
        # seconds, while the full bucketed Pippenger construct (sort +
        # scanned segmented accumulation) takes ~40 min of XLA:CPU compile —
        # the same small-N dispatch `sw_msm` already makes
        return [sw_msm(p, s, nbits=nbits)
                for p, s in zip(points_list, scalars_list)]
    spec = scalars_list[0].spec

    def pad_pts(p):
        n = p.shape[0]
        if n == Nmax:
            return p
        pad = SWPoint.infinity_like(_bcast_sw(p[0:1], (Nmax - n,)))
        return SWPoint.concat([p.tighten(), pad], axis=0)

    def pad_sc(s):
        n = s.shape[-1]
        if n == Nmax:
            return s
        z = jnp.zeros(s.limbs.shape[:-2] + (Nmax - n, s.limbs.shape[-1]),
                      s.limbs.dtype)
        return FpArray(jnp.concatenate([s.limbs, z], axis=-2), spec, s.bound)

    pts = SWPoint.concat([pad_pts(p).reshape((1, Nmax))
                          for p in points_list], axis=0)      # [k, Nmax]
    # stack the k MSMs as a new batch axis before N (limbs stay last)
    scal = FpArray(jnp.stack([pad_sc(s).limbs for s in scalars_list],
                             axis=-3), spec,
                   max(s.bound for s in scalars_list))
    out = sw_msm_bucketed(pts, scal, nbits=nbits, point_batches=k)
    return [_take_last(out, j) for j in range(k)]


def _sw_reduce_last(p: SWPoint) -> SWPoint:
    """Fold the last batch axis with complete adds.

    Fixed-width masked tree inside one fori_loop (a single add_complete in
    the traced graph) instead of log-n inlined copies — keeps XLA compile
    times sane for deep reductions."""
    import jax

    from .curve import _point_bound2

    n = p.shape[-1]
    if n == 1:
        return _take_last(p, 0)
    log = (n - 1).bit_length()
    iota = jnp.arange(n)
    p = _point_bound2(p.tighten())
    inf = _point_bound2(SWPoint.infinity_like(p))

    def body(k, x):
        d = jnp.left_shift(1, k)
        rolled = jax.tree_util.tree_map(
            lambda leaf: jnp.roll(leaf, -d, axis=(-2 if leaf.dtype == jnp.uint32
                                                  else -1)), x)
        valid = (iota + d) < n
        rolled = SWPoint.select(jnp.broadcast_to(valid, x.inf.shape),
                                rolled, inf)
        out = sw_add_complete(x, rolled)
        return _point_bound2(SWPoint(out.x.tighten(), out.y.tighten(),
                                     out.z.tighten(), out.inf))

    folded = jax.lax.fori_loop(0, log, body, p)
    return _take_last(folded, 0)


def _take_last(p: SWPoint, i) -> SWPoint:
    return SWPoint(_coord_slice(p.x, i), _coord_slice(p.y, i),
                   _coord_slice(p.z, i), p.inf[..., i])


def _coord_slice(f, sl):
    if isinstance(f, FpArray):
        return FpArray(f.limbs[..., sl, :], f.spec, f.bound)
    return Fp2Array(_coord_slice(f.c0, sl), _coord_slice(f.c1, sl))


def te_msm(points: TEPoint, scalars: FpArray, nbits: int | None = None) -> TEPoint:
    """points: [N] (or broadcastable), scalars: [..., N] -> TEPoint [...]."""
    shape = scalars.shape

    def bc(f):
        return f.broadcast_to(shape)
    pts = TEPoint(bc(points.x), bc(points.y), bc(points.t), bc(points.z))
    prods = te_scalar_mul(pts, scalars, nbits)
    while prods.shape[-1] > 1:
        n = prods.shape[-1]
        half = n // 2
        a = TEPoint(*[_coord_slice(c, slice(0, half)) for c in
                      (prods.x, prods.y, prods.t, prods.z)])
        b = TEPoint(*[_coord_slice(c, slice(half, 2 * half)) for c in
                      (prods.x, prods.y, prods.t, prods.z)])
        folded = te_add(a, b)
        if n % 2:
            rest = TEPoint(*[_coord_slice(c, slice(2 * half, n)) for c in
                             (prods.x, prods.y, prods.t, prods.z)])
            folded = TEPoint(
                FpArray.concat([folded.x, rest.x], axis=-2),
                FpArray.concat([folded.y, rest.y], axis=-2),
                FpArray.concat([folded.t, rest.t], axis=-2),
                FpArray.concat([folded.z, rest.z], axis=-2))
        prods = folded
    return TEPoint(*[_coord_slice(c, 0) for c in
                     (prods.x, prods.y, prods.t, prods.z)])
