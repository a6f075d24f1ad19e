"""Intra-party multi-chip sharding of the hot kernels (MSM, NTT).

The reference scales only by batching within one process (SURVEY.md §2.4:
"there is no multi-device sharding of a single FFT/MSM").  On TPU a party is
a pod slice, so the party's own MSMs and NTTs shard across its chips over a
second mesh axis (typically ``("parties", "chips")``):

- **MSM** is embarrassingly parallel over points: each chip computes the
  partial MSM of its slice of (points, scalars); partials meet in one
  ``all_gather`` over the chips axis and a log(C)-depth complete-add fold.
  Communication: one point per chip per MSM, independent of N.
- **NTT** uses the Bailey four-step factorization n = n1*n2: local row NTTs
  of length n1 and n2 around a twiddle scaling, with the distributed
  transposes as ``all_to_all`` collectives riding ICI.  Each chip only ever
  runs dense local butterflies on its [n/C]-row block.

Both functions must run inside ``shard_map`` with ``axis_name`` a real mesh
axis.  They compose with the party axis: shares are additively linear, so
sharding the coefficient/point axis across chips commutes with the MPC
share dimension (reference `wire/field.rs:1068-1082` share-wise FFT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.curve import SWPoint
from ..ops.fp2 import Fp2Array
from ..ops.limbs import FieldSpec, FpArray
from ..ops.msm import _sw_reduce_last, sw_msm
from ..ops.ntt import Domain


# ------------------------------------------------------------------ MSM


def sharded_sw_msm(points: SWPoint, scalars: FpArray,
                   axis_name: str = "chips",
                   nbits: int | None = None) -> SWPoint:
    """MSM over points/scalars sharded on ``axis_name``.

    points/scalars: the local [N/C] slice on each chip.  Returns the full
    MSM result replicated on every chip.  Replaces the single-device
    Pippenger call for the Groth16/KZG commit hot loop (SURVEY.md §3.1).
    """
    partial = sw_msm(points, scalars, nbits=nbits)   # scalar-shaped point

    def gather_coord(f):
        if isinstance(f, Fp2Array):
            return Fp2Array(gather_coord(f.c0), gather_coord(f.c1))
        # limbs [..., nlimbs] -> [C, nlimbs] batch of points
        return FpArray(jax.lax.all_gather(f.limbs, axis_name, axis=0),
                       f.spec, f.bound)

    gathered = SWPoint(gather_coord(partial.x), gather_coord(partial.y),
                       gather_coord(partial.z),
                       jax.lax.all_gather(partial.inf, axis_name, axis=0))
    return _sw_reduce_last(gathered)


def replicated_sharded_sw_msm(points: SWPoint, scalars: FpArray,
                              axis_name: str, n_chips: int,
                              nbits: int | None = None) -> SWPoint:
    """MSM with *replicated* inputs, work-split over ``axis_name``.

    For use inside ``shard_map`` when the point/scalar tensors are replicated
    across the chips axis (the common case in the prove path: the witness is
    party-sharded but chip-replicated).  Each chip dynamically slices its
    [N/C] block, computes the partial MSM, and the partials fold over one
    all_gather — same collective pattern as :func:`sharded_sw_msm` without
    requiring the caller to pre-shard the operands."""
    N = scalars.shape[-1]
    per = -(-N // n_chips)
    pad = per * n_chips - N
    if pad:
        zpad = jnp.zeros(scalars.limbs.shape[:-2] + (pad, scalars.limbs.shape[-1]),
                         jnp.uint32)
        scalars = FpArray(jnp.concatenate([scalars.limbs, zpad], axis=-2),
                          scalars.spec, scalars.bound)
        inf_pad = _bcast_point_like(SWPoint.infinity_like(points[0:1]), pad)
        points = SWPoint.concat([points.tighten(), inf_pad], axis=0)
    i = jax.lax.axis_index(axis_name)

    def slc(leaf):
        axis = leaf.ndim - 2 if leaf.dtype == jnp.uint32 else leaf.ndim - 1
        return jax.lax.dynamic_slice_in_dim(leaf, i * per, per, axis=axis)

    pts_local = jax.tree_util.tree_map(slc, points)
    scal_local = FpArray(slc(scalars.limbs), scalars.spec, scalars.bound)
    partial = sw_msm(pts_local, scal_local, nbits=nbits)

    def gather_coord(f):
        if isinstance(f, Fp2Array):
            return Fp2Array(gather_coord(f.c0), gather_coord(f.c1))
        return FpArray(jax.lax.all_gather(f.limbs, axis_name, axis=0),
                       f.spec, f.bound)

    gathered = SWPoint(gather_coord(partial.x), gather_coord(partial.y),
                       gather_coord(partial.z),
                       jax.lax.all_gather(partial.inf, axis_name, axis=0))
    return _sw_reduce_last(gathered)


def _bcast_point_like(p: SWPoint, n: int) -> SWPoint:
    shape = (n,) + p.shape[1:]

    def bc(f):
        if isinstance(f, Fp2Array):
            return Fp2Array(bc(f.c0), bc(f.c1))
        return f.broadcast_to(shape)
    return SWPoint(bc(p.x), bc(p.y), bc(p.z), jnp.broadcast_to(p.inf, shape))


# ------------------------------------------------------------------ NTT


def _transpose_shards(limbs, axis_name: str):
    """Distributed transpose of a row-sharded matrix of field elements.

    limbs: [R_local, S, nlimbs] (global [R, S]) -> [S_local, R, nlimbs]
    (global [S, R]).  One all_to_all + a local transpose.
    """
    # split the column axis across chips, concat received blocks on rows:
    # [R_local, S, L] -> [R, S/C, L]
    y = jax.lax.all_to_all(limbs, axis_name, split_axis=1, concat_axis=0,
                           tiled=True)
    return jnp.swapaxes(y, 0, 1)                     # [S/C, R, L]


@functools.lru_cache(maxsize=None)
def _twiddle_table(spec: FieldSpec, n: int, n1: int, n2: int,
                   rows_local: int):
    """Host table of w_n^{i2*k1} for the four-step middle scaling, as a
    [C, rows_local, n1] stack indexed by chip (i2 block)."""
    import numpy as np

    from ..spec import field as specfield

    omega = specfield.root_of_unity(spec.p, spec.generator,
                                    spec.two_adicity, n)
    c = n2 // rows_local
    tab = np.empty((c, rows_local, n1), dtype=object)
    for chip in range(c):
        for r in range(rows_local):
            i2 = chip * rows_local + r
            w = pow(omega, i2, spec.p)
            acc = 1
            for k1 in range(n1):
                tab[chip, r, k1] = acc
                acc = acc * w % spec.p
    return FpArray.from_int(spec, tab)


def sharded_fft(spec: FieldSpec, n: int, coeffs_local: FpArray,
                axis_name: str = "chips", *, n_chips: int) -> FpArray:
    """Four-step distributed NTT.

    coeffs_local: this chip's contiguous [n/C] coefficient block (row-major
    rows of the [n1, n2] matrix view, n1 = C * rows).  Returns this chip's
    contiguous [n/C] block of evaluations f(omega^k) in natural order.
    ``n_chips`` is the static size of the chips mesh axis.
    """
    C = n_chips
    n_local = coeffs_local.shape[-1]
    assert n_local * C == n, (n_local, C, n)
    # factor n = n1 * n2 with both multiples of C
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    if n1 % C or n2 % C:
        n1 = C
        n2 = n // C
    assert n1 % C == 0 and n2 % C == 0, (n, C)

    L = coeffs_local.limbs.shape[-1]
    x = coeffs_local.limbs.reshape(n1 // C, n2, L)   # rows i1, cols i2
    bound = coeffs_local.bound

    # transpose to [n2/C, n1]: rows i2
    x = _transpose_shards(x, axis_name)
    # step 1: length-n1 NTT along rows (sum over i1)
    dom1 = Domain(spec, n1)
    y = dom1.fft(FpArray(x, spec, bound))            # [n2/C, n1] -> C[i2, k1]
    # step 2: twiddle w_n^{i2*k1} (global i2 = chip*rows + r)
    tw = _twiddle_table(spec, n, n1, n2, n2 // C)
    chip = jax.lax.axis_index(axis_name)
    tw_local = FpArray(
        jax.lax.dynamic_index_in_dim(tw.limbs, chip, axis=0, keepdims=False),
        spec, tw.bound)
    y = y * tw_local
    # step 3: transpose to [n1/C, n2]: rows k1
    z = _transpose_shards(y.limbs, axis_name)
    # step 4: length-n2 NTT along rows (sum over i2)
    dom2 = Domain(spec, n2)
    e = dom2.fft(FpArray(z, spec, y.bound))          # E[k1, k2] = X[k1 + n1*k2]
    # final transpose to natural order: rows k2, flatten -> index n1*k2 + k1
    out = _transpose_shards(e.limbs, axis_name)      # [n2/C, n1]
    return FpArray(out.reshape(n_local, L), spec, e.bound)


def sharded_ifft(spec: FieldSpec, n: int, evals_local: FpArray,
                 axis_name: str = "chips", *, n_chips: int) -> FpArray:
    """Inverse of :func:`sharded_fft` (natural-order blocks in and out).

    Uses iNTT(x)[i] = (1/n) * NTT(x)[(-i) mod n]: run the forward four-step
    on the evals, then apply the index reversal locally after one
    all_to_all realignment.
    """
    fwd = sharded_fft(spec, n, evals_local, axis_name, n_chips=n_chips)
    n_local = evals_local.shape[-1]
    # global index of local slot j on chip c is c*n_local + j; we need
    # element at global (-i) mod n = (n - i) for i>0, 0 for i=0.
    # Gather the full vector (n is per-chip-feasible for the sizes we shard)
    # and slice our reversed block; one all_gather.
    full = jax.lax.all_gather(fwd.limbs, axis_name, axis=0)   # [C, n/C, L]
    full = full.reshape(n, fwd.limbs.shape[-1])
    idx = (n - (jax.lax.axis_index(axis_name) * n_local
                + jnp.arange(n_local))) % n
    rev = jnp.take(full, idx, axis=0)
    n_inv = FpArray.from_int(spec, pow(n, -1, spec.p))
    return FpArray(rev, spec, fwd.bound) * n_inv
