"""Bucketed (Pippenger) MSM for TPU: sort + chunked segmented accumulation.

Replaces the O(bits*N) double-and-add ladder with the classic windowed bucket
method, reorganized for SIMD hardware (no scatter-adds of group elements):

1. window digits (c bits) for every scalar -> flat keys (batch, window, digit);
2. one global argsort of the keys (XLA sort);
3. *chunked segmented accumulation*: the sorted stream is split into L lanes x
   S sequential steps; each step is one vectorized complete point-add over all
   lanes, writing running sums into [L, S] buffers.  Total point-add work is
   O(W*N) — the Pippenger optimum — with only S (~64-128) sequential steps;
4. segment partials are compacted by a second sort and lane-boundary
   duplicates merged with log2 masked combine rounds;
5. merged bucket sums scatter (unique indices) into a dense [batch*W, 2^c]
   grid; the classic double-suffix-sum walk gives each window value, and a
   Horner pass over windows yields the final points.

All point operations are complete (exceptional-case-safe), so duplicate and
infinity bases are handled.  Replaces arkworks' Pippenger
(`arkworks/algebra/ec/src/msm/variable_base.rs:12`) — the hottest kernel in
collaborative Groth16/KZG (SURVEY.md §3 hot loops).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .curve import SWPoint, _point_bound2, sw_add_complete, sw_double
from .fp2 import Fp2Array
from .limbs import FpArray, W as LIMB_W

_tmap = jax.tree_util.tree_map

# Max accumulation lanes.  Wider lanes = fewer sequential bucket steps
# (each step has ~5ms of fixed gather/relayout overhead on v5e) but more
# merge-round work (K = nb_total + L partials).  Swept on v5e @ 64k points.
LANE_CAP = int(os.environ.get("ZKMPC_MSM_LANES", 32768))


def _digits(scalars: FpArray, c: int, nwin: int):
    """[..., N] scalars -> uint32 digits [..., N, nwin] (little-endian windows)."""
    limbs = scalars.int_limbs()                      # [..., N, nl]
    limbs = jnp.concatenate([limbs, jnp.zeros_like(limbs[..., :1])], axis=-1)
    starts = np.arange(nwin) * c
    idx0 = starts // LIMB_W
    shift = starts % LIMB_W
    l0 = limbs[..., idx0]                            # [..., N, nwin]
    l1 = limbs[..., idx0 + 1]
    d = (l0 >> jnp.asarray(shift, jnp.uint32)) | (
        l1 << jnp.asarray(LIMB_W - shift, jnp.uint32))
    return d & jnp.uint32((1 << c) - 1)


def _gather(p: SWPoint, idx) -> SWPoint:
    """Gather points along the (single) batch axis."""
    def g(leaf):
        return jnp.take(leaf, idx, axis=0)
    return _tmap(g, p)


def _tighten2(p: SWPoint) -> SWPoint:
    return _point_bound2(SWPoint(p.x.tighten(), p.y.tighten(),
                                 p.z.tighten(), p.inf))


def sw_msm_bucketed(points: SWPoint, scalars: FpArray, c: int = 8,
                    nbits: int | None = None,
                    point_batches: int = 1) -> SWPoint:
    """points: [N] public bases (or [kB, N] with point_batches=kB — distinct
    base sets cycling over the flattened scalar batch, the fused multi-MSM
    path); scalars: [..., N] -> SWPoint [...]."""
    nbits = nbits or scalars.spec.p.bit_length()
    nwin = -(-nbits // c)
    batch_shape = scalars.shape[:-1]
    N = scalars.shape[-1]
    Bt = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    D = 1 << c
    nb_total = Bt * nwin * D
    M = Bt * nwin * N
    kB = point_batches
    assert Bt % kB == 0, "point batches must divide the flattened batch"
    if kB > 1:
        points = points.reshape((kB * N,))

    digits = _digits(scalars, c, nwin).reshape((Bt, N, nwin))
    digits = jnp.moveaxis(digits, -1, 1)             # [Bt, nwin, N]
    flat_d = digits.reshape((-1,))                   # [M], layout (b, w, i)
    bw = jnp.repeat(jnp.arange(Bt * nwin, dtype=jnp.uint32), N)
    keys = bw * jnp.uint32(D) + flat_d               # [M]

    perm = jnp.argsort(keys)
    skeys = keys[perm]
    if kB > 1:
        # flat layout (b, w, i): base set = (b mod kB), gather from [kB*N]
        b_idx = (perm // (nwin * N)).astype(jnp.int32)
        spoint_idx = (b_idx % kB) * N + (perm % N).astype(jnp.int32)
    else:
        spoint_idx = (perm % N).astype(jnp.int32)

    # chunk layout: L lanes x S sequential steps.  Wide lanes keep the VPU
    # saturated AND put the per-step point-add multiplies over the Pallas
    # mont-mul batch threshold (measured v5e @ 64k points: 16384 lanes 2.7ms
    # vs 4096 lanes 5.8ms).
    L = int(min(LANE_CAP, max(64, 2 ** int(np.ceil(np.log2(max(M // 16, 1)))))))
    S = -(-M // L)
    pad = L * S - M
    SENT = jnp.uint32(0xFFFFFFFF)
    skeys = jnp.concatenate([skeys, jnp.full((pad,), SENT, jnp.uint32)])
    spoint_idx = jnp.concatenate([spoint_idx, jnp.zeros((pad,), jnp.int32)])
    skeys = skeys.reshape(L, S)
    spoint_idx = spoint_idx.reshape(L, S)

    pts = _point_bound2(points.tighten())
    inf_L = _point_bound2(
        SWPoint.infinity_like(_gather(pts, jnp.zeros(L, jnp.int32))))

    # [L, S]-shaped output buffers with the same pytree structure as a point
    def mkbuf(leaf):
        return jnp.zeros((L, S) + leaf.shape[1:], leaf.dtype)
    bufs0 = _tmap(mkbuf, inf_L)

    def body(s, carry):
        acc, bufs = carry
        k = jax.lax.dynamic_slice_in_dim(skeys, s, 1, axis=1)[:, 0]
        kprev = jax.lax.dynamic_slice_in_dim(
            skeys, jnp.maximum(s - 1, 0), 1, axis=1)[:, 0]
        idx = jax.lax.dynamic_slice_in_dim(spoint_idx, s, 1, axis=1)[:, 0]
        p = _gather(pts, idx)
        p = SWPoint.select(k == SENT, inf_L, p)
        same = (k == kprev) & (s > 0)
        acc = SWPoint.select(same, sw_add_complete(acc, p), p)
        acc = _tighten2(acc)
        bufs = _tmap(
            lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
                buf, val[:, None], s, axis=1), bufs, acc)
        return acc, bufs

    _, bufs = jax.lax.fori_loop(0, S, body, (inf_L, bufs0))

    # segment-end mask (per lane; cross-lane merging below)
    nxt = jnp.concatenate(
        [skeys[:, 1:], jnp.full((L, 1), SENT, jnp.uint32)], axis=1)
    is_end = (skeys != nxt) | (
        jnp.arange(S, dtype=jnp.int32)[None, :] == S - 1)
    ends = (is_end & (skeys != SENT)).reshape(-1)
    cand_keys = jnp.where(ends, skeys.reshape(-1), SENT)

    # compaction: valid partials number <= nb_total + L
    K = int(min(nb_total + L, L * S))
    order = jnp.argsort(cand_keys)[:K]
    ckeys = cand_keys[order]
    parts = _tmap(lambda buf: buf.reshape((L * S,) + buf.shape[2:])[order],
                  bufs)
    parts = SWPoint(parts.x, parts.y, parts.z,
                    parts.inf | (ckeys == SENT))

    # merge lane-boundary duplicates: log rounds of masked combines.
    # fori_loop + dynamic roll so only ONE add_complete is in the graph.
    rounds = int(np.ceil(np.log2(max(L, 2)))) + 1
    iota_k = jnp.arange(K)

    def merge_body(r, pts_):
        d = jnp.left_shift(1, r)
        shifted = _tmap(lambda leaf: jnp.roll(leaf, d, axis=0), pts_)
        keys_sh = jnp.roll(ckeys, d)
        samek = (iota_k >= d) & (ckeys == keys_sh)
        out = SWPoint.select(samek, sw_add_complete(pts_, shifted), pts_)
        return _tighten2(out)

    parts = jax.lax.fori_loop(0, rounds, merge_body, _tighten2(parts))
    last = jnp.concatenate([ckeys[1:] != ckeys[:-1], jnp.ones((1,), bool)])
    final_mask = last & (ckeys != SENT)

    # scatter bucket sums into the dense grid (unique indices, drop OOB)
    tgt = jnp.where(final_mask, ckeys, jnp.uint32(nb_total)).astype(jnp.int32)
    inf_grid = _point_bound2(SWPoint.infinity_like(
        _gather(pts, jnp.zeros(nb_total, jnp.int32))))
    grid = _tmap(
        lambda g, src: g.at[tgt].set(src, mode="drop"), inf_grid, parts)
    # overwrite inf flags correctly: scatter wrote parts.inf; untouched stay 1
    grid = _tmap(lambda leaf: leaf.reshape((Bt * nwin, D) + leaf.shape[1:]),
                 grid)

    # bucket combine: tot = sum_d d * S_d = sum_{j>=1} (sum_{d>=j} S_d),
    # per (batch, window).  Two log2(D)-depth passes of whole-grid adds
    # (Bt*nwin*D lanes each) instead of the classic 2(D-1) sequential
    # double-suffix walk — the walk's tiny 2*Bt*nwin-lane adds were 20% of
    # MSM wall-clock at 64k points (fixed per-step overhead, idle VPU).
    # fori_loop + dynamic roll so each pass has ONE add_complete in the
    # graph (same trick as merge_body above).
    iota_d = jnp.arange(D, dtype=jnp.int32)[None, :]
    log2d = int(np.ceil(np.log2(max(D, 2))))

    def _rolled(pt: SWPoint, d) -> SWPoint:
        """pt[:, j] <- pt[:, j+d] along buckets, infinity past the end."""
        sh = _tmap(lambda leaf: jnp.roll(leaf, -d, axis=1), pt)
        return SWPoint(sh.x, sh.y, sh.z, sh.inf | (iota_d + d >= D))

    def suffix_body(r, run):           # run[:, j] = sum_{d' >= j} S_{d'}
        # ONE fori over BOTH suffix walks (2*log2d rounds): at round log2d
        # the j=0 bucket is dropped (d * S_d has no d=0 term) before the
        # second walk starts — halves the add_complete call sites vs two
        # separate fori_loops (each site is ~5k eqns G1 / ~15k G2).
        d = jnp.left_shift(1, r % log2d)
        drop0 = (jnp.arange(D)[None, :] == 0) & (r == log2d)
        run = SWPoint(run.x, run.y, run.z, run.inf | drop0)
        return _tighten2(sw_add_complete(run, _rolled(run, d)))

    tot_all = jax.lax.fori_loop(0, 2 * log2d, suffix_body, _tighten2(grid))
    tot = _tmap(lambda leaf: leaf[:, 0], tot_all)

    # Horner over windows (fori over windows; inner fori over c doublings)
    def col(pt, j):
        return _tmap(
            lambda leaf: jax.lax.dynamic_index_in_dim(
                leaf, j, axis=1, keepdims=False), pt)

    win = _tmap(lambda leaf: leaf.reshape((Bt, nwin) + leaf.shape[1:]), tot)
    res0 = col(win, nwin - 1)

    def horner_body(j, res):
        w = nwin - 2 - j
        res = jax.lax.fori_loop(0, c, lambda i, r: sw_double(r), res)
        return _tighten2(sw_add_complete(res, col(win, w)))

    res = jax.lax.fori_loop(0, nwin - 1, horner_body, res0)
    return res.reshape(batch_shape)
