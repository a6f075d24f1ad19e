"""Pallas/Mosaic TPU kernel for batched Montgomery multiplication.

The XLA path (`limbs._mont_mul_limbs`) lowers each REDC to ~3 int8 MXU
matmuls plus carry chains — fast, but every field multiply is ~15 HLO ops,
which makes point-op-heavy graphs (MSM ladders, NTT layers) both slow to
compile (~10ms/op on TPU) and HBM-bound between ops.  This kernel fuses the
whole REDC (three limb convolutions + relaxed carry resolution) into one
VMEM-resident Mosaic kernel.

Design notes (vs the parked `experiments/pallas_mont_mul.py`):

- **Limbs live on the sublane axis, batch on lanes** (`[nlimbs, B]` blocks).
  The limb convolution is a Horner recurrence over the limbs of `a`:
  ``acc = (acc << one-limb) + a_i * b`` — the one-limb shift is a *static*
  sublane slice/concat and `a_i` is one dynamic row read, so the loop body
  is ~8 small vector ops inside a `fori_loop`.  The parked attempt unrolled
  ~600 shifted adds in lane layout, which took Mosaic ~505 s to compile;
  this formulation compiles in seconds.
- Inputs are relaxed 15-bit limbs (<= B+1) exactly like the XLA path;
  outputs are REDC results < 2p with limbs <= B.  Bound bookkeeping stays in
  `FpArray` (the kernel is a drop-in for `_mont_mul_limbs`).
- Grid over batch tiles of ``LANE_TILE`` lanes; the batch is padded to the
  tile.  One Mosaic compile per (field, padded-batch-bucket) — batches are
  bucketed to powers of two to bound recompiles.

Reference replaced: arkworks `ff/src/fields/models/*` CIOS Montgomery mul
(word-serial, per-scalar) — here one kernel invocation multiplies an entire
tensor of field elements (SURVEY.md §7 "big-int modular arithmetic on TPU").
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import MASK, W, FieldSpec

LANE_TILE = 512           # lanes per grid step (batch elements per block)
# Crossover measured on v5e: at 4k elements the fused-XLA path still wins
# (kernel dispatch + layout transposes dominate); at 64k the Pallas kernel
# is ~4x faster and ~10x cheaper to compile.  Route only big batches.
MIN_PALLAS_BATCH = 16384

_U32 = jnp.uint32


def enabled() -> str | None:
    """Returns 'mosaic', 'interpret', or None (disabled).

    ZKMPC_PALLAS=1   -> mosaic on TPU, interpret elsewhere
    ZKMPC_PALLAS=0   -> disabled
    unset            -> mosaic on TPU (validated path), disabled on CPU
    """
    v = os.environ.get("ZKMPC_PALLAS", "")
    if v == "0":
        return None
    try:
        backend = jax.default_backend()
    except Exception:
        return None
    if backend == "tpu":
        return "mosaic"
    return "interpret" if v else None


def _shift_up(x):
    """Multiply by one limb (x * 2^W): row j of out = row j-1 of x."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _conv_horner(n: int, x, y, total: int):
    """Limb convolution of x[n, B] and y[n, B] -> columns [total, B].

    Horner over the limbs of x, high to low: acc = (acc << limb) + x_i * y.
    Mosaic-friendly: every slice/concat is static.  Instead of dynamically
    indexing row i, the loop reads the (static) top row of x and rolls x up
    by one each iteration.  Column sums < 2n * 2^16 < 2^26 for n <= 64.
    ``total`` must be >= nb + 1.
    """
    nb = y.shape[0]
    pad_lo = total - nb
    pad_hi = total - nb - 1

    def body(_, carry):
        acc, xs = carry
        row = xs[n - 1:n]                                       # [1, B]
        prod = row * y                                          # [nb, B]
        lo = prod & MASK
        hi = prod >> W
        acc = _shift_up(acc)
        if pad_lo > 0:
            lo = jnp.concatenate(
                [lo, jnp.zeros((pad_lo,) + lo.shape[1:], lo.dtype)], axis=0)
        hi = jnp.concatenate(
            [jnp.zeros((1,) + hi.shape[1:], hi.dtype), hi] +
            ([jnp.zeros((pad_hi,) + hi.shape[1:], hi.dtype)]
             if pad_hi > 0 else []), axis=0)
        return acc + lo + hi, _shift_up(xs)

    acc0 = jnp.zeros((total,) + x.shape[1:], dtype=_U32)
    acc, _ = jax.lax.fori_loop(0, n, body, (acc0, x))
    return acc


def _resolve2_rows(cols):
    """Two relaxed carry passes along the row (limb) axis; mirrors
    `limbs._resolve2` (columns < 2^26 -> limbs <= B, length+1).
    Concat-form (no scatter-like .at updates) for Mosaic."""
    c = cols >> W
    lo = cols & MASK
    y = jnp.concatenate([lo[:1], lo[1:] + c[:-1], c[-1:]], axis=0)
    c2 = y >> W
    z = y & MASK
    z = jnp.concatenate([z[:1], z[1:] + c2[:-1]], axis=0)
    return z


def _mont_kernel(n: int, a_ref, b_ref, pp_ref, p_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    pp = pp_ref[...]
    pl_ = p_ref[...]
    t_cols = _conv_horner(n, a, b, 2 * n)            # [2n, B]
    t = _resolve2_rows(t_cols)                       # [2n+1, B]
    m_cols = _conv_horner(n, t[:n], pp, n + 1)       # low half only
    m = _resolve2_rows(m_cols[:n])[:n]               # [n, B]
    u_cols = _conv_horner(n, m, pl_, 2 * n) + t_cols
    u = _resolve2_rows(u_cols)                       # [2n+1, B]
    # low half is 0 or exactly R; carry-out = 1 iff any low limb nonzero
    # (signed max: limbs <= B << 2^31 so the cast is value-preserving)
    carry = (jnp.max(u[:n].astype(jnp.int32), axis=0, keepdims=True)
             > 0).astype(_U32)
    res = u[n:2 * n]
    res = jnp.concatenate([res[:1] + carry, res[1:]], axis=0)
    o_ref[...] = res


@functools.lru_cache(maxsize=None)
def _mont_call(spec: FieldSpec, n_tiles: int, mode: str, b_const: bool):
    from jax.experimental import pallas as pl

    n = spec.nlimbs
    kern = functools.partial(_mont_kernel, n)
    grid = (n_tiles,)
    blk = lambda: pl.BlockSpec((n, LANE_TILE), lambda i: (0, i))
    # constants (p, p', and b when broadcast) are one tile reused every step
    const_blk = lambda: pl.BlockSpec((n, LANE_TILE), lambda i: (0, 0))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[blk(), const_blk() if b_const else blk(),
                  const_blk(), const_blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * LANE_TILE), jnp.uint32),
        interpret=(mode == "interpret"),
    )


@functools.lru_cache(maxsize=None)
def _const_cols(spec: FieldSpec):
    """pprime / p limb columns as host arrays [n, 1] for broadcasting."""
    return (np.asarray(spec.pprime_limbs, dtype=np.uint32)[:, None],
            np.asarray(spec.p_limbs, dtype=np.uint32)[:, None])


def mont_mul_pallas(spec: FieldSpec, a, b, mode: str):
    """REDC(a*b) for limb tensors a [..., nlimbs] and b broadcastable to a.

    Same contract as `limbs._mont_mul_limbs`: inputs relaxed (limbs <= B+1)
    with value bounds c1*c2*p <= R/2; output < 2p, limbs <= B.  A 1-D b
    (single element multiplying the whole batch, e.g. `tighten`'s repr(1))
    rides the constant-operand path: one tile, reused by every grid step.
    """
    n = spec.nlimbs
    b_const = (b.ndim == 1)
    if a.ndim == 1 and not b_const:
        a, b = b, a
        b_const = True
    batch_shape = tuple(np.broadcast_shapes(a.shape[:-1],
                                            () if b_const else b.shape[:-1]))
    a = jnp.broadcast_to(a, batch_shape + (n,))
    size = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    # bucket the padded size to powers of two (bounds Mosaic recompiles)
    tiles = max(1, -(-size // LANE_TILE))
    tiles = 1 << (tiles - 1).bit_length()
    padded = tiles * LANE_TILE

    at = jnp.moveaxis(a.reshape(size, n), 0, 1)      # [n, size]
    if padded != size:
        at = jnp.concatenate(
            [at, jnp.zeros((n, padded - size), dtype=_U32)], axis=1)
    if b_const:
        bt = jnp.broadcast_to(jnp.asarray(b)[:, None], (n, LANE_TILE))
    else:
        b = jnp.broadcast_to(b, batch_shape + (n,))
        bt = jnp.moveaxis(b.reshape(size, n), 0, 1)
        if padded != size:
            bt = jnp.concatenate(
                [bt, jnp.zeros((n, padded - size), dtype=_U32)], axis=1)
    ppc, pc = _const_cols(spec)
    pp = jnp.broadcast_to(jnp.asarray(ppc), (n, LANE_TILE))
    pl_ = jnp.broadcast_to(jnp.asarray(pc), (n, LANE_TILE))
    out = _mont_call(spec, tiles, mode, b_const)(at, bt, pp, pl_)
    out = jnp.moveaxis(out[:, :size], 0, 1)
    return out.reshape(batch_shape + (n,))
