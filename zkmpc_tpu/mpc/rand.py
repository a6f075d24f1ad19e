"""Randomness helpers: batched uniform field elements from JAX PRNG keys.

The reference splits randomness into "public" randomness (identical across
parties, `ark_std::PubUniformRand`, reference `arkworks/std/src/rand_helper.rs:14`)
and per-party share randomness (`UniformRand`).  Here that split is a key
discipline: a replicated key produces public values, per-party-folded keys
produce share values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.limbs import B, MASK, W, FieldSpec, FpArray


def _raw_half_range(key, spec: FieldSpec, shape) -> FpArray:
    """Uniform over [0, 2^b) with b = 15*nlimbs - 1 (top bit cleared so the
    raw value is < R/2, within every op's bound budget)."""
    bits = jax.random.bits(key, tuple(shape) + (spec.nlimbs,), dtype=jnp.uint32)
    limbs = bits & MASK
    limbs = limbs.at[..., -1].set(limbs[..., -1] & (MASK >> 1))
    x = FpArray(limbs, spec, spec.mul_bound_budget)
    return x.tighten()


_WIDE_K = {}  # spec -> Montgomery constant for 2^b


def uniform_fp(key, spec: FieldSpec, shape=()) -> FpArray:
    """Uniform field elements (Montgomery domain) with negligible bias.

    Rejection-free double-width sampling: draw X = hi * 2^b + lo uniform over
    [0, 2^{2b}) with b = 15*nlimbs - 1 >= |p|, reduce mod p with one
    Montgomery multiply by the constant repr(2^b).  Relative bias is
    p / 2^{2b} (< 2^{-250} for all fields here), vs ~2^{-11} for the naive
    single-width draw the reference's StdRng-based sampling also exhibits.
    """
    k1, k2 = jax.random.split(key)
    hi = _raw_half_range(k1, spec, shape)
    lo = _raw_half_range(k2, spec, shape)
    kconst = _WIDE_K.get(spec)
    if kconst is None:
        b = W * spec.nlimbs - 1
        kconst = FpArray.from_int(spec, pow(2, b, spec.p))
        _WIDE_K[spec] = kconst
    return hi * kconst.broadcast_to(hi.shape) + lo


def party_fold(key, party_index):
    """Derive a per-party key from a replicated key (party_index: traced i32)."""
    return jax.random.fold_in(key, party_index)
