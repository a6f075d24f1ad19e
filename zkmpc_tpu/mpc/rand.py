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


def uniform_fp(key, spec: FieldSpec, shape=()) -> FpArray:
    """Near-uniform field elements (Montgomery domain), bound 2.

    Samples 15*nlimbs - 1 raw bits (value < R/2) and tightens: the result is
    uniform over [0, R/2) reduced mod p, with relative bias ~ 2p/R
    (<= 2^-11 across our fields).  TODO(crypto-hardening): double-width
    rejection-free sampling for negligible bias.
    """
    bits = jax.random.bits(key, tuple(shape) + (spec.nlimbs,), dtype=jnp.uint32)
    limbs = bits & MASK
    # clear the top bit of the top limb so the value is < R/2 = budget * p
    limbs = limbs.at[..., -1].set(limbs[..., -1] & (MASK >> 1))
    x = FpArray(limbs, spec, spec.mul_bound_budget)
    return x.tighten()


def party_fold(key, party_index):
    """Derive a per-party key from a replicated key (party_index: traced i32)."""
    return jax.random.fold_in(key, party_index)
