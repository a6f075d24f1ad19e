"""Ciphertext ring R_q = Z_q[X]/(X^N + 1) with q = MNT4-753's 753-bit prime.

Replaces the reference's schoolbook `Encodedtext` polynomial arithmetic
(`src/she/encodedtext.rs:115-134` does O(N^2) polymul) with negacyclic NTT
multiplication over the same modulus (`src/she.rs:17` reuses ark-mnt4-753 Fq
as q): psi-twist, size-N NTT, pointwise multiply, inverse.  All batched limb
tensors; thousands of ciphertexts multiply in one kernel — the SHE
preprocessing throughput lever (SURVEY.md §2 "batched across slots").

Also hosts cross-field conversion: plaintext polynomials over Fr (BLS12-377
scalar field = SPDZ modulus p) centered-lift into R_q, and R_q results
centered-reduce back mod p (`she/encodedtext.rs:24-50` semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.limbs import (FR, MNT4Q, FpArray, MASK, W, _mont_mul_limbs,
                         _resolve2, fp_from_u32, fp_geq_const, int_to_limbs)
from ..ops.ntt import Domain
from ..spec import field as SF

Q = MNT4Q.p
P = FR.p


@functools.lru_cache(maxsize=None)
def _twist_tables(spec, n):
    """(psi^j, psi^-j * ...) twist vectors for negacyclic wrap, as FpArrays."""
    p = spec.p
    psi = SF.root_of_unity(p, spec.generator, spec.two_adicity, 2 * n)
    psi_inv = pow(psi, -1, p)
    fwd = FpArray.from_int(
        spec, np.asarray([pow(psi, j, p) for j in range(n)], dtype=object))
    inv = FpArray.from_int(
        spec, np.asarray([pow(psi_inv, j, p) for j in range(n)], dtype=object))
    return psi, fwd, inv


def negacyclic_mul(a: FpArray, b: FpArray) -> FpArray:
    """[..., N] x [..., N] -> [..., N] product mod X^N + 1 (same spec)."""
    spec = a.spec
    n = a.shape[-1]
    if n == 1:
        return a * b
    _, fwd, inv = _twist_tables(spec, n)
    dom = Domain(spec, n)
    fa = dom.fft(a * fwd)
    fb = dom.fft(b * fwd)
    return dom.ifft(fa * fb) * inv


def negacyclic_ntt(a: FpArray) -> FpArray:
    spec = a.spec
    n = a.shape[-1]
    _, fwd, _ = _twist_tables(spec, n)
    return Domain(spec, n).fft(a * fwd)


def negacyclic_intt(fa: FpArray) -> FpArray:
    spec = fa.spec
    n = fa.shape[-1]
    _, _, inv = _twist_tables(spec, n)
    return Domain(spec, n).ifft(fa) * inv


# --------------------------------------------------------------- sampling


def uniform_rq(key, n: int, shape=()) -> FpArray:
    from ..mpc.rand import uniform_fp
    return uniform_fp(key, MNT4Q, tuple(shape) + (n,))


def gaussian_coeffs(key, n: int, shape=(), sigma: float = 3.2) -> FpArray:
    """Discrete-gaussian-ish coefficients (rounded normal, sigma=3.2 like the
    reference's sampler `src/she.rs:93-113`) embedded in R_q."""
    g = jax.random.normal(key, tuple(shape) + (n,)) * sigma
    v = jnp.round(g).astype(jnp.int32)
    mag = fp_from_u32(MNT4Q, jnp.abs(v).astype(jnp.uint32))
    neg = v < 0
    return FpArray.select(neg, -mag, mag)


def small_u32_rq(vals) -> FpArray:
    return fp_from_u32(MNT4Q, vals)


# ------------------------------------------------- cross-field conversion


def lift_centered_p_to_q(x: FpArray) -> FpArray:
    """Fr (mod-p) coefficients -> R_q coefficients via centered lift:
    v <= p/2 maps to v, else to q - (p - v)."""
    assert x.spec is FR
    ints = x.int_limbs()                       # [..., 17] canonical
    is_neg = fp_geq_const(ints, FR, (P >> 1) + 1)
    nl = MNT4Q.nlimbs
    pad = jnp.zeros(ints.shape[:-1] + (nl - ints.shape[-1],), jnp.uint32)
    raw = jnp.concatenate([ints, pad], axis=-1)
    # add (q - p) where negative
    qp = jnp.asarray(int_to_limbs(Q - P, nl))
    cols = raw + jnp.where(is_neg[..., None], qp, 0)
    raw2 = _resolve2(cols)[..., :nl]
    out = _mont_mul_limbs(MNT4Q, raw2, jnp.asarray(MNT4Q.r2_limbs))
    return FpArray(out, MNT4Q, 2)


@functools.lru_cache(maxsize=None)
def _limb_pows_mod_p():
    """Montgomery consts 2^(15*i) mod p for i < MNT4Q.nlimbs, as one FpArray."""
    vals = [pow(1 << W, i, P) for i in range(MNT4Q.nlimbs + 1)]
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def reduce_centered_q_to_p(x: FpArray) -> FpArray:
    """R_q coefficients -> Fr via centered reduction:
    t = v if v <= q/2 else v - q; result = t mod p."""
    assert x.spec is MNT4Q
    ints = x.int_limbs()                        # [..., 51] canonical
    is_neg = fp_geq_const(ints, MNT4Q, (Q >> 1) + 1)
    pows = _limb_pows_mod_p()                   # [52] Fr consts
    # m = sum_i limb_i * 2^(15 i) mod p, via scalar lift of each limb
    limbs_fr = fp_from_u32(FR, ints)            # [..., 51] Fr elements
    terms = limbs_fr * FpArray(pows.limbs[:MNT4Q.nlimbs], FR, 1)
    m = _fold_sum(terms)
    # negative case: subtract q mod p
    q_mod_p = FpArray.from_int(FR, np.asarray(Q % P, dtype=object))
    m_neg = m - q_mod_p
    return FpArray.select(is_neg, m_neg.tighten(), m.tighten())


def _fold_sum(x: FpArray) -> FpArray:
    """Sum over the last batch axis with pairwise folds."""
    while x.shape[-1] > 1:
        n = x.shape[-1]
        half = n // 2
        a = FpArray(x.limbs[..., :half, :], x.spec, x.bound)
        b = FpArray(x.limbs[..., half:2 * half, :], x.spec, x.bound)
        s = a + b
        if n % 2:
            rest = FpArray(x.limbs[..., 2 * half:, :], x.spec, x.bound)
            s = FpArray(jnp.concatenate([s.limbs, rest.limbs], axis=-2),
                        x.spec, max(s.bound, rest.bound))
        x = s
    return FpArray(x.limbs[..., 0, :], x.spec, x.bound)
