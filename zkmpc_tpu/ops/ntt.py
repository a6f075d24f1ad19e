"""Radix-2 NTT and polynomial evaluation domains on TPU.

Semantics match the reference's arkworks `Radix2EvaluationDomain`
(`arkworks/algebra/poly/src/domain/radix2`): for a domain H of power-of-two
size n with generator omega (`F::get_root_of_unity(n)`),

- ``fft(coeffs)[i]   = f(omega^i)``
- ``ifft(evals)``      inverts it (inverse twiddles, scale by 1/n)
- ``coset_fft``        evaluates over the coset g*H where g is the field's
                       multiplicative generator (used by Groth16's
                       divide-by-vanishing-poly trick: Z_H(g*omega^i) = g^n - 1
                       is constant on the coset; reference `src/groth16.rs:240-307`).

The butterfly network is fully vectorized: each of the log2(n) stages is one
batched Montgomery multiply + lazy add/sub over the whole array, so the TPU
sees ~log2(n) large elementwise kernels and no data-dependent control flow.
Shares are additively linear, so the same NTT runs unchanged on secret-shared
tensors (reference `wire/field.rs:1068-1082`).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..spec import field as specfield
from .limbs import FieldSpec, FpArray


@functools.lru_cache(maxsize=None)
def _domain_tables(spec: FieldSpec, n: int):
    """Host-precomputed integer tables for a size-n domain."""
    assert n & (n - 1) == 0 and n >= 1
    log_n = n.bit_length() - 1
    assert spec.two_adicity is not None and log_n <= spec.two_adicity, (
        f"domain size 2^{log_n} exceeds 2-adicity of {spec.name}")
    p = spec.p
    omega = specfield.root_of_unity(p, spec.generator, spec.two_adicity, n)
    omega_inv = pow(omega, -1, p) if n > 1 else 1
    n_inv = pow(n, -1, p)
    g = spec.generator % p
    g_inv = pow(g, -1, p)
    # bit reversal permutation
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        for b in range(log_n):
            r |= ((i >> b) & 1) << (log_n - 1 - b)
        rev[i] = r
    return omega, omega_inv, n_inv, g, g_inv, rev


class Domain:
    """Radix-2 evaluation domain over ``spec`` of power-of-two size ``n``."""

    _cache: dict = {}

    def __new__(cls, spec: FieldSpec, n: int):
        key = (spec, n)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        self._init(spec, n)
        return self

    def _init(self, spec, n):
        self.spec = spec
        self.n = n
        self.log_n = n.bit_length() - 1
        omega, omega_inv, n_inv, g, g_inv, rev = _domain_tables(spec, n)
        self.omega, self.omega_inv, self.n_inv = omega, omega_inv, n_inv
        self.coset_gen = g
        # host numpy (NOT jnp): this object is cached across jit traces and a
        # device array created inside a trace would leak a tracer
        self._rev = rev
        p = spec.p
        # per-stage twiddles: stage s has block size m=2^(s+1), uses
        # w = omega^(n/m) and powers w^0..w^(m/2-1)
        self._tw_fwd, self._tw_inv = [], []
        for s in range(self.log_n):
            m = 1 << (s + 1)
            w = pow(omega, n // m, p)
            wi = pow(omega_inv, n // m, p)
            half = m // 2
            fwd = [pow(w, j, p) for j in range(half)]
            inv = [pow(wi, j, p) for j in range(half)]
            self._tw_fwd.append(FpArray.from_int(spec, np.asarray(fwd, dtype=object)))
            self._tw_inv.append(FpArray.from_int(spec, np.asarray(inv, dtype=object)))
        # flat per-stage tables for the SCANNED butterfly network:
        # stage s, flat index i with pos = i mod m:
        #   pos <  half: out[i] = x[i]      + w^pos        * x[i+half]
        #   pos >= half: out[i] = x[i-half] - w^(pos-half) * x[i]
        if self.log_n > 0:
            idx_e = np.zeros((self.log_n, n), dtype=np.int32)
            idx_o = np.zeros((self.log_n, n), dtype=np.int32)
            lo_mask = np.zeros((self.log_n, n), dtype=bool)
            twf = np.zeros((self.log_n, n), dtype=object)
            twi = np.zeros((self.log_n, n), dtype=object)
            i_arr = np.arange(n)
            for s in range(self.log_n):
                m = 1 << (s + 1)
                half = m // 2
                pos = i_arr % m
                lo = pos < half
                k = np.where(lo, pos, pos - half)
                idx_e[s] = np.where(lo, i_arr, i_arr - half)
                idx_o[s] = np.where(lo, i_arr + half, i_arr)
                lo_mask[s] = lo
                w = pow(omega, n // m, p)
                wi_ = pow(omega_inv, n // m, p)
                wk = {j: pow(w, int(j), p) for j in np.unique(k)}
                wik = {j: pow(wi_, int(j), p) for j in np.unique(k)}
                twf[s] = np.asarray([wk[int(j)] for j in k], dtype=object)
                twi[s] = np.asarray([wik[int(j)] for j in k], dtype=object)
            self._flat_idx_e, self._flat_idx_o = idx_e, idx_o
            self._flat_lo = lo_mask
            self._flat_tw_fwd = FpArray.from_int(spec, twf)
            self._flat_tw_inv = FpArray.from_int(spec, twi)
        # coset scaling vectors: g^i and g^-i / plain n^-1
        self._coset_pows = FpArray.from_int(
            spec, np.asarray([pow(g, i, p) for i in range(n)], dtype=object))
        self._coset_inv_pows_scaled = FpArray.from_int(
            spec, np.asarray([pow(g_inv, i, p) * n_inv % p for i in range(n)],
                             dtype=object))
        self._n_inv_fp = FpArray.from_int(spec, np.asarray(n_inv, dtype=object))
        # (g^n - 1)^-1: constant value of 1/Z_H on the coset
        self.vanishing_on_coset_inv = pow(pow(g, n, p) - 1, -1, p)
        self._vanish_inv_fp = FpArray.from_int(
            spec, np.asarray(self.vanishing_on_coset_inv, dtype=object))

    # ---------------------------------------------------------------- kernels

    def _butterflies(self, x: FpArray, twiddles) -> FpArray:
        """Iterative DIT NTT given bit-reversed input. x: [..., n] field elems.

        The log2(n) stages run inside ONE `lax.scan` over precomputed flat
        per-stage tables (gather indices + full-width twiddles), so the
        traced graph carries a single butterfly body instead of log2(n)
        inlined copies — the Groth16 witness map runs 7 NTTs, which were
        ~17k jaxpr eqns of prove-graph compile mass in the unrolled form."""
        import jax

        n = self.n
        if self.log_n == 0:
            return x
        if self.log_n < 6:
            # small domains: the unrolled form is tiny anyway, and XLA:CPU's
            # compiler has been seen to segfault on the scanned body at small
            # shapes (observed in the SHE ring tests at n=8)
            return self._butterflies_unrolled(x, twiddles)
        fwd = twiddles is self._tw_fwd
        tw = self._flat_tw_fwd if fwd else self._flat_tw_inv
        spec = x.spec

        def norm2(f: FpArray) -> FpArray:
            f = f.tighten()
            return f if f.bound == 2 else FpArray(f.limbs, spec, 2)

        lo_mask = self._flat_lo[..., None]          # [L, n, 1]

        def body(carry, stage):
            idx_e, idx_o, lo, tw_l = stage
            xe = jnp.take(carry.limbs, idx_e, axis=-2)
            xo = jnp.take(carry.limbs, idx_o, axis=-2)
            e = FpArray(xe, spec, carry.bound)
            t = FpArray(xo, spec, carry.bound) * FpArray(tw_l, spec, 1)
            hi = e + t
            lo_v = e - t
            out = FpArray(jnp.where(lo, hi.limbs, lo_v.limbs), spec,
                          max(hi.bound, lo_v.bound))
            return norm2(out), None

        stages = (jnp.asarray(self._flat_idx_e), jnp.asarray(self._flat_idx_o),
                  lo_mask, jnp.asarray(tw.limbs))
        out, _ = jax.lax.scan(body, norm2(x), stages)
        return out

    def _butterflies_unrolled(self, x: FpArray, twiddles) -> FpArray:
        n = self.n
        batch = x.shape[:-1]
        for s in range(self.log_n):
            m = 1 << (s + 1)
            half = m // 2
            y = x.reshape(batch + (n // m, m))
            even = FpArray(y.limbs[..., :half, :], y.spec, y.bound)
            odd = FpArray(y.limbs[..., half:, :], y.spec, y.bound)
            t = odd * twiddles[s]
            hi = even + t
            lo = even - t
            x = FpArray(jnp.concatenate([hi.limbs, lo.limbs], axis=-2),
                        y.spec, max(hi.bound, lo.bound))
            x = x.reshape(batch + (n,))
        return x

    def fft(self, coeffs: FpArray) -> FpArray:
        """coeffs [..., n] -> evaluations f(omega^i), i in 0..n-1."""
        assert coeffs.shape[-1] == self.n
        x = FpArray(jnp.take(coeffs.limbs, self._rev, axis=-2),
                    coeffs.spec, coeffs.bound)
        return self._butterflies(x, self._tw_fwd)

    def ifft(self, evals: FpArray) -> FpArray:
        assert evals.shape[-1] == self.n
        x = FpArray(jnp.take(evals.limbs, self._rev, axis=-2),
                    evals.spec, evals.bound)
        out = self._butterflies(x, self._tw_inv)
        return out * self._n_inv_fp

    def coset_fft(self, coeffs: FpArray) -> FpArray:
        """Evaluate over g*H: scale coeff j by g^j, then fft."""
        scaled = coeffs * self._coset_pows
        return self.fft(scaled)

    def coset_ifft(self, evals: FpArray) -> FpArray:
        x = FpArray(jnp.take(evals.limbs, self._rev, axis=-2),
                    evals.spec, evals.bound)
        out = self._butterflies(x, self._tw_inv)
        return out * self._coset_inv_pows_scaled

    def divide_by_vanishing_poly_on_coset(self, evals: FpArray) -> FpArray:
        """Pointwise multiply coset evaluations by 1/(g^n - 1)."""
        return evals * self._vanish_inv_fp
