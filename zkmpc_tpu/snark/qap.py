"""R1CS -> QAP witness map on device (the Groth16 prover hot path).

Mirrors the reference's MPC-compatible witness map (`src/groth16.rs:240-307`):
evaluate constraint rows (sparse matvec on shares), iFFT -> coset FFT, batched
Beaver multiplication for a*b (the one communication round;
`wire/field.rs:917` -> `share/field.rs:97`), divide by the vanishing
polynomial on the coset (a constant scale), coset iFFT.

Everything is batched limb tensors; the sparse matvec is a gather +
segment-sum over the constraint rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mpc.share import MpcFp, SHARED
from ..ops.limbs import FpArray, _resolve2
from ..ops.ntt import Domain
from ..parallel import transport as T


class DeviceMatrix:
    """COO sparse matrix with field coefficients resident on device."""

    def __init__(self, spec, rows, cols, coeffs_int, n_rows, max_row_nnz):
        self.spec = spec
        # host numpy: instances may be cached/reused across jit traces
        self.rows = np.asarray(rows, dtype=np.int32)
        self.cols = np.asarray(cols, dtype=np.int32)
        self.coeffs = FpArray.from_int(spec, np.asarray(coeffs_int, dtype=object))
        self.n_rows = n_rows
        self.max_row_nnz = max_row_nnz

    # max entries accumulated in one raw-limb segment sum (keeps columns
    # within the carry-resolution headroom: K * 2^15 < 2^26)
    CHUNK = 1024

    @classmethod
    def from_coo(cls, spec, coo, n_rows):
        rows, cols, coeffs = coo
        if len(rows):
            max_nnz = int(np.bincount(rows).max())
        else:
            max_nnz = 1
        assert 2 * max_nnz <= spec.mul_bound_budget, "row too dense for field"
        self = cls(spec, rows, cols, coeffs, n_rows, max_nnz)
        # occurrence index of each entry within its row -> chunk ids for the
        # two-level accumulation of dense rows
        occ = np.zeros(len(rows), dtype=np.int64)
        counts = {}
        for i, r_ in enumerate(rows):
            c = counts.get(int(r_), 0)
            occ[i] = c
            counts[int(r_)] = c + 1
        self.nchunks = max(1, -(-max_nnz // cls.CHUNK))
        self.seg1 = np.asarray(rows, dtype=np.int64) * self.nchunks + \
            (occ // cls.CHUNK)
        return self

    def matvec(self, z: MpcFp) -> MpcFp:
        """A @ z for a shared assignment z [m] -> shared [n_rows]."""
        assert z.visibility == SHARED
        t = T.current()
        zv = z.value.tighten()
        out_v = _gather_scale_segsum(self, zv)
        out_m = None
        if z.mac is not None:
            out_m = _gather_scale_segsum(self, z.mac.tighten())
        return MpcFp(out_v, SHARED, out_m)


def _gather_scale_segsum(mat: DeviceMatrix, zv: FpArray) -> FpArray:
    """Two-level segmented accumulation: raw limb sums stay within carry
    headroom per chunk (<= CHUNK entries), then chunk partials (carry-resolved
    limbs) combine per row — handles arbitrarily dense constraint rows (e.g.
    vote-tally LCs)."""
    spec = mat.spec
    gathered = FpArray(jnp.take(zv.limbs, mat.cols, axis=-2), spec, zv.bound)
    scaled = gathered * mat.coeffs          # [..., nnz] bound 2
    limbs = jnp.moveaxis(scaled.limbs, -2, 0)   # [nnz, ..., nl]
    part = jax.ops.segment_sum(
        limbs, jnp.asarray(mat.seg1), num_segments=mat.n_rows * mat.nchunks)
    part = jnp.moveaxis(part, 0, -2)            # [..., rows*chunks, nl]
    part = _resolve2(part)[..., :spec.nlimbs]   # limbs <= B
    if mat.nchunks > 1:
        shape = part.shape[:-2] + (mat.n_rows, mat.nchunks, spec.nlimbs)
        part = part.reshape(shape).sum(axis=-2, dtype=jnp.uint32)
        part = _resolve2(part)[..., :spec.nlimbs]
    return FpArray(part, spec, 2 * mat.max_row_nnz)


def witness_map(spec, matrices, z: MpcFp, domain: Domain, num_instance: int,
                num_constraints: int):
    """-> h coefficients [domain.n - 1] as a shared MpcFp.

    `matrices` = (A, B, C) DeviceMatrix with n_rows = domain.n.  Following the
    ark/libsnark convention, A additionally gets rows
    a[num_constraints + j] = z[j] for instance j (input consistency).
    """
    A, Bm, Cm = matrices
    az = A.matvec(z)
    bz = Bm.matvec(z)
    cz = Cm.matvec(z)

    # input-consistency rows in A
    az = _set_rows(az, z, num_constraints, num_instance)

    a_coset = _to_coset(az, domain)
    b_coset = _to_coset(bz, domain)
    c_coset = _to_coset(cz, domain)

    ab = a_coset * b_coset          # batched Beaver mul (one comms round)
    hv = ab - c_coset
    h_evals = _scale_mpc(hv, domain._vanish_inv_fp)
    h = _apply_fp(h_evals, domain.coset_ifft)
    return h[:domain.n - 1]


def _set_rows(az: MpcFp, z: MpcFp, offset: int, count: int) -> MpcFp:
    """az[offset + j] = z[j] for j < count (limb-level dynamic update)."""
    def upd(dst: FpArray, src: FpArray) -> FpArray:
        limbs = dst.limbs.at[..., offset:offset + count, :].set(
            src.limbs[..., :count, :])
        return FpArray(limbs, dst.spec, max(dst.bound, src.bound))
    mac = None
    if az.mac is not None:
        mac = upd(az.mac, z.mac)
    return MpcFp(upd(az.value, z.value), SHARED, mac)


def _apply_fp(x: MpcFp, fn) -> MpcFp:
    mac = None if x.mac is None else fn(x.mac)
    return MpcFp(fn(x.value), x.visibility, mac)


def _to_coset(x: MpcFp, domain: Domain) -> MpcFp:
    return _apply_fp(x, lambda f: domain.coset_fft(domain.ifft(f)))


def _scale_mpc(x: MpcFp, c: FpArray) -> MpcFp:
    return _apply_fp(x, lambda f: f * c)
