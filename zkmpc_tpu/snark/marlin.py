"""Collaborative Marlin-style KZG proof system (algebraic holographic proof,
round-1 subset).

Captures the reference's collaborative-Marlin structure (`src/marlin.rs`,
`arkworks/marlin/src/lib.rs:152-324`): witness polynomials stay secret-shared;
every round's commitments are *publicized* (opened) before being absorbed into
the Fiat-Shamir transcript so all parties derive identical challenges
(`marlin/src/lib.rs:171-228` — the collaborative-SNARK trick); the final
evaluations + batched KZG openings are publicized and checked by a vanilla
verifier.

Protocol:
- domain H of size n >= max(#constraints, #vars); z, z_A, z_B, z_C as
  polynomials over H (shared coefficients via iNTT).
- rowcheck: z_A z_B - z_C = h_0 v_H   (committed h_0, random-point check)
- lincheck for each M in {A,B,C} at a random alpha, eta-combined:
  sum_{h in H} [ u_H(alpha,h) zM(h) - (M^T r_alpha)(h) z(h) ] = 0, proven by
  the univariate sumcheck decomposition p(X) = X g(X) + v_H(X) q(X).
- holographic matrix indexing (AHP round 3): the indexer commits to the
  row/col/val low-degree extensions over an index domain K
  (`_index_matrix`); the prover supplies the matrix-sumcheck round proving
  (M^T r_alpha)(beta) against those commitments, so the verifier never
  touches the matrices (falls back to a direct public-matrix scan when an
  index lacks commitments).
- one KZG batch opening point beta; openings are publicized and verified with
  pairings on the host.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax

from .. import params
from ..mpc.share import MpcFp, PUBLIC, SHARED, _promote_to_shared
from ..ops.limbs import FR, FpArray
from ..ops.ntt import Domain
from ..spec import curves as SC
from ..spec import field as SF
from . import kzg
from .qap import DeviceMatrix
from .r1cs import ConstraintSystem

R = params.FR_MODULUS


@dataclasses.dataclass
class MatrixIndexComms:
    """Holographic index for one matrix: commitments to the low-degree
    extensions of the non-zero entries' (row point, col point, value) over
    an index domain K (the AHP indexer, `marlin/src/ahp/indexer.rs`
    semantics; row/col store the H-points omega^r, omega^c, not indices)."""
    k_size: int
    com_row: tuple
    com_col: tuple
    com_val: tuple
    # prover-side data (public): coeff arrays + raw entry ints
    row_poly: object = None
    col_poly: object = None
    val_poly: object = None
    entries: tuple = None          # (row_pts, col_pts, vals) int lists


@dataclasses.dataclass
class MarlinIndex:
    srs: kzg.KzgSrs
    domain_n: int
    num_instance: int
    matrices: tuple          # host COO (A, B, C), columns in H-index layout
    dev_matrices: tuple      # DeviceMatrix triples with n_rows = n
    index_comms: tuple = None    # MatrixIndexComms per matrix
    # --- x/w split (ark-marlin input-domain layout) ---
    nx: int = 1              # |X| = next_pow2(num_instance), X subgroup of H
    num_witness: int = 0
    perm: object = None      # [n] int32: H slot -> source index into
    #                          [instance..., witness..., 0]; len(z)=sentinel 0


def _index_matrix(srs_dev, coo, n: int) -> MatrixIndexComms:
    """Commit the (row, col, val) polynomials of one matrix over K."""
    from ..ops import msm as M_

    rows, cols, coeffs = coo
    omega_pows = {}

    def w(i):
        if i not in omega_pows:
            omega_pows[i] = pow(_omega(n), int(i), R)
        return omega_pows[i]

    row_pts = [w(r) for r in rows]
    col_pts = [w(c) for c in cols]
    vals = [int(v) % R for v in coeffs]
    k = max(2, 1 << (max(1, len(vals) - 1)).bit_length())
    # pad: val 0, row/col at omega^0 = 1 (contributes 0 to the sum)
    row_pts += [1] * (k - len(row_pts))
    col_pts += [1] * (k - len(col_pts))
    vals += [0] * (k - len(vals))
    domK = Domain(FR, k)
    arr = lambda xs: FpArray.from_int(FR, np.asarray(xs, dtype=object))
    row_poly = domK.ifft(arr(row_pts))
    col_poly = domK.ifft(arr(col_pts))
    val_poly = domK.ifft(arr(vals))

    def com(poly):
        pt = M_.sw_msm(srs_dev.powers[0:k], poly)
        return tuple(int(x) for x in pt.to_affine_ints()[0])
    return MatrixIndexComms(k, com(row_poly), com(col_poly), com(val_poly),
                            row_poly, col_poly, val_poly,
                            (row_pts, col_pts, vals))


def _omega(n: int) -> int:
    return SF.root_of_unity(R, FR.generator, FR.two_adicity, n)


def _domain_sizes(cs: ConstraintSystem) -> tuple[int, int]:
    """(n, nx): |H| and |X| for this circuit.  X = next_pow2(num_instance)
    must be a subgroup of H, and H must hold the padded instance (nx slots)
    plus every witness (`marlin/src/ahp/mod.rs` domain sizing)."""
    nx = 1
    while nx < cs.num_instance:
        nx <<= 1
    n = 1
    need = max(len(cs.constraints), nx + cs.num_witness, 2, nx)
    while n < need:
        n <<= 1
    return n, nx


def _h_layout(n: int, nx: int, ninst: int, nwit: int):
    """H-slot layout of the x/w split: instance i sits at H-index i*(n/nx)
    (the subgroup X = <omega^(n/nx)>), witnesses fill the complement in
    order.  Returns (perm [n] -> source idx with sentinel ninst+nwit,
    col_map [ninst+nwit] -> H-index)."""
    stride = n // nx
    x_pos = [i * stride for i in range(nx)]
    in_x = np.zeros(n, dtype=bool)
    in_x[x_pos] = True
    wit_pos = np.nonzero(~in_x)[0]
    assert nwit <= len(wit_pos)
    nvars = ninst + nwit
    perm = np.full(n, nvars, dtype=np.int32)
    for i in range(ninst):
        perm[i * stride] = i
    perm[wit_pos[:nwit]] = ninst + np.arange(nwit, dtype=np.int32)
    col_map = np.empty(nvars, dtype=np.int32)
    col_map[:ninst] = stride * np.arange(ninst, dtype=np.int32)
    col_map[ninst:] = wit_pos[:nwit]
    return perm, col_map


def srs_degree_for(cs: ConstraintSystem) -> int:
    """Smallest SRS degree that can index + prove this circuit."""
    n, _ = _domain_sizes(cs)
    A, B, C = cs.matrices()
    kmax = 2
    for m in (A, B, C):
        nnz = max(1, len(m[2]))
        k = 1 << (nnz - 1).bit_length()
        kmax = max(kmax, k)
    return max(n + 1, 2 * kmax - 1)


def universal_setup(max_degree: int, seed: int = 0) -> kzg.KzgSrs:
    """ONE circuit-independent KZG SRS covering every circuit whose
    `srs_degree_for` fits — the reference's `Marlin::universal_setup`
    (`src/marlin.rs:36`, `bin_werewolf.rs:430`: one shared SRS for all game
    phases).  Trust model: a single universal ceremony instead of one
    trusted setup per circuit."""
    return kzg.setup(max_degree, seed=seed)


def index_with_srs(srs: kzg.KzgSrs, cs: ConstraintSystem) -> MarlinIndex:
    """Holographic index under a pre-existing universal SRS (the reference's
    `index` + `from_public` lift, AHP indexer `marlin/src/ahp/indexer.rs`):
    the verifier never reads the matrices, only their (row, col, val) KZG
    commitments."""
    need = srs_degree_for(cs)
    assert len(srs.powers) - 1 >= need, \
        f"universal SRS degree {len(srs.powers) - 1} < required {need}"
    n, nx = _domain_sizes(cs)
    perm, col_map = _h_layout(n, nx, cs.num_instance, cs.num_witness)
    # remap matrix columns from variable order to H-slot order (the ark
    # input-domain layout: `ahp/indexer.rs` pads + interleaves x into H)
    mats = []
    for rows, cols, coeffs in cs.matrices():
        new_cols = col_map[np.asarray(cols, dtype=np.int64)] if len(cols) \
            else np.asarray([], dtype=np.int32)
        mats.append((rows, new_cols, coeffs))
    mats = tuple(mats)
    dsrs = srs.device()
    dev = tuple(DeviceMatrix.from_coo(FR, m, n) for m in mats)
    comms = tuple(_index_matrix(dsrs, m, n) for m in mats)
    return MarlinIndex(srs, n, cs.num_instance, mats, dev, comms,
                       nx=nx, num_witness=cs.num_witness, perm=perm)


def setup_and_index(cs: ConstraintSystem, seed: int = 0) -> MarlinIndex:
    """Convenience: minimal universal setup sized for this circuit, then
    index (`src/marlin.rs:36` + indexer)."""
    return index_with_srs(universal_setup(srs_degree_for(cs), seed=seed), cs)


def _pt_bytes(pt) -> bytes:
    """FS-absorb encoding of a host affine point: ark ToBytes
    (full-width x || y || infinity byte, `compat/ark.py:g1_affine_to_bytes`)."""
    from ..compat import ark as A_
    return A_.g1_affine_to_bytes(pt)


def _fs_start(index: "MarlinIndex", instance_ints):
    """ONE chained Fiat-Shamir transcript for the whole proof
    (`arkworks/marlin/src/rng.rs:40-70` seed = H(new || old) semantics via
    `compat/ark.py:FiatShamirRng`; init order `marlin/src/lib.rs:163,346`:
    PROTOCOL_NAME || index_vk || public_input).  Every challenge drawn from
    this rng transitively binds the entire prior transcript — the round-4
    per-challenge blake2b tags were unchained (a soundness hole: eta did not
    absorb the z_M commitments, so a prover could pick eta-cancelling
    errors; see tests/test_marlin.py cheating-prover cases)."""
    from ..compat import ark as A_
    buf = b"MARLIN-2019"
    buf += int(index.domain_n).to_bytes(8, "little")
    buf += int(index.nx).to_bytes(8, "little")
    buf += int(index.num_instance).to_bytes(8, "little")
    for mic in (index.index_comms or ()):
        buf += int(mic.k_size).to_bytes(8, "little")
        for pt in (mic.com_row, mic.com_col, mic.com_val):
            buf += _pt_bytes(pt)
    for v in instance_ints:
        buf += int(v).to_bytes(32, "little")
    return A_.FiatShamirRng(buf)


def _fs_absorb(fs, *, points=(), ints=()):
    buf = b""
    for pt in points:
        buf += _pt_bytes(pt)
    for v in ints:
        buf += int(v).to_bytes(32, "little")
    fs.absorb(buf)


def _fs_round3_absorb(fs, mat_proofs):
    """Absorb the holographic round-3 messages (sigma + commitments) in
    matrix order (A, B, C)."""
    buf = b""
    for mp in mat_proofs:
        buf += int(mp["sigma"]).to_bytes(32, "little")
        for pt in (mp["com_g3"], mp["com_h3"], mp["com_g3_shift"]):
            buf += _pt_bytes(pt)
    fs.absorb(buf)


def _fs_evals_absorb(fs, evals, mat_proofs):
    """Absorb every published evaluation (beta evals in _BETA_ORDER, then
    per-matrix beta3 evals in _BETA3_ORDER) before drawing the opening
    LC challenges xi / xi3 (`marlin/src/lib.rs:296` evaluations absorb)."""
    buf = b""
    for name in _BETA_ORDER:
        buf += int(evals[name]).to_bytes(32, "little")
    for mp in mat_proofs:
        for name in _BETA3_ORDER:
            buf += int(mp["evals"][name]).to_bytes(32, "little")
    fs.absorb(buf)


def _open_point(mp) -> tuple | None:
    """Publicize a shared commitment point -> host affine ints."""
    pt = mp.reveal()
    aff = pt[0:1].to_affine_ints() if pt.shape else pt.to_affine_ints()
    return aff[0]


def _poly_from_evals(evals: MpcFp, dom: Domain) -> MpcFp:
    def f(fp):
        return dom.ifft(fp)
    mac = None if evals.mac is None else f(evals.mac)
    return MpcFp(f(evals.value), evals.visibility, mac)


def _evals_pad(x: MpcFp, n: int) -> MpcFp:
    return kzg._pad_to(x, n)


#: fixed order of the polynomials batch-opened at beta (FS + LC ordering);
#: "w" is the witness polynomial w_hat of the x/w split — z itself is never
#: committed (z = x_poly + v_X * w_hat, `ahp/prover.rs:243` publicized input)
_BETA_ORDER = ("w", "za", "zb", "zc", "m", "h0", "g", "q")
#: fixed order of the per-matrix polynomials batch-opened at beta3
_BETA3_ORDER = ("row", "col", "val", "g3", "h3")


def prove(index: MarlinIndex, cs: ConstraintSystem, key):
    """Collaborative prove under the ambient MPC scope.  Returns the opened
    proof dict (commitments, publicized evaluations, TWO batched opening
    witnesses).

    x/w split (`arkworks/marlin/src/ahp/prover.rs:243`): the assignment z
    lives on H in the input-domain layout (instance on the subgroup X,
    witness on H \\ X); the prover commits only w_hat = (z - x_poly) / v_X,
    and the verifier reconstructs z(beta) = x_poly(beta) + v_X(beta) *
    w_hat(beta) from the public inputs itself — proof size and verify time
    are O(1) in the instance count (the round-4 per-instance-slot KZG opens
    are gone).

    Zero-knowledge: each witness polynomial is masked with a fresh shared
    multiple of v_H (evals on H unchanged, the published beta-evaluation is
    perfectly hidden), and the sumcheck carries a random sum-zero mask
    polynomial m — the zk_bound randomization + mask_poly of the reference
    (`arkworks/marlin/src/ahp/prover.rs:280,371-376`).

    Soundness: deg(g) <= n-2 is enforced with a shifted-power commitment
    X^(D-(n-2)) * g (marlin_pc `shifted_comm`, `poly-commit/src/lib.rs:178`)
    folded into ONE batched opening at beta (`open_combinations`,
    `poly-commit/src/lib.rs:315`); deg(g3) <= k-2 likewise at beta3.
    All challenges come from ONE chained FiatShamirRng (`_fs_start`).
    """
    import jax

    dsrs = index.srs.device()
    n = index.domain_n
    nx = index.nx
    D = len(index.srs.powers) - 1
    dom = Domain(FR, n)
    big = Domain(FR, 2 * n)
    A, Bm, Cm = index.dev_matrices

    instance_ints = cs.instance_ints()
    z_evals = _layout_assignment(index, cs)  # z over H, input-domain layout
    za = _evals_pad(A.matvec(z_evals), n)
    zb = _evals_pad(Bm.matvec(z_evals), n)
    zc = _evals_pad(Cm.matvec(z_evals), n)

    # zk masking: poly + c * v_H (deg n), c fresh shared randomness
    ks = jax.random.split(key, 5)
    z_poly = _mask_vh(_poly_from_evals(z_evals, dom), ks[0], n)
    za_poly = _mask_vh(_poly_from_evals(za, dom), ks[1], n)
    zb_poly = _mask_vh(_poly_from_evals(zb, dom), ks[2], n)
    zc_poly = _mask_vh(_poly_from_evals(zc, dom), ks[3], n)
    m_poly = _sum_zero_mask(ks[4], n)        # sumcheck mask, sum_H m = 0

    # witness polynomial: w_hat = (z - x_poly) / v_X  (exact: z - x_poly
    # vanishes on X; the v_H zk mask is itself divisible by v_X since X <= H)
    x_poly = _x_poly(index, instance_ints)   # public, nx coeffs
    w_poly = _div_by_vx(z_poly, x_poly, nx, big)

    # round 1: commit w, zA, zB, zC, m; publicize; absorb; FS -> alpha, etas
    com_w = _open_point(kzg.commit(dsrs, w_poly))
    com_za = _open_point(kzg.commit(dsrs, za_poly))
    com_zb = _open_point(kzg.commit(dsrs, zb_poly))
    com_zc = _open_point(kzg.commit(dsrs, zc_poly))
    com_m = _open_point(kzg.commit(dsrs, m_poly))
    fs = _fs_start(index, instance_ints)
    _fs_absorb(fs, points=(com_w, com_za, com_zb, com_zc, com_m))
    alpha = fs.fr_challenge()
    eta = [fs.fr_challenge() for _ in range(3)]

    # rowcheck quotient: h0 = (zA zB - zC) / v_H.  The masked polys have
    # degree n, so the product needs the 2n coset (v_H is NOT constant
    # there: v_H(g w_{2n}^i) = g^n (-1)^i - 1, precomputed below).
    a_big = _apply(kzg._pad_to(za_poly, 2 * n), big.coset_fft)
    b_big = _apply(kzg._pad_to(zb_poly, 2 * n), big.coset_fft)
    c_big = _apply(kzg._pad_to(zc_poly, 2 * n), big.coset_fft)
    prod = a_big * b_big                      # batched Beaver round
    h0_big = _scale(prod - c_big, _vanish_n_inv_on_coset(big, n))
    h0_poly = kzg._slice(_apply(h0_big, big.coset_ifft), n + 2)

    # lincheck sumcheck: p(X) = u_H(alpha, X) * (sum eta_M zM)(X)
    #                         - (sum eta_M (M^T r_alpha))(X) * z(X) + m(X)
    # Both products are public x shared => local.  Compute the TRUE degree
    # <= 2n-1 product on a size-2n domain, then split by v_H = X^n - 1
    # with coefficient surgery: p = (p_low + p_high) + v_H * p_high.
    u_alpha = _u_H_row(alpha, dom)            # public evals over H [n]
    eta_fp = [FpArray.from_int(FR, np.asarray(e, dtype=object)) for e in eta]
    zm_poly = _lincomb([za_poly, zb_poly, zc_poly], eta_fp)
    rstar = _rstar_evals(index, u_alpha, eta, n)   # public [n] evals of M^T r
    u_poly = dom.ifft(u_alpha)                # public coeff vectors
    rstar_poly = dom.ifft(rstar)
    zm_big = _apply(kzg._pad_to(zm_poly, 2 * n), big.fft)
    z_big = _apply(kzg._pad_to(z_poly, 2 * n), big.fft)
    u_big = big.fft(_pad_pub(u_poly, 2 * n))
    rs_big = big.fft(_pad_pub(rstar_poly, 2 * n))
    p_big = _scale(zm_big, u_big) - _scale(z_big, rs_big)
    p_coeffs = _apply(p_big, big.ifft) + kzg._place(m_poly, 0, 2 * n)
    p_high = kzg._slice(_shift_block(p_coeffs, n), n)
    q_poly = p_high
    r_poly = kzg._slice(p_coeffs, n) + p_high           # p_low + p_high
    # sum over H is zero => r's constant coefficient is zero => g = r >> 1,
    # with deg(g) <= n-2 (n-1 coefficients) ENFORCED by the shifted commit
    g_poly = kzg._slice(_shift_down(r_poly), n - 1)
    shift_g = D - (n - 2)

    com_h0 = _open_point(kzg.commit(dsrs, h0_poly))
    com_g = _open_point(kzg.commit(dsrs, g_poly))
    com_q = _open_point(kzg.commit(dsrs, q_poly))
    com_g_shift = _open_point(kzg.commit_shifted(dsrs, g_poly, shift_g))
    _fs_absorb(fs, points=(com_h0, com_g, com_q, com_g_shift))
    beta = fs.fr_challenge()
    beta_fp = FpArray.from_int(FR, np.asarray(beta, dtype=object))

    # round 3 (holographic matrix sumcheck, AHP round 3): for each matrix,
    # prove sigma_M = sum_K val*col / ((alpha-row)(beta-col)) against the
    # index commitments; everything in this round is PUBLIC (matrices are
    # public), so no protocol rounds are spent
    mat_proofs = []
    if index.index_comms is not None:
        for mic in index.index_comms:
            mat_proofs.append(
                _matrix_sumcheck_prove(dsrs, mic, alpha, beta, D))
    beta3 = None
    w_beta3 = None
    items3 = []
    if mat_proofs:
        _fs_round3_absorb(fs, mat_proofs)
        beta3 = fs.fr_challenge()
        b3_fp = FpArray.from_int(FR, np.asarray(beta3, dtype=object))
        for mic, mp in zip(index.index_comms, mat_proofs):
            k = mic.k_size
            g3_poly, h3_poly = mp.pop("g3_poly"), mp.pop("h3_poly")
            evals3 = {}
            polys3 = dict(row=mic.row_poly, col=mic.col_poly,
                          val=mic.val_poly, g3=g3_poly, h3=h3_poly)
            for name in _BETA3_ORDER:
                pw = MpcFp.from_public(polys3[name])
                v = _scalar_int(kzg.evaluate(pw, b3_fp))
                evals3[name] = v
                items3.append((pw, 0, MpcFp.const(FR, v)))
            # degree bound: deg(g3) <= k-2
            items3.append((MpcFp.from_public(g3_poly), D - (k - 2),
                           MpcFp.const(FR, evals3["g3"])))
            mp["evals"] = evals3

    # publicize ALL evaluations, absorb them, then draw the two batched
    # opening LC challenges (openings happen after the evals are bound)
    proof_polys = dict(w=w_poly, za=za_poly, zb=zb_poly, zc=zc_poly,
                       m=m_poly, h0=h0_poly, g=g_poly, q=q_poly)
    evals = {}
    items = []
    for name in _BETA_ORDER:
        v = _scalar_int(kzg.evaluate(proof_polys[name], beta_fp))
        evals[name] = v
        items.append((proof_polys[name], 0, MpcFp.const(FR, v)))
    items.append((g_poly, shift_g, MpcFp.const(FR, evals["g"])))
    coms = dict(w=com_w, za=com_za, zb=com_zb, zc=com_zc, m=com_m,
                h0=com_h0, g=com_g, q=com_q, g_shift=com_g_shift)
    _fs_evals_absorb(fs, evals, mat_proofs)
    xi = fs.fr_challenge()
    xi3 = fs.fr_challenge()
    w_beta = _open_point(kzg.batch_open_at(
        dsrs, items, beta_fp, xi, domain_n=kzg._next_pow2(D + 1)))
    if mat_proofs:
        w_beta3 = _open_point(kzg.batch_open_at(
            dsrs, items3, b3_fp, xi3, domain_n=kzg._next_pow2(D + 1)))
    return dict(coms=coms, evals=evals, w_beta=w_beta,
                alpha=alpha, eta=eta, beta=beta,
                mat_proofs=mat_proofs,
                beta3=beta3, w_beta3=w_beta3,
                fs_digest=fs.seed.hex())


def verify(index: MarlinIndex, instance_ints, proof) -> bool:
    n = index.domain_n
    nx = index.nx
    D = len(index.srs.powers) - 1
    coms = proof["coms"]
    ev = proof["evals"]
    if len(instance_ints) != index.num_instance or \
            instance_ints[0] % R != 1:
        return False
    # replay the chained transcript: every challenge binds everything
    # absorbed before it (commitments, round-3 messages, evaluations)
    fs = _fs_start(index, instance_ints)
    _fs_absorb(fs, points=(coms["w"], coms["za"], coms["zb"], coms["zc"],
                           coms["m"]))
    alpha = fs.fr_challenge()
    eta = [fs.fr_challenge() for _ in range(3)]
    _fs_absorb(fs, points=(coms["h0"], coms["g"], coms["q"],
                           coms["g_shift"]))
    beta = fs.fr_challenge()
    if alpha != proof["alpha"] or beta != proof["beta"] or eta != proof["eta"]:
        return False
    mat_proofs = proof.get("mat_proofs") or []
    beta3 = None
    if mat_proofs:
        _fs_round3_absorb(fs, mat_proofs)
        beta3 = fs.fr_challenge()
        if proof.get("beta3") != beta3:
            return False
    _fs_evals_absorb(fs, ev, mat_proofs)
    xi = fs.fr_challenge()
    xi3 = fs.fr_challenge()
    # ONE batched KZG opening check at beta.  The degree bound on g rides
    # along: the g_shift entry's expected value is beta^(D-(n-2)) * g(beta);
    # if deg(g) > n-2 no SRS-computable com_g_shift satisfies this w.h.p.
    shift_g = D - (n - 2)
    batch_coms = [coms[name] for name in _BETA_ORDER] + [coms["g_shift"]]
    batch_vals = [ev[name] for name in _BETA_ORDER] + \
        [pow(beta, shift_g, R) * ev["g"] % R]
    if not kzg.verify_batch_open(index.srs, batch_coms, batch_vals, beta,
                                 xi, proof["w_beta"]):
        return False
    v_H_beta = (pow(beta, n, R) - 1) % R
    # rowcheck at beta
    if (ev["za"] * ev["zb"] - ev["zc"]) % R != ev["h0"] * v_H_beta % R:
        return False
    # x/w split: reconstruct z(beta) from the public inputs — the verifier
    # evaluates the x-polynomial itself (`ahp/prover.rs:243` publicized
    # input), no per-instance opens needed
    x_beta = _x_poly_eval_host(index, instance_ints, beta)
    v_X_beta = (pow(beta, nx, R) - 1) % R
    z_beta = (x_beta + v_X_beta * ev["w"]) % R
    # lincheck sumcheck identity at beta; r*(beta) comes from the holographic
    # matrix sumchecks when the index is committed (succinct verifier), with
    # the direct matrix scan as the non-holographic fallback
    u_ab = _u_H_point(alpha, beta, n)
    if index.index_comms is not None and mat_proofs:
        if len(mat_proofs) != len(index.index_comms):
            return False
        # ONE batched opening check at beta3 across all matrices, with the
        # per-matrix deg(g3) <= k-2 bounds folded in
        items_coms, items_vals = [], []
        for mic, mp in zip(index.index_comms, mat_proofs):
            if mp.get("k") != mic.k_size:
                return False
            ev3 = mp["evals"]
            index_coms = dict(row=mic.com_row, col=mic.com_col,
                              val=mic.com_val, g3=mp["com_g3"],
                              h3=mp["com_h3"])
            for name in _BETA3_ORDER:
                items_coms.append(index_coms[name])
                items_vals.append(ev3[name] % R)
            items_coms.append(mp["com_g3_shift"])
            items_vals.append(
                pow(beta3, D - (mic.k_size - 2), R) * ev3["g3"] % R)
        if not kzg.verify_batch_open(index.srs, items_coms, items_vals,
                                     beta3, xi3, proof["w_beta3"]):
            return False
        vh_a = (pow(alpha, n, R) - 1) % R
        vh_b = v_H_beta
        acc = 0
        for mic, mp, e in zip(index.index_comms, mat_proofs, eta):
            if not _matrix_sumcheck_identity(mic, mp, alpha, beta, beta3):
                return False
            acc = (acc + e * int(mp["sigma"])) % R
        rstar_b = vh_a * vh_b % R * pow(n, -1, R) % R * acc % R
    else:
        rstar_b = _rstar_eval_host(index, alpha, eta, beta)
    p_beta = (sum(e * zv for e, zv in
                  zip(eta, (ev["za"], ev["zb"], ev["zc"]))) % R * u_ab
              - rstar_b * z_beta + ev["m"]) % R
    rhs = (beta * ev["g"] + v_H_beta * ev["q"]) % R
    if p_beta != rhs:
        return False
    return True


# ------------------------------------------------- holographic round 3


def _layout_assignment(index: MarlinIndex, cs: ConstraintSystem) -> MpcFp:
    """The full assignment scattered into H slots per `index.perm`
    (instance on X, witness on H \\ X, zeros elsewhere) — ONE gather."""
    import jax.numpy as jnp
    z = cs.full_assignment()                 # [num_vars], shared
    zero = z[0:1].smul(0)                    # zero share, same party layout
    z_ext = MpcFp.concat([z, zero], axis=0)
    perm = jnp.asarray(index.perm, dtype=jnp.int32)

    def f(fp: FpArray):
        return FpArray(jnp.take(fp.limbs, perm, axis=-2), fp.spec, fp.bound)
    return MpcFp(f(z_ext.value), SHARED,
                 None if z_ext.mac is None else f(z_ext.mac))


def _x_poly(index: MarlinIndex, instance_ints) -> FpArray:
    """Public x-polynomial: interpolates [instance..., 0-pad] over the input
    domain X (|X| = nx).  omega_X = omega_H^(n/nx) by the canonical 2-adic
    root construction, so X really is the subgroup the layout uses."""
    nx = index.nx
    vals = [int(v) % R for v in instance_ints] + \
        [0] * (nx - len(instance_ints))
    domX = Domain(FR, nx)
    return domX.ifft(FpArray.from_int(FR, np.asarray(vals, dtype=object)))


def _div_by_vx(z_poly: MpcFp, x_poly: FpArray, nx: int, big: Domain) -> MpcFp:
    """w_hat = (z_poly - x_poly) / v_X, exact (numerator vanishes on X).
    Pointwise on the 2n coset — v_X(g w^i) = g^nx w^{i nx} - 1 is never
    zero there."""
    n2 = big.n
    p = FR.p
    zx = _apply(kzg._pad_to(z_poly, n2), big.coset_fft) - \
        MpcFp.from_public(big.coset_fft(_pad_pub(x_poly, n2)))
    g = big.coset_gen
    gnx = pow(g, nx, p)
    wnx = pow(big.omega, nx, p)
    vx_inv = []
    acc = gnx
    for _ in range(n2):
        vx_inv.append(pow((acc - 1) % p, -1, p))
        acc = acc * wnx % p
    vxi = FpArray.from_int(FR, np.asarray(vx_inv, dtype=object))
    w_evals = _scale(zx, vxi)
    w_coeffs = _apply(w_evals, big.coset_ifft)
    # deg(z_poly) = n (zk mask), so deg(w_hat) = n - nx -> n - nx + 1 coeffs
    return kzg._slice(w_coeffs, n2 // 2 - nx + 1)


def _x_poly_eval_host(index: MarlinIndex, instance_ints, beta: int) -> int:
    """x_poly(beta) from the public inputs (host):
    sum_i x_i * v_X(beta) * omega_X^i / (nx * (beta - omega_X^i))."""
    nx = index.nx
    omega_x = SF.root_of_unity(R, FR.generator, FR.two_adicity, nx)
    vx_b = (pow(beta, nx, R) - 1) % R
    if vx_b == 0:
        # beta landed on X (prob ~ nx/p): evaluate by direct match
        w = 1
        for i in range(nx):
            if w == beta % R:
                xs = list(instance_ints) + [0] * (nx - len(instance_ints))
                return int(xs[i]) % R
            w = w * omega_x % R
        return 0
    total = 0
    nx_inv = pow(nx, -1, R)
    w = 1
    for i, v in enumerate(instance_ints):
        li = vx_b * w % R * nx_inv % R * pow((beta - w) % R, -1, R) % R
        total = (total + int(v) * li) % R
        w = w * omega_x % R
    return total


def _mask_vh(poly: MpcFp, key, n: int) -> MpcFp:
    """poly + c * v_H for fresh shared c: evals on H unchanged, the
    published evaluation at any point outside H is perfectly hidden
    (zk_bound-style randomization, `ahp/prover.rs:280`)."""
    from ..mpc import share as MS
    c = MS.rand_shared(key, FR, (1,))
    p1 = kzg._pad_to(poly, n + 1)
    return p1 + kzg._place(c, n, n + 1) - kzg._place(c, 0, n + 1)


def _sum_zero_mask(key, n: int) -> MpcFp:
    """Random shared polynomial of degree n with sum_H m = 0 (the sumcheck
    mask, `ahp/prover.rs:371-376`): for deg <= n, sum_H m = n*(m_0 + m_n),
    so pin m_n = -m_0."""
    from ..mpc import share as MS
    m = MS.rand_shared(key, FR, (n + 1,))
    return MpcFp.concat([m[0:1], m[1:n], -m[0:1]], axis=0)


def _vanish_n_inv_on_coset(big: Domain, n: int) -> FpArray:
    """1 / v_{H_n}(x) on the coset of the 2n domain: with x = g w_{2n}^i,
    x^n = g^n (-1)^i, so the evals alternate between two constants."""
    p = FR.p
    gn = pow(big.coset_gen, n, p)
    even = pow((gn - 1) % p, -1, p)
    odd = pow((p - gn - 1) % p, -1, p)
    vals = [even if i % 2 == 0 else odd for i in range(2 * n)]
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def _matrix_sumcheck_prove(dsrs, mic: MatrixIndexComms, alpha: int,
                           beta: int, D: int) -> dict:
    """Univariate sumcheck over the index domain K for
    sigma = sum_{kappa in K} val(kappa) col(kappa) /
            ((alpha - row(kappa)) (beta - col(kappa))).

    Identity committed: val(X) col(X) - (alpha - row(X)) (beta - col(X)) *
    (X g3(X) + sigma/|K|) = h3(X) v_K(X), checked at the FS point beta3.
    All data here is public; the only cost is device NTTs of size 4|K|.
    """
    from ..ops import msm as M_

    k = mic.k_size
    row_pts, col_pts, vals = mic.entries
    # sigma + f evals (host ints; |K| is the nnz count)
    f_evals = []
    sigma = 0
    for rw, cl, v in zip(row_pts, col_pts, vals):
        den = (alpha - rw) % R * ((beta - cl) % R) % R
        f = v * cl % R * pow(den, -1, R) % R
        f_evals.append(f)
        sigma = (sigma + f) % R
    domK = Domain(FR, k)
    arr = lambda xs: FpArray.from_int(FR, np.asarray(xs, dtype=object))
    f_poly = domK.ifft(arr(f_evals))          # deg < k ; f_0 = sigma/|K|
    # g3 = (f - f_0) / X  (coefficient shift)
    import jax.numpy as jnp
    g3 = FpArray(f_poly.limbs[1:], FR, f_poly.bound)
    # q(X) = a - b * f over a 4K domain
    dom4 = Domain(FR, 4 * k)

    def pad4(x: FpArray):
        padn = 4 * k - x.shape[-1]
        pad = jnp.zeros(x.limbs.shape[:-2] + (padn, x.limbs.shape[-1]),
                        jnp.uint32)
        return FpArray(jnp.concatenate([x.limbs, pad], axis=-2), FR, x.bound)

    row_poly, col_poly, val_poly = mic.row_poly, mic.col_poly, mic.val_poly
    rowb = dom4.fft(pad4(row_poly))
    colb = dom4.fft(pad4(col_poly))
    valb = dom4.fft(pad4(val_poly))
    fb = dom4.fft(pad4(f_poly))
    alpha_fp = arr([alpha] * (4 * k))
    beta_fp = arr([beta] * (4 * k))
    a_ev = valb * colb
    b_ev = (alpha_fp - rowb) * (beta_fp - colb)
    q_coeffs = dom4.ifft(a_ev - b_ev * fb)    # deg <= 3k-3, vanishes on K
    # divide by v_K = X^k - 1: blocks q = q0 + X^k q1 + X^2k q2 + X^3k q3
    # -> h = (q1+q2+q3) + X^k (q2+q3) + X^2k q3
    qL = q_coeffs.limbs
    q0, q1, q2, q3 = (FpArray(qL[i * k:(i + 1) * k], FR, q_coeffs.bound)
                      for i in range(4))
    h2 = q3
    h1 = q2 + h2
    h0 = q1 + h1
    # deg q <= 3k-3 so q3 = 0 and deg h <= 2k-3: keep 2k-1 coeffs
    h3_poly = FpArray(jnp.concatenate(
        [h0.limbs, h1.limbs], axis=-2)[:2 * k - 1], FR,
        max(h0.bound, h1.bound))

    def com(poly):
        pt = M_.sw_msm(dsrs.powers[0:poly.shape[-1]], poly)
        return tuple(int(x) for x in pt.to_affine_ints()[0])

    # deg(g3) <= k-2 (k-1 coefficients), enforced by the shifted commitment
    g3 = FpArray(g3.limbs[:k - 1], FR, g3.bound)

    def com_shift(poly, shift):
        pt = M_.sw_msm(dsrs.powers[shift:shift + poly.shape[-1]], poly)
        return tuple(int(x) for x in pt.to_affine_ints()[0])
    return dict(sigma=sigma, com_g3=com(g3), com_h3=com(h3_poly),
                com_g3_shift=com_shift(g3, D - (k - 2)),
                g3_poly=g3, h3_poly=h3_poly, k=k)


def _matrix_sumcheck_identity(mic: MatrixIndexComms, mp: dict,
                              alpha: int, beta: int, beta3: int) -> bool:
    """Check the committed sumcheck identity at beta3 from the published
    evaluations (the KZG opening itself is verified in the batched check)."""
    k = mic.k_size
    ev3 = mp["evals"]
    row_b = ev3["row"]
    col_b = ev3["col"]
    val_b = ev3["val"]
    g3_b = ev3["g3"]
    h3_b = ev3["h3"]
    sigma = int(mp["sigma"]) % R
    vk_b3 = (pow(beta3, k, R) - 1) % R
    lhs = (val_b * col_b
           - (alpha - row_b) % R * ((beta - col_b) % R) % R
           * ((beta3 * g3_b + sigma * pow(k, -1, R)) % R)) % R
    return lhs == h3_b * vk_b3 % R


# ---------------------------------------------------------------- internals


def _apply(x: MpcFp, fn) -> MpcFp:
    mac = None if x.mac is None else fn(x.mac)
    return MpcFp(fn(x.value), x.visibility, mac)


def _pad_pub(x: FpArray, n: int):
    import jax.numpy as jnp
    d = x.shape[-1]
    if d == n:
        return x
    pad = jnp.zeros(x.limbs.shape[:-2] + (n - d, x.limbs.shape[-1]),
                    jnp.uint32)
    return FpArray(jnp.concatenate([jnp.asarray(x.limbs), pad], axis=-2),
                   x.spec, x.bound)


def _shift_block(x: MpcFp, k: int) -> MpcFp:
    """Drop the first k coefficients: out_i = x_{i+k}."""
    def f(fp: FpArray):
        return FpArray(fp.limbs[..., k:, :], fp.spec, fp.bound)
    return _apply(x, f)


def _scale(x: MpcFp, c: FpArray) -> MpcFp:
    return _apply(x, lambda f: f * c)


def _lincomb(xs, coeffs):
    acc = None
    for x, c in zip(xs, coeffs):
        term = _scale(x, c)
        acc = term if acc is None else acc + term
    return acc


def _scalar_int(v: MpcFp) -> int:
    opened = v.reveal() if v.visibility == SHARED else v.value
    return int(np.asarray(opened.to_ints()).reshape(-1)[0])


def _u_H_row(alpha: int, dom: Domain) -> FpArray:
    """Evals over H of u_H(alpha, X) = (v_H(alpha) - v_H(X)) / (alpha - X):
    on H, v_H(X)=0, so u_H(alpha, h) = v_H(alpha)/(alpha - h)."""
    n = dom.n
    vh_a = (pow(alpha, n, R) - 1) % R
    vals = []
    w = 1
    for _ in range(n):
        vals.append(vh_a * pow((alpha - w) % R, -1, R) % R)
        w = w * dom.omega % R
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def _u_H_point(alpha: int, beta: int, n: int) -> int:
    if alpha == beta:
        return n * pow(alpha, n - 1, R) % R
    va = (pow(alpha, n, R) - 1) % R
    vb = (pow(beta, n, R) - 1) % R
    return (va - vb) * pow((alpha - beta) % R, -1, R) % R


def _rstar_evals(index: MarlinIndex, u_alpha: FpArray, eta, n) -> FpArray:
    """Public evals over H of sum_M eta_M (M^T r_alpha): r*(h) =
    sum_rows u_alpha[row] * M[row, h] (host; matrices are public)."""
    ua = [int(x) for x in np.asarray(u_alpha.to_ints()).reshape(-1)]
    out = [0] * n
    for (rows, cols, coeffs), e in zip(index.matrices, eta):
        for r_i, c_i, coef in zip(rows, cols, coeffs):
            out[c_i] = (out[c_i] + e * ua[r_i] % R * int(coef)) % R
    return FpArray.from_int(FR, np.asarray(out, dtype=object))


def _rstar_eval_host(index: MarlinIndex, alpha: int, eta, beta: int) -> int:
    """r*(beta) = sum_M eta_M sum_{(r,c,v)} u_H(alpha, omega^r) * v * L_c(beta).

    L_c(beta) = v_H(beta) * omega^c / (n (beta - omega^c)).
    """
    n = index.domain_n
    omega = SF.root_of_unity(R, FR.generator, FR.two_adicity, n)
    vh_b = (pow(beta, n, R) - 1) % R
    vh_a = (pow(alpha, n, R) - 1) % R
    ninv = pow(n, -1, R)
    # caches
    upow = {}
    lpow = {}
    total = 0
    for (rows, cols, coeffs), e in zip(index.matrices, eta):
        for r_i, c_i, coef in zip(rows, cols, coeffs):
            if r_i not in upow:
                wr = pow(omega, int(r_i), R)
                upow[r_i] = vh_a * pow((alpha - wr) % R, -1, R) % R
            if c_i not in lpow:
                wc = pow(omega, int(c_i), R)
                lpow[c_i] = vh_b * wc % R * ninv % R * pow(
                    (beta - wc) % R, -1, R) % R
            total = (total + e * upow[r_i] % R * int(coef) % R * lpow[c_i]) % R
    return total


def _shift_down(x: MpcFp) -> MpcFp:
    import jax.numpy as jnp

    def f(fp: FpArray):
        limbs = jnp.concatenate(
            [fp.limbs[..., 1:, :],
             jnp.zeros_like(fp.limbs[..., :1, :])], axis=-2)
        return FpArray(limbs, fp.spec, fp.bound)
    return _apply(x, f)
