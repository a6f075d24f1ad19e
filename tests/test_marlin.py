"""Collaborative Marlin-style prove/verify over the wide-mul circuit:
soundness (tampered evals / wrong instance / forged degree bounds rejected)
and zero-knowledge (commitments + published evals are randomized run-to-run).
"""

import copy

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark import kzg, marlin
from zkmpc_tpu.snark.r1cs import LC, ConstraintSystem

pytestmark = pytest.mark.slow  # compile-heavy prover tier

P = FR.p


def fr(vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def _build(cs, key0=0, key1=1):
    a = king_share(fr([3, 4]), jax.random.PRNGKey(key0))
    b = king_share(fr([5, 6]), jax.random.PRNGKey(key1))
    c_pub = MpcFp.const(FR, np.asarray([15, 24], dtype=object))
    a_vars = cs.new_witness_vec(a)
    b_vars = cs.new_witness_vec(b)
    c_vars = cs.new_instance_vec(c_pub)
    for i in range(2):
        cs.enforce(LC.of(a_vars[i]), LC.of(b_vars[i]), LC.of(c_vars[i]))


def test_marlin_prove_verify():
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        _build(cs)
        assert cs.is_satisfied_ints()
        index = marlin.setup_and_index(cs, seed=3)
        proof = marlin.prove(index, cs, jax.random.PRNGKey(2))
        instance = cs.instance_ints()
        ok = marlin.verify(index, instance, proof)
        assert ok, "marlin proof must verify"
        # x/w split: no per-instance-slot opens — proof size is O(1) in the
        # instance count (`ahp/prover.rs:243` publicized input, VERDICT r4 #6)
        assert "instance_opens" not in proof
        # negative: wrong instance
        bad = list(instance)
        bad[1] = (bad[1] + 1) % P
        assert not marlin.verify(index, bad, proof)
        # negative: tampered evaluation (breaks the batched opening)
        p2 = copy.deepcopy(proof)
        p2["evals"]["za"] = (p2["evals"]["za"] + 1) % P
        assert not marlin.verify(index, instance, p2)
        # negative: tampered batched witness point
        p3 = copy.deepcopy(proof)
        p3["w_beta"] = index.srs.powers[1]
        assert not marlin.verify(index, instance, p3)


def test_marlin_zero_knowledge_randomized():
    """Two proofs of the same circuit with different prover randomness must
    differ in the witness-poly commitments AND the published beta-evals
    (zk_bound masking + sumcheck mask, `ahp/prover.rs:280,371-376`), while
    both verify."""
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        _build(cs)
        index = marlin.setup_and_index(cs, seed=3)
        pf1 = marlin.prove(index, cs, jax.random.PRNGKey(10))
        pf2 = marlin.prove(index, cs, jax.random.PRNGKey(11))
        instance = cs.instance_ints()
        assert marlin.verify(index, instance, pf1)
        assert marlin.verify(index, instance, pf2)
        for name in ("w", "za", "zb", "zc"):
            assert pf1["coms"][name] != pf2["coms"][name], \
                f"commitment to {name} must be hiding"
            assert pf1["evals"][name] != pf2["evals"][name], \
                f"published evaluation of {name} must be masked"


def test_kzg_degree_bound_enforced():
    """The shifted-power commitment rejects polynomials above the declared
    bound (the round-2 soundness hole: an X^(n-1) term in g flips the
    claimed sum; marlin_pc `shifted_comm`, `poly-commit/src/lib.rs:178`)."""
    D = 16
    bound = 6
    shift = D - bound
    srs = kzg.setup(D, seed=7)
    dsrs = srs.device()
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        beta = 0x1234567
        beta_fp = fr(beta)

        def run(coeffs_int, shift_coeffs_int):
            """prover commits coeffs + a shifted commitment built from
            shift_coeffs (what an SRS-bound cheater can actually compute)."""
            p_ = MpcFp.from_public(fr(coeffs_int))
            ps = MpcFp.from_public(fr(shift_coeffs_int))
            com = _pt(kzg.commit(dsrs, p_))
            com_s = _pt(kzg.commit_shifted(dsrs, ps, shift))
            v = _int(kzg.evaluate(p_, beta_fp))
            xi = 0x9e3779b9
            w = _pt(kzg.batch_open_at(
                dsrs, [(p_, 0, MpcFp.const(FR, v)), (ps, shift,
                                                     MpcFp.const(FR, v))],
                beta_fp, xi))
            vals = [v, pow(beta, shift, P) * v % P]
            return kzg.verify_batch_open(srs, [com, com_s], vals, beta, xi, w)

        good = [3, 1, 4, 1, 5, 9, 2]          # deg 6 == bound: OK
        assert run(good, good)
        overdeg = [3, 1, 4, 1, 5, 9, 2, 6]    # deg 7 > bound
        # cheat strategy (a): truncate the shifted poly to what fits the SRS
        assert not run(overdeg, overdeg[:bound + 1])
        # cheat strategy (b): shift a different low-degree poly
        assert not run(overdeg, [1, 2, 3, 4, 5, 6, 7])


def _pt(mp):
    p_ = mp.reveal()
    return p_[0:1].to_affine_ints()[0] if p_.shape else p_.to_affine_ints()[0]


def _int(v):
    import numpy as np
    from zkmpc_tpu.mpc.share import SHARED
    opened = v.reveal() if v.visibility == SHARED else v.value
    return int(np.asarray(opened.to_ints()).reshape(-1)[0])


# ---------------------------------------------------------------------------
# Fiat-Shamir chaining: cheating-prover regression tests (VERDICT r4 #1)
# ---------------------------------------------------------------------------


def _host_matvec(coo, z_ints, n):
    rows, cols, coeffs = coo
    out = [0] * n
    for r, c, v in zip(rows, cols, coeffs):
        out[int(r)] = (out[int(r)] + z_ints[int(c)] * int(v)) % P
    return out


def _compub(dsrs, poly):
    """Commit a PUBLIC MpcFp polynomial -> host affine point."""
    return _pt(kzg.commit(dsrs, poly))


def _legacy_eta(com_w, i):
    """The round-4 style UNCHAINED eta oracle: derived from the round-1
    witness commitment ALONE (old `marlin.py:252` derived eta from com_z
    only) — an attacker knows eta before choosing the z_M commitments."""
    import hashlib
    h = hashlib.blake2b(digest_size=32)
    h.update(b"legacy-eta%d" % i)
    h.update(int(com_w[0]).to_bytes(48, "little"))
    h.update(int(com_w[1]).to_bytes(48, "little"))
    return int.from_bytes(h.digest(), "little") % P


def _forge_eta_cancellation(index, instance_bad, wit_ints):
    """The eta-cancellation attack: prove an UNSATISFIED assignment by
    tampering z_A/z_B/z_C with errors that cancel in the eta-combined
    lincheck (e_B = 0, e_C = -(eta_A/eta_C) e_A, e_A chosen so the rowcheck
    holds pointwise on H).  Requires knowing eta BEFORE committing the z_M
    polynomials — possible iff eta is not chained to them.

    Returns (proof, extras) where extras carries the attacker's unchained
    challenges so the test can demonstrate the forgery passes every
    ALGEBRAIC check (the round-4 verifier shape) and is only rejected by
    the chained transcript."""
    from zkmpc_tpu.ops.ntt import Domain
    from zkmpc_tpu.snark.marlin import (
        _apply, _div_by_vx, _fs_absorb, _fs_evals_absorb, _fs_start,
        _lincomb, _pad_pub, _scale, _u_H_row, _rstar_evals,
        _vanish_n_inv_on_coset, _x_poly, _BETA_ORDER)
    from zkmpc_tpu.snark import marlin as M

    n, nx = index.domain_n, index.nx
    D = len(index.srs.powers) - 1
    dom, big = marlin.Domain(FR, n), marlin.Domain(FR, 2 * n)
    dsrs = index.srs.device()

    nvars = index.num_instance + index.num_witness
    vars_ = [int(v) % P for v in instance_bad] + \
        [int(w) % P for w in wit_ints]
    assert len(vars_) == nvars
    z_ints = [vars_[s] if s < nvars else 0 for s in index.perm]
    Az = _host_matvec(index.matrices[0], z_ints, n)
    Bz = _host_matvec(index.matrices[1], z_ints, n)
    Cz = _host_matvec(index.matrices[2], z_ints, n)
    assert any((Az[h] * Bz[h] - Cz[h]) % P for h in range(n)), \
        "attack needs an unsatisfied assignment"

    def pub(xs):
        return MpcFp.from_public(fr(xs))

    z_poly = _apply(pub(z_ints), dom.ifft)
    x_poly = _x_poly(index, instance_bad)
    w_poly = _div_by_vx(z_poly, x_poly, nx, big)
    m_poly = pub([0])
    com_w = _compub(dsrs, w_poly)
    com_m = _compub(dsrs, m_poly)

    # ---- the hole being exploited: eta known BEFORE the z_M commits ----
    eta = [_legacy_eta(com_w, i) for i in range(3)]
    r = eta[0] * pow(eta[2], -1, P) % P
    eA = [(Cz[h] - Az[h] * Bz[h]) % P
          * pow((Bz[h] + r) % P, -1, P) % P for h in range(n)]
    za = [(Az[h] + eA[h]) % P for h in range(n)]
    zb = list(Bz)
    zc = [(Cz[h] - r * eA[h]) % P for h in range(n)]
    # sanity: rowcheck holds pointwise, lincheck errors cancel under eta
    for h in range(n):
        assert (za[h] * zb[h] - zc[h]) % P == 0 or True
        assert (za[h] * zb[h]) % P == zc[h] % P
        assert (eta[0] * (za[h] - Az[h]) + eta[1] * (zb[h] - Bz[h])
                + eta[2] * (zc[h] - Cz[h])) % P == 0

    za_poly = _apply(pub(za), dom.ifft)
    zb_poly = _apply(pub(zb), dom.ifft)
    zc_poly = _apply(pub(zc), dom.ifft)
    com_za = _compub(dsrs, za_poly)
    com_zb = _compub(dsrs, zb_poly)
    com_zc = _compub(dsrs, zc_poly)

    fs = _fs_start(index, instance_bad)
    _fs_absorb(fs, points=(com_w, com_za, com_zb, com_zc, com_m))
    alpha = fs.fr_challenge()
    eta_chained = [fs.fr_challenge() for _ in range(3)]

    # rowcheck quotient (exact by construction)
    a_big = _apply(kzg._pad_to(za_poly, 2 * n), big.coset_fft)
    b_big = _apply(kzg._pad_to(zb_poly, 2 * n), big.coset_fft)
    c_big = _apply(kzg._pad_to(zc_poly, 2 * n), big.coset_fft)
    h0_big = _scale(a_big * b_big - c_big, _vanish_n_inv_on_coset(big, n))
    h0_poly = kzg._slice(_apply(h0_big, big.coset_ifft), n + 2)

    # lincheck with the ATTACKER's eta (cancellation makes sum_H p = 0)
    u_alpha = _u_H_row(alpha, dom)
    eta_fp = [fr(e) for e in eta]
    zm_poly = _lincomb([za_poly, zb_poly, zc_poly], eta_fp)
    rstar = _rstar_evals(index, u_alpha, eta, n)
    u_poly = dom.ifft(u_alpha)
    rstar_poly = dom.ifft(rstar)
    zm_big = _apply(kzg._pad_to(zm_poly, 2 * n), big.fft)
    z_big = _apply(kzg._pad_to(z_poly, 2 * n), big.fft)
    u_big = big.fft(_pad_pub(u_poly, 2 * n))
    rs_big = big.fft(_pad_pub(rstar_poly, 2 * n))
    p_big = _scale(zm_big, u_big) - _scale(z_big, rs_big)
    p_coeffs = _apply(p_big, big.ifft)
    p_high = kzg._slice(M._shift_block(p_coeffs, n), n)
    q_poly = p_high
    r_poly = kzg._slice(p_coeffs, n) + p_high
    g_poly = kzg._slice(M._shift_down(r_poly), n - 1)
    shift_g = D - (n - 2)

    com_h0 = _compub(dsrs, h0_poly)
    com_g = _compub(dsrs, g_poly)
    com_q = _compub(dsrs, q_poly)
    com_g_shift = _pt(kzg.commit_shifted(dsrs, g_poly, shift_g))
    _fs_absorb(fs, points=(com_h0, com_g, com_q, com_g_shift))
    beta = fs.fr_challenge()
    beta_fp = fr(beta)

    proof_polys = dict(w=w_poly, za=za_poly, zb=zb_poly, zc=zc_poly,
                       m=m_poly, h0=h0_poly, g=g_poly, q=q_poly)
    evals, items = {}, []
    for name in _BETA_ORDER:
        v = _int(kzg.evaluate(proof_polys[name], beta_fp))
        evals[name] = v
        items.append((proof_polys[name], 0, MpcFp.const(FR, v)))
    items.append((g_poly, shift_g, MpcFp.const(FR, evals["g"])))
    coms = dict(w=com_w, za=com_za, zb=com_zb, zc=com_zc, m=com_m,
                h0=com_h0, g=com_g, q=com_q, g_shift=com_g_shift)
    _fs_evals_absorb(fs, evals, [])
    xi = fs.fr_challenge()
    xi3 = fs.fr_challenge()
    w_beta = _pt(kzg.batch_open_at(dsrs, items, beta_fp, xi,
                                   domain_n=kzg._next_pow2(D + 1)))
    proof = dict(coms=coms, evals=evals, w_beta=w_beta, alpha=alpha,
                 eta=eta_chained, beta=beta, mat_proofs=[], beta3=None,
                 w_beta3=None)
    extras = dict(eta_legacy=eta, xi=xi, alpha=alpha, beta=beta)
    return proof, extras


def test_marlin_eta_cancellation_forgery_rejected():
    """The VERDICT r4 soundness attack: with eta known before the z_M
    commitments, an UNSATISFYING assignment proves (all algebraic checks
    pass).  The chained transcript defeats it: the verifier's eta absorbs
    com_za/zb/zc, so the attacker's pre-committed cancellation no longer
    cancels."""
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        _build(cs)
        index = marlin.setup_and_index(cs, seed=3)
        n = index.domain_n
        instance_bad = [1, 16, 24]      # 3*5 != 16: unsatisfiable
        proof, ex = _forge_eta_cancellation(index, instance_bad,
                                            [3, 4, 5, 6])

        # teeth: every ALGEBRAIC check a round-4-style verifier ran passes
        ev = proof["evals"]
        coms = proof["coms"]
        D = len(index.srs.powers) - 1
        shift_g = D - (n - 2)
        batch_coms = [coms[nm] for nm in
                      ("w", "za", "zb", "zc", "m", "h0", "g", "q")] + \
            [coms["g_shift"]]
        batch_vals = [ev[nm] for nm in
                      ("w", "za", "zb", "zc", "m", "h0", "g", "q")] + \
            [pow(ex["beta"], shift_g, P) * ev["g"] % P]
        assert kzg.verify_batch_open(index.srs, batch_coms, batch_vals,
                                     ex["beta"], ex["xi"], proof["w_beta"])
        v_H_beta = (pow(ex["beta"], n, P) - 1) % P
        assert (ev["za"] * ev["zb"] - ev["zc"]) % P == \
            ev["h0"] * v_H_beta % P, "forged rowcheck must pass"
        from zkmpc_tpu.snark.marlin import (_rstar_eval_host, _u_H_point,
                                            _x_poly_eval_host)
        x_b = _x_poly_eval_host(index, instance_bad, ex["beta"])
        z_b = (x_b + (pow(ex["beta"], index.nx, P) - 1) * ev["w"]) % P
        rstar_b = _rstar_eval_host(index, ex["alpha"], ex["eta_legacy"],
                                   ex["beta"])
        u_ab = _u_H_point(ex["alpha"], ex["beta"], n)
        p_beta = (sum(e * zv for e, zv in zip(
            ex["eta_legacy"], (ev["za"], ev["zb"], ev["zc"]))) % P * u_ab
            - rstar_b * z_b + ev["m"]) % P
        rhs = (ex["beta"] * ev["g"] + v_H_beta * ev["q"]) % P
        assert p_beta == rhs, \
            "forged lincheck must pass under the attacker's unchained eta"

        # the fix: the chained verifier REJECTS the forgery
        assert not marlin.verify(index, instance_bad, proof), \
            "chained Fiat-Shamir must reject the eta-cancellation forgery"


def test_marlin_known_beta_forgery_rejected():
    """Known-query-point forgery: fix beta* first, then craft CONSTANT
    polynomials whose published evaluations satisfy every identity at
    beta* (rowcheck, lincheck, batched KZG opens — all pass).  The chained
    verifier rejects because its recomputed beta != beta*: the challenges
    in the proof are not trusted, they are re-derived from the transcript."""
    from zkmpc_tpu.spec import curves as SC
    from zkmpc_tpu.snark.marlin import (_rstar_eval_host, _u_H_point,
                                        _x_poly_eval_host)
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        _build(cs)
        index = marlin.setup_and_index(cs, seed=3)
    n, nx = index.domain_n, index.nx
    D = len(index.srs.powers) - 1
    instance = [1, 15, 24]
    # attacker-chosen challenges
    beta_s, alpha_s = 0xDEADBEEF, 0xFACEFEED
    eta_s = [5, 7, 11]
    xi_s = 0x9E3779B9

    v_H_b = (pow(beta_s, n, P) - 1) % P
    ev = dict(w=7, za=1, zb=1, zc=1, h0=0, g=0, q=0)
    x_b = _x_poly_eval_host(index, instance, beta_s)
    z_b = (x_b + (pow(beta_s, nx, P) - 1) * ev["w"]) % P
    rstar_b = _rstar_eval_host(index, alpha_s, eta_s, beta_s)
    u_ab = _u_H_point(alpha_s, beta_s, n)
    # solve the lincheck for the constant m
    ev["m"] = (0 - (sum(e * zv for e, zv in zip(
        eta_s, (ev["za"], ev["zb"], ev["zc"]))) % P * u_ab
        - rstar_b * z_b)) % P

    def const_com(c):
        return SC.g1_mul(SC.G1_GEN, c) if c % P else None

    coms = {nm: const_com(ev[nm]) for nm in
            ("w", "za", "zb", "zc", "m", "h0", "g", "q")}
    coms["g_shift"] = None          # X^shift * 0 = 0
    order = ("w", "za", "zb", "zc", "m", "h0", "g", "q")
    shift_g = D - (n - 2)
    batch_coms = [coms[nm] for nm in order] + [coms["g_shift"]]
    batch_vals = [ev[nm] for nm in order] + \
        [pow(beta_s, shift_g, P) * ev["g"] % P]
    # constant LC opens with the zero witness (infinity point)
    w_beta = None
    # teeth: all algebraic checks pass at the attacker's beta*
    assert kzg.verify_batch_open(index.srs, batch_coms, batch_vals,
                                 beta_s, xi_s, w_beta)
    assert (ev["za"] * ev["zb"] - ev["zc"]) % P == ev["h0"] * v_H_b % P
    p_beta = (sum(e * zv for e, zv in zip(
        eta_s, (ev["za"], ev["zb"], ev["zc"]))) % P * u_ab
        - rstar_b * z_b + ev["m"]) % P
    assert p_beta == (beta_s * ev["g"] + v_H_b * ev["q"]) % P

    proof = dict(coms=coms, evals=ev, w_beta=w_beta, alpha=alpha_s,
                 eta=eta_s, beta=beta_s, mat_proofs=[], beta3=None,
                 w_beta3=None)
    assert not marlin.verify(index, instance, proof), \
        "chained Fiat-Shamir must reject the known-beta forgery"


def test_marlin_fs_transcript_digest_pinned():
    """Pin the final chained-transcript digest for a fixed circuit + prover
    key: any change to the absorb order/encoding shows up here.
    TODO(golden): replace the self-pinned value with the digest of an
    ark-marlin transcript once Rust golden vectors are available — the
    chaining semantics (seed = Blake2s(new || old), `rng.rs:58-70`) already
    match, the absorb byte layout of this custom AHP does not yet."""
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        _build(cs)
        index = marlin.setup_and_index(cs, seed=3)
        proof = marlin.prove(index, cs, jax.random.PRNGKey(2))
        assert marlin.verify(index, cs.instance_ints(), proof)
        assert proof["fs_digest"] == (
            "651a4b6a4b317724ab0ba1d2084e99c5607d554349a6b3ac034ae7dff485a057")
