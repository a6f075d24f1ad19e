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
        for name in ("z", "za", "zb", "zc"):
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
