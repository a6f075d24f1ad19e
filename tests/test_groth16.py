"""End-to-end Groth16: local and 3-party collaborative prove + vanilla verify.

The e2e slice from SURVEY.md §7 stage 3/5: circuit -> R1CS -> QAP witness map
(NTT + Beaver) -> MSMs -> proof reveal -> pairing verification, with the
negative check (wrong public input must fail) mirroring the reference's
`mpc_test_prove_and_verify` (`src/groth16.rs:309-339`)."""

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc.share import (MpcContext, MpcFp, king_share, mpc_scope)
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark import groth16
from zkmpc_tpu.snark.r1cs import LC, ConstraintSystem

pytestmark = pytest.mark.slow  # compile-heavy prover tier

P = FR.p


def fp(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def build_mul_circuit(cs: ConstraintSystem, a_wire: MpcFp, b_wire: MpcFp,
                      c_pub: MpcFp):
    """MySimpleCircuit analogue (`src/circuits/circuit.rs:95-126`): a*b = c
    with c a public instance, plus a redundant square constraint."""
    c_var = cs.new_instance(c_pub)
    a_var = cs.new_witness(a_wire)
    b_var = cs.new_witness(b_wire)
    asq = a_wire * a_wire
    asq_var = cs.new_witness(asq)
    cs.enforce(LC.of(a_var), LC.of(b_var), LC.of(c_var))
    cs.enforce(LC.of(a_var), LC.of(a_var), LC.of(asq_var))
    return cs


def run_prove(n_parties: int, a_int: int, b_int: int):
    t = StackedTransport(n_parties)
    with mpc_scope(MpcContext(t, backend="semi")):
        cs = ConstraintSystem(FR)
        a_wire = king_share(fp(a_int), jax.random.PRNGKey(11))
        b_wire = king_share(fp(b_int), jax.random.PRNGKey(12))
        c_pub = MpcFp.const(FR, a_int * b_int % P)
        build_mul_circuit(cs, a_wire, b_wire, c_pub)
        assert cs.is_satisfied_ints()
        pk = groth16.setup(cs, seed=5)
        dpk = pk.device()
        proof = groth16.prove(dpk, cs, jax.random.PRNGKey(42))
        proof_ints = groth16.proof_to_ints(proof)
        instance = cs.instance_ints()
    return pk.vk, instance, proof_ints


@pytest.mark.parametrize("n_parties", [1, 3])
def test_groth16_prove_verify(n_parties):
    vk, instance, proof = run_prove(n_parties, 7, 6)
    assert groth16.verify(vk, instance, proof), "proof must verify"
    # negative: wrong public input
    bad = list(instance)
    bad[1] = (bad[1] + 1) % P
    assert not groth16.verify(vk, bad, proof), "wrong instance must fail"


def test_groth16_prove_verify_spdz():
    """Collaborative prove under the malicious-majority (SPDZ) backend:
    every open during the witness map / proof reveal accumulates MAC
    residues that must sum to zero (reference `malicious` feature swapping
    `AdditiveFieldShare` -> `SpdzFieldShare`, `src/lib.rs:11-23`)."""
    from zkmpc_tpu.mpc.rand import uniform_fp
    t = StackedTransport(3)
    alpha = uniform_fp(jax.random.PRNGKey(99), FR, (3,))
    c = MpcContext(t, backend="spdz", alpha_share=alpha,
                   mac_check_key=jax.random.PRNGKey(7))
    with mpc_scope(c):
        cs = ConstraintSystem(FR)
        a_wire = king_share(fp(7), jax.random.PRNGKey(21))
        b_wire = king_share(fp(6), jax.random.PRNGKey(22))
        c_pub = MpcFp.const(FR, 42)
        build_mul_circuit(cs, a_wire, b_wire, c_pub)
        assert cs.is_satisfied_ints()
        pk = groth16.setup(cs, seed=9)
        proof = groth16.prove(pk.device(), cs, jax.random.PRNGKey(43))
        proof_ints = groth16.proof_to_ints(proof)
        instance = cs.instance_ints()
        # MAC checks: queues must be non-empty (vacuous pass = round-2 bug)
        # and every accumulated residue must open to zero / infinity
        assert c.mac_residue_count > 0
        assert c.group_mac_residue_count > 0
        c.assert_field_macs(require_nonempty=True)
        c.assert_group_macs(require_nonempty=True)
    assert groth16.verify(pk.vk, instance, proof_ints)
