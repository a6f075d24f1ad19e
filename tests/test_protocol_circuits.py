"""MPC-native protocol circuits (reference `src/circuits/{equality_zero,
bit_decomposition,smaller_than,enforce_smaller_or_eq_than}.rs`): dual
local/shared synthesis, satisfiability, and one collaborative Groth16 proof.
"""

import jax
import numpy as np
import pytest

from zkmpc_tpu.circuits import protocol_circuits as PC
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, PUBLIC, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark.r1cs import ConstraintSystem

P = FR.p


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def shared_scalar(v, key):
    x = king_share(fr([v]), key)
    def f(fp):
        return FpArray(fp.limbs[..., 0, :], fp.spec, fp.bound)
    return MpcFp(f(x.value), x.visibility,
                 None if x.mac is None else f(x.mac))


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def test_equality_zero_circuit():
    with scope():
        cs = ConstraintSystem(FR)
        a = shared_scalar(0, jax.random.PRNGKey(0))
        PC.equality_zero_circuit(cs, a, jax.random.PRNGKey(1))
        assert cs.is_satisfied_ints()
        # negative: nonzero witness fails the constraint set
        cs2 = ConstraintSystem(FR)
        a2 = shared_scalar(7, jax.random.PRNGKey(2))
        PC.equality_zero_circuit(cs2, a2, jax.random.PRNGKey(3))
        assert not cs2.is_satisfied_ints()


def test_not_equality_zero_circuit():
    with scope():
        for v, seed in ((5, 0), (0, 1)):
            cs = ConstraintSystem(FR)
            a = shared_scalar(v, jax.random.PRNGKey(seed))
            PC.not_equality_zero_circuit(cs, a, jax.random.PRNGKey(seed + 10))
            assert cs.is_satisfied_ints()


@pytest.mark.slow
def test_bit_decomposition_circuit():
    with scope():
        cs = ConstraintSystem(FR)
        a = shared_scalar(0b110101, jax.random.PRNGKey(0))
        PC.bit_decomposition_circuit(cs, a, jax.random.PRNGKey(1))
        assert cs.is_satisfied_ints()


@pytest.mark.slow
def test_smaller_than_circuit():
    with scope():
        cs = ConstraintSystem(FR)
        a = shared_scalar(17, jax.random.PRNGKey(0))
        b = shared_scalar(42, jax.random.PRNGKey(1))
        res = shared_scalar(1, jax.random.PRNGKey(2))
        PC.smaller_than_circuit(cs, a, b, res, jax.random.PRNGKey(3))
        assert cs.is_satisfied_ints()


def test_smaller_eq_than_circuit():
    with scope():
        # value 11 <= bound 13, 8-bit decomposition
        bits = king_share(fr([(11 >> i) & 1 for i in range(8)]),
                          jax.random.PRNGKey(0))
        cs = ConstraintSystem(FR)
        PC.smaller_eq_than_circuit(cs, bits, 13)
        assert cs.is_satisfied_ints()
        # negative: 14 > 13
        bits2 = king_share(fr([(14 >> i) & 1 for i in range(8)]),
                           jax.random.PRNGKey(1))
        cs2 = ConstraintSystem(FR)
        PC.smaller_eq_than_circuit(cs2, bits2, 13)
        assert not cs2.is_satisfied_ints()


@pytest.mark.slow
def test_equality_zero_groth16_prove():
    from zkmpc_tpu.snark import groth16
    with scope():
        cs = ConstraintSystem(FR)
        a = shared_scalar(0, jax.random.PRNGKey(0))
        PC.equality_zero_circuit(cs, a, jax.random.PRNGKey(1))
        pk = groth16.setup(cs, seed=11)
        proof = groth16.prove(pk.device(), cs, jax.random.PRNGKey(2))
        proof_ints = groth16.proof_to_ints(proof)
        instance = cs.instance_ints()
    assert groth16.verify(pk.vk, instance, proof_ints)


@pytest.mark.slow
def test_equality_zero_marlin_prove():
    """Collaborative Marlin proof of the equality-zero protocol circuit
    (reference `src/marlin.rs:241-262` test_equality_zero)."""
    from zkmpc_tpu.snark import marlin
    with scope():
        cs = ConstraintSystem(FR)
        a = shared_scalar(0, jax.random.PRNGKey(0))
        PC.equality_zero_circuit(cs, a, jax.random.PRNGKey(1))
        index = marlin.setup_and_index(cs, seed=13)
        proof = marlin.prove(index, cs, jax.random.PRNGKey(2))
        instance = cs.instance_ints()
    assert marlin.verify(index, instance, proof)


@pytest.mark.slow
def test_smaller_eq_than_marlin_prove():
    """Collaborative Marlin proof of the smaller-or-equal circuit
    (reference `src/marlin.rs:322-346` test_smaller_eq_than)."""
    from zkmpc_tpu.snark import marlin
    with scope():
        bits = king_share(fr([(11 >> i) & 1 for i in range(8)]),
                          jax.random.PRNGKey(0))
        cs = ConstraintSystem(FR)
        PC.smaller_eq_than_circuit(cs, bits, 13)
        index = marlin.setup_and_index(cs, seed=17)
        proof = marlin.prove(index, cs, jax.random.PRNGKey(3))
        instance = cs.instance_ints()
    assert marlin.verify(index, instance, proof)
