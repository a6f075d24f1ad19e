"""End-to-end: MySecretInputCircuit (range check + Pedersen commitment)
proved collaboratively with Groth16 and verified with the vanilla verifier —
the reference's flagship flow (`src/main.rs`, `src/circuits/input_circuit.rs`).
"""

import jax
import numpy as np
import pytest

from zkmpc_tpu.circuits import input_circuit
from zkmpc_tpu.crypto import pedersen
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark import groth16
from zkmpc_tpu.snark.r1cs import ConstraintSystem

P = FR.p


def fr(vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


@pytest.mark.slow
def test_input_circuit_prove_verify():
    pp = pedersen.PedersenParams.sample()
    x_int = 5
    r_int = 0b1011
    commitment = pedersen.commit_public_ints(pp, x_int, r_int)

    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        x = king_share(fr([x_int]), jax.random.PRNGKey(0))
        x = _scalar(x)
        r_bits = king_share(fr([(r_int >> i) & 1 for i in range(16)]),
                            jax.random.PRNGKey(1))
        input_circuit.build(cs, x, r_bits, commitment, pp,
                            lower=3, upper=7, key=jax.random.PRNGKey(2))
        assert cs.is_satisfied_ints(), "circuit unsatisfied"
        pk = groth16.setup(cs, seed=9)
        proof = groth16.prove(pk.device(), cs, jax.random.PRNGKey(3))
        proof_ints = groth16.proof_to_ints(proof)
        instance = cs.instance_ints()
    assert groth16.verify(pk.vk, instance, proof_ints)
    bad = list(instance)
    bad[1] = (bad[1] + 1) % P
    assert not groth16.verify(pk.vk, bad, proof_ints)


def _scalar(x):
    """[1]-shaped wire -> scalar shape ()."""
    from zkmpc_tpu.mpc.share import MpcFp
    def f(fp):
        return FpArray(fp.limbs[..., 0, :], fp.spec, fp.bound)
    return MpcFp(f(x.value), x.visibility,
                 None if x.mac is None else f(x.mac))
