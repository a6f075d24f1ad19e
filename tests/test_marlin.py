"""Collaborative Marlin-style prove/verify over the wide-mul circuit."""

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark import marlin
from zkmpc_tpu.snark.r1cs import LC, ConstraintSystem

P = FR.p


def fr(vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def test_marlin_prove_verify():
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        cs = ConstraintSystem(FR)
        a = king_share(fr([3, 4]), jax.random.PRNGKey(0))
        b = king_share(fr([5, 6]), jax.random.PRNGKey(1))
        c_pub = MpcFp.const(FR, np.asarray([15, 24], dtype=object))
        a_vars = cs.new_witness_vec(a)
        b_vars = cs.new_witness_vec(b)
        c_vars = cs.new_instance_vec(c_pub)
        for i in range(2):
            cs.enforce(LC.of(a_vars[i]), LC.of(b_vars[i]), LC.of(c_vars[i]))
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
        # negative: tampered evaluation
        import copy
        p2 = copy.deepcopy(proof)
        w, v = p2["opens"]["za"]
        p2["opens"]["za"] = (w, (v + 1) % P)
        assert not marlin.verify(index, instance, p2)
