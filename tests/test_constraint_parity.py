"""Constraint-count parity with the reference's published table
(`/root/reference/docs/benchmark.md:35-46`):

    MySecretInputCircuit   6,574      PedersenComCircuit  2,544
    MyCircuit              5,094      KeyPublicize (n=3) 15,266
    DivinationCircuit (3) 22,249

Circuits are built here at REFERENCE parameters (full 253-bit message bit
width, 253 randomness bits, per-input Pedersen commitment checks) and the
counts must land within a stated tolerance.  Known deltas, justified:
our complete-Edwards affine adds cost 7 constraints vs ark's ~5/bit
Montgomery-ladder Pedersen windows — partially closed by the 2-bit window
lookup (`pedersen_gadget.py:two_bit_window_add_constant`), leaving ~10%
overhead per commitment.
"""

import jax
import numpy as np
import pytest

from zkmpc_tpu.crypto import pedersen as PD
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark.gadgets import Boolean, FpVar
from zkmpc_tpu.snark.r1cs import ConstraintSystem

pytestmark = pytest.mark.slow

TOL = (0.70, 1.40)           # accepted ratio band vs the reference count
NB = 253                     # full-width bits (BLS12-377 Fr: 253)


def _report(name, got, want):
    ratio = got / want
    print(f"{name}: {got} constraints vs reference {want} "
          f"(ratio {ratio:.3f})")
    assert TOL[0] <= ratio <= TOL[1], \
        f"{name}: {got} vs reference {want} (ratio {ratio:.3f})"


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def _pub(v):
    return MpcFp.const(FR, int(v))


def _rbools(cs, r_int, nbits=NB):
    return [Boolean.new_witness(cs, _pub((r_int >> i) & 1))
            for i in range(nbits)]


def _pp():
    return PD.PedersenParams.sample(1)


def test_pedersen_com_circuit_count():
    from zkmpc_tpu.circuits.pedersen_gadget import pedersen_com_circuit
    with scope():
        pp = _pp()
        m, r = 123456789, 987654321
        com = PD.commit_public_ints(pp, m, r)
        cs = ConstraintSystem(FR)
        x = FpVar.new_witness(cs, _pub(m))
        pedersen_com_circuit(cs, x, _rbools(cs, r), com, pp,
                             jax.random.PRNGKey(0), nbits=None)
        _report("PedersenComCircuit", len(cs.constraints), 2544)
        assert cs.is_satisfied_ints()


def test_my_circuit_count():
    from zkmpc_tpu import inputs as IN
    from zkmpc_tpu.circuits import my_circuit
    with scope():
        pp = _pp()
        a, b = 3, 5
        ra, rb = 77, 99
        a_iwc = IN.InputWithCommit(
            0, _pub(a), MpcFp.const(FR, np.asarray(
                [(ra >> i) & 1 for i in range(NB)], dtype=object)),
            PD.commit_public_ints(pp, a, ra))
        b_iwc = IN.InputWithCommit(
            1, _pub(b), MpcFp.const(FR, np.asarray(
                [(rb >> i) & 1 for i in range(NB)], dtype=object)),
            PD.commit_public_ints(pp, b, rb))
        cs = ConstraintSystem(FR)
        my_circuit.build(cs, a_iwc, b_iwc, a * b, pp, jax.random.PRNGKey(1),
                         com_nbits=None)
        _report("MyCircuit", len(cs.constraints), 5094)


def test_key_publicize_circuit_count():
    from zkmpc_tpu.circuits import werewolf as WC
    with scope():
        pp = _pp()
        n = 3
        xs, ys = [5, 0, 0], [6, 0, 0]
        rs = list(range(10, 10 + 2 * n))
        coms = [PD.commit_public_ints(pp, v, r)
                for v, r in zip(xs + ys, rs)]
        rand = [MpcFp.const(FR, np.asarray([(r >> i) & 1 for i in range(NB)],
                                           dtype=object)) for r in rs]
        cs = ConstraintSystem(FR)
        WC.key_publicize_circuit(
            cs, [_pub(v) for v in xs], [_pub(v) for v in ys],
            [_pub(v) for v in (1, 0, 0)], 5, 6,
            pedersen_pp=pp, xy_randomness=rand, xy_commitments=coms,
            key=jax.random.PRNGKey(2), com_nbits=None)
        _report("KeyPublicizeCircuit(3)", len(cs.constraints), 15266)


def test_divination_circuit_count():
    from zkmpc_tpu.circuits import werewolf as WC
    from zkmpc_tpu.crypto import elgamal as EG
    from zkmpc_tpu.spec import curves as SC
    with scope():
        pp = _pp()
        n = 3
        keys = EG.keygen(3)
        r_int = 0x5A5A5
        nbits = 251                          # ed-on-bls12-377 scalar width
        r_bits = MpcFp.const(FR, np.asarray(
            [(r_int >> i) & 1 for i in range(nbits)], dtype=object))
        c1, c2 = EG.encrypt_ints(keys.pk, SC.TE_GEN, r_int)
        is_w = [_pub(v) for v in (0, 1, 0)]
        is_t = [_pub(v) for v in (0, 1, 0)]
        rs = list(range(30, 30 + 2 * n))
        coms = [PD.commit_public_ints(pp, v, r)
                for v, r in zip((0, 1, 0, 0, 1, 0), rs)]
        rand = [MpcFp.const(FR, np.asarray([(r >> i) & 1 for i in range(NB)],
                                           dtype=object)) for r in rs]
        cs = ConstraintSystem(FR)
        WC.divination_circuit(cs, is_w, is_t, r_bits, keys.pk,
                              c1, c2, jax.random.PRNGKey(3),
                              pedersen_pp=pp, wire_randomness=rand,
                              wire_commitments=coms, com_nbits=None)
        _report("DivinationCircuit(3)", len(cs.constraints), 22249)


def test_input_circuit_count():
    from zkmpc_tpu.circuits import input_circuit
    with scope():
        pp = _pp()
        x, r = 59, 1234
        com = PD.commit_public_ints(pp, x, r)
        cs = ConstraintSystem(FR)
        input_circuit.build(
            cs, _pub(x),
            MpcFp.const(FR, np.asarray([(r >> i) & 1 for i in range(NB)],
                                       dtype=object)),
            com, pp, 3, 100, jax.random.PRNGKey(4), n_r_bits=NB)
        _report("MySecretInputCircuit", len(cs.constraints), 6574)
