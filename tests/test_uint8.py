"""MpcU8 byte wires (reference `wire/uint8.rs`) + Pedersen CRH gadget."""

import jax
import numpy as np

from zkmpc_tpu.crypto import pedersen as PD
from zkmpc_tpu.mpc.share import MpcContext, mpc_scope, king_share
from zkmpc_tpu.mpc.uint8 import MpcU8, bytes_to_u8
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def test_u8_ops():
    with scope():
        a = MpcU8.from_public_ints(np.asarray([0b1100, 0xFF], dtype=object))
        b = MpcU8.from_public_ints(np.asarray([0b1010, 0x0F], dtype=object))
        assert a.xor(b).reveal_ints() == [0b0110, 0xF0]
        assert a.and_(b).reveal_ints() == [0b1000, 0x0F]
        assert a.or_(b).reveal_ints() == [0b1110, 0xFF]
        assert a.not_().reveal_ints() == [0xFF ^ 0b1100, 0x00]


def test_u8_shared_roundtrip():
    with scope():
        vals = [33, 200]
        bits = [[(v >> i) & 1 for i in range(8)] for v in vals]
        sh = king_share(FpArray.from_int(FR, np.asarray(bits, dtype=object)),
                        jax.random.PRNGKey(0))
        u = MpcU8(sh)
        assert u.reveal_ints() == vals


def test_crh_gadget_matches_host():
    from zkmpc_tpu.circuits.pedersen_gadget import pedersen_crh_gadget
    from zkmpc_tpu.crypto.pedersen import crh
    from zkmpc_tpu.snark.gadgets import Boolean, FpVar
    from zkmpc_tpu.snark.r1cs import ConstraintSystem
    from zkmpc_tpu.mpc import bits as B

    with scope():
        cp = PD.CrhParams.sample(8, seed=5)
        in_int = 0b10110011
        bits = king_share(FpArray.from_int(
            FR, np.asarray([(in_int >> i) & 1 for i in range(8)],
                           dtype=object)), jax.random.PRNGKey(1))
        # protocol-level CRH
        pt = crh(cp, bits)
        xy = pt.reveal_affine_ints()[0]
        # in-circuit CRH equals it
        cs = ConstraintSystem(FR)
        bools = [Boolean.new_witness(cs, B._index_last(bits, i))
                 for i in range(8)]
        out = pedersen_crh_gadget(cs, bools, cp)
        from zkmpc_tpu.mpc.share import MpcFp
        cx = FpVar.new_input(cs, MpcFp.const(FR, int(xy[0])))
        cy = FpVar.new_input(cs, MpcFp.const(FR, int(xy[1])))
        out.x.enforce_equal(cx)
        out.y.enforce_equal(cy)
        assert cs.is_satisfied_ints()


def test_two_to_one_crh_matches_host_and_gadget():
    """TwoToOneCRH = CRH(left || right) (reference `crh.rs:31-60`,
    `crh/pedersen/constraints.rs:93-121`)."""
    from zkmpc_tpu.circuits.pedersen_gadget import (
        pedersen_two_to_one_crh_gadget)
    from zkmpc_tpu.crypto.pedersen import (
        CrhParams, crh_public_ints, two_to_one_crh)
    from zkmpc_tpu.mpc import bits as B
    from zkmpc_tpu.mpc.share import MpcFp
    from zkmpc_tpu.snark.gadgets import Boolean, FpVar
    from zkmpc_tpu.snark.r1cs import ConstraintSystem

    with scope():
        cp = CrhParams.sample(16, seed=7)
        lv, rv = 0b1011, 0b0110
        lb = [(lv >> i) & 1 for i in range(8)]
        rb = [(rv >> i) & 1 for i in range(8)]
        left = king_share(FpArray.from_int(FR, np.asarray(lb, dtype=object)),
                          jax.random.PRNGKey(2))
        right = king_share(FpArray.from_int(FR, np.asarray(rb, dtype=object)),
                           jax.random.PRNGKey(3))
        pt = two_to_one_crh(cp, left, right)
        xy = pt.reveal_affine_ints()[0]
        # host oracle on the concatenated bits
        exp = crh_public_ints(cp, lb + rb)
        assert (int(xy[0]), int(xy[1])) == (int(exp[0]), int(exp[1]))
        # gadget agrees and satisfies
        cs = ConstraintSystem(FR)
        lbools = [Boolean.new_witness(cs, B._index_last(left, i))
                  for i in range(8)]
        rbools = [Boolean.new_witness(cs, B._index_last(right, i))
                  for i in range(8)]
        out = pedersen_two_to_one_crh_gadget(cs, lbools, rbools, cp)
        cx = FpVar.new_input(cs, MpcFp.const(FR, int(xy[0])))
        cy = FpVar.new_input(cs, MpcFp.const(FR, int(xy[1])))
        out.x.enforce_equal(cx)
        out.y.enforce_equal(cy)
        assert cs.is_satisfied_ints()
