"""UInt8 R1CS gadget + two-bit lookup (reference `mpc_uint8.rs`,
`mpc_select.rs:69`): allocation from shared bytes, bitwise algebra, and
constraint satisfaction on revealed assignments."""

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark.gadgets import Boolean, two_bit_lookup
from zkmpc_tpu.snark.r1cs import ConstraintSystem
from zkmpc_tpu.snark.uint8_gadget import UInt8

pytestmark = pytest.mark.slow  # compile-heavy prover tier


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def _reveal_byte(u: UInt8) -> int:
    v = u.to_fp().value
    opened = v.reveal() if v.is_shared() else v
    return int(np.asarray(opened.to_ints()).reshape(-1)[0])


def test_uint8_alloc_and_bitwise_ops():
    with scope():
        cs = ConstraintSystem(FR)
        vals = king_share(fr([0xA5, 0x3C]), jax.random.PRNGKey(0))
        xs = UInt8.new_witness_vec(cs, vals, jax.random.PRNGKey(1))
        a, b = xs
        assert _reveal_byte(a) == 0xA5
        assert _reveal_byte(b) == 0x3C
        assert _reveal_byte(a.xor(b)) == 0xA5 ^ 0x3C
        assert _reveal_byte(a.and_(b)) == 0xA5 & 0x3C
        assert _reveal_byte(a.or_(b)) == 0xA5 | 0x3C
        assert _reveal_byte(a.not_()) == 0xA5 ^ 0xFF
        assert _reveal_byte(a.rotr(3)) == ((0xA5 >> 3) | (0xA5 << 5)) & 0xFF
        assert _reveal_byte(a.shl(2)) == (0xA5 << 2) & 0xFF
        c = UInt8.constant(cs, 0x0F)
        assert _reveal_byte(a.xor(c)) == 0xA5 ^ 0x0F
        assert cs.is_satisfied_ints()


def test_uint8_range_restriction():
    """Allocation forces the byte < 256: recomposition over 8 bits cannot
    match a larger value."""
    with scope():
        cs = ConstraintSystem(FR)
        vals = king_share(fr([300]), jax.random.PRNGKey(2))
        UInt8.new_witness_vec(cs, vals, jax.random.PRNGKey(3))
        assert not cs.is_satisfied_ints()


def test_uint8_is_eq():
    with scope():
        cs = ConstraintSystem(FR)
        vals = king_share(fr([7, 7, 9]), jax.random.PRNGKey(4))
        xs = UInt8.new_witness_vec(cs, vals, jax.random.PRNGKey(5))
        eq = xs[0].is_eq(xs[1], jax.random.PRNGKey(6))
        ne = xs[0].is_eq(xs[2], jax.random.PRNGKey(7))
        assert _reveal_byte_fp(eq.var.value) == 1
        assert _reveal_byte_fp(ne.var.value) == 0
        assert cs.is_satisfied_ints()


def _reveal_byte_fp(v):
    opened = v.reveal() if v.is_shared() else v
    return int(np.asarray(opened.to_ints()).reshape(-1)[0])


@pytest.mark.parametrize("idx", [0, 1, 2, 3])
def test_two_bit_lookup(idx):
    table = [11, 22, 33, 44]
    with scope():
        cs = ConstraintSystem(FR)
        b0_val = king_share(fr(idx & 1), jax.random.PRNGKey(10 + idx))
        b1_val = king_share(fr((idx >> 1) & 1), jax.random.PRNGKey(20 + idx))
        b0 = Boolean.new_witness(cs, b0_val)
        b1 = Boolean.new_witness(cs, b1_val)
        out = two_bit_lookup([b0, b1], table)
        assert _reveal_byte_fp(out.value) == table[idx]
        assert cs.is_satisfied_ints()
