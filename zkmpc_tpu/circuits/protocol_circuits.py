"""MPC-native protocol test circuits.

Behavioral equivalents of the reference's dual-instantiation circuit set
(`src/circuits/{equality_zero,bit_decomposition,smaller_than,
enforce_smaller_or_eq_than}.rs`): each synthesizes identically over public
wires (local proving) or shared wires (collaborative proving), because the
gadget layer runs the MPC protocol inside the witness-allocation closure.
"""

from __future__ import annotations

from ..mpc.share import MpcFp
from ..snark.gadgets import Boolean, FpVar
from ..snark.r1cs import LC, ConstraintSystem


def equality_zero_circuit(cs: ConstraintSystem, a: MpcFp, key):
    """`EqualityZeroCircuit` (`equality_zero.rs:19-41`): witness a; enforce
    [a == 0] is true."""
    a_var = FpVar.new_witness(cs, a)
    a_var.is_zero(key).enforce_true()
    return cs


def not_equality_zero_circuit(cs: ConstraintSystem, a: MpcFp, key):
    """`NotEqualityZeroCircuit` (`equality_zero.rs:43-81`): the is-zero bit is
    computed by the MPC equality-zero protocol, *opened*, and allocated as a
    public instance wire; the circuit proves consistency of the in-circuit
    is_zero with the published bit."""
    from ..mpc import bits as B
    from ..mpc.share import PUBLIC, SHARED

    a_var = FpVar.new_witness(cs, a)
    b_val = B.equality_zero(a, key) if a.visibility == SHARED else _is_zero_pub(a)
    opened = MpcFp(b_val.reveal(), PUBLIC) if b_val.visibility == SHARED else b_val
    is_zero_pub = FpVar.new_input(cs, opened)
    a_var.is_zero(key).var.enforce_equal(is_zero_pub)
    return cs


def _is_zero_pub(a: MpcFp) -> MpcFp:
    import numpy as np
    from ..mpc.share import PUBLIC
    from ..ops.limbs import FpArray
    v = int(np.asarray(a.value.to_ints()).reshape(-1)[0])
    return MpcFp.const(a.spec, int(v == 0))


def bit_decomposition_circuit(cs: ConstraintSystem, a: MpcFp, key):
    """`BitDecompositionCircuit` (`bit_decomposition.rs:11-33`): witness a,
    constrain its full little-endian bit decomposition."""
    a_var = FpVar.new_witness(cs, a)
    a_var.to_bits(key)
    return cs


def smaller_than_circuit(cs: ConstraintSystem, a: MpcFp, b: MpcFp, res: MpcFp,
                         key, check_eq: bool = False):
    """`SmallerThanCircuit` (`smaller_than.rs:19-51`): witnesses a, b and a
    claimed comparison bit res; enforce res == is_cmp(a, b, Less, check_eq)."""
    from ..snark.gadgets import less_than_gadget

    a_var = FpVar.new_witness(cs, a)
    b_var = FpVar.new_witness(cs, b)
    res_var = Boolean.new_witness(cs, res)
    lt = less_than_gadget(a_var, b_var, key)
    if check_eq:
        eq = a_var.is_eq(b_var, key)
        lt = Boolean.or_(lt, eq)
    res_var.var.enforce_equal(lt.var)
    return cs


def smaller_eq_than_circuit(cs: ConstraintSystem, a_bits: MpcFp, b_int: int):
    """`SmallerEqThanCircuit` (`enforce_smaller_or_eq_than.rs:12-43`): witness
    bit vector a (LE), enforce value(a) <= b for the public constant b."""
    bools = Boolean.new_witness_vec(cs, a_bits)
    enforce_smaller_or_equal_than_le(cs, bools, b_int)
    return cs


def enforce_smaller_or_equal_than_le(cs: ConstraintSystem, bits: list,
                                     element: int):
    """ark-r1cs-std `Boolean::enforce_smaller_or_equal_than_le` semantics
    (run-of-ones k-ary AND / NAND chain), over MPC Booleans.

    bits: LSB-first Booleans; element: public bound.
    """
    nbits = element.bit_length()
    # bits above the bound's MSB must be zero
    if len(bits) > nbits:
        or_acc = Boolean.constant(cs, False)
        for extra in bits[nbits:]:
            or_acc = Boolean.or_(or_acc, extra)
        or_acc.enforce_false()
    last_run = Boolean.constant(cs, True)
    current_run: list = []
    # big-endian walk over the bound's significant bits
    for i in range(nbits - 1, -1, -1):
        a = bits[i]
        if (element >> i) & 1:
            current_run.append(a)
        else:
            if current_run:
                current_run.append(last_run)
                last_run = Boolean.kary_and(current_run)
                current_run = []
            # NAND(last_run, a): their AND must be 0
            prod = Boolean.and_(last_run, a)
            prod.enforce_false()
    return current_run
