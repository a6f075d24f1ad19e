"""R1CS gadget layer over MPC wires: FpVar / Boolean / comparisons.

The TPU counterpart of the reference's MPC gadget stack
(`mpc-algebra/src/r1cs_helper/{mpc_fp,mpc_boolean,mpc_eq,mpc_select,
mpc_bits,mpc_fp_cmp}.rs`): gadget values are batched MpcFp tensors, witness
allocation closures run MPC protocols (Beaver mul, equality-zero, bit
decomposition), and constraint *structure* accumulates host-side in the
ConstraintSystem.  Where the reference allocates one gadget per scalar, every
gadget here carries a whole tensor, so the generated R1CS is the same but the
online protocol cost batches.
"""

from __future__ import annotations

import numpy as np

from ..mpc import bits as B
from ..mpc.share import MpcFp, PUBLIC, SHARED
from ..ops.limbs import FR, FpArray
from .r1cs import LC, ONE, ConstraintSystem


class FpVar:
    """A field wire in the circuit: LC + (tensor) value.

    Scalar-shaped (shape ()) values per variable; vector allocation helpers
    return lists of FpVars sharing one batched protocol round.
    """

    __slots__ = ("cs", "lc", "value")

    def __init__(self, cs: ConstraintSystem, lc: LC, value: MpcFp):
        self.cs = cs
        self.lc = lc
        self.value = value

    # ------------------------------------------------------------ allocation

    @classmethod
    def new_witness(cls, cs: ConstraintSystem, value: MpcFp) -> "FpVar":
        var = cs.new_witness(value)
        return cls(cs, LC.of(var), value)

    @classmethod
    def new_input(cls, cs: ConstraintSystem, value: MpcFp) -> "FpVar":
        var = cs.new_instance(value)
        return cls(cs, LC.of(var), value)

    @classmethod
    def new_witness_vec(cls, cs: ConstraintSystem, values: MpcFp):
        vars_ = cs.new_witness_vec(values)
        out = []
        for i, v in enumerate(vars_):
            out.append(cls(cs, LC.of(v), values[i]))
        return out

    @classmethod
    def constant(cls, cs: ConstraintSystem, c: int) -> "FpVar":
        return cls(cs, LC.constant(c), MpcFp.const(cs.spec, c))

    # ------------------------------------------------------------ arithmetic

    def __add__(self, other: "FpVar") -> "FpVar":
        other = self._coerce(other)
        return FpVar(self.cs, self.lc + other.lc, self.value + other.value)

    def __sub__(self, other: "FpVar") -> "FpVar":
        other = self._coerce(other)
        return FpVar(self.cs, self.lc - other.lc, self.value - other.value)

    def __neg__(self):
        return FpVar(self.cs, -self.lc, -self.value)

    def scale(self, k: int) -> "FpVar":
        return FpVar(self.cs, self.lc.scale(k),
                     self.value * MpcFp.const(self.cs.spec, k))

    def __mul__(self, other: "FpVar") -> "FpVar":
        """Allocates the product witness + one constraint
        (`mpc_fp.rs:141-263`)."""
        other = self._coerce(other)
        prod_val = self.value * other.value      # MPC (Beaver if both shared)
        out = FpVar.new_witness(self.cs, prod_val)
        self.cs.enforce(self.lc, other.lc, out.lc)
        return out

    def square(self):
        return self * self

    def _coerce(self, other):
        if isinstance(other, FpVar):
            return other
        if isinstance(other, int):
            return FpVar.constant(self.cs, other)
        raise TypeError(type(other))

    # ----------------------------------------------------------- assertions

    def enforce_equal(self, other: "FpVar"):
        other = self._coerce(other)
        self.cs.enforce(self.lc - other.lc, LC.constant(1), LC({}))

    def mul_equals(self, other: "FpVar", result: "FpVar"):
        self.cs.enforce(self.lc, other.lc, result.lc)

    # ------------------------------------------------------------ predicates

    def is_zero(self, key) -> "Boolean":
        """Allocates b = [self == 0] via the MPC equality-zero protocol inside
        the witness closure (`mpc_fp.rs:320-488`), with the standard
        constraints: b*(x) = 0 and (1-b) = x*inv (inv witness)."""
        x = self.value
        b_val = B.equality_zero(x, key)
        b = Boolean.new_witness(self.cs, b_val)
        # inv witness: any value satisfying x*inv = 1 - b; for x==0 use 0
        from ..mpc.share import beaver_inv
        safe_inv = _safe_inverse(x, b_val)
        inv = FpVar.new_witness(self.cs, safe_inv)
        # x * b = 0 ; x * inv = 1 - b
        self.cs.enforce(self.lc, b.var.lc, LC({}))
        self.cs.enforce(self.lc, inv.lc, LC.constant(1) - b.var.lc)
        return b

    def is_eq(self, other: "FpVar", key) -> "Boolean":
        return (self - other).is_zero(key)

    def to_bits(self, key, nbits: int | None = None):
        """Bit-decompose with booleanity + recomposition constraints
        (`mpc_fp.rs:490-544`).  Returns list of Booleans (LSB first).

        nbits < full width is a sound range restriction: recomposition over
        the first nbits forces x < 2^nbits (the MPC decomposition protocol
        still runs full-width; only the allocation narrows)."""
        spec = self.cs.spec
        full = spec.p.bit_length()
        nbits = nbits or full
        bits_val = B.bit_decomposition(self.value, key)   # [.., full]
        if nbits < full:
            bits_val = B._slice_last(bits_val, 0, nbits)
        bools = Boolean.new_witness_vec(self.cs, bits_val)
        # recomposition: sum 2^i b_i = x
        lc = LC({})
        for i, bv in enumerate(bools):
            lc = lc + bv.var.lc.scale(pow(2, i, spec.p))
        self.cs.enforce(lc, LC.constant(1), self.lc)
        return bools

    def enforce_cmp(self, other: "FpVar", key, allow_equal: bool = False):
        """self < other (or <=), signed-interval semantics matching the
        reference's `enforce_cmp` (`mpc_fp_cmp.rs:19-103`)."""
        lt = less_than_gadget(self, other, key)
        if allow_equal:
            eq = self.is_eq(other, key)
            ok = Boolean.or_(lt, eq, key)
            ok.enforce_true()
        else:
            lt.enforce_true()

    @staticmethod
    def conditionally_select(cond: "Boolean", a: "FpVar", b: "FpVar") -> "FpVar":
        """out = cond ? a : b  (`mpc_select.rs:6-67`)."""
        cs = a.cs
        out_val = b.value + cond.var.value * (a.value - b.value)
        out = FpVar.new_witness(cs, out_val)
        # cond * (a - b) = out - b
        cs.enforce(cond.var.lc, a.lc - b.lc, out.lc - b.lc)
        return out


def _safe_inverse(x: MpcFp, is_zero_bit: MpcFp) -> MpcFp:
    """inverse of x where x != 0, anything where x == 0 (use x + b)."""
    from ..mpc.share import beaver_inv
    shifted = x + is_zero_bit          # nonzero everywhere
    return beaver_inv(shifted)


class Boolean:
    """A wire constrained to {0,1} (`mpc_boolean.rs:245`)."""

    __slots__ = ("var",)

    def __init__(self, var: FpVar):
        self.var = var

    @classmethod
    def new_witness(cls, cs: ConstraintSystem, value: MpcFp) -> "Boolean":
        v = FpVar.new_witness(cs, value)
        # b * (1 - b) = 0
        cs.enforce(v.lc, LC.constant(1) - v.lc, LC({}))
        return cls(v)

    @classmethod
    def new_witness_vec(cls, cs: ConstraintSystem, values: MpcFp):
        """values: [.., n] bits -> n Booleans (one tensor, n constraints)."""
        n = values.shape[-1]
        out = []
        for i in range(n):
            out.append(cls.new_witness(cs, B._index_last(values, i)))
        return out

    @classmethod
    def constant(cls, cs: ConstraintSystem, b: bool) -> "Boolean":
        return cls(FpVar.constant(cs, 1 if b else 0))

    def enforce_true(self):
        self.var.cs.enforce(self.var.lc, LC.constant(1), LC.constant(1))

    def enforce_false(self):
        self.var.cs.enforce(self.var.lc, LC.constant(1), LC({}))

    def not_(self) -> "Boolean":
        cs = self.var.cs
        return Boolean(FpVar.constant(cs, 1) - self.var)

    @staticmethod
    def and_(a: "Boolean", b: "Boolean", key=None) -> "Boolean":
        prod = a.var * b.var
        return Boolean(prod)

    @staticmethod
    def or_(a: "Boolean", b: "Boolean", key=None) -> "Boolean":
        ab = a.var * b.var
        return Boolean(a.var + b.var - ab)

    @staticmethod
    def xor(a: "Boolean", b: "Boolean", key=None) -> "Boolean":
        ab = a.var * b.var
        return Boolean(a.var + b.var - ab.scale(2))

    @staticmethod
    def kary_and(bools: list) -> "Boolean":
        acc = bools[0]
        for b in bools[1:]:
            acc = Boolean.and_(acc, b)
        return acc


# ---------------------------------------------------------------------------
# Batched gadget forms: one protocol round for many wires (ARCHITECTURE
# pillar 3 — the reference pays per-scalar rounds; we stack the values into
# one tensor, run the protocol once, then allocate per-wire constraints).
# ---------------------------------------------------------------------------


def _stack_values(vals) -> MpcFp:
    return MpcFp.concat([v.reshape(1) for v in vals], axis=0)


def _unstack(batch: MpcFp, n: int):
    return [batch[i] for i in range(n)]


def mul_many(pairs) -> list:
    """Products of (FpVar, FpVar) pairs with ONE batched Beaver round."""
    if not pairs:
        return []
    cs = pairs[0][0].cs
    xs = _stack_values([a.value for a, _ in pairs])
    ys = _stack_values([b.value for _, b in pairs])
    prods = xs * ys                         # one batched round
    out = []
    for i, (a, b) in enumerate(pairs):
        w = FpVar.new_witness(cs, prods[i])
        cs.enforce(a.lc, b.lc, w.lc)
        out.append(w)
    return out


def matmul_gadget(A, B):
    """C = A @ B for FpVar matrices (lists of rows); all partial products in
    one batched Beaver round, n^2 linear constraints tie them to C."""
    n, k, m = len(A), len(B), len(B[0])
    pairs = [(A[i][t], B[t][j]) for i in range(n) for j in range(m)
             for t in range(k)]
    prods = mul_many(pairs)
    C = []
    idx = 0
    for i in range(n):
        row = []
        for j in range(m):
            acc = prods[idx]
            for t in range(1, k):
                acc = acc + prods[idx + t]
            idx += k
            row.append(acc)
        C.append(row)
    return C


def to_bits_many(vars_, key, nbits: int | None = None):
    """Bit-decompose many wires with one batched protocol round."""
    if not vars_:
        return []
    cs = vars_[0].cs
    spec = cs.spec
    full = spec.p.bit_length()
    nbits = nbits or full
    batch = _stack_values([v.value for v in vars_])       # [n]
    bits_val = B.bit_decomposition(batch, key)            # [n, full]
    out = []
    for i, v in enumerate(vars_):
        row = bits_val[i]
        if nbits < full:
            row = B._slice_last(row, 0, nbits)
        bools = Boolean.new_witness_vec(cs, row)
        lc = LC({})
        for j, bv in enumerate(bools):
            lc = lc + bv.var.lc.scale(pow(2, j, spec.p))
        cs.enforce(lc, LC.constant(1), v.lc)
        out.append(bools)
    return out


def is_zero_many(vars_, key) -> list:
    """[v == 0] for many wires, one batched equality-zero protocol."""
    if not vars_:
        return []
    cs = vars_[0].cs
    batch = _stack_values([v.value for v in vars_])
    b_val = B.equality_zero(batch, key)                   # [n]
    from ..mpc.share import beaver_inv
    safe = beaver_inv(batch + b_val)                      # batched inverse
    out = []
    for i, v in enumerate(vars_):
        b = Boolean.new_witness(cs, b_val[i])
        inv = FpVar.new_witness(cs, safe[i])
        cs.enforce(v.lc, b.var.lc, LC({}))
        cs.enforce(v.lc, inv.lc, LC.constant(1) - b.var.lc)
        out.append(b)
    return out


def less_than_many(pairs, key) -> list:
    """[a < b] Booleans for many pairs, batching the comparison protocol and
    the bit decompositions into single rounds."""
    if not pairs:
        return []
    cs = pairs[0][0].cs
    spec = cs.spec
    xs = _stack_values([a.value for a, _ in pairs])
    ys = _stack_values([b.value for _, b in pairs])
    lt_val = B.less_than(xs, ys, key)                     # [n], one protocol
    lts = [Boolean.new_witness(cs, lt_val[i]) for i in range(len(pairs))]
    # constrain via bounded difference, batched decomposition
    diffs = []
    for (a, b), lt in zip(pairs, lts):
        diffs.append(FpVar.conditionally_select(
            lt, b - a, (a - b) + FpVar.constant(cs, 1)))
    half_bits = (spec.p - 1).bit_length() - 1
    all_bits = to_bits_many(diffs, key)
    for bools in all_bits:
        for bit in bools[half_bits:]:
            bit.enforce_false()
    return lts


def two_bit_lookup(bits, table) -> FpVar:
    """out = table[b0 + 2*b1] with ONE constraint (reference
    `mpc_select.rs:69` MpcTwoBitLookupGadget / ark TwoBitLookupGadget).

    bits: [b0, b1] Booleans (LSB first); table: 4 public ints.
    Constraint: b1 * (b0*(c3-c2-c1+c0) + (c2-c0)) = out - b0*(c1-c0) - c0.
    """
    b0, b1 = bits
    cs = b0.var.cs
    p = cs.spec.p
    c0, c1, c2, c3 = (int(t) % p for t in table)
    b0v, b1v = b0.var.value, b1.var.value
    prod = b0v * b1v                        # Beaver when both shared
    val = (MpcFp.const(cs.spec, c0)
           + b0v * MpcFp.const(cs.spec, (c1 - c0) % p)
           + b1v * MpcFp.const(cs.spec, (c2 - c0) % p)
           + prod * MpcFp.const(cs.spec, (c3 - c2 - c1 + c0) % p))
    out = FpVar.new_witness(cs, val)
    a_lc = b1.var.lc
    b_lc = b0.var.lc.scale((c3 - c2 - c1 + c0) % p) + \
        LC.constant((c2 - c0) % p)
    c_lc = out.lc - b0.var.lc.scale((c1 - c0) % p) - LC.constant(c0)
    cs.enforce(a_lc, b_lc, c_lc)
    return out


def less_than_gadget(a: FpVar, b: FpVar, key) -> Boolean:
    """Allocate [a < b] (signed interval semantics) with correctness
    constraints via the half-test decomposition (`mpc_fp_cmp.rs:19-103`)."""
    cs = a.cs
    lt_val = B.less_than(a.value, b.value, key)
    lt = Boolean.new_witness(cs, lt_val)
    # Constrain via: (b - a - 1) in [0, (p-1)/2) when lt, else (a - b) in ...
    # Simplified sound variant used by the reference's cmp chain: check that
    # d = lt ? (b - a) : (a - b + 1) has its "sign bit" clear, by bit
    # decomposition of d and bounding d <= (p-1)/2.
    diff = FpVar.conditionally_select(lt, b - a, (a - b) + FpVar.constant(cs, 1))
    half_bits = (cs.spec.p - 1).bit_length() - 1
    dbits = diff.to_bits(key, nbits=cs.spec.p.bit_length())
    # enforce top bits zero => d < 2^half_bits <= (p-1)/2 ... (conservative)
    for bit in dbits[half_bits:]:
        bit.enforce_false()
    return lt


FpVar.__radd__ = FpVar.__add__
