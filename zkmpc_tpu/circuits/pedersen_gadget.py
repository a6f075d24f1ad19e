"""In-circuit twisted-Edwards + Pedersen commitment gadgets.

Mirrors the reference's TE curve gadget + Pedersen commitment gadget
(`mpc-algebra/src/r1cs_helper/groups/curves/twisted_edwards/mod.rs:273`,
`commitment/pedersen/constraints.rs`): curve points are (x, y) FpVar pairs
over Fr; addition is enforced with the complete Edwards formulas; the
commitment folds message/randomness bits against public generator multiples
with conditional adds.
"""

from __future__ import annotations

import numpy as np

from .. import params
from ..ops.limbs import FpArray
from ..snark.gadgets import Boolean, FpVar
from ..snark.r1cs import LC, ConstraintSystem
from ..spec import curves as SC

ED_D = params.ED_D
P = params.FR_MODULUS


class TEAffineVar:
    """Affine TE point as circuit wires."""

    __slots__ = ("x", "y")

    def __init__(self, x: FpVar, y: FpVar):
        self.x = x
        self.y = y

    @classmethod
    def constant(cls, cs: ConstraintSystem, xy):
        return cls(FpVar.constant(cs, int(xy[0])), FpVar.constant(cs, int(xy[1])))

    @classmethod
    def neutral(cls, cs: ConstraintSystem):
        return cls.constant(cs, SC.TE_NEUTRAL)

    def add(self, other: "TEAffineVar") -> "TEAffineVar":
        """Complete Edwards addition with witness allocation:
        x3 (1 + d x1 x2 y1 y2) = x1 y2 + y1 x2
        y3 (1 - d x1 x2 y1 y2) = y1 y2 + x1 x2      (a = -1)."""
        cs = self.x.cs
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        u = x1 * x2             # witness + constraint
        v = y1 * y2
        t = u * v               # x1x2y1y2
        xy = x1 * y2
        yx = y1 * x2
        dt = t.scale(ED_D)
        one = FpVar.constant(cs, 1)
        denom_x = one + dt
        denom_y = one - dt
        # witness values for x3, y3 via MPC inversion-free select: compute with
        # field inverse on shares (Beaver inverse)
        from ..mpc.share import beaver_inv, MpcFp, PUBLIC
        inv_dx = _inv_wire(denom_x)
        inv_dy = _inv_wire(denom_y)
        x3_val = (xy.value + yx.value) * inv_dx
        y3_val = (v.value + u.value) * inv_dy
        x3 = FpVar.new_witness(cs, x3_val)
        y3 = FpVar.new_witness(cs, y3_val)
        cs.enforce(x3.lc, denom_x.lc, xy.lc + yx.lc)
        cs.enforce(y3.lc, denom_y.lc, v.lc + u.lc)
        return TEAffineVar(x3, y3)

    def conditionally_add_constant(self, bit: Boolean, xy) -> "TEAffineVar":
        """self + (bit ? constant point : neutral).

        Selecting between a CONSTANT point and the neutral is linear in the
        bit — cx = px*b, cy = 1 + (py-1)*b — so the select costs zero
        constraints; only the complete add pays."""
        cs = self.x.cs
        from ..mpc.share import MpcFp
        px, py1 = int(xy[0]) % P, (int(xy[1]) - 1) % P
        bval = bit.var.value
        cx = FpVar(cs, bit.var.lc.scale(px), bval * MpcFp.const(cs.spec, px))
        cy = FpVar(cs, LC.constant(1) + bit.var.lc.scale(py1),
                   MpcFp.const(cs.spec, 1) + bval * MpcFp.const(cs.spec, py1))
        return self.add(TEAffineVar(cx, cy))

    def two_bit_window_add_constant(self, bits, p0, p1) -> "TEAffineVar":
        """self + (b0?p0:0) + (b1?p1:0) via a 4-entry table lookup per
        coordinate (ark's TwoBitLookup precomputed-window trick that gives
        the reference its ~5 constraints/bit Pedersen density;
        `mpc_select.rs:69`): 2 lookup constraints + one complete add per
        BIT PAIR instead of an add per bit."""
        from ..snark.gadgets import two_bit_lookup
        table = [SC.TE_NEUTRAL, p0, p1, SC.te_add(p0, p1)]
        tx = two_bit_lookup(bits, [t[0] for t in table])
        ty = two_bit_lookup(bits, [t[1] for t in table])
        return self.add(TEAffineVar(tx, ty))

    def double(self) -> "TEAffineVar":
        """Complete formulas double correctly."""
        return self.add(self)

    @staticmethod
    def conditionally_select(bit: Boolean, a: "TEAffineVar",
                             b: "TEAffineVar") -> "TEAffineVar":
        return TEAffineVar(FpVar.conditionally_select(bit, a.x, b.x),
                           FpVar.conditionally_select(bit, a.y, b.y))

    def conditionally_add(self, bit: Boolean, other: "TEAffineVar"
                          ) -> "TEAffineVar":
        """self + (bit ? other : neutral) for a *variable* other point."""
        cs = self.x.cs
        sel = TEAffineVar.conditionally_select(
            bit, other, TEAffineVar.neutral(cs))
        return self.add(sel)

    def scalar_mul_le(self, bits: list) -> "TEAffineVar":
        """Variable-base double-and-add over Boolean bits (LSB first) — the
        gadget equivalent of ark's `CurveVar::scalar_mul_le` used by the
        reference's in-circuit ElGamal (`werewolf.rs:520-534`)."""
        cs = self.x.cs
        acc = TEAffineVar.neutral(cs)
        cur = self
        for bit in bits:
            acc = acc.conditionally_add(bit, cur)
            cur = cur.double()
        return acc

    def enforce_equal(self, other: "TEAffineVar"):
        self.x.enforce_equal(other.x)
        self.y.enforce_equal(other.y)


def _inv_wire(v: FpVar):
    from ..mpc.share import beaver_inv, PUBLIC
    val = v.value
    if val.visibility == PUBLIC:
        return MpcFpInvPublic(val)
    return beaver_inv(val)


def MpcFpInvPublic(val):
    from ..mpc.share import MpcFp, PUBLIC
    return MpcFp(val.value.inv(), PUBLIC)


def pedersen_com_circuit(cs: ConstraintSystem, x: FpVar, r_bools: list,
                         commitment_xy, pp, key, nbits: int | None = None
                         ) -> None:
    """`PedersenComCircuit` (`src/circuits/pedersen_revised.rs:193-240`):
    enforce that commit(x, r) equals the public commitment point.

    x: allocated FpVar (shared or public); r_bools: randomness-bit Booleans
    (empty list = default/zero randomness, as the reference's
    `PedersenRandomness::default()` in the player-commitment checks);
    commitment_xy: public affine point.
    """
    m_bits = x.to_bits(key, nbits)
    com = pedersen_commit_gadget(cs, m_bits, r_bools, pp)
    cx = FpVar.new_input(cs, _pub_fp(cs, int(commitment_xy[0])))
    cy = FpVar.new_input(cs, _pub_fp(cs, int(commitment_xy[1])))
    com.x.enforce_equal(cx)
    com.y.enforce_equal(cy)


def _pub_fp(cs: ConstraintSystem, v: int):
    from ..mpc.share import MpcFp
    return MpcFp.const(cs.spec, v)


def pedersen_commit_gadget(cs: ConstraintSystem, m_bits: list, r_bits: list,
                           pp) -> TEAffineVar:
    """C = sum m_i G_i + sum r_j 2^j H as circuit wires.

    m_bits/r_bits: lists of Booleans; pp: crypto.pedersen.PedersenParams.

    Constraint shape: bits are folded two at a time through precomputed
    4-entry window tables (2 lookup constraints + 1 complete add per pair
    ~ 4.5 constraints/bit), matching the reference Pedersen gadget's
    windowed density (`crypto-primitives commitment/pedersen/constraints.rs`
    + ark TwoBitLookupGadget).

    Witness shape (the tpu-first part): instead of one protocol round per
    gadget call (506 sequential conditional adds in the reference's
    synthesis), ALL pair lookups run as one batched Beaver round and the
    window points are summed by a log-depth TREE of batched complete adds —
    constraint count identical (addition reassociates; the formulas are
    complete), protocol rounds drop from O(bits) to O(log bits), and the
    traced graph is ~64x smaller."""
    h_pows = []
    h = pp.blind_base
    for _ in range(len(r_bits)):
        h_pows.append(h)
        h = SC.te_add(h, h)
    bits = list(m_bits) + list(r_bits)
    bases = list(pp.generators[:len(m_bits)]) + h_pows
    if len(bits) == 0:
        return TEAffineVar.neutral(cs)
    if len(bits) < 8:
        acc = TEAffineVar.neutral(cs)
        i = 0
        while i + 1 < len(bits):
            acc = acc.two_bit_window_add_constant(
                [bits[i], bits[i + 1]], bases[i], bases[i + 1])
            i += 2
        if i < len(bits):
            acc = acc.conditionally_add_constant(bits[i], bases[i])
        return acc
    leaves = _window_lookup_leaves(cs, bits, bases)
    return _te_tree_scan(cs, leaves)


def _window_lookup_leaves(cs, bits, bases):
    """Batched 2-bit window lookups: ONE Beaver round computes every pair
    product b0*b1; each pair contributes one leaf point via 2 lookup
    constraints.  A trailing odd bit becomes a constraint-free linear leaf
    (select between a constant and the neutral is affine in the bit)."""
    from ..mpc import bits as B
    from ..mpc.share import MpcFp
    from ..snark.gadgets import _stack_values

    p = cs.spec.p
    npairs = len(bits) // 2
    tables = []
    for i in range(npairs):
        p0, p1 = bases[2 * i], bases[2 * i + 1]
        tables.append([SC.TE_NEUTRAL, p0, p1, SC.te_add(p0, p1)])

    b0v = _stack_values([bits[2 * i].var.value for i in range(npairs)])
    b1v = _stack_values([bits[2 * i + 1].var.value for i in range(npairs)])
    prod = b0v * b1v                               # ONE batched Beaver round

    def coeff(sel):
        import numpy as np
        return MpcFp.from_public(FpArray.from_int(
            cs.spec, np.asarray([sel(t) for t in tables], dtype=object)))

    out_vals = {}
    for coord in (0, 1):
        c0 = coeff(lambda t: int(t[0][coord]) % p)
        d1 = coeff(lambda t: (int(t[1][coord]) - int(t[0][coord])) % p)
        d2 = coeff(lambda t: (int(t[2][coord]) - int(t[0][coord])) % p)
        d3 = coeff(lambda t: (int(t[3][coord]) - int(t[2][coord])
                              - int(t[1][coord]) + int(t[0][coord])) % p)
        out_vals[coord] = c0 + b0v * d1 + b1v * d2 + prod * d3

    x_vars = _alloc_vec(cs, out_vals[0])
    y_vars = _alloc_vec(cs, out_vals[1])
    # lookup constraint per coordinate (ark TwoBitLookupGadget shape):
    # b1 * (b0*(c3-c2-c1+c0) + (c2-c0)) = out - b0*(c1-c0) - c0
    for i in range(npairs):
        b0, b1 = bits[2 * i], bits[2 * i + 1]
        for coord, ovars in ((0, x_vars), (1, y_vars)):
            t = tables[i]
            c0, c1, c2, c3 = (int(t[j][coord]) % p for j in range(4))
            b_lc = b0.var.lc.scale((c3 - c2 - c1 + c0) % p) + \
                LC.constant((c2 - c0) % p)
            c_lc = ovars[i].lc - b0.var.lc.scale((c1 - c0) % p) - \
                LC.constant(c0)
            cs.enforce(b1.var.lc, b_lc, c_lc)

    if len(bits) % 2:
        bit, base = bits[-1], bases[len(bits) - 1]
        px, py1 = int(base[0]) % p, (int(base[1]) - 1) % p
        bval = bit.var.value
        lx = FpVar(cs, bit.var.lc.scale(px),
                   bval * MpcFp.const(cs.spec, px))
        ly = FpVar(cs, LC.constant(1) + bit.var.lc.scale(py1),
                   MpcFp.const(cs.spec, 1) + bval * MpcFp.const(cs.spec, py1))
        x_vars.append(lx)
        y_vars.append(ly)
    return (x_vars, y_vars)


def _alloc_vec(cs, vals):
    """Allocate one witness wire per element of a batched MpcFp [m]."""
    from ..mpc import bits as B
    vs = cs.new_witness_vec(vals)
    return [FpVar(cs, LC.of(v), B._index_last(vals, i))
            for i, v in enumerate(vs)]


def _te_tree_scan(cs, leaves) -> TEAffineVar:
    """All tree levels of the Pedersen point fold in ONE `lax.scan`.

    The VALUE computation (the traced graph) runs as a single masked
    fixed-width scan body — one set of Beaver-mul/inverse constructs for all
    log2(n) levels, instead of one inlined copy per level (the unrolled tree
    was ~40k jaxpr eqns of the prove graph's compile mass).  The
    wires/constraints are emitted per level on host from the stacked scan
    outputs, in exactly the order the unrolled `_te_tree_level` loop used,
    so the constraint system is unchanged (ark parity:
    `r1cs_helper/groups/curves/twisted_edwards/mod.rs:273` add gadget
    formulas, reassociated into a tree)."""
    import jax

    from ..mpc import bits as B
    from ..mpc.share import MpcFp, _promote_to_shared, beaver_inv
    from ..ops.limbs import FpArray as _FA
    from ..snark.gadgets import _stack_values

    x_vars, y_vars = leaves
    m = len(x_vars)
    if m == 1:
        return TEAffineVar(x_vars[0], y_vars[0])

    ms = []
    mm = m
    while mm > 1:
        ms.append(mm)
        mm = (mm + 1) // 2
    Wh = (m + 1) // 2
    Wfull = 2 * Wh

    xv = _stack_values([v.value for v in x_vars])
    yv = _stack_values([v.value for v in y_vars])
    if not xv.is_shared():
        xv = _promote_to_shared(xv)
    if not yv.is_shared():
        yv = _promote_to_shared(yv)
    if Wfull > m:
        pad = Wfull - m

        def fill(v):
            return MpcFp.from_public(_FA.from_int(
                cs.spec, np.full((pad,), v, dtype=object)))
        xv = B._concat_last(xv, fill(0))
        yv = B._concat_last(yv, fill(1))
    state = (B._norm2(xv), B._norm2(yv))

    import jax.numpy as jnp
    m_arr = jnp.asarray(ms, dtype=jnp.int32)
    d_fp = MpcFp.const(cs.spec, ED_D)
    one = MpcFp.const(cs.spec, 1)

    def gather(w: MpcFp, idx):
        def f(fp):
            return _FA(jnp.take(fp.limbs, idx, axis=-2), fp.spec, fp.bound)
        return MpcFp(f(w.value), w.visibility,
                     None if w.mac is None else f(w.mac))

    def sel(cond, a: MpcFp, b: MpcFp) -> MpcFp:
        def f(fa, fb):
            c = jnp.broadcast_to(cond[..., None], fa.limbs.shape)
            return _FA(jnp.where(c, fa.limbs, fb.limbs), fa.spec,
                       max(fa.bound, fb.bound))
        mac = None
        if a.mac is not None and b.mac is not None:
            mac = f(a.mac, b.mac)
        return MpcFp(f(a.value, b.value), a.visibility, mac)

    def body(carry, m_l):
        X, Y = carry                       # [.., Wfull] shared
        m2 = m_l // 2
        odd = m_l - 2 * m2
        iota = jnp.arange(Wh, dtype=jnp.int32)
        ax, ay = B._slice_last(X, 0, Wh), B._slice_last(Y, 0, Wh)
        bidx = jnp.minimum(iota + m2, Wfull - 1)
        bx, by = gather(X, bidx), gather(Y, bidx)
        lhs = MpcFp.concat([ax, ay, ax, ay], axis=0)
        rhs = MpcFp.concat([bx, by, by, bx], axis=0)
        prods = lhs * rhs                  # ONE fused Beaver round
        u_v, v_v = prods[0:Wh], prods[Wh:2 * Wh]
        xy_v, yx_v = prods[2 * Wh:3 * Wh], prods[3 * Wh:4 * Wh]
        t_v = u_v * v_v
        dt = t_v * d_fp
        denx = one + dt
        deny = one - dt
        inv = beaver_inv(MpcFp.concat([denx, deny], axis=0))
        num = MpcFp.concat([xy_v + yx_v, v_v + u_v], axis=0)
        res = num * inv                    # ONE fused Beaver round
        x3, y3 = res[0:Wh], res[Wh:2 * Wh]
        # next level: results in lanes [0, m2), odd leftover at lane m2
        lidx = jnp.full((Wh,), 0, jnp.int32) + jnp.maximum(m_l - 1, 0)
        lx, ly = gather(X, lidx), gather(Y, lidx)
        pos_odd = (iota == m2) & (odd == 1)
        nx = B._norm2(sel(pos_odd, lx, x3))
        ny = B._norm2(sel(pos_odd, ly, y3))
        nX = MpcFp.concat([nx, nx], axis=0)
        nY = MpcFp.concat([ny, ny], axis=0)
        outs = tuple(B._norm2(w) for w in (u_v, v_v, t_v, xy_v, yx_v, x3, y3))
        return (B._norm2(nX), B._norm2(nY)), outs

    from ..parallel import transport as _T
    if _T.current().kind == "socket":
        # socket transport: Beaver reveals are host TCP rounds, so the tree
        # levels run as eager Python iterations (same math, log-depth real
        # protocol rounds) instead of one lax.scan
        carry, outs_list = state, []
        for m_l in ms:
            carry, outs = body(carry, jnp.asarray(m_l, jnp.int32))
            outs_list.append(outs)

        def stackw(ws):
            val = _FA(jnp.stack([w.value.limbs for w in ws]),
                      ws[0].value.spec, max(w.value.bound for w in ws))
            mac = None
            if ws[0].mac is not None:
                mac = _FA(jnp.stack([w.mac.limbs for w in ws]),
                          ws[0].mac.spec, max(w.mac.bound for w in ws))
            return MpcFp(val, ws[0].visibility, mac)

        stk = tuple(stackw([o[j] for o in outs_list]) for j in range(7))
    else:
        _, stk = jax.lax.scan(body, state, m_arr)

    def level_vals(w: MpcFp, l: int, m2: int) -> MpcFp:
        def f(fp):
            return _FA(fp.limbs[l, ..., :m2, :], fp.spec, fp.bound)
        return MpcFp(f(w.value), w.visibility,
                     None if w.mac is None else f(w.mac))

    cur_x, cur_y = list(x_vars), list(y_vars)
    for l, m_l in enumerate(ms):
        m2 = m_l // 2
        u_w = _alloc_vec(cs, level_vals(stk[0], l, m2))
        v_w = _alloc_vec(cs, level_vals(stk[1], l, m2))
        t_w = _alloc_vec(cs, level_vals(stk[2], l, m2))
        xy_w = _alloc_vec(cs, level_vals(stk[3], l, m2))
        yx_w = _alloc_vec(cs, level_vals(stk[4], l, m2))
        x3_w = _alloc_vec(cs, level_vals(stk[5], l, m2))
        y3_w = _alloc_vec(cs, level_vals(stk[6], l, m2))
        for i in range(m2):
            ax_, ay_ = cur_x[i], cur_y[i]
            bx_, by_ = cur_x[m2 + i], cur_y[m2 + i]
            cs.enforce(ax_.lc, bx_.lc, u_w[i].lc)
            cs.enforce(ay_.lc, by_.lc, v_w[i].lc)
            cs.enforce(u_w[i].lc, v_w[i].lc, t_w[i].lc)
            cs.enforce(ax_.lc, by_.lc, xy_w[i].lc)
            cs.enforce(ay_.lc, bx_.lc, yx_w[i].lc)
            denx_lc = LC.constant(1) + t_w[i].lc.scale(ED_D % cs.spec.p)
            deny_lc = LC.constant(1) - t_w[i].lc.scale(ED_D % cs.spec.p)
            cs.enforce(x3_w[i].lc, denx_lc, xy_w[i].lc + yx_w[i].lc)
            cs.enforce(y3_w[i].lc, deny_lc, v_w[i].lc + u_w[i].lc)
        nx_vars, ny_vars = list(x3_w), list(y3_w)
        if m_l % 2:
            nx_vars.append(cur_x[m_l - 1])
            ny_vars.append(cur_y[m_l - 1])
        cur_x, cur_y = nx_vars, ny_vars
    assert len(cur_x) == 1
    return TEAffineVar(cur_x[0], cur_y[0])


def _te_tree_level(cs, level):
    """One tree level: batched complete adds of point pairs.  4 protocol
    rounds regardless of width (one fused Beaver round for u,v,xy,yx; one
    for t; one batched inverse; one fused round for x3,y3)."""
    from ..mpc import bits as B
    from ..mpc.share import MpcFp, PUBLIC, beaver_inv
    from ..snark.gadgets import _stack_values

    x_vars, y_vars = level
    m = len(x_vars)
    m2 = m // 2
    ax, bx = x_vars[:m2], x_vars[m2:2 * m2]
    ay, by = y_vars[:m2], y_vars[m2:2 * m2]
    axv = _stack_values([v.value for v in ax])
    ayv = _stack_values([v.value for v in ay])
    bxv = _stack_values([v.value for v in bx])
    byv = _stack_values([v.value for v in by])

    lhs = MpcFp.concat([axv, ayv, axv, ayv], axis=0)
    rhs = MpcFp.concat([bxv, byv, byv, bxv], axis=0)
    prods = lhs * rhs                              # ONE fused Beaver round
    u_v, v_v = prods[0:m2], prods[m2:2 * m2]
    xy_v, yx_v = prods[2 * m2:3 * m2], prods[3 * m2:4 * m2]
    t_v = u_v * v_v
    d_fp = MpcFp.const(cs.spec, ED_D)
    dt = t_v * d_fp
    one = MpcFp.const(cs.spec, 1)
    denx = one + dt
    deny = one - dt
    inv = beaver_inv(MpcFp.concat([denx, deny], axis=0))
    num = MpcFp.concat([xy_v + yx_v, v_v + u_v], axis=0)
    res = num * inv                                # ONE fused Beaver round
    x3_v, y3_v = res[0:m2], res[m2:2 * m2]

    u_w = _alloc_vec(cs, u_v)
    v_w = _alloc_vec(cs, v_v)
    t_w = _alloc_vec(cs, t_v)
    xy_w = _alloc_vec(cs, xy_v)
    yx_w = _alloc_vec(cs, yx_v)
    x3_w = _alloc_vec(cs, x3_v)
    y3_w = _alloc_vec(cs, y3_v)
    for i in range(m2):
        cs.enforce(ax[i].lc, bx[i].lc, u_w[i].lc)
        cs.enforce(ay[i].lc, by[i].lc, v_w[i].lc)
        cs.enforce(u_w[i].lc, v_w[i].lc, t_w[i].lc)
        cs.enforce(ax[i].lc, by[i].lc, xy_w[i].lc)
        cs.enforce(ay[i].lc, bx[i].lc, yx_w[i].lc)
        denx_lc = LC.constant(1) + t_w[i].lc.scale(ED_D % cs.spec.p)
        deny_lc = LC.constant(1) - t_w[i].lc.scale(ED_D % cs.spec.p)
        cs.enforce(x3_w[i].lc, denx_lc, xy_w[i].lc + yx_w[i].lc)
        cs.enforce(y3_w[i].lc, deny_lc, v_w[i].lc + u_w[i].lc)

    nx, ny = x3_w, y3_w
    if m % 2:                                      # odd point rides up
        nx = nx + [x_vars[-1]]
        ny = ny + [y_vars[-1]]
    return (nx, ny)


def pedersen_crh_gadget(cs: ConstraintSystem, in_bits: list, cp
                        ) -> TEAffineVar:
    """Pedersen CRH in-circuit: H(x) = sum x_i G_i, no blinding (reference
    `crh/pedersen/constraints.rs`); cp: crypto.pedersen.CrhParams."""
    acc = TEAffineVar.neutral(cs)
    for i, bit in enumerate(in_bits):
        acc = acc.conditionally_add_constant(bit, cp.generators[i])
    return acc


def pedersen_two_to_one_crh_gadget(cs: ConstraintSystem, left_bits: list,
                                   right_bits: list, cp) -> TEAffineVar:
    """TwoToOneCRH gadget: concat left/right bit wires, then the windowed
    CRH (reference `crh/pedersen/constraints.rs:93-121`)."""
    assert len(left_bits) == len(right_bits)
    return pedersen_crh_gadget(cs, list(left_bits) + list(right_bits), cp)
