"""Secret-shared elliptic-curve points (additive group shares).

TPU re-design of the reference's `GroupShare`/`MpcGroup`
(`mpc-algebra/src/share/group.rs`, `wire/group.rs`):

- a shared point tensor is one Jacobian/TE point (batch) per party;
- reveal = gather all party shares + complete-addition fold
  (`share/additive.rs:368-521`);
- `scale(shared_point, shared_scalar)` uses a *group Beaver triple*
  (`share/group.rs:72-111`);
- `multi_scale_pub_group` — MSM of public bases with shared scalars — is a
  purely local MSM on each party's scalar shares (`share/group.rs:113-124`,
  `wire/pairing.rs:714-777`): the single hottest op in collaborative
  Groth16/KZG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import msm as M
from ..ops.curve import (SWPoint, TEPoint, sw_add_complete, sw_neg,
                         sw_scalar_mul, te_add, te_neg, te_scalar_mul)
from ..ops.fp2 import Fp2Array
from ..ops.limbs import FpArray
from ..parallel import transport as T
from .share import PUBLIC, SHARED, MpcFp, ctx

__all__ = ["MpcSWPoint", "mpc_msm", "reveal_sw_point"]


def _tree_gather(t: T.Transport, tree):
    """Gather a point pytree across parties into a leading P axis."""
    if t.kind == "stacked":
        return tree
    return jax.tree_util.tree_map(t.all_gather, tree)


@jax.tree_util.register_pytree_node_class
class MpcSWPoint:
    """Shared (or public) batch of short-Weierstrass points.

    Under the spdz backend a shared point optionally carries a group MAC
    share mac_i with sum_i mac_i = alpha * P (reference `SpdzGroupShare`,
    `share/spdz.rs:278-489`); linear ops maintain it, `reveal` accumulates
    the residue mac_i - alpha_i * P_open into the context's group-MAC queue.
    """

    __slots__ = ("point", "visibility", "mac")

    def __init__(self, point: SWPoint, visibility: str, mac=None):
        self.point = point
        self.visibility = visibility
        self.mac = mac

    def tree_flatten(self):
        if self.mac is None:
            return (self.point,), (self.visibility, False)
        return (self.point, self.mac), (self.visibility, True)

    @classmethod
    def tree_unflatten(cls, aux, children):
        vis, has_mac = aux
        return cls(children[0], vis, children[1] if has_mac else None)

    @property
    def shape(self):
        s = self.point.shape
        return s[1:] if T.current().kind == "stacked" else s

    @classmethod
    def from_public(cls, point: SWPoint):
        t = T.current()
        if t.kind == "stacked":
            shape = (t.n_parties,) + point.shape
            point = M._bcast_sw(point, shape)
        return cls(point, PUBLIC)

    def is_shared(self):
        return self.visibility == SHARED

    # ---------------------------------------------------------------- algebra

    def __add__(self, other: "MpcSWPoint") -> "MpcSWPoint":
        a, b = self, other
        if a.visibility == b.visibility == PUBLIC:
            return MpcSWPoint(sw_add_complete(a.point, b.point), PUBLIC)
        if a.visibility == PUBLIC:
            a, b = b, a
        if b.visibility == PUBLIC:
            # leader adds the public point to its share; every party adds
            # alpha_i * P_pub to its mac share (`spdz.rs:197-219`)
            t = T.current()
            mask = t.party_index(len(self.shape)) == 0
            mask = jnp.broadcast_to(mask, a.point.shape)
            added = sw_add_complete(a.point, b.point)
            mac = None
            if a.mac is not None:
                mac = sw_add_complete(a.mac, _alpha_scale(b.point))
            return MpcSWPoint(SWPoint.select(mask, added, a.point), SHARED,
                              mac)
        if (a.mac is None) != (b.mac is None):
            # never silently drop authentication: a mac'd share may only
            # combine with another mac'd share (`spdz.rs:197-219`)
            raise ValueError(
                "adding a MAC'd group share to a MAC-less one would silently "
                "drop SPDZ authentication")
        mac = None
        if a.mac is not None:
            mac = sw_add_complete(a.mac, b.mac)
        return MpcSWPoint(sw_add_complete(a.point, b.point), SHARED, mac)

    def __neg__(self):
        return MpcSWPoint(sw_neg(self.point), self.visibility,
                          None if self.mac is None else sw_neg(self.mac))

    def __sub__(self, other):
        return self + (-other)

    def scale_public(self, k: MpcFp) -> "MpcSWPoint":
        """Multiply by a public scalar (local)."""
        assert k.visibility == PUBLIC
        return MpcSWPoint(sw_scalar_mul(self.point, k.value), self.visibility,
                          None if self.mac is None
                          else sw_scalar_mul(self.mac, k.value))

    def scale(self, x: MpcFp) -> "MpcSWPoint":
        """Multiply by a (possibly shared) scalar."""
        if x.visibility == PUBLIC:
            return self.scale_public(x)
        if self.visibility == PUBLIC:
            # public base, shared scalar: local scalar-mul of shares; the
            # MAC share of x*P_pub is mac_x * P_pub (linearity:
            # sum_i mac_x_i * P = (alpha*x) * P = alpha * (x*P),
            # `spdz.rs:424-489`)
            mac = None if x.mac is None else sw_scalar_mul(self.point, x.mac)
            return MpcSWPoint(sw_scalar_mul(self.point, x.value), SHARED, mac)
        return _group_beaver_scale(self, x)

    def reveal(self) -> SWPoint:
        """Open the shared point: fold all party shares with complete adds.
        Under spdz, the MAC residue mac_i - alpha_i * P_open joins the
        context's group-MAC check queue (`spdz.rs:287-356`)."""
        if self.visibility == PUBLIC:
            return self.point
        t = T.current()
        gathered = _tree_gather(t, self.point)  # leading axis = parties
        acc = _fold_leading_axis(gathered, t.n_parties)
        if t.kind == "stacked":
            acc = M._bcast_sw(acc, (t.n_parties,) + acc.shape)
        if self.mac is not None:
            residue = sw_add_complete(self.mac, sw_neg(_alpha_scale(acc)))
            ctx().accumulate_group_mac_residue(residue)
        return acc

    def open(self) -> "MpcSWPoint":
        return MpcSWPoint(self.reveal(), PUBLIC)


def _index0(p: SWPoint, i: int) -> SWPoint:
    return p[i]


def _fold_leading_axis(p: SWPoint, n: int) -> SWPoint:
    """Sum a point tree over its leading (party) axis with a masked log-depth
    fori fold — ONE `sw_add_complete` in the traced graph instead of n-1
    inlined copies (each is ~5k eqns for G1, ~15k for G2; the unrolled party
    folds were a large slice of the prove graph's compile mass)."""
    if n == 1:
        return _index0(p, 0)
    # move the party axis to the last batch axis and reuse the masked fold
    moved = jax.tree_util.tree_map(
        lambda leaf: jnp.moveaxis(leaf, 0, -2 if leaf.dtype == jnp.uint32
                                  else -1), p)
    return M._sw_reduce_last(moved)


def _alpha_scale(point: SWPoint) -> SWPoint:
    """alpha_i * P for the context's SPDZ key share (local scalar mul)."""
    c = ctx()
    a = c.alpha_for(len(point.shape) -
                    (1 if c.transport.kind == "stacked" else 0))
    return sw_scalar_mul(point, a)


def with_mac_from_public(point_pub: SWPoint) -> MpcSWPoint:
    """Lift a public point into a mac'd spdz sharing: leader holds P, every
    party holds mac share alpha_i * P (`spdz.rs:278-310` from_public)."""
    t = T.current()
    if t.kind == "stacked":
        point_pub = M._bcast_sw(point_pub, (t.n_parties,) + point_pub.shape)
    wrapped = MpcSWPoint.from_public_party_layout(point_pub)
    mask = jnp.broadcast_to(
        t.party_index(len(point_pub.shape) -
                      (1 if t.kind == "stacked" else 0)) == 0,
        point_pub.shape)
    inf = SWPoint.infinity_like(point_pub)
    share = SWPoint.select(mask, point_pub, inf)
    return MpcSWPoint(share, SHARED, _alpha_scale(point_pub))


def mpc_msm(bases: SWPoint, scalars: MpcFp) -> MpcSWPoint:
    """MSM of public bases with (shared or public) scalar vector [..., N].

    Shared case is communication-free across *parties*: each party MSMs its
    scalar shares (reference `multi_scale_pub_group`, `share/group.rs:113-124`).
    When the context carries a chips axis (2-D mesh: parties x chips), the
    point range additionally splits across the party's own chips with one
    all_gather-fold on ICI (SURVEY.md §5: the reference never shards a single
    MSM; this is the TPU-native scale-out axis)."""
    c = ctx()
    if c.chips_axis is not None and len(bases.shape) == 1:
        from ..parallel.sharded import replicated_sharded_sw_msm

        def msm(s):
            return replicated_sharded_sw_msm(bases, s, c.chips_axis, c.n_chips)
    else:
        def msm(s):
            return M.sw_msm(bases, s)
    out = msm(scalars.value)
    # spdz: msm of the scalar MAC shares IS the group MAC share
    # (sum_i msm(b, mac_i) = msm(b, alpha*s) = alpha * msm(b, s))
    mac = msm(scalars.mac) if scalars.mac is not None else None
    return MpcSWPoint(out, scalars.visibility, mac)


def _group_beaver_scale(P: MpcSWPoint, x: MpcFp) -> MpcSWPoint:
    """x*P for shared x, shared P via a group triple (a, B, C=a*B):
    open d = x - a and E = P - B, then x*P = C + d*B + a*E + d*E
    (reference `share/group.rs:72-111`)."""
    return scale_many([(P, x)])[0]


def mpc_msm_many(bases_list, scalars_list) -> list:
    """k MSMs of public base sets with shared scalar vectors, fused into ONE
    bucketed kernel call (`ops/msm.py:sw_msm_multi`).  Falls back to
    per-MSM calls on the 2-D chips mesh (the sharded kernel handles one
    point range at a time)."""
    c = ctx()
    if c.chips_axis is not None or len(bases_list) == 1:
        return [mpc_msm(b, s) for b, s in zip(bases_list, scalars_list)]
    vals = M.sw_msm_multi(bases_list, [s.value for s in scalars_list])
    macs = [None] * len(bases_list)
    if all(s.mac is not None for s in scalars_list):
        macs = M.sw_msm_multi(bases_list, [s.mac for s in scalars_list])
    vis = scalars_list[0].visibility
    return [MpcSWPoint(v, vis, m) for v, m in zip(vals, macs)]


def _stack_points_last(pts):
    """Stack k same-shaped SWPoints along a new trailing batch axis."""
    exp = [p.reshape(p.shape + (1,)) for p in pts]
    return exp[0] if len(exp) == 1 else SWPoint.concat(exp, axis=-1)


def _take_trailing(p: SWPoint, j: int) -> SWPoint:
    return jax.tree_util.tree_map(
        lambda leaf: leaf[..., j, :] if leaf.dtype == jnp.uint32
        else leaf[..., j], p)


def _bcast_trailing(p: SWPoint, k: int) -> SWPoint:
    """Broadcast a point (batch) to a new trailing batch axis of width k."""
    return jax.tree_util.tree_map(
        lambda leaf: (jnp.broadcast_to(
            leaf[..., None, :], leaf.shape[:-1] + (k, leaf.shape[-1]))
            if leaf.dtype == jnp.uint32 else
            jnp.broadcast_to(leaf[..., None], leaf.shape + (k,))), p)


def scale_many(pairs) -> list:
    """Batched group-Beaver scaling: [x_j * P_j for (P_j, x_j) in pairs]
    with ONE triple batch, ONE batched open round, and ONE fused
    scalar-multiplication ladder for all 3k terms (d*B, a*E, d*E stacked on
    a trailing batch axis).

    Semantics per pair are exactly `share/group.rs:72-111`; the fusion is a
    TPU compile-size/throughput optimization — the traced graph carries one
    ladder construct instead of 3k (each ~25k XLA ops), which is a large
    slice of the cold-compile problem."""
    c = ctx()
    k = len(pairs)
    spec = pairs[0][1].spec
    P_pts = _stack_points_last([p.point for p, _ in pairs])
    P_macs = None
    if all(p.mac is not None for p, _ in pairs):
        P_macs = _stack_points_last([p.mac for p, _ in pairs])
    P = MpcSWPoint(P_pts, SHARED, P_macs)
    x = MpcFp.concat([xx.reshape(1) for _, xx in pairs], axis=0)   # [k]

    a, Bp, Cp = c.triple_source.group_triples(P, x.spec)
    d = (x - a).reveal()                      # public scalars [k]
    E = (P - Bp).reveal()                     # public points [k]

    spdz = a.mac is not None and Bp.mac is not None
    bases = [Bp.point, E, E]
    scal = [d, a.value, d]
    if spdz:
        # MAC ladders ride the same fused graph: mac(d*B) = d * mac_B,
        # mac(a*E) = mac_a * E (`spdz.rs:424-489`)
        bases += [Bp.mac, E]
        scal += [d, a.mac]
    bases_t = SWPoint.concat(bases, axis=-1)
    scal_t = FpArray.concat(scal, axis=-2)     # -2: last batch axis (limbs last)
    prods = sw_scalar_mul(bases_t, scal_t)    # ONE ladder for every term

    def tslice(p, a, b):
        return jax.tree_util.tree_map(
            lambda leaf: leaf[..., a:b, :] if leaf.dtype == jnp.uint32
            else leaf[..., a:b], p)

    db = tslice(prods, 0, k)                  # [.., k]
    aE = tslice(prods, k, 2 * k)
    dE = tslice(prods, 2 * k, 3 * k)
    # per-pair shared sum C + d*B + a*E in ONE masked log fold (the trailing
    # term axis folds with a single add_complete in the graph, vs 3k inlined
    # adds before — each ~5k eqns)
    stack = _stack_term_axis([Cp.point, db, aE])        # [.., k, 3]
    shared_sum = M._sw_reduce_last(stack)               # [.., k]
    mac_sum = None
    if spdz:
        mac_db = tslice(prods, 3 * k, 4 * k)
        mac_aE = tslice(prods, 4 * k, 5 * k)
        mac_sum = M._sw_reduce_last(
            _stack_term_axis([Cp.mac, mac_db, mac_aE]))
    res = MpcSWPoint(shared_sum, SHARED, mac_sum) + \
        MpcSWPoint.from_public_party_layout(dE)         # one public add
    return [MpcSWPoint(_take_trailing(res.point, j), SHARED,
                       None if res.mac is None
                       else _take_trailing(res.mac, j)) for j in range(k)]


def _stack_term_axis(pts):
    """Stack k same-shaped point trees along a NEW trailing batch axis.
    Bound metadata is normalized first so the trees' aux data match."""
    from ..ops.curve import _point_bound2
    pts = [_point_bound2(p.tighten()) for p in pts]
    return jax.tree_util.tree_map(
        lambda *leaves: (jnp.stack(leaves, axis=-2)
                         if leaves[0].dtype == jnp.uint32
                         else jnp.stack(leaves, axis=-1)), *pts)


def scale_sum(pairs, extra_shared=()) -> MpcSWPoint:
    """sum_j x_j * P_j (+ sum of extra SHARED points), with every shared
    term folded by ONE masked log fold.  Compile-size companion to
    `scale_many` for consumers that only need the sum (Groth16's
    C = h-msm + l-msm + s*A + r*B1, `src/groth16.rs:104-182`)."""
    outs = scale_many(pairs)
    terms = list(outs) + list(extra_shared)
    if len(terms) == 1:
        return terms[0]
    stack = _stack_term_axis([t.point for t in terms])
    val = M._sw_reduce_last(stack)
    mac = None
    n_mac = sum(t.mac is not None for t in terms)
    if n_mac:
        if n_mac != len(terms):
            raise ValueError("scale_sum: mixing MAC'd and MAC-less group "
                             "shares would silently drop SPDZ authentication")
        mac = M._sw_reduce_last(_stack_term_axis([t.mac for t in terms]))
    return MpcSWPoint(val, SHARED, mac)


def from_public_party_layout(point: SWPoint) -> MpcSWPoint:
    """Wrap an already party-laid-out point as public."""
    return MpcSWPoint(point, PUBLIC)


MpcSWPoint.from_public_party_layout = staticmethod(from_public_party_layout)


def reveal_sw_point(p: MpcSWPoint) -> SWPoint:
    return p.reveal()
