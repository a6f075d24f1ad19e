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
    """Shared (or public) batch of short-Weierstrass points."""

    __slots__ = ("point", "visibility")

    def __init__(self, point: SWPoint, visibility: str):
        self.point = point
        self.visibility = visibility

    def tree_flatten(self):
        return (self.point,), (self.visibility,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

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
            # leader adds the public point to its share
            t = T.current()
            mask = t.party_index(len(self.shape)) == 0
            mask = jnp.broadcast_to(mask, a.point.shape)
            added = sw_add_complete(a.point, b.point)
            return MpcSWPoint(SWPoint.select(mask, added, a.point), SHARED)
        return MpcSWPoint(sw_add_complete(a.point, b.point), SHARED)

    def __neg__(self):
        return MpcSWPoint(sw_neg(self.point), self.visibility)

    def __sub__(self, other):
        return self + (-other)

    def scale_public(self, k: MpcFp) -> "MpcSWPoint":
        """Multiply by a public scalar (local)."""
        assert k.visibility == PUBLIC
        return MpcSWPoint(sw_scalar_mul(self.point, k.value), self.visibility)

    def scale(self, x: MpcFp) -> "MpcSWPoint":
        """Multiply by a (possibly shared) scalar."""
        if x.visibility == PUBLIC:
            return self.scale_public(x)
        if self.visibility == PUBLIC:
            # public base, shared scalar: local scalar-mul of shares
            return MpcSWPoint(sw_scalar_mul(self.point, x.value), SHARED)
        return _group_beaver_scale(self, x)

    def reveal(self) -> SWPoint:
        """Open the shared point: fold all party shares with complete adds."""
        if self.visibility == PUBLIC:
            return self.point
        t = T.current()
        gathered = _tree_gather(t, self.point)  # leading axis = parties
        acc = _index0(gathered, 0)
        for i in range(1, t.n_parties):
            acc = sw_add_complete(acc, _index0(gathered, i))
        if t.kind == "stacked":
            acc = M._bcast_sw(acc, (t.n_parties,) + acc.shape)
        return acc

    def open(self) -> "MpcSWPoint":
        return MpcSWPoint(self.reveal(), PUBLIC)


def _index0(p: SWPoint, i: int) -> SWPoint:
    return p[i]


def mpc_msm(bases: SWPoint, scalars: MpcFp) -> MpcSWPoint:
    """MSM of public bases with (shared or public) scalar vector [..., N].

    Shared case is communication-free: each party MSMs its scalar shares
    (reference `multi_scale_pub_group`, `share/group.rs:113-124`)."""
    t = T.current()
    out = M.sw_msm(bases, scalars.value)
    return MpcSWPoint(out, scalars.visibility)


def _group_beaver_scale(P: MpcSWPoint, x: MpcFp) -> MpcSWPoint:
    """x*P for shared x, shared P via a group triple (a, B, C=a*B):
    open d = x - a and E = P - B, then x*P = C + d*B + a*E + d*E
    (reference `share/group.rs:72-111`)."""
    c = ctx()
    a, Bp, Cp = c.triple_source.group_triples(P, x.spec)
    d = (x - a).reveal()                      # public scalar
    E = (P - Bp).reveal()                     # public point
    d_pub = MpcFp(d, PUBLIC)
    term_db = Bp.scale_public(d_pub)
    term_aE = MpcSWPoint.from_public_party_layout(E).scale(a)
    term_dE = MpcSWPoint(sw_scalar_mul(E, d), PUBLIC)
    return Cp + term_db + term_aE + term_dE


def from_public_party_layout(point: SWPoint) -> MpcSWPoint:
    """Wrap an already party-laid-out point as public."""
    return MpcSWPoint(point, PUBLIC)


MpcSWPoint.from_public_party_layout = staticmethod(from_public_party_layout)


def reveal_sw_point(p: MpcSWPoint) -> SWPoint:
    return p.reveal()
