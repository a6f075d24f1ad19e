"""Multiplicative secret sharing: ``MpcMulFp``.

TPU-native equivalent of the reference's ``MulFieldShare``
(`mpc-algebra/src/share/additive.rs:258-347`): the secret is the *product*
of the per-party factors, so

- ``reveal`` = all-gather the factors and multiply (one broadcast round);
- ``mul`` / ``square`` / ``inv`` / ``pow`` are purely local (no Beaver
  triples — this is the whole point of the representation);
- ``scale`` by a public constant multiplies the leader's factor only
  (`additive.rs:301-306`);
- ``add`` / ``shift`` are unsupported, as in the reference
  (`additive.rs:296-299,308-310`).

The reference uses this representation for pairing-target ext-field values
(Fqk) inside ``AdditivePairingShare`` (`additive.rs:567-589`) and the SPDZ
variant with exponent MACs (`spdz.rs:501-607`).  Pairings themselves are
never evaluated on shares (reference `wire/pairing.rs:119-143` is
``todo!()``); proofs are opened first — so, like the reference, this type
is an algebra building block, exercised directly by tests.

Layout mirrors ``MpcFp``: factors are party-shaped FpArray tensors
([P, batch...] stacked / [batch...] per-party mesh program).  Public values
are replicated; ``from_public`` places the value on the leader and 1
elsewhere (`additive.rs:270-275`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.limbs import FieldSpec, FpArray
from ..parallel import transport as T
from .share import PUBLIC, SHARED, _gather_stack


def _prod_axis0(x: FpArray) -> FpArray:
    """Product over axis 0 via pairwise folds (log-depth tree)."""
    while x.shape and x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        folded = x[:half] * x[half:2 * half]
        if n % 2:
            folded = FpArray.concat([folded, x[2 * half:]], axis=0)
        x = folded
    return x[0]


@jax.tree_util.register_pytree_node_class
class MpcMulFp:
    """Multiplicatively-shared (or public) field tensor."""

    __slots__ = ("value", "visibility")

    def __init__(self, value: FpArray, visibility: str):
        self.value = value
        self.visibility = visibility

    def tree_flatten(self):
        return (self.value,), (self.visibility,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def spec(self) -> FieldSpec:
        return self.value.spec

    def is_shared(self):
        return self.visibility == SHARED

    def __repr__(self):
        return f"MpcMulFp({self.visibility}, {self.value!r})"

    # --------------------------------------------------------------- creation

    @classmethod
    def from_public(cls, value: FpArray) -> "MpcMulFp":
        """Leader holds the value, everyone else holds 1, marked shared
        (`additive.rs:270-275` ``from_public``)."""
        t = T.current()
        ones = FpArray.ones(value.spec, value.shape)
        if t.kind == "stacked":
            stacked = FpArray.stack(
                [value] + [ones] * (t.n_parties - 1), axis=0)
            return cls(stacked, SHARED)
        is_leader = t.party_id_scalar() == 0
        mine = FpArray.select(
            jnp.broadcast_to(is_leader, value.shape), value, ones)
        return cls(mine, SHARED)

    @classmethod
    def from_shares(cls, factors: FpArray) -> "MpcMulFp":
        """Wrap raw per-party factors (`additive.rs:276-278`
        ``from_add_shared`` — the reference reuses the same hook name)."""
        return cls(factors, SHARED)

    @classmethod
    def public(cls, value: FpArray) -> "MpcMulFp":
        """A replicated public wire (no sharing)."""
        t = T.current()
        if t.kind == "stacked":
            limbs = jnp.broadcast_to(
                value.limbs[None], (t.n_parties,) + value.limbs.shape)
            value = FpArray(limbs, value.spec, value.bound)
        return cls(value, PUBLIC)

    # --------------------------------------------------------------- openings

    def reveal(self) -> FpArray:
        """Open: product of all parties' factors (`additive.rs:268-270`,
        batched form `additive.rs:287-295`).  One all-gather round."""
        if self.visibility == PUBLIC:
            return self.value
        t = T.current()
        stack = _gather_stack(t, self.value.tighten().limbs)
        prod = _prod_axis0(FpArray(stack, self.spec, 2))
        if t.kind == "stacked":
            limbs = jnp.broadcast_to(
                prod.limbs[None], (t.n_parties,) + prod.limbs.shape)
            prod = FpArray(limbs, prod.spec, prod.bound)
        return prod

    def open(self) -> "MpcMulFp":
        return MpcMulFp(self.reveal(), PUBLIC)

    def unwrap_as_public(self) -> FpArray:
        """Raw local factor (`additive.rs:279-281`)."""
        return self.value

    # ------------------------------------------------------------- arithmetic

    def __mul__(self, other: "MpcMulFp") -> "MpcMulFp":
        """Local multiply — shared*shared needs no communication
        (`additive.rs:312-331` ``beaver_mul``/``batch_mul`` ignore the
        triple source)."""
        assert isinstance(other, MpcMulFp)
        vis = SHARED if (self.is_shared() or other.is_shared()) else PUBLIC
        return MpcMulFp(self.value * other.value, vis)

    def square(self) -> "MpcMulFp":
        return MpcMulFp(self.value.square(), self.visibility)

    def inv(self) -> "MpcMulFp":
        """Local per-factor inverse (`additive.rs:333-338`)."""
        return MpcMulFp(self.value.inv(), self.visibility)

    def pow_const(self, e: int) -> "MpcMulFp":
        return MpcMulFp(self.value.pow_const(e), self.visibility)

    def scale(self, k: FpArray) -> "MpcMulFp":
        """Multiply by a public constant: leader's factor only
        (`additive.rs:301-306`)."""
        if self.visibility == PUBLIC:
            return MpcMulFp(self.value * k, PUBLIC)
        t = T.current()
        nd = self.value.ndim
        is_leader = t.party_index(
            nd - 1 if t.kind == "stacked" else nd) == 0
        scaled = self.value * k
        mask = jnp.broadcast_to(is_leader, self.value.shape)
        return MpcMulFp(FpArray.select(mask, scaled, self.value), SHARED)

    def __add__(self, other):
        raise NotImplementedError(
            "add on multiplicative shares (reference additive.rs:296-299)")

    __radd__ = __add__

    def shift(self, other):
        raise NotImplementedError(
            "shift on multiplicative shares (reference additive.rs:308-310)")
