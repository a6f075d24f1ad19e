"""Secret-shared field/group tensors: the MPC wire layer.

TPU-native re-design of the reference's share + wire stack
(`mpc-algebra/src/share/{field,group,additive,spdz}.rs`,
`mpc-algebra/src/wire/{field,group}.rs`): instead of a `Public|Shared` enum
around each scalar, a whole tensor is either public (replicated across
parties) or shared (each party holds an additive share), with visibility as
static metadata.  All protocol communication is expressed through the ambient
`parallel.transport` (psum = share opening).

Semantics preserved from the reference:

- public constants are added by the leader only (`share/additive.rs:147`);
- `Mul(shared, shared)` is a (batched) Beaver multiplication: mask with a
  triple, open two values, recombine (`share/field.rs:62-129`);
- SPDZ backend carries a MAC share per wire; openings accumulate a MAC check
  that must be drained and verified (`share/spdz.rs:125-196`, "Pragmatic MPC
  6.6.2");
- `king_share`: the leader deals additive shares (`reveal.rs:36-48`).
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses

import jax
import jax.numpy as jnp

from ..ops.limbs import FieldSpec, FpArray
from ..parallel import transport as T
from . import rand as R

PUBLIC = "public"
SHARED = "shared"


# ---------------------------------------------------------------------------
# context
# ---------------------------------------------------------------------------


class MpcContext:
    """Ambient MPC execution state: transport, backend, triples, SPDZ key."""

    def __init__(self, transport: T.Transport, backend: str = "semi",
                 triple_source=None, alpha_share: FpArray | None = None,
                 mac_check_key=None, chips_axis: str | None = None,
                 n_chips: int = 1):
        assert backend in ("semi", "spdz")
        self.transport = transport
        self.backend = backend
        self.triple_source = triple_source or DummyTripleSource()
        self.alpha_share = alpha_share  # FpArray, party-shaped scalar share
        self.mac_check_key = mac_check_key
        # intra-party multi-chip sharding: when set (inside shard_map over a
        # 2-D mesh ("parties", chips_axis)), the MSM hot loop splits its
        # point range across the party's chips (parallel/sharded.py)
        self.chips_axis = chips_axis
        self.n_chips = n_chips
        self._mac_accum = None  # random linear combination of MAC residues
        self._mac_count = 0

    def alpha_for(self, batch_ndim: int) -> FpArray:
        """alpha share reshaped to broadcast against party-shaped batch tensors."""
        a = self.alpha_share
        lead = a.limbs.shape[:-1]  # (P,) stacked / () mesh
        limbs = a.limbs.reshape(lead + (1,) * batch_ndim + (a.spec.nlimbs,))
        return FpArray(limbs, a.spec, a.bound)

    # -- MAC check accumulation (SPDZ batched check) --

    def accumulate_mac_residue(self, residue: FpArray):
        """residue: party-shaped [P?, batch...] share tensor that must open to 0."""
        lead = 1 if self.transport.kind == "stacked" else 0
        batch = residue.shape[lead:]
        flat = residue.reshape(residue.shape[:lead] + (-1,)) if batch \
            else residue.reshape(residue.shape[:lead] + (1,))
        if self.mac_check_key is not None:
            k = jax.random.fold_in(self.mac_check_key, self._mac_count)
            rho = R.uniform_fp(k, flat.spec, flat.shape[lead:])
            contrib = flat * rho
        else:
            contrib = flat
        s = _sum_last_axis(contrib)
        self._mac_accum = s if self._mac_accum is None else self._mac_accum + s
        self._mac_count += 1

    def drain_mac_check(self):
        """Returns the accumulated MAC-check share (must reveal to zero)."""
        acc = self._mac_accum
        self._mac_accum = None
        return acc

    # -- group MAC check (SPDZ over curve points, `spdz.rs:287-356`) --

    def accumulate_group_mac_residue(self, residue):
        """residue: party-shaped SWPoint share that must open to infinity."""
        from ..ops.curve import SWPoint, sw_add_complete
        if not hasattr(self, "_group_mac_accum"):
            self._group_mac_accum = None
            self._group_mac_count = 0
        lead = 1 if self.transport.kind == "stacked" else 0
        flat = residue.reshape(residue.shape[:lead] + (-1,)) \
            if len(residue.shape) > lead else \
            residue.reshape(residue.shape[:lead] + (1,))
        # fold the batch down to ONE residue point per party so the queue
        # stays O(1) regardless of how many points were opened
        while flat.shape[-1] > 1:
            n = flat.shape[-1]
            half = n // 2
            folded = sw_add_complete(flat[..., :half], flat[..., half:2 * half])
            if n % 2:
                folded = SWPoint.concat([folded, flat[..., 2 * half:]], axis=-1)
            flat = folded
        flat = flat[..., 0]
        if self._group_mac_accum is None:
            self._group_mac_accum = flat
        else:
            self._group_mac_accum = sw_add_complete(self._group_mac_accum,
                                                    flat)
        self._group_mac_count += 1

    @property
    def group_mac_residue_count(self) -> int:
        """How many opened group shares contributed MAC residues (tests use
        this to assert the check is NOT vacuous)."""
        return getattr(self, "_group_mac_count", 0)

    @property
    def mac_residue_count(self) -> int:
        """How many field openings contributed MAC residues."""
        return self._mac_count

    def drain_group_mac_check(self):
        acc = getattr(self, "_group_mac_accum", None)
        self._group_mac_accum = None
        self._group_mac_count = 0
        return acc

    def assert_group_macs(self, require_nonempty: bool = False):
        """Open the accumulated group residue; must be the point at
        infinity on every slot.  With ``require_nonempty`` the check fails
        if NO group opening ever contributed a residue (i.e. the proof ran
        with unauthenticated group shares) — guards against the vacuous-pass
        failure mode."""
        import numpy as np
        if require_nonempty and self.group_mac_residue_count == 0:
            raise AssertionError(
                "SPDZ group MAC queue is empty: no authenticated group "
                "share was ever opened")
        acc = self.drain_group_mac_check()
        if acc is None:
            return True
        from .group import MpcSWPoint
        opened = MpcSWPoint(acc, "shared").reveal()
        inf = np.asarray(jax.device_get(opened.inf))
        if not bool(inf.all()):
            raise AssertionError("SPDZ group MAC check failed")
        return True

    def assert_field_macs(self, require_nonempty: bool = False):
        """Open the accumulated field MAC residue; must be zero
        (`spdz.rs:125-196` batched check)."""
        import numpy as np
        if require_nonempty and self.mac_residue_count == 0:
            raise AssertionError("SPDZ field MAC queue is empty")
        acc = self.drain_mac_check()
        if acc is None:
            return True
        # open WITHOUT re-entering MAC accumulation: psum the residue shares
        t = self.transport
        from ..ops.limbs import _resolve2
        s = t.psum(acc.tighten().limbs)
        opened = FpArray(_resolve2(s)[..., :acc.spec.nlimbs], acc.spec,
                         2 * t.n_parties).tighten()
        if not bool(np.asarray(jax.device_get(opened.is_zero())).all()):
            raise AssertionError("SPDZ field MAC check failed")
        return True


_CTX: contextvars.ContextVar = contextvars.ContextVar("zkmpc_mpc_ctx", default=None)


def ctx() -> MpcContext:
    c = _CTX.get()
    if c is None:
        raise RuntimeError("no MPC context; use `with mpc_scope(ctx):`")
    return c


@contextlib.contextmanager
def mpc_scope(c: MpcContext):
    tok = _CTX.set(c)
    with T.scope(c.transport):
        try:
            yield c
        finally:
            _CTX.reset(tok)


def _sum_fp(x: FpArray) -> FpArray:
    """Sum a 1-D FpArray to a scalar via pairwise folds."""
    while x.shape and x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        rest = x[2 * half:] if n % 2 else None
        folded = x[:half] + x[half:2 * half]
        if rest is not None:
            folded = FpArray.concat([folded, rest], axis=0)
        x = folded
    return x


def _sum_last_axis(x: FpArray) -> FpArray:
    """Sum an FpArray over its last batch axis via pairwise folds."""
    while x.shape[-1] > 1:
        n = x.shape[-1]
        half = n // 2
        a = FpArray(x.limbs[..., :half, :], x.spec, x.bound)
        b = FpArray(x.limbs[..., half:2 * half, :], x.spec, x.bound)
        folded = a + b
        if n % 2:
            rest = FpArray(x.limbs[..., 2 * half:, :], x.spec, x.bound)
            folded = FpArray(
                jnp.concatenate([folded.limbs, rest.limbs], axis=-2),
                x.spec, max(folded.bound, rest.bound))
        x = folded
    return FpArray(x.limbs[..., 0, :], x.spec, x.bound)


# ---------------------------------------------------------------------------
# helpers bridging stacked/mesh layouts
# ---------------------------------------------------------------------------


def _gather_stack(t: T.Transport, arr):
    """Party-local array -> [P, ...] stack of all parties' arrays."""
    if t.kind == "stacked":
        return arr
    return t.all_gather(arr)


def _rebroadcast(t: T.Transport, arr):
    """[...]-shaped public result -> party-shaped layout."""
    if t.kind == "stacked":
        return jnp.broadcast_to(arr[None], (t.n_parties,) + arr.shape)
    return arr


def party_shape(t: T.Transport, batch_shape):
    return ((t.n_parties,) + tuple(batch_shape)) if t.kind == "stacked" \
        else tuple(batch_shape)


def check_eq(x) -> bool:
    """Debug util: broadcast a supposedly-public value and assert every
    party holds the same bits (reference `wire/macros.rs:8-33` check_eq,
    compiled into debug builds).  Accepts a public MpcFp or a raw FpArray
    in party layout; returns True or raises."""
    t = T.current()
    if isinstance(x, MpcFp):
        assert x.visibility == PUBLIC, "check_eq is for public values"
        arr = x.value
    else:
        arr = x
    limbs = _gather_stack(t, arr.limbs)          # [P, ...]
    same = (limbs == limbs[:1]).all()
    if not bool(jax.device_get(same)):
        raise AssertionError("check_eq: parties disagree on a public value")
    return True


# ---------------------------------------------------------------------------
# MpcFp: secret-shared / public field tensor
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class MpcFp:
    """Field tensor with visibility. value layout: [P, batch...] (stacked) or
    [batch...] (mesh, per-party program).  Public values are replicated."""

    __slots__ = ("value", "mac", "visibility")

    def __init__(self, value: FpArray, visibility: str, mac: FpArray | None = None):
        self.value = value
        self.visibility = visibility
        self.mac = mac

    def tree_flatten(self):
        if self.mac is None:
            return (self.value,), (self.visibility, False)
        return (self.value, self.mac), (self.visibility, True)

    @classmethod
    def tree_unflatten(cls, aux, children):
        vis, has_mac = aux
        if has_mac:
            return cls(children[0], vis, children[1])
        return cls(children[0], vis, None)

    @property
    def spec(self):
        return self.value.spec

    @property
    def shape(self):
        """Batch shape (excluding the stacked party axis)."""
        s = self.value.shape
        if T.current().kind == "stacked":
            return s[1:]
        return s

    def is_shared(self):
        return self.visibility == SHARED

    def __repr__(self):
        return f"MpcFp({self.visibility}, {self.value!r})"

    # --------------------------------------------------------------- creation

    @classmethod
    def from_public(cls, value: FpArray):
        """Replicate a plain (host/global) FpArray as a public wire."""
        t = T.current()
        if t.kind == "stacked":
            limbs = jnp.broadcast_to(value.limbs[None],
                                     (t.n_parties,) + value.limbs.shape)
            value = FpArray(limbs, value.spec, value.bound)
        return cls(value, PUBLIC)

    @classmethod
    def const(cls, spec: FieldSpec, ints):
        import numpy as np
        return cls.from_public(FpArray.from_int(spec, np.asarray(ints, dtype=object)))

    @classmethod
    def from_shares(cls, share_value: FpArray, mac: FpArray | None = None):
        """Wrap raw additive shares (already party-laid-out)."""
        c = ctx()
        if c.backend == "spdz" and mac is None:
            raise ValueError("spdz wire requires a mac share")
        return cls(share_value, SHARED, mac)

    # --------------------------------------------------------------- openings

    def reveal(self) -> FpArray:
        """Open to a public plain FpArray (party-shaped, replicated)."""
        c = ctx()
        t = c.transport
        if self.visibility == PUBLIC:
            return self.value
        x = self.value.tighten()
        opened_limbs = t.psum(x.limbs)
        from ..ops.limbs import _resolve2
        opened = FpArray(_resolve2(opened_limbs)[..., :x.spec.nlimbs],
                         x.spec, 2 * t.n_parties).tighten()
        if c.backend == "spdz":
            # residue share: mac_i - alpha_i * opened  (sums to 0 iff honest)
            lead = 1 if t.kind == "stacked" else 0
            residue = self.mac - opened * c.alpha_for(opened.ndim - lead)
            c.accumulate_mac_residue(residue)
        return opened

    def open(self) -> "MpcFp":
        return MpcFp(self.reveal(), PUBLIC)

    # ------------------------------------------------------------- arithmetic

    def _leader_mask(self):
        t = T.current()
        nd = self.value.ndim  # batch dims (+party dim in stacked layout)
        return t.party_index(nd - 1 if t.kind == "stacked" else nd) == 0

    def _aligned(self, other):
        """Insert singleton batch axes after the party axis so that wires of
        different batch rank broadcast (e.g. scalar const + vector share)."""
        lead = 1 if T.current().kind == "stacked" else 0
        ra = self.value.ndim - lead
        rb = other.value.ndim - lead
        rank = max(ra, rb)

        def fix(w: MpcFp, r):
            if r >= rank:
                return w

            def rs(f: FpArray):
                shp = f.limbs.shape
                new = shp[:lead] + (1,) * (rank - r) + shp[lead:]
                return FpArray(f.limbs.reshape(new), f.spec, f.bound)
            return MpcFp(rs(w.value), w.visibility,
                         None if w.mac is None else rs(w.mac))
        return fix(self, ra), fix(other, rb)

    def __add__(self, other):
        other = _coerce(other, self.spec)
        a, b = self._aligned(other)
        if a.visibility == b.visibility == PUBLIC:
            return MpcFp(a.value + b.value, PUBLIC)
        if a.visibility == PUBLIC:
            a, b = b, a
        if b.visibility == PUBLIC:
            # leader adds the public constant to its share
            mask = a._leader_mask()
            shifted = FpArray.select(
                jnp.broadcast_to(mask, a.value.shape), a.value + b.value, a.value)
            mac = None
            if a.mac is not None:
                c = ctx()
                lead = 1 if c.transport.kind == "stacked" else 0
                mac = a.mac + b.value * c.alpha_for(b.value.ndim - lead)
            return MpcFp(shifted, SHARED, mac)
        mac = None if a.mac is None else a.mac + b.mac
        return MpcFp(a.value + b.value, SHARED, mac)

    def __neg__(self):
        return MpcFp(-self.value, self.visibility,
                     None if self.mac is None else -self.mac)

    def __sub__(self, other):
        other = _coerce(other, self.spec)
        return self + (-other)

    def __mul__(self, other):
        other = _coerce(other, self.spec)
        a, b = self._aligned(other)
        if a.visibility == b.visibility == PUBLIC:
            return MpcFp(a.value * b.value, PUBLIC)
        if a.visibility == PUBLIC:
            a, b = b, a
        if b.visibility == PUBLIC:  # scale: local
            mac = None if a.mac is None else a.mac * b.value
            return MpcFp(a.value * b.value, SHARED, mac)
        return beaver_mul(a, b)

    def square(self):
        return self * self

    def smul(self, k: int):
        return MpcFp(self.value.smul(k), self.visibility,
                     None if self.mac is None else self.mac.smul(k))

    def double(self):
        return self.smul(2)

    # ----------------------------------------------------------------- shape

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        t = T.current()
        full = (self.value.shape[0],) + shape if t.kind == "stacked" else shape
        return MpcFp(self.value.reshape(full), self.visibility,
                     None if self.mac is None else self.mac.reshape(full))

    def __getitem__(self, idx):
        """Index into the batch (party axis is preserved)."""
        t = T.current()
        if t.kind == "stacked":
            if not isinstance(idx, tuple):
                idx = (idx,)
            idx = (slice(None),) + idx
        return MpcFp(self.value[idx], self.visibility,
                     None if self.mac is None else self.mac[idx])

    @staticmethod
    def concat(xs, axis=0):
        t = T.current()
        ax = axis + 1 if t.kind == "stacked" else axis
        vis = SHARED if any(x.is_shared() for x in xs) else PUBLIC
        xs = [x if x.visibility == vis else _promote_to_shared(x) for x in xs]
        mac = None
        if xs[0].mac is not None:
            mac = FpArray.concat([x.mac for x in xs], ax)
        return MpcFp(FpArray.concat([x.value for x in xs], ax), vis, mac)


def _coerce(x, spec):
    if isinstance(x, MpcFp):
        return x
    if isinstance(x, FpArray):
        return MpcFp.from_public(x)
    if isinstance(x, int):
        import numpy as np
        return MpcFp.from_public(FpArray.from_int(spec, np.asarray(x, dtype=object)))
    raise TypeError(type(x))


def _promote_to_shared(x: MpcFp) -> MpcFp:
    """Public -> trivial sharing (leader holds value, others hold 0)."""
    assert x.visibility == PUBLIC
    c = ctx()
    mask = jnp.broadcast_to(x._leader_mask(), x.value.shape)
    sh = FpArray.select(mask, x.value, FpArray.zeros(x.spec, x.value.shape))
    mac = None
    if c.backend == "spdz":
        lead = 1 if c.transport.kind == "stacked" else 0
        mac = x.value * c.alpha_for(x.value.ndim - lead)
    return MpcFp(sh, SHARED, mac)


# ---------------------------------------------------------------------------
# Beaver multiplication + triple sources
# ---------------------------------------------------------------------------


class TripleSource:
    """Provider of multiplication triples / inverse pairs
    (reference `mpc-algebra/src/share.rs:17-42`)."""

    def field_triples(self, spec: FieldSpec, shape):
        raise NotImplementedError

    def inv_pairs(self, spec: FieldSpec, shape):
        raise NotImplementedError

    def rand_shares(self, spec: FieldSpec, shape):
        """Authenticated random shared values (SPDZ <r> pairs,
        `preprocessing.rs:823-878`)."""
        raise NotImplementedError


class DummyTripleSource(TripleSource):
    """INSECURE constant (1,1,1) triples — mirrors the reference's
    `DummyFieldTripleSource` placeholder (`wire/field.rs:44-63`).  Correct
    results, no privacy.  Swap in the SHE-backed source for real runs."""

    def field_triples(self, spec, shape):
        one = _promote_to_shared(MpcFp.const(spec, 1))
        t = T.current()
        full = party_shape(t, shape)

        def bcast(f: FpArray):
            tgt = full + (spec.nlimbs,)
            src = f.limbs.reshape((f.limbs.shape[0],) + (1,) * len(shape) +
                                  (spec.nlimbs,)) if t.kind == "stacked" \
                else f.limbs.reshape((1,) * len(shape) + (spec.nlimbs,))
            return FpArray(jnp.broadcast_to(src, tgt), spec, f.bound)

        def bcast_wire(w: MpcFp):
            return MpcFp(bcast(w.value), SHARED,
                         None if w.mac is None else bcast(w.mac))

        a = bcast_wire(one)
        return a, a, a

    def inv_pairs(self, spec, shape):
        a, _, _ = self.field_triples(spec, shape)
        return a, a

    def group_triples(self, P, scalar_spec):
        """Group triple (a, B, C=a*B) with a=1 and B=the group generator
        (leader-held share); batch shape matches P.  INSECURE placeholder
        mirroring `DummyGroupTripleSource` (`wire/group.rs:36-71`)."""
        from ..ops import msm as _M
        from ..ops.curve import SWPoint
        from ..ops.fp2 import Fp2Array
        from ..spec import curves as _SC
        from .group import MpcSWPoint

        t = T.current()
        a, _, _ = self.field_triples(scalar_spec, P.shape)
        # generator of the matching group, broadcast to the party layout
        if isinstance(P.point.x, Fp2Array):
            gen = SWPoint.g2_from_affine_ints([_SC.G2_GEN])
        else:
            gen = SWPoint.g1_from_affine_ints([_SC.G1_GEN])
        gen = _M._bcast_sw(gen[0], P.point.shape)
        # leader holds the generator, others hold infinity
        mask = jnp.broadcast_to(t.party_index(len(P.shape)) == 0, P.point.shape)
        from ..ops.curve import SWPoint as _SW
        inf = _SW.infinity_like(gen)
        # spdz: B's value is the public generator, so every party can form
        # its group MAC share as alpha_i * G (sum = alpha * G = alpha * B)
        mac = None
        if ctx().backend == "spdz":
            from .group import _alpha_scale
            mac = _alpha_scale(gen)
        Bp = MpcSWPoint(_SW.select(mask, gen, inf), SHARED, mac)
        return a, Bp, Bp


def beaver_mul(x: MpcFp, y: MpcFp) -> MpcFp:
    """Batched Beaver multiplication (reference `share/field.rs:62-129`):
    open d = x-a and e = y-b, then z = c + d*b + e*a + d*e."""
    c = ctx()
    a, b, cc = c.triple_source.field_triples(x.spec, x.shape)
    d = (x - a).reveal()
    e = (y - b).reveal()
    de = MpcFp(d * e, PUBLIC)
    z = cc + b * MpcFp(d, PUBLIC) + a * MpcFp(e, PUBLIC) + de
    return z


def beaver_inv(x: MpcFp) -> MpcFp:
    """Shared inverse via inverse pairs (reference `share/field.rs:131-160`):
    open x*r, return r * (x*r)^-1."""
    c = ctx()
    r, rinv = c.triple_source.inv_pairs(x.spec, x.shape)
    xr = (x * r).reveal()
    return r * MpcFp(xr.inv(), PUBLIC)


def beaver_div(x: MpcFp, y: MpcFp) -> MpcFp:
    """Shared division x/y (reference `share/field.rs:162-177`
    beaver_div/batch_div): mask the divisor with an inverse-pair r, open
    y*r, then x/y = (x*r) * (y*r)^-1."""
    c = ctx()
    r, _ = c.triple_source.inv_pairs(y.spec, y.shape)
    yr = (y * r).reveal()
    return (x * r) * MpcFp(yr.inv(), PUBLIC)


def rand_shared(key, spec: FieldSpec, shape=()) -> MpcFp:
    """Fresh random shared value: each party samples an independent share
    (sum of uniform shares is uniform).

    Under the SPDZ backend shared randomness must carry MACs, so it is drawn
    from the preprocessing pair pool (`preprocessing.rs:823-878` <r>) when
    the triple source provides one; otherwise falls back to the dealt-value
    "cheat" (every party learns r, macs computed locally — the reference's
    `can_cheat` escape hatch, `channel.rs:171-182`, fine for tests only)."""
    c = ctx()
    t = c.transport
    if c.backend != "semi":
        try:
            return c.triple_source.rand_shares(spec, shape)
        except NotImplementedError:
            pass
        v = R.uniform_fp(key, spec, tuple(shape))
        return king_share(v, jax.random.fold_in(key, 0x5bd2))
    if t.kind == "stacked":
        sh = R.uniform_fp(key, spec, (t.n_parties,) + tuple(shape))
    else:
        k = R.party_fold(key, t.party_id_scalar())
        sh = R.uniform_fp(k, spec, shape)
    return MpcFp(sh, SHARED)


# ---------------------------------------------------------------------------
# king share: leader deals additive shares of known values
# ---------------------------------------------------------------------------


def king_share(value: FpArray, key) -> MpcFp:
    """Leader (party 0) deals additive shares of `value`
    (reference `reveal.rs:36-48`, `share/additive.rs:98-107`).

    `key` must be a replicated PRNG key; shares for parties 1..P-1 are PRF
    outputs, the leader keeps value - sum(others).  In a real deployment the
    non-leader shares being derivable from a replicated key is a privacy hole
    — this mirrors the reference's test-net king_share; production input
    sharing uses `input_share` with per-party masks (preprocessed r values).
    """
    c = ctx()
    t = c.transport
    spec = value.spec
    batch = value.shape
    # shares for all parties from the replicated key
    all_shares = R.uniform_fp(key, spec, (t.n_parties,) + tuple(batch))
    others_sum = _sum_axis0(all_shares[1:])
    leader_share = value - others_sum
    if t.kind == "stacked":
        sh = FpArray.concat(
            [leader_share.reshape((1,) + tuple(batch)), all_shares[1:]], axis=0)
    else:
        idx = t.party_id_scalar()
        mine = FpArray(jnp.take(all_shares.limbs, idx, axis=0),
                       spec, all_shares.bound)
        is_leader = idx == 0
        sh = FpArray.select(jnp.broadcast_to(is_leader, mine.shape),
                            leader_share, mine)
    mac = None
    if c.backend == "spdz":
        # the dealt value is known to every party here (replicated key), so
        # each party can compute its mac share directly
        vparty = FpArray(_rebroadcast(t, value.limbs), spec, value.bound)
        mac = vparty * c.alpha_for(len(batch))
    return MpcFp(sh, SHARED, mac)


def _sum_axis0(x: FpArray) -> FpArray:
    if x.shape[0] == 0:
        return FpArray.zeros(x.spec, x.shape[1:])
    acc = x[0]
    for i in range(1, x.shape[0]):
        acc = acc + x[i]
    return acc


# ---------------------------------------------------------------------------
# modulus conversion: re-embed a wire mod p1 as a wire mod p2
# ---------------------------------------------------------------------------


def modulus_conversion(x: MpcFp, target: FieldSpec, key) -> MpcFp:
    """Convert a field wire mod p1 into a wire mod p2 (reference
    `mpc_primitives.rs:75-87` ``ModulusConversion``, used by the Pedersen
    constraint gadget to move booleans from Fr to the TE scalar field,
    `commitment/pedersen/constraints.rs:171,222`).

    Matches the reference protocol exactly (`share/additive.rs:164-181`,
    `spdz.rs:253-265`, both marked "bad implementation, just for testing"):
    the value is *opened*, its integer bit pattern re-embedded mod p2 on
    device (`fp_from_digits`), and the result re-shared by the leader
    (``king_share``).  Only suitable for values that may be made public
    mid-protocol (the reference uses it on commitment openings).

    SPDZ: re-sharing in a different field needs a MAC key in that field;
    like the reference we reuse the ambient context, so the conversion is
    supported when ``target`` matches the MAC-key field, else the semi
    backend must be used for the target wire.
    """
    from ..ops.limbs import fp_from_digits

    t = T.current()
    if x.visibility == PUBLIC:
        v = x.value
        if t.kind == "stacked":
            v = v[0]
        return MpcFp.from_public(fp_from_digits(target, v.int_limbs()))
    opened = x.reveal()
    if t.kind == "stacked":
        opened = opened[0]
    converted = fp_from_digits(target, opened.int_limbs())
    c = ctx()
    if c.backend == "spdz" and c.alpha_share.spec is not target:
        # deal semi-style shares (no MAC) — caller tracks the value's
        # integrity through the commitment it was opened against, as the
        # reference does on this path.
        with mpc_scope(MpcContext(t, "semi", c.triple_source)):
            return king_share(converted, key)
    return king_share(converted, key)
