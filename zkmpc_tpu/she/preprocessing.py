"""SPDZ preprocessing: Beaver triples / pairs via SHE (DPSZ11 §5-§6).

Mirrors the reference's `src/preprocessing.rs` — a *single-process simulation
of all parties* (the reference holds the joint secret key locally and never
networks the preprocessing; `preprocessing.rs:447-538`), generalized from the
reference's hardcoded n=3 to any party count, and batched: one call produces
whole tensors of triples (the reference generates them one SIMD-packed
ciphertext at a time).

Pieces:
- ``reshare``: mask a ciphertext with encrypted party randomness, decrypt the
  masked value, re-distribute additive shares (+ optional fresh ciphertext)
  (`preprocessing.rs:467-538`).
- ``angle``: SPDZ <.> sharing with alpha-MACs via ciphertext multiply +
  reshare (`preprocessing.rs:540-611`).
- ``bracket``: [.] sharing with per-party MAC keys (`preprocessing.rs:613-721`).
- ``initialize``: alpha generation + ZKPoPK + bracket(alpha)
  (`preprocessing.rs:732-809`).
- ``pair`` / ``triple``: random pairs and multiplication triples
  (`preprocessing.rs:823-974`).
- ``zkpopk_prove`` / ``zkpopk_verify``: proof of plaintext knowledge
  (DPSZ11 Fig.10, `preprocessing.rs:6-445`) with a *real* Fiat-Shamir hash
  (blake2b) instead of the reference's seeded-RNG stub
  (`preprocessing.rs:235-239`).
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..mpc.share import MpcFp, SHARED
from ..ops.limbs import FR, MNT4Q, FpArray
from . import bgv, ring

P = FR.p


@dataclasses.dataclass
class DealerContext:
    """Single-process preprocessing state (trusted-dealer-style simulation,
    like the reference; the sk exists only inside this context)."""
    params: bgv.SheParams
    n_parties: int
    sk: bgv.SecretKey
    pk: bgv.PublicKey
    alpha_shares: FpArray | None = None     # [P] Fr
    e_alpha: bgv.Ciphertext | None = None   # Enc(diag(alpha))
    beta: FpArray | None = None             # [P] per-party bracket MAC keys
    e_beta: list | None = None              # per-party Enc(diag(beta_j))
    alpha_bracket: tuple | None = None      # bracket(alpha) from initialize


def make_dealer(params: bgv.SheParams, n_parties: int, key) -> DealerContext:
    k1, _ = jax.random.split(key)
    sk, pk = bgv.keygen(params, k1)
    return DealerContext(params, n_parties, sk, pk)


# ---------------------------------------------------------------- ctx pickle
# ``initialize`` is the one host-bound phase (ZKPoPK Fiat-Shamir hashing runs
# eagerly around the jitted commit/respond kernels; ~10 min on the tunneled
# TPU), while everything downstream (pair/triple) jits.  The initialized
# dealer state is pure data, so persist it — the file-handoff analogue of the
# reference writing preprocessing outputs to ``outputs/<i>/online_setup.json``
# (`src/serialize.rs:101-147`), applied to the dealer instead of the parties.

_SPEC_BY_NAME = {FR.name: FR, MNT4Q.name: MNT4Q}


def _enc_node(x):
    if x is None:
        return None
    if isinstance(x, FpArray):
        # store tightened (bound <= 2): a loaded dealer can then feed
        # jit kernels without any eager tighten pass (see _dec_node)
        x = _n2q(x)
        return ("fp", x.spec.name, int(x.bound),
                np.asarray(jax.device_get(x.limbs)))
    if isinstance(x, bgv.Ciphertext):
        return ("ct", _enc_node(x.c0), _enc_node(x.c1), _enc_node(x.c2))
    if isinstance(x, (list, tuple)):
        return ("seq", isinstance(x, tuple), [_enc_node(v) for v in x])
    raise TypeError(f"unpicklable dealer field: {type(x)}")


def _dec_node(d):
    if d is None:
        return None
    tag = d[0]
    if tag == "fp":
        _, name, bound, limbs = d
        # keep limbs as HOST numpy: a jnp.asarray here is an eager device
        # transfer, which flips the axon runtime into its degraded launch
        # mode (see bench.py ordering note) — jit calls transfer arguments
        # themselves without that side effect
        return FpArray(np.asarray(limbs), _SPEC_BY_NAME[name], bound)
    if tag == "ct":
        return bgv.Ciphertext(_dec_node(d[1]), _dec_node(d[2]), _dec_node(d[3]))
    _, is_tuple, items = d
    seq = [_dec_node(v) for v in items]
    return tuple(seq) if is_tuple else seq


def dealer_to_host(ctx: DealerContext) -> dict:
    return {
        "n": ctx.params.n, "sigma": ctx.params.sigma,
        "n_parties": ctx.n_parties,
        "sk": _enc_node(ctx.sk.s),
        "pk_a": _enc_node(ctx.pk.a), "pk_b": _enc_node(ctx.pk.b),
        "alpha_shares": _enc_node(ctx.alpha_shares),
        "e_alpha": _enc_node(ctx.e_alpha),
        "beta": _enc_node(ctx.beta),
        "e_beta": _enc_node(ctx.e_beta),
        "alpha_bracket": _enc_node(ctx.alpha_bracket),
    }


def dealer_from_host(doc: dict) -> DealerContext:
    params = bgv.SheParams(doc["n"], doc["sigma"])
    ctx = DealerContext(params, doc["n_parties"],
                        bgv.SecretKey(_dec_node(doc["sk"])),
                        bgv.PublicKey(_dec_node(doc["pk_a"]),
                                      _dec_node(doc["pk_b"])))
    ctx.alpha_shares = _dec_node(doc["alpha_shares"])
    ctx.e_alpha = _dec_node(doc["e_alpha"])
    ctx.beta = _dec_node(doc["beta"])
    ctx.e_beta = _dec_node(doc["e_beta"])
    ctx.alpha_bracket = _dec_node(doc["alpha_bracket"])
    return ctx


#: bump when the dealer doc layout or FpArray limb layout changes — a stale
#: pickle must be regenerated, not silently loaded (triple() does not
#: validate MACs, so stale state would produce plausible-looking garbage)
_DEALER_SCHEMA = 2


def cached_initialized_dealer(n_slots: int, n_parties: int, cache_dir: str,
                              seed: int = 100) -> DealerContext:
    """Load an initialized dealer from ``cache_dir`` or run
    ``make_dealer`` + ``initialize`` and persist the result.

    Robustness: the pickle is written to a temp file and os.replace()d into
    place (no truncated files from a crashed/concurrent run), carries a
    schema version + parameters, and any unreadable/mismatched file is
    deleted and regenerated."""
    import os
    import pickle
    import tempfile

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"dealer_{n_slots}s_{n_parties}p_{seed}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                doc = pickle.load(f)
            if (doc.get("schema") == _DEALER_SCHEMA
                    and doc.get("n") == n_slots
                    and doc.get("n_parties") == n_parties):
                return dealer_from_host(doc)
        except Exception:
            pass
        os.remove(path)     # stale/corrupt: regenerate below
    params = bgv.SheParams(n_slots)
    ctx = make_dealer(params, n_parties, jax.random.PRNGKey(seed))
    initialize(ctx, jax.random.PRNGKey(seed + 1))
    doc = dealer_to_host(ctx)
    doc["schema"] = _DEALER_SCHEMA
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".pkl.tmp")
    with os.fdopen(fd, "wb") as f:
        pickle.dump(doc, f)
    os.replace(tmp, path)
    return ctx


# ------------------------------------------------------------ jit kernels
# The protocol-phase jits take the dealer state (pk/sk/e_alpha limbs) as
# ARGUMENTS, not closure constants: with baked-in constants every fresh
# dealer produced a distinct HLO, so the XLA persistent cache never hit and
# every bench/test run re-paid a 100-300 s compile on the tunneled TPU.
# Parameterized, the HLO depends only on (n, n_parties), and a cold
# initialize on a warm-cache box is execution-only (~1 s).


def dealer_state(ctx: DealerContext) -> dict:
    """Dealer arrays as a jit-argument pytree."""
    st = dict(pk_a=_n2q(ctx.pk.a).limbs, pk_b=_n2q(ctx.pk.b).limbs,
              sk=_n2q(ctx.sk.s).limbs)
    if ctx.e_alpha is not None:
        st.update(ea_c0=_n2q(ctx.e_alpha.c0).limbs,
                  ea_c1=_n2q(ctx.e_alpha.c1).limbs,
                  ea_c2=_n2q(ctx.e_alpha.c2).limbs)
    return st


def _ctx_from_state(params: bgv.SheParams, n_parties: int,
                    st: dict) -> DealerContext:
    def fq(l):
        return FpArray(l, MNT4Q, 2)
    ctx = DealerContext(params, n_parties, bgv.SecretKey(fq(st["sk"])),
                        bgv.PublicKey(fq(st["pk_a"]), fq(st["pk_b"])))
    if "ea_c0" in st:
        ctx.e_alpha = bgv.Ciphertext(fq(st["ea_c0"]), fq(st["ea_c1"]),
                                     fq(st["ea_c2"]))
    return ctx


@functools.lru_cache(maxsize=None)
def _kernel(name: str, n: int, n_parties: int, sigma: float):
    """Module-level jitted protocol phases, keyed by static shape params
    only; dealer data arrives as the `st` argument."""
    params = bgv.SheParams(n, sigma)
    P_ = n_parties

    def fq(l):
        return FpArray(l, MNT4Q, 2)

    if name == "angle":
        def fn(st, c0, c1, c2, key):
            ctx = _ctx_from_state(params, P_, st)
            e = bgv.Ciphertext(_n2q(fq(c0)), fq(c1), fq(c2))
            e_gamma = ctx.e_alpha.mul(e)
            mac_shares, _ = reshare(ctx, e_gamma, jax.random.fold_in(key, 1))
            return _n2q(mac_shares).limbs
    elif name == "bracket":
        def fn(st, c0, c1, c2, eb0, eb1, eb2, keys):
            ctx = _ctx_from_state(params, P_, st)
            e = bgv.Ciphertext(fq(c0), fq(c1), fq(c2))

            def per_key(b0, b1, b2, kj):
                e_b = bgv.Ciphertext(fq(b0), fq(b1), fq(b2))
                macs_j, _ = reshare(ctx, e_b.mul(e), kj)
                return _n2q(macs_j).limbs

            return jax.vmap(per_key)(eb0, eb1, eb2, keys)
    elif name == "triple":
        def fn(st, key):
            ctx = _ctx_from_state(params, P_, st)
            (a, ma), (b, mb), (c, mc) = triple(ctx, key)
            return tuple(_n2q(x).limbs for x in (a, ma, b, mb, c, mc))
    elif name == "diag_enc_commit":
        V = _SEC

        def fn(st, vals_l, key):
            from ..mpc.rand import uniform_fp
            ctx = _ctx_from_state(params, P_, st)
            n_ = params.n
            d = FpArray(jnp.broadcast_to(vals_l[:, None, :],
                                         (P_, n_, vals_l.shape[-1])), FR, 2)
            r = bgv.sample_enc_randomness(params,
                                          jax.random.fold_in(key, 0), (P_,))
            ct = bgv.encrypt_slots(ctx.pk, params, d, r)
            m_rq = ring.lift_centered_p_to_q(bgv.encode(d))
            y = uniform_fp(jax.random.fold_in(key, 1), FR, (P_, V, n_))
            y_rq = ring.lift_centered_p_to_q(bgv.encode(y))
            s = bgv.sample_enc_randomness(params,
                                          jax.random.fold_in(key, 2),
                                          (P_, V))
            cm = bgv.encrypt_rq(ctx.pk, y_rq, s)
            hb = jnp.stack([ct.c0.canon_limbs(), ct.c1.canon_limbs()],
                           axis=1)
            cmb = jnp.stack([cm.c0.canon_limbs(), cm.c1.canon_limbs()],
                            axis=1)
            return (dict(ct_c0=_n2q(ct.c0).limbs, ct_c1=_n2q(ct.c1).limbs,
                         cm_c0=_n2q(cm.c0).limbs, cm_c1=_n2q(cm.c1).limbs,
                         rv=_n2q(r.v).limbs, re0=_n2q(r.e0).limbs,
                         re1=_n2q(r.e1).limbs,
                         m_rq=_n2q(m_rq).limbs, y_rq=_n2q(y_rq).limbs,
                         sv=_n2q(s.v).limbs, se0=_n2q(s.e0).limbs,
                         se1=_n2q(s.e1).limbs),
                    hb, cmb)
    elif name == "diag_popk_verify":
        def fn(st, stash, eb):
            ctx = _ctx_from_state(params, P_, st)
            m, y = fq(stash["m_rq"]), fq(stash["y_rq"])
            sel = eb[:, :, None, None] > 0
            zsum = _n2q(y + m[:, None])
            z_l = jnp.where(sel, zsum.limbs, y.limbs)
            ts = []
            for s_l, r_l in ((stash["sv"], stash["rv"]),
                             (stash["se0"], stash["re0"]),
                             (stash["se1"], stash["re1"])):
                s_, r_ = fq(s_l), fq(r_l)
                t_ = _n2q(s_ + r_[:, None])
                ts.append(jnp.where(sel, t_.limbs, _n2q(s_).limbs))
            tv, te0, te1 = ts
            lhs = bgv.encrypt_rq(
                ctx.pk, fq(z_l),
                bgv.EncRandomness(fq(tv), fq(te0), fq(te1)))
            ok = jnp.bool_(True)
            for lc, cs_, c_ in ((lhs.c0, fq(stash["cm_c0"]),
                                 fq(stash["ct_c0"])),
                                (lhs.c1, fq(stash["cm_c1"]),
                                 fq(stash["ct_c1"]))):
                plus = _n2q(cs_ + c_[:, None])
                rhs_l = jnp.where(sel, plus.limbs, _n2q(cs_).limbs)
                ok = ok & jnp.all(lc.equals(FpArray(rhs_l, MNT4Q, 2)))
            tau = (FR.p - 1) // 2
            rho = 64
            z_viol = _norm_violation(fq(z_l), 2 * tau)
            t_viol = (_norm_violation(fq(tv), 2 * rho)
                      | _norm_violation(fq(te0), 2 * rho)
                      | _norm_violation(fq(te1), 2 * rho))
            return ok & ~z_viol & ~t_viol
    else:
        raise KeyError(name)
    return jax.jit(fn)


def triple_kernel(ctx: DealerContext):
    """(jitted_fn, state): `jitted_fn(state, key)` produces one triple batch
    with dealer-independent HLO (persistent-cache friendly)."""
    return (_kernel("triple", ctx.params.n, ctx.n_parties, ctx.params.sigma),
            dealer_state(ctx))


def _sum_ct(cts):
    acc = cts[0]
    for c in cts[1:]:
        acc = acc + c
    return acc


def _ct_sum_axis0(ct: bgv.Ciphertext) -> bgv.Ciphertext:
    """Fold a batched ciphertext's leading axis (sum of per-party cts)."""
    def s(f: FpArray):
        acc = FpArray(f.limbs[0], f.spec, f.bound)
        for i in range(1, f.limbs.shape[0]):
            acc = acc + FpArray(f.limbs[i], f.spec, f.bound)
        return acc
    return bgv.Ciphertext(s(ct.c0), s(ct.c1), s(ct.c2))


def _encrypt_party_slots(ctx: DealerContext, slots_P: FpArray, key):
    """slots_P: [P, n] Fr -> ONE batched ciphertext with a leading [P]
    axis.  All parties encrypt in one batched graph (the per-party Python
    loop inlined P copies of the encode+encrypt subgraph into every
    reshare/triple jit — compile mass, `BENCH_r04` 283 s triple compile)."""
    r = bgv.sample_enc_randomness(ctx.params, key, (ctx.n_parties,))
    return bgv.encrypt_slots(ctx.pk, ctx.params, slots_P, r)


def reshare(ctx: DealerContext, e_m: bgv.Ciphertext, key,
            new_ciphertext: bool = False):
    """-> (shares [P, n] Fr, optional fresh Enc(m)).
    Each party masks with f_i, the masked value opens, leader keeps
    (m + f) - f_0, others keep -f_i (`preprocessing.rs:467-538`)."""
    from ..mpc.rand import uniform_fp
    n = ctx.params.n
    P_ = ctx.n_parties
    f = uniform_fp(jax.random.fold_in(key, 1000), FR, (P_, n))
    e_f = _encrypt_party_slots(ctx, f, jax.random.fold_in(key, 2000))
    e_f_sum = _ct_sum_axis0(e_f)
    e_mf = e_m + e_f_sum
    mf = bgv.decrypt_slots(ctx.sk, e_mf)          # m + sum f  [n]
    # shares: leader gets (m + sum f) - f_0, others get -f_i; sums to m
    shares = -f
    lead_share = mf - f[0]
    limbs = shares.limbs
    limbs = limbs.at[0].set(lead_share.limbs)
    shares = FpArray(limbs, FR, max(shares.bound, lead_share.bound))
    fresh = None
    if new_ciphertext:
        r = bgv.sample_enc_randomness(ctx.params,
                                      jax.random.fold_in(key, 3000))
        e_mf_fresh = bgv.encrypt_slots(ctx.pk, ctx.params, mf, r)
        fresh = e_mf_fresh - e_f_sum
    return shares, fresh


def angle(ctx: DealerContext, shares: FpArray, e_m: bgv.Ciphertext, key):
    """SPDZ <m>: (shares [P, n], mac shares [P, n]) with mac = alpha * m
    (`preprocessing.rs:540-611`).  The ciphertext-mult + reshare pipeline
    runs as one jitted graph with the dealer state as arguments (eager TPU
    dispatch is ~ms/op; closure constants would defeat the compile cache)."""
    mac_l = _kernel("angle", ctx.params.n, ctx.n_parties, ctx.params.sigma)(
        dealer_state(ctx),
        _n2q(e_m.c0).limbs, _n2q(e_m.c1).limbs, _n2q(e_m.c2).limbs, key)
    return shares, FpArray(mac_l, FR, 2)


def _diag_encrypt_with_popk(ctx: DealerContext, vals: FpArray, key):
    """Encrypt diag(vals_j) per party with a ZKPoPK each; -> list of cts.

    Fully BATCHED over parties: ONE jitted encrypt+commit phase, ONE host
    Fiat-Shamir pass over device-canonicalized bytes, ONE jitted
    respond+verify phase (re-encryption equality + DPSZ infinity-norm
    bounds on device).  The round-4 form looped zkpopk_prove/verify per
    party with eager `canon_limbs` dispatches between the jits — on the
    tunneled TPU each eager op is a network round trip, which is where the
    361 s initialize wall-clock went (BENCH_r04)."""
    P_ = ctx.n_parties
    n = ctx.params.n
    V = _SEC

    st, hb, cmb = _kernel("diag_enc_commit", n, P_, ctx.params.sigma)(
        dealer_state(ctx), _n2q(vals).limbs, key)
    # ONE host transfer for all hash inputs; blake2b per party.  Bytes per
    # party: ct.c0||ct.c1||ct.c2(zeros)|| for k<V: cm.c0[k]||cm.c1[k]||zeros
    # (the `_hash_fs` component order with c2 = 0 for fresh encryptions).
    hb_h = np.asarray(jax.device_get(hb))          # [P, 2, ring, limbs]
    cmb_h = np.asarray(jax.device_get(cmb))        # [P, 2, V, ring, limbs]
    zeros_c2 = np.zeros_like(hb_h[0, 0]).tobytes()
    ebits_all = []
    for i in range(P_):
        h = hashlib.blake2b(digest_size=32)
        h.update(hb_h[i, 0].tobytes())
        h.update(hb_h[i, 1].tobytes())
        h.update(zeros_c2)
        for k in range(V):
            h.update(cmb_h[i, 0, k].tobytes())
            h.update(cmb_h[i, 1, k].tobytes())
            h.update(zeros_c2)
        e = h.digest()
        ebits_all.append([(e[k // 8] >> (k % 8)) & 1 for k in range(V)])
    eb = jnp.asarray(ebits_all, jnp.uint32)        # [P, V]

    ok = _kernel("diag_popk_verify", n, P_, ctx.params.sigma)(
        dealer_state(ctx), st, eb)
    assert bool(np.asarray(jax.device_get(ok))), "ZKPoPK rejected"
    cts = [bgv.Ciphertext(FpArray(st["ct_c0"][i], MNT4Q, 2),
                          FpArray(st["ct_c1"][i], MNT4Q, 2),
                          FpArray.zeros(MNT4Q, (n,)))
           for i in range(P_)]
    return cts


def bracket(ctx: DealerContext, shares: FpArray, e_m: bgv.Ciphertext, key):
    """SPDZ [m]: per-party MAC keys.  Returns (shares [P, n],
    macs [P_keys, P_holders, n]) with sum_i macs[j, i] == beta_j * m for
    every key-owner j (`preprocessing.rs:613-721` BracketShares: each party
    holds its share plus one MAC share under every other party's key)."""
    assert ctx.e_beta is not None, "initialize() first"
    # stack the per-key ciphertexts once; vmap the (mul + reshare) body over
    # the key-owner axis so the traced graph carries ONE copy instead of
    # n_parties inlined copies (the unrolled form compiled for 236 s on the
    # tunneled TPU at ring degree 1024 — the bulk of initialize wall-clock)
    eb_c0 = jnp.stack([_n2q(cb.c0).limbs for cb in ctx.e_beta])
    eb_c1 = jnp.stack([_n2q(cb.c1).limbs for cb in ctx.e_beta])
    eb_c2 = jnp.stack([_n2q(cb.c2).limbs for cb in ctx.e_beta])
    keys = jnp.stack([jax.random.fold_in(key, j)
                      for j in range(ctx.n_parties)])
    macs_l = _kernel("bracket", ctx.params.n, ctx.n_parties,
                     ctx.params.sigma)(
        dealer_state(ctx),
        _n2q(e_m.c0).limbs, _n2q(e_m.c1).limbs, _n2q(e_m.c2).limbs,
        eb_c0, eb_c1, eb_c2, keys)
    return shares, FpArray(macs_l, FR, 2)


def initialize(ctx: DealerContext, key):
    """Generate alpha + per-party bracket keys beta_j, encrypt each
    diag-encoded key share under a ZKPoPK, store Enc(alpha), and produce
    [alpha] (`preprocessing.rs:732-809`: alpha-gen + ZKPoPKs + bracket of
    alpha)."""
    from ..mpc.rand import uniform_fp
    P_ = ctx.n_parties
    alpha_i = uniform_fp(jax.random.fold_in(key, 1), FR, (P_,))
    beta_i = uniform_fp(jax.random.fold_in(key, 2), FR, (P_,))
    cts = _diag_encrypt_with_popk(ctx, alpha_i, jax.random.fold_in(key, 10))
    ctx.alpha_shares = alpha_i
    ctx.e_alpha = _sum_ct(cts)
    ctx.beta = beta_i
    ctx.e_beta = _diag_encrypt_with_popk(ctx, beta_i,
                                         jax.random.fold_in(key, 20))
    # bracket(alpha): alpha_i is one scalar per party -> replicate across the
    # slot dimension so the MAC ciphertext algebra is uniform, keep slot 0
    n = ctx.params.n
    a_slots = FpArray(jnp.broadcast_to(
        alpha_i.limbs[:, None, :], (P_, n, alpha_i.limbs.shape[-1])),
        FR, alpha_i.bound)
    ctx.alpha_bracket = bracket(ctx, a_slots, ctx.e_alpha,
                                jax.random.fold_in(key, 30))
    return alpha_i


def pair(ctx: DealerContext, key):
    """Random r in both representations (`preprocessing.rs:823-878`):
    returns ((r_shares, r_mac_shares), (r_shares, r_bracket_macs)) —
    the reference's (<r>, [r]) output."""
    from ..mpc.rand import uniform_fp
    P_ = ctx.n_parties
    n = ctx.params.n
    r_i = uniform_fp(jax.random.fold_in(key, 1), FR, (P_, n))
    e_r = _ct_sum_axis0(_encrypt_party_slots(ctx, r_i, jax.random.fold_in(key, 2)))
    _, macs = angle(ctx, r_i, e_r, jax.random.fold_in(key, 3))
    br = bracket(ctx, r_i, e_r, jax.random.fold_in(key, 4)) \
        if ctx.e_beta is not None else None
    return (r_i, macs), br


def inv_pair(ctx: DealerContext, key):
    """Random (r, r^-1) in <.> representation: sample r, s, open w = r*s via
    SHE multiply + decrypt, set r^-1 shares = s_i * w^-1 (w public)
    (`share.rs:17-42` inv_pair interface; the reference never generates
    these — its online inv uses the dummy source)."""
    from ..mpc.rand import uniform_fp
    P_ = ctx.n_parties
    n = ctx.params.n
    r_i = uniform_fp(jax.random.fold_in(key, 1), FR, (P_, n))
    s_i = uniform_fp(jax.random.fold_in(key, 2), FR, (P_, n))
    e_r = _ct_sum_axis0(_encrypt_party_slots(ctx, r_i, jax.random.fold_in(key, 3)))
    e_s = _ct_sum_axis0(_encrypt_party_slots(ctx, s_i, jax.random.fold_in(key, 4)))
    w = bgv.decrypt_slots(ctx.sk, e_r.mul(e_s))        # [n] public
    w_inv = w.inv()
    rinv_i = s_i * w_inv.broadcast_to(s_i.shape)       # scale by public
    # fresh low-noise ciphertext of r^-1 for its MAC (dealer-side re-encrypt,
    # same trust model as the reference's reshare which decrypts centrally;
    # Enc(s)*lift(encode(w^-1)) would overflow the q noise budget: the lifted
    # coefficients are ~p/2)
    rinv_slots = bgv.decrypt_slots(ctx.sk, e_s) * w_inv
    re = bgv.sample_enc_randomness(ctx.params, jax.random.fold_in(key, 7))
    e_rinv = bgv.encrypt_slots(ctx.pk, ctx.params, rinv_slots, re)
    _, mac_r = angle(ctx, r_i, e_r, jax.random.fold_in(key, 5))
    _, mac_rinv = angle(ctx, rinv_i, e_rinv, jax.random.fold_in(key, 6))
    return (r_i, mac_r), (rinv_i, mac_rinv)


def triple(ctx: DealerContext, key):
    """Beaver triples: ((a, mac_a), (b, mac_b), (c, mac_c)), each [P, n]
    (`preprocessing.rs:892-974`)."""
    from ..mpc.rand import uniform_fp
    P_ = ctx.n_parties
    n = ctx.params.n
    a_i = uniform_fp(jax.random.fold_in(key, 1), FR, (P_, n))
    b_i = uniform_fp(jax.random.fold_in(key, 2), FR, (P_, n))
    e_a = _ct_sum_axis0(_encrypt_party_slots(ctx, a_i, jax.random.fold_in(key, 3)))
    e_b = _ct_sum_axis0(_encrypt_party_slots(ctx, b_i, jax.random.fold_in(key, 4)))
    e_c = e_a.mul(e_b)
    c_i, e_c_fresh = reshare(ctx, e_c, jax.random.fold_in(key, 5),
                             new_ciphertext=True)
    _, mac_a = angle(ctx, a_i, e_a, jax.random.fold_in(key, 6))
    _, mac_b = angle(ctx, b_i, e_b, jax.random.fold_in(key, 7))
    _, mac_c = angle(ctx, c_i, e_c_fresh, jax.random.fold_in(key, 8))
    return (a_i, mac_a), (b_i, mac_b), (c_i, mac_c)


# ---------------------------------------------------------------------------
# ZKPoPK (DPSZ11 Fig. 10) — sound Fiat-Shamir via blake2b
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ZkPoPK:
    commitments: list          # ciphertexts a_k
    challenge: bytes
    z: FpArray                 # response plaintext slots [V, n]
    t: list                    # response randomness (v, e0, e1) coeff arrays


_SEC = 8  # soundness bits per run (reference uses sec=1 in its params)


def _hash_fs(ctx, ct: bgv.Ciphertext, comms) -> bytes:
    h = hashlib.blake2b(digest_size=32)
    for c in [ct] + comms:
        for comp in (c.c0, c.c1, c.c2):
            h.update(np.asarray(jax.device_get(comp.canon_limbs())).tobytes())
    return h.digest()


def _ctx_jit(ctx: DealerContext, name: str, fn):
    """Per-dealer cache of jitted protocol phases (a fresh jax.jit wrapper
    per call would recompile every time)."""
    cache = getattr(ctx, "_jits", None)
    if cache is None:
        cache = {}
        ctx._jits = cache
    if name not in cache:
        cache[name] = jax.jit(fn)
    return cache[name]


def _n2q(f: FpArray) -> FpArray:
    f = f.tighten()
    return f if f.bound == 2 else FpArray(f.limbs, f.spec, 2)


def zkpopk_prove(ctx: DealerContext, slots: FpArray, r: bgv.EncRandomness,
                 ct: bgv.Ciphertext, key) -> ZkPoPK:
    """Prove knowledge of (m, r) for ct = Enc(m, r).

    The response z lives in the *lifted* R_q message domain, where encryption
    is exactly linear (the centered lift itself is not additive mod p — the
    reference likewise runs the protocol over Encodedtext integer vectors,
    `preprocessing.rs:106-159`).

    Runs as two JITTED phases (commitments; responses) around the host-side
    Fiat-Shamir hash — the fully-eager form paid one TPU dispatch/compile
    per array op and took minutes per proof."""
    V = _SEC
    n = ctx.params.n

    def commit(slots_l, key):
        from ..mpc.rand import uniform_fp
        m_rq = ring.lift_centered_p_to_q(
            bgv.encode(FpArray(slots_l, FR, 2)))
        y = uniform_fp(jax.random.fold_in(key, 1), FR, (V, n))
        y_rq = ring.lift_centered_p_to_q(bgv.encode(y))
        s = bgv.sample_enc_randomness(ctx.params,
                                      jax.random.fold_in(key, 2), (V,))
        cm = bgv.encrypt_rq(ctx.pk, y_rq, s)
        # every returned tensor is tightened to bound 2: the caller rewraps
        # the raw limbs as FpArray(..., bound=2), and an under-labeled lazy
        # representation (encrypt outputs reach bound ~6) silently breaks
        # canonicalization in the verifier's equality checks
        return (_n2q(m_rq).limbs, _n2q(y_rq).limbs,
                _n2q(cm.c0).limbs, _n2q(cm.c1).limbs,
                _n2q(s.v).limbs, _n2q(s.e0).limbs, _n2q(s.e1).limbs)

    m_l, y_l, c0_l, c1_l, sv, se0, se1 = _ctx_jit(ctx, "popk_commit", commit)(
        _n2q(slots).limbs, key)
    comms = [bgv.Ciphertext(FpArray(c0_l[k], MNT4Q, 2),
                            FpArray(c1_l[k], MNT4Q, 2),
                            FpArray.zeros(MNT4Q, (n,)))
             for k in range(V)]
    e = _hash_fs(ctx, ct, comms)
    ebits = [(e[k // 8] >> (k % 8)) & 1 for k in range(V)]
    eb = jnp.asarray(ebits, jnp.uint32)

    def respond(m_l, y_l, sv, se0, se1, rv, re0, re1, eb):
        def fq(l):
            return FpArray(l, MNT4Q, 2)
        m, y = fq(m_l), fq(y_l)
        zsum = _n2q(y + m)
        z_l = jnp.where(eb[:, None, None] > 0, zsum.limbs, y.limbs)
        outs = [z_l]
        for s_l, r_l in ((sv, rv), (se0, re0), (se1, re1)):
            s_, r_ = fq(s_l), fq(r_l)
            t_ = _n2q(s_ + r_)
            outs.append(jnp.where(eb[:, None, None] > 0, t_.limbs,
                                  _n2q(s_).limbs))
        return tuple(outs)

    z_l, tv, te0, te1 = _ctx_jit(ctx, "popk_respond", respond)(
        m_l, y_l, sv, se0, se1,
        _n2q(r.v).limbs, _n2q(r.e0).limbs, _n2q(r.e1).limbs, eb)
    zarr = FpArray(z_l, MNT4Q, 2)
    ts = [bgv.EncRandomness(FpArray(tv[k], MNT4Q, 2),
                            FpArray(te0[k], MNT4Q, 2),
                            FpArray(te1[k], MNT4Q, 2)) for k in range(V)]
    return ZkPoPK(comms, e, zarr, ts)


def _limbs_gt_const(canon, c: int, spec) -> "jnp.ndarray":
    """Elementwise (value > c) for canonical little-endian limb tensors,
    fully on device (lexicographic from the most-significant limb)."""
    from ..ops.limbs import int_to_limbs
    cl = jnp.asarray(int_to_limbs(c, spec.nlimbs))
    gt = canon > cl
    eq = canon == cl
    # value > c iff exists j with limb_j > c_j and limbs equal above j
    eq_above = jnp.flip(jnp.cumprod(
        jnp.flip(eq, axis=-1).astype(jnp.uint32), axis=-1), axis=-1)
    eq_above = jnp.concatenate(
        [eq_above[..., 1:], jnp.ones_like(eq_above[..., :1])], axis=-1)
    return jnp.any(gt & (eq_above > 0), axis=-1)


def _norm_violation(x: FpArray, thr: int):
    """Traced scalar bool: any coefficient with |centered lift| > thr
    (in-graph form of `_inf_norm_exceeds` for batched verifiers)."""
    q = x.spec.p
    limbs = x.int_limbs()
    viol = _limbs_gt_const(limbs, thr, x.spec) & \
        ~_limbs_gt_const(limbs, q - thr - 1, x.spec)
    return jnp.any(viol)


def _inf_norm_exceeds(x: FpArray, thr: int) -> bool:
    """max |centered lift| > thr, evaluated on device in one pass (the old
    host loop converted every coefficient to a Python bigint — minutes of
    wall-clock at ring degree 1024)."""
    q = x.spec.p
    limbs = x.int_limbs()          # canonical INTEGER limbs (de-Montgomery)
    viol = _limbs_gt_const(limbs, thr, x.spec) & \
        ~_limbs_gt_const(limbs, q - thr - 1, x.spec)
    return bool(np.asarray(jax.device_get(jnp.any(viol))))


def zkpopk_verify(ctx: DealerContext, ct: bgv.Ciphertext, proof: ZkPoPK) -> bool:
    """Check Enc_rq(z_k, t_k) == a_k + e_k * ct (re-encryption equality) AND
    the DPSZ Fig.10 infinity-norm bounds on the responses — the check the
    reference leaves unimplemented (`preprocessing.rs:258-328` verifies
    re-encryption only; its `hash` is also an RNG stub, `:235-239`)."""
    e = _hash_fs(ctx, ct, proof.commitments)
    if e != proof.challenge:
        return False
    V = _SEC
    # norm bounds: honest z = y + e*m with both centered <= tau = (p-1)/2,
    # honest t = s + e*r with gaussian coeffs (sigma = 3.2, tail < 10 sigma)
    tau = (FR.p - 1) // 2
    rho = 64          # 2 x 10-sigma tail bound per summand
    if _inf_norm_exceeds(proof.z, 2 * tau):
        return False
    t_all = FpArray.stack(
        [comp for t in proof.t for comp in (t.v, t.e0, t.e1)], axis=0)
    if _inf_norm_exceeds(t_all, 2 * rho):
        return False
    ebits = [(e[k // 8] >> (k % 8)) & 1 for k in range(V)]
    eb = jnp.asarray(ebits, jnp.uint32)

    def reenc_check(z_l, tv, te0, te1, c0s, c1s, ct0, ct1, eb):
        def fq(l):
            return FpArray(l, MNT4Q, 2)
        lhs = bgv.encrypt_rq(
            ctx.pk, fq(z_l),
            bgv.EncRandomness(fq(tv), fq(te0), fq(te1)))
        ok = jnp.bool_(True)
        for lc, cs, c in ((lhs.c0, c0s, ct0), (lhs.c1, c1s, ct1)):
            plus = _n2q(fq(cs) + fq(c))
            rhs_l = jnp.where(eb[:, None, None] > 0, plus.limbs, fq(cs).limbs)
            ok = ok & jnp.all(lc.equals(FpArray(rhs_l, MNT4Q, 2)))
        return ok

    z_l = _n2q(proof.z).limbs
    tv = jnp.stack([_n2q(t.v).limbs for t in proof.t])
    te0 = jnp.stack([_n2q(t.e0).limbs for t in proof.t])
    te1 = jnp.stack([_n2q(t.e1).limbs for t in proof.t])
    c0s = jnp.stack([_n2q(c.c0).limbs for c in proof.commitments])
    c1s = jnp.stack([_n2q(c.c1).limbs for c in proof.commitments])
    ok = _ctx_jit(ctx, "popk_reenc", reenc_check)(
        z_l, tv, te0, te1, c0s, c1s,
        _n2q(ct.c0).limbs, _n2q(ct.c1).limbs, eb)
    return bool(np.asarray(jax.device_get(ok)))


# ---------------------------------------------------------------------------
# Triple source backed by preprocessing (closing the loop the reference
# leaves open: its online phase uses dummy triples, `wire/field.rs:44-63`)
# ---------------------------------------------------------------------------


class SheTripleSource:
    """Serves Beaver triples from a preprocessing pool; refills by running
    `triple` batches.  Stacked layout only (one device simulating parties)."""

    def __init__(self, ctx: DealerContext, key):
        self.ctx = ctx
        self.key = key
        self._pool = []    # list of ((a, ma), (b, mb), (c, mc)) slot tensors
        self._count = 0

    def _refill(self):
        self.key, k = jax.random.split(self.key)
        fn, st = triple_kernel(self.ctx)
        a, ma, b, mb, c, mc = fn(st, k)
        wrap = lambda l: FpArray(l, FR, 2)
        self._pool.append(((wrap(a), wrap(ma)), (wrap(b), wrap(mb)),
                           (wrap(c), wrap(mc))))

    def field_triples(self, spec, shape):
        assert spec is FR
        total = int(np.prod(shape, dtype=np.int64)) if shape else 1
        n = self.ctx.params.n
        batches = []
        got = 0
        while got < total:
            self._refill()
            batches.append(self._pool.pop())
            got += n

        def cat(idx, midx):
            vals = FpArray.concat([b[idx][0] for b in batches], axis=1)
            macs = FpArray.concat([b[idx][1] for b in batches], axis=1)
            return vals, macs

        use_mac = _current_backend_spdz()
        out = []
        for i in range(3):
            vals, macs = cat(i, i)
            vals = _shape_to(vals, shape, total)
            macs = _shape_to(macs, shape, total)
            out.append(MpcFp(vals, SHARED, macs if use_mac else None))
        return tuple(out)

    def inv_pairs(self, spec, shape):
        assert spec is FR
        total = int(np.prod(shape, dtype=np.int64)) if shape else 1
        n = self.ctx.params.n
        batches = []
        got = 0
        while got < total:
            self.key, k = jax.random.split(self.key)
            batches.append(inv_pair(self.ctx, k))
            got += n
        use_mac = _current_backend_spdz()
        out = []
        for i in range(2):
            vals = FpArray.concat([b[i][0] for b in batches], axis=1)
            macs = FpArray.concat([b[i][1] for b in batches], axis=1)
            vals = _shape_to(vals, shape, total)
            macs = _shape_to(macs, shape, total)
            out.append(MpcFp(vals, SHARED, macs if use_mac else None))
        return tuple(out)

    def group_triples(self, P, scalar_spec):
        """Group Beaver triple (a, B, C=a*B) for scaling a shared point by a
        shared scalar (`share/group.rs:72-111`, `share/spdz.rs:424-489`).

        Derived from a *field* triple (a, b, c=a*b) by the linearity of the
        fixed-base map s -> s*G: each party locally computes B_i = b_i*G and
        C_i = c_i*G (sums = b*G, c*G = a*(b*G)), and the group MAC shares are
        the scalar MAC shares mapped the same way (sum_i mac_b_i*G =
        (alpha*b)*G = alpha*B) — so the authenticated group triple costs no
        extra preprocessing beyond one field triple.
        """
        from ..mpc.group import MpcSWPoint
        from ..ops import msm as M_
        from ..ops.curve import SWPoint, sw_scalar_mul
        from ..ops.fp2 import Fp2Array
        from ..spec import curves as SC_

        a, b, c = self.field_triples(scalar_spec, P.shape)
        if isinstance(P.point.x, Fp2Array):
            gen = SWPoint.g2_from_affine_ints([SC_.G2_GEN])
        else:
            gen = SWPoint.g1_from_affine_ints([SC_.G1_GEN])
        gen_b = M_._bcast_sw(gen[0], b.value.shape)

        def to_pt(w):
            mac = None if w.mac is None else sw_scalar_mul(gen_b, w.mac)
            return MpcSWPoint(sw_scalar_mul(gen_b, w.value), SHARED, mac)

        return a, to_pt(b), to_pt(c)

    def rand_shares(self, spec, shape):
        """Authenticated random shared values from the <r> pair pool
        (`preprocessing.rs:823-878`); used for SPDZ proof randomness."""
        assert spec is FR
        total = int(np.prod(shape, dtype=np.int64)) if shape else 1
        n = self.ctx.params.n
        vals_b, macs_b = [], []
        got = 0
        while got < total:
            self.key, k = jax.random.split(self.key)
            (r_i, macs), _ = pair(self.ctx, k)
            vals_b.append(r_i)
            macs_b.append(macs)
            got += n
        vals = _shape_to(FpArray.concat(vals_b, axis=1), shape, total)
        macs = _shape_to(FpArray.concat(macs_b, axis=1), shape, total)
        return MpcFp(vals, SHARED,
                     macs if _current_backend_spdz() else None)


def _current_backend_spdz():
    from ..mpc.share import ctx as mpc_ctx
    return mpc_ctx().backend == "spdz"


def _shape_to(x: FpArray, shape, total):
    flat = FpArray(x.limbs[:, :total, :], x.spec, x.bound)
    tgt = (x.limbs.shape[0],) + tuple(shape) + (x.limbs.shape[-1],)
    return FpArray(flat.limbs.reshape(tgt), x.spec, x.bound)
