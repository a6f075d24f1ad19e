"""KZG10 polynomial commitments over BLS12-377 (the Marlin backbone).

Mirrors the reference's vendored ark poly-commit KZG10
(`arkworks/poly-commit/src/kzg10/mod.rs:142,295`): commitments are MSMs of
the SRS powers with polynomial coefficients — run generically over *shared*
coefficients (the collaborative-Marlin hot loop, SURVEY.md §3.1) — and opening
proofs are witness-polynomial commitments.

TPU-first twist: the witness polynomial (p(X) - p(z))/(X - z) is computed by
*pointwise division on an evaluation domain* (one NTT + batched Fermat
inverse + inverse NTT) instead of sequential synthetic division, so shared
polynomials never leave batched tensor form.

Setup and pairing verification are host-side spec code (like Groth16's).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import params
from ..mpc.share import MpcFp, PUBLIC, SHARED
from ..mpc.group import MpcSWPoint, mpc_msm
from ..ops.curve import SWPoint
from ..ops.limbs import FR, FpArray
from ..ops.ntt import Domain
from ..spec import curves as SC
from ..spec import pairing as SP

R = params.FR_MODULUS


@dataclasses.dataclass
class KzgSrs:
    powers: list                    # [(x, y)] G1 powers of tau, length d+1
    g2: tuple                       # h
    beta_g2: tuple                  # tau * h

    def device(self):
        return DeviceKzgSrs(self)


class DeviceKzgSrs:
    def __init__(self, srs: KzgSrs):
        self.srs = srs
        self.powers = SWPoint.g1_from_affine_ints(srs.powers)


def setup(max_degree: int, seed: int = 0) -> KzgSrs:
    """KZG universal setup; tau drawn via ark `Fp::rand` on a ChaCha12
    StdRng stream (seed 0 = `ark_std::test_rng()`, `compat/ark.py`)."""
    from ..compat import ark as A_
    tau = A_.fr_rand(A_.seeded_rng(seed))
    g1, g2 = SC.G1_GEN, SC.G2_GEN
    powers = []
    acc = 1
    for _ in range(max_degree + 1):
        powers.append(SC.g1_mul(g1, acc))
        acc = acc * tau % R
    return KzgSrs(powers, g2, SC.g2_mul(g2, tau))


def save_srs(srs: KzgSrs, path: str) -> None:
    """Persist the universal SRS as 0x-hex JSON.  Mirrors the reference's
    Marlin SRS save/load (`src/marlin.rs:371-376,456-478`) so large one-time
    setups (e.g. the werewolf RoleAssignment SRS) are reusable across runs."""
    import json
    import os

    from ..ops.limbs import FQ
    from ..utils.serialize import field_to_hex

    def hx(v):
        return field_to_hex(int(v), FQ)

    doc = {
        "powers": [[hx(x), hx(y)] for (x, y) in srs.powers],
        "g2": [[hx(c) for c in co] for co in srs.g2],
        "beta_g2": [[hx(c) for c in co] for co in srs.beta_g2],
    }
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f)


def load_srs(path: str) -> KzgSrs:
    import json

    from ..utils.serialize import hex_to_field

    with open(path) as f:
        doc = json.load(f)
    powers = [(hex_to_field(x), hex_to_field(y)) for x, y in doc["powers"]]
    g2 = tuple(tuple(hex_to_field(c) for c in co) for co in doc["g2"])
    beta_g2 = tuple(tuple(hex_to_field(c) for c in co)
                    for co in doc["beta_g2"])
    return KzgSrs(powers, g2, beta_g2)


def commit(srs: DeviceKzgSrs, coeffs: MpcFp) -> MpcSWPoint:
    """coeffs: [..., d] (shared or public) -> commitment point(s)."""
    d = coeffs.shape[-1]
    assert d <= len(srs.srs.powers)
    bases = srs.powers[0:d]
    return mpc_msm(bases, coeffs)


def evaluate(coeffs: MpcFp, z: FpArray) -> MpcFp:
    """p(z) for public z, shared coeffs: powers of z dot coeffs (local)."""
    d = coeffs.shape[-1]
    pows = _pow_vector(z, d)
    scaled = coeffs * MpcFp.from_public(pows)
    from ..mpc.share import _sum_last_axis
    mac = None if scaled.mac is None else _sum_last_axis(scaled.mac)
    return MpcFp(_sum_last_axis(scaled.value), scaled.visibility, mac)


def _pow_vector(z: FpArray, d: int) -> FpArray:
    """[1, z, z^2, ..., z^(d-1)] via log-depth doubling products."""
    import jax.numpy as jnp
    out = FpArray.ones(z.spec, (1,))
    cur = z.reshape((1,)) if z.shape == () else z.reshape((1,))
    while out.shape[0] < d:
        k = out.shape[0]
        # out[k:2k] = out[:k] * z^k ; z^k = cur
        nxt = out * cur
        out = FpArray.concat([out, nxt], axis=0)
        cur = (cur * cur)
    return FpArray(out.limbs[:d], out.spec, out.bound)


def open_at(srs: DeviceKzgSrs, coeffs: MpcFp, z: FpArray,
            domain_n: int | None = None):
    """Opening proof at public z: returns (witness commitment MpcSWPoint,
    claimed value MpcFp).

    Witness poly w(X) = (p(X) - p(z))/(X - z) computed pointwise on a
    power-of-two domain of size >= deg+1 (z is sampled from the whole field,
    so z is outside the domain w.h.p.; a malicious challenge equal to a domain
    point would only cause a division blow-up caught by verification).
    """
    d = coeffs.shape[-1]
    n = domain_n or _next_pow2(d)
    dom = Domain(FR, n)
    v = evaluate(coeffs, z)
    padded = _pad_to(coeffs, n)
    # evaluate on the COSET g*H so opening points inside H (e.g. omega^j for
    # instance-consistency opens) never hit a zero denominator
    evals = _apply(padded, dom.coset_fft)
    g = dom.coset_gen
    xs = FpArray.from_int(
        FR, np.asarray([g * pow(dom.omega, i, R) % R for i in range(n)],
                       dtype=object))
    den = xs - z
    den_inv = den.inv()
    num = evals - _broadcast_scalar(v, n)
    w_evals = num * MpcFp.from_public(den_inv)
    w_coeffs = _apply(w_evals, dom.coset_ifft)
    w_commit = commit(srs, _slice(w_coeffs, d))
    return w_commit, v


def commit_shifted(srs: DeviceKzgSrs, coeffs: MpcFp, shift: int) -> MpcSWPoint:
    """Commitment to X^shift * p(X): MSM against powers[shift:shift+d].

    This is the degree-bound enforcement device (reference marlin_pc
    `shifted_comm`, `arkworks/poly-commit/src/lib.rs:178`): to prove
    deg(p) <= b against an SRS of max degree D, commit X^(D-b) * p as well —
    a cheating prover whose p has degree > b would need powers of tau beyond
    tau^D, which the SRS does not contain, so no consistent shifted
    commitment exists and the batched opening check fails w.h.p.
    """
    d = coeffs.shape[-1]
    assert shift + d <= len(srs.srs.powers), "shifted poly exceeds SRS"
    return mpc_msm(srs.powers[shift:shift + d], coeffs)


def batch_open_at(srs: DeviceKzgSrs, items, z: FpArray, xi: int,
                  domain_n: int | None = None):
    """ONE opening witness for the xi-combined linear combination
    sum_i xi^i * X^{shift_i} * p_i(X) at public point z.

    items: list of (coeffs MpcFp, shift int, value MpcFp == p_i(z)).
    Returns the witness commitment (MpcSWPoint).  Replaces N separate
    `open_at` calls with one evaluation-domain division + one MSM
    (reference `open_combinations`, `poly-commit/src/lib.rs:315`).
    """
    import jax.numpy as jnp

    R_ = FR.p
    L = max(s + c.shape[-1] for c, s, _ in items)
    # combined coefficients: sum_i xi^i * (p_i placed at offset shift_i)
    comb = None
    xi_pow = 1
    for coeffs, shift, _ in items:
        placed = _place(coeffs, shift, L)
        term = _scale_pub_int(placed, xi_pow)
        comb = term if comb is None else comb + term
        xi_pow = xi_pow * xi % R_
    # combined value at z: sum_i xi^i z^{shift_i} v_i
    vcomb = None
    xi_pow = 1
    z_int = int(np.asarray(z.to_ints()).reshape(-1)[0])
    for _, shift, v in items:
        c_int = xi_pow * pow(z_int, shift, R_) % R_
        term = _scale_pub_int(v, c_int)
        vcomb = term if vcomb is None else vcomb + term
        xi_pow = xi_pow * xi % R_
    n = domain_n or _next_pow2(L)
    assert n >= L
    dom = Domain(FR, n)
    padded = _pad_to(comb, n)
    evals = _apply(padded, dom.coset_fft)
    g = dom.coset_gen
    xs = FpArray.from_int(
        FR, np.asarray([g * pow(dom.omega, i, R) % R for i in range(n)],
                       dtype=object))
    den_inv = (xs - z).inv()
    num = evals - _broadcast_scalar(vcomb, n)
    w_evals = num * MpcFp.from_public(den_inv)
    w_coeffs = _apply(w_evals, dom.coset_ifft)
    return commit(srs, _slice(w_coeffs, max(1, L - 1)))


def verify_batch_open(srs: KzgSrs, coms, values, z_int: int, xi: int,
                      proof_pt) -> bool:
    """Host check of a batched opening: C = sum xi^i C_i, v = sum xi^i v_i,
    then ONE pairing product e(C - v g, h) == e(W, beta h - z h).

    coms: list of host affine points (None = infinity); values: ints —
    for degree-bound (shifted) entries the caller passes
    v_i = z^{D-b} * value so the combined value matches the shifted LC.
    """
    acc = None
    v = 0
    xi_pow = 1
    for c_pt, v_int in zip(coms, values):
        acc = SC.g1_add(acc, SC.g1_mul(c_pt, xi_pow) if c_pt else None)
        v = (v + xi_pow * v_int) % R
        xi_pow = xi_pow * xi % R
    return verify_open(srs, acc, z_int, v, proof_pt)


def _place(x: MpcFp, shift: int, total: int) -> MpcFp:
    """Coefficients of X^shift * p, zero-padded to `total`."""
    import jax.numpy as jnp
    d = x.shape[-1]

    def f(fp: FpArray):
        pre = jnp.zeros(fp.limbs.shape[:-2] + (shift, fp.limbs.shape[-1]),
                        jnp.uint32)
        post = jnp.zeros(
            fp.limbs.shape[:-2] + (total - shift - d, fp.limbs.shape[-1]),
            jnp.uint32)
        return FpArray(jnp.concatenate([pre, fp.limbs, post], axis=-2),
                       fp.spec, fp.bound)
    return _apply(x, f)


def _scale_pub_int(x: MpcFp, k: int) -> MpcFp:
    c = FpArray.from_int(FR, np.asarray(k, dtype=object))
    return _apply(x, lambda f: f * c)


def verify_open(srs: KzgSrs, commitment, z_int: int, v_int: int, proof) -> bool:
    """Host pairing check: e(C - v g, h) == e(W, beta h - z h)."""
    c_minus_v = SC.g1_add(commitment, SC.g1_neg(SC.g1_mul(SC.G1_GEN, v_int)))
    rhs_g2 = SC.g2_add(srs.beta_g2, SC.g2_neg(SC.g2_mul(srs.g2, z_int)))
    return SP.product_pairing_is_one([
        (c_minus_v, srs.g2),
        (SC.g1_neg(proof), rhs_g2),
    ])


# ------------------------------------------------------------------ helpers


def _next_pow2(d):
    n = 1
    while n < d:
        n <<= 1
    return n


def _apply(x: MpcFp, fn) -> MpcFp:
    mac = None if x.mac is None else fn(x.mac)
    return MpcFp(fn(x.value), x.visibility, mac)


def _pad_to(x: MpcFp, n: int) -> MpcFp:
    import jax.numpy as jnp
    d = x.shape[-1]
    if d == n:
        return x

    def f(fp: FpArray):
        pad = jnp.zeros(fp.limbs.shape[:-2] + (n - d, fp.limbs.shape[-1]),
                        jnp.uint32)
        return FpArray(jnp.concatenate([fp.limbs, pad], axis=-2),
                       fp.spec, fp.bound)
    return _apply(x, f)


def _slice(x: MpcFp, d: int) -> MpcFp:
    def f(fp: FpArray):
        return FpArray(fp.limbs[..., :d, :], fp.spec, fp.bound)
    return _apply(x, f)


def _broadcast_scalar(v: MpcFp, n: int) -> MpcFp:
    import jax.numpy as jnp

    def f(fp: FpArray):
        limbs = jnp.broadcast_to(fp.limbs[..., None, :],
                                 fp.limbs.shape[:-1] + (n, fp.limbs.shape[-1]))
        return FpArray(limbs, fp.spec, fp.bound)
    return _apply(v, f)
