"""Vectorized big-integer modular arithmetic on TPU: the field compute core.

Replaces the reference's arkworks `Fp256`/`Fp384`/`Fp768` Montgomery scalar
arithmetic (reference `arkworks/algebra/ff/src/fields/models/*`) with *batched
limb tensors* designed for TPU vector units:

- A field element batch is a ``uint32`` tensor ``[..., nlimbs]`` of 15-bit
  limbs (base ``B = 2**15``).  Relaxed limbs are allowed up to ``B + 1`` so all
  limb products fit in 31 bits and column sums of schoolbook convolutions fit
  comfortably in uint32 — no 64-bit arithmetic anywhere (TPUs have no u64).
- Elements are kept in Montgomery form ``x·R mod p`` with ``R = B**nlimbs``.
  Multiplication uses a "fat" Montgomery reduction — one low half-product
  ``m = T·p' mod R`` followed by ``(T + m·p)/R`` — which, unlike the classic
  word-serial CIOS loop, has no sequential cross-limb dependency and maps to a
  handful of vectorized shifted multiply-adds.
- Values are *lazily reduced*: a tensor's value lives in ``[0, bound·p)`` where
  ``bound`` is tracked statically (at trace time).  Additions just add;
  multiplication auto-"tightens" (one extra Montgomery multiply) only when the
  static bounds would overflow the headroom ``R/p``.  Carry propagation in the
  hot path is two data-independent passes, never a sequential scan.

The word size / bound discipline is chosen per field so that every
intermediate provably fits ``uint32``; see ``FieldSpec.__init__`` for the
derivations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

W = 15
B = 1 << W
MASK = B - 1

_U32 = jnp.uint32


def int_to_limbs(x: int, nlimbs: int) -> np.ndarray:
    out = np.zeros(nlimbs, dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = x & MASK
        x >>= W
    assert x == 0, "value does not fit in nlimbs"
    return out


def limbs_to_int(limbs) -> int:
    x = 0
    for i, l in enumerate(np.asarray(limbs, dtype=np.uint64).tolist()):
        x += int(l) << (W * i)
    return x


class FieldSpec:
    """Static (hashable) parameters + precomputed limb tables for one prime field."""

    _cache: dict = {}

    def __new__(cls, name: str, modulus: int, generator: int | None = None,
                two_adicity: int | None = None):
        key = (name, modulus)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        self._init(name, modulus, generator, two_adicity)
        return self

    def _init(self, name, p, generator, two_adicity):
        self.name = name
        self.p = p
        self.generator = generator
        self.two_adicity = two_adicity
        bits = p.bit_length()

        # Choose limb count: minimal, plus one headroom limb if the natural
        # slack B**n / p leaves too little room for lazy accumulation.
        n = -(-bits // W)
        if (B ** n) // p < 256:  # want bound budget c_max = sqrt(B^n/p) >= 16
            n += 1
        self.nlimbs = n
        self.R = B ** n
        assert 4 * p < self.R, (name, bits, n)
        self.r_mod_p = self.R % p
        self.r2 = self.R * self.R % p
        self.rinv = pow(self.R, -1, p)
        self.pprime = (-pow(p, -1, self.R)) % self.R

        self.p_limbs = int_to_limbs(p, n)
        self.pprime_limbs = int_to_limbs(self.pprime, n)
        self.one_limbs = int_to_limbs(self.r_mod_p, n)  # Montgomery repr of 1
        self.int_one_limbs = int_to_limbs(1, n)         # raw integer 1
        self.r2_limbs = int_to_limbs(self.r2, n)        # R^2 mod p

        # Max product of input bounds for a single Montgomery multiply:
        # need bound_a*bound_b*p <= R/2 so the REDC output stays below 2p.
        self.mul_bound_budget = self.R // (2 * p)
        assert self.mul_bound_budget >= 4, (name, self.mul_bound_budget)
        # Max bound for an n-limb tensor at all (value < R).
        self.max_bound = self.R // p

    def __repr__(self):
        return f"FieldSpec({self.name}, {self.nlimbs} limbs)"

    def __hash__(self):
        return hash((self.name, self.p))

    def __eq__(self, other):
        return self is other

    # ---------------------------------------------------------------- tables

    @functools.lru_cache(maxsize=None)
    def sub_digits(self, bound_b: int):
        """Borrow-free digit decomposition of k·p used for subtraction.

        Returns (digits uint32 [nlimbs], k) with sum(d_j B^j) = k*p,
        d_j >= (max possible limb of a tensor with bound ``bound_b``) + 1 for
        every j, so ``d - b`` never underflows in uint32.
        """
        n, p = self.nlimbs, self.p
        # Max top limb of b: floor(bound_b*p / B^(n-1)) + 1 (relaxed slack).
        top_max = (bound_b * p) // (B ** (n - 1)) + 2
        # Middle limbs are at most B+1; covered by the +2B below.
        k = max(bound_b, 1)
        while (k * p) // (B ** (n - 1)) < top_max + 3:
            k += 1
        if k * p >= self.R:
            raise ValueError(
                f"sub_digits: bound {bound_b} too large for field {self.name}")
        e = int_to_limbs(k * p, n).astype(np.int64)
        d = e.copy()
        d[0] += 2 * B
        d[1:n - 1] += 2 * B - 2
        d[n - 1] -= 2
        assert (d >= 0).all() and sum(int(x) << (W * i) for i, x in enumerate(d)) == k * p
        assert d[n - 1] >= top_max + 1, (d[n - 1], top_max)
        assert (d[:n - 1] >= B + 2).all()
        return np.asarray(d, dtype=np.uint32), k


# Concrete field specs -------------------------------------------------------

from .. import params as _P  # noqa: E402

FR = FieldSpec("bls12_377_fr", _P.FR_MODULUS, _P.FR_GENERATOR, _P.FR_TWO_ADICITY)
FQ = FieldSpec("bls12_377_fq", _P.FQ_MODULUS, _P.FQ_GENERATOR % _P.FQ_MODULUS,
               _P.FQ_TWO_ADICITY)
EDFR = FieldSpec("ed_bls12_377_fr", _P.ED_FR_MODULUS, _P.ED_FR_GENERATOR, 1)
MNT4Q = FieldSpec("mnt4_753_fq", _P.MNT4753_FQ_MODULUS, _P.MNT4753_FQ_GENERATOR,
                  _P.MNT4753_FQ_TWO_ADICITY)


# ---------------------------------------------------------------------------
# Low-level limb kernels (operate on raw uint32 arrays)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _pallas_mode():
    """'mosaic' | 'interpret' | None — resolved once per process."""
    from . import pallas_fp
    return pallas_fp.enabled()


def _resolve2(cols):
    """Two relaxed carry passes: columns < 2**26  ->  limbs <= B (length+1)."""
    # pass 1: limbs -> < B + 2**11
    c = cols >> W
    lo = cols & MASK
    y = jnp.concatenate([lo, jnp.zeros_like(lo[..., :1])], axis=-1)
    y = y.at[..., 1:].add(c)
    # pass 2: carries are now 0/1; limbs -> <= B.  (pass-1 top limb < 2**11,
    # so no carry escapes the extended top limb.)
    c2 = y >> W
    z = y & MASK
    z = z.at[..., 1:].add(c2[..., :-1])
    return z


@functools.lru_cache(maxsize=None)
def _conv_matrix(na: int, nb: int, total: int):
    """0/1 int8 matrix [4*na*nb, 2*total] for the byte-plane convolution.

    Input rows are the four byte planes of each outer product a_i*b_j
    (= lo15 & 0xff, lo15 >> 8, hi16 & 0xff, hi16 >> 8 where
    p = lo15 + 2^15 hi16); output columns are two blocks of ``total``:
    weight-1 contributions and weight-2^8 contributions.
    """
    nn = na * nb
    t = np.zeros((4 * nn, 2 * total), dtype=np.int8)
    for i in range(na):
        for j in range(nb):
            r = i * nb + j
            k_lo, k_hi = i + j, i + j + 1
            if k_lo < total:
                t[0 * nn + r, k_lo] = 1          # l0 -> weight 1
                t[1 * nn + r, total + k_lo] = 1  # l1 -> weight 2^8
            if k_hi < total:
                t[2 * nn + r, k_hi] = 1          # h0 -> weight 1
                t[3 * nn + r, total + k_hi] = 1  # h1 -> weight 2^8
    return t


def _conv_cols(a, b, nout=None):
    """Column sums of the limb convolution of a [...,na] and b [...,nb].

    Inputs must have limbs <= B+1.  Output columns < 2*min(na,nb)*2^16 < 2**24.
    ``nout`` truncates to the low ``nout`` columns (for mod-R half products).

    Implemented as one *exact* u8 x s8 -> s32 matmul (the TPU MXU's native
    int8 path; f32 matmuls on TPU are bf16-decomposed and NOT exact for our
    magnitudes): each outer product splits into four byte planes, the 0/1
    matrix routes them to weight-1 / weight-256 column blocks, and the two
    blocks recombine with one shift-add.
    """
    na = a.shape[-1]
    nb = b.shape[-1]
    total = na + nb if nout is None else nout
    outer = a[..., :, None] * b[..., None, :]          # u32, exact (<2^31)
    lo15 = outer & MASK
    hi16 = outer >> W
    batch = outer.shape[:-2]
    nn = na * nb

    def plane(x, shift):
        return ((x >> shift) & 0xFF).astype(jnp.uint8).reshape(batch + (nn,))

    flat = jnp.concatenate(
        [plane(lo15, 0), plane(lo15, 8), plane(hi16, 0), plane(hi16, 8)],
        axis=-1)                                        # [..., 4nn] u8
    t = _conv_matrix(na, nb, total)
    blocks = jax.lax.dot_general(
        flat, t, (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # [..., 2*total] s32
    w0 = blocks[..., :total].astype(_U32)
    w1 = blocks[..., total:].astype(_U32)
    return w0 + (w1 << 8)


def _mont_mul_limbs(spec: FieldSpec, a, b):
    """REDC(a*b): inputs value < c1*p, c2*p with c1*c2*p <= R/2; output < 2p.

    Large batches route to the fused Pallas kernel on TPU
    (`pallas_fp.mont_mul_pallas`): one Mosaic kernel instead of ~15 HLO ops,
    ~4x faster at depth and ~10x faster to compile (measured v5e)."""
    mode = _pallas_mode()
    if mode is not None:
        from . import pallas_fp
        batch = np.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        size = int(np.prod(batch, dtype=np.int64)) if batch else 1
        if size >= pallas_fp.MIN_PALLAS_BATCH:
            return pallas_fp.mont_mul_pallas(spec, a, b, mode)
    n = spec.nlimbs
    t_cols = _conv_cols(a, b)                      # [..., 2n]
    t = _resolve2(t_cols)                          # [..., 2n+1], limbs <= B
    pprime = jnp.asarray(spec.pprime_limbs)
    m = _resolve2(_conv_cols(t[..., :n], pprime, nout=n))[..., :n]
    u_cols = _conv_cols(m, jnp.asarray(spec.p_limbs))  # [..., 2n]
    u_cols = u_cols + t_cols
    u = _resolve2(u_cols)                          # [..., 2n+1]
    # Low half value is 0 or exactly R; carry-out = 1 iff any low limb nonzero.
    carry = (jnp.max(u[..., :n], axis=-1) > 0).astype(_U32)
    res = u[..., n:2 * n]
    res = res.at[..., 0].add(carry)
    return res


def _full_resolve(x, passes=None):
    """Exact carry propagation (nonnegative limbs): repeat single-limb passes."""
    m = x.shape[-1]
    passes = passes if passes is not None else m + 2
    y = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)
    for _ in range(passes):
        c = y >> W
        y = (y & MASK).at[..., 1:].add(c[..., :-1])
    return y


def _canonicalize_lt2p(spec: "FieldSpec", limbs):
    """Exact canonical limbs (< B, value < p) for a value known < 2p."""
    y = _full_resolve(limbs)[..., :spec.nlimbs + 1]
    p_ext = jnp.concatenate([jnp.asarray(spec.p_limbs), jnp.zeros(1, dtype=_U32)])
    ge = _geq(y, p_ext)
    yi = y.astype(jnp.int32) - jnp.where(ge[..., None], p_ext.astype(jnp.int32), 0)
    for _ in range(spec.nlimbs + 2):
        c = yi >> W
        yi = (yi & MASK).at[..., 1:].add(c[..., :-1])
    return yi[..., :spec.nlimbs].astype(_U32)


def _geq(a, b):
    """Lexicographic a >= b for canonical-limb arrays of equal length."""
    eq = (a == b).astype(jnp.uint32)
    gt = (a > b).astype(jnp.uint32)
    # prefix-AND of eq strictly above each position (scanning from the top)
    eq_rev = jnp.flip(eq, axis=-1)
    ones = jnp.ones_like(eq_rev[..., :1])
    prefix_rev = jnp.cumprod(
        jnp.concatenate([ones, eq_rev[..., :-1]], axis=-1), axis=-1)
    prefix = jnp.flip(prefix_rev, axis=-1)
    gt_any = jnp.any(prefix * gt > 0, axis=-1)
    return gt_any | jnp.all(eq > 0, axis=-1)


# ---------------------------------------------------------------------------
# FpArray: batched field elements as a pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class FpArray:
    """A batch of field elements in Montgomery form: uint32 limbs [..., nlimbs].

    ``bound`` is a static (trace-time) upper bound: value < bound * p.
    """

    __slots__ = ("limbs", "spec", "bound")

    def __init__(self, limbs, spec: FieldSpec, bound: int = 2):
        self.limbs = limbs
        self.spec = spec
        self.bound = bound

    def tree_flatten(self):
        return (self.limbs,), (self.spec, self.bound)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    # ------------------------------------------------------------- properties

    @property
    def shape(self):
        return self.limbs.shape[:-1]

    @property
    def ndim(self):
        return self.limbs.ndim - 1

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return FpArray(self.limbs[idx + (slice(None),)], self.spec, self.bound)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return FpArray(self.limbs.reshape(shape + (self.spec.nlimbs,)),
                       self.spec, self.bound)

    def broadcast_to(self, shape):
        return FpArray(jnp.broadcast_to(self.limbs, tuple(shape) + (self.spec.nlimbs,)),
                       self.spec, self.bound)

    # ------------------------------------------------------------ constructors

    @classmethod
    def from_int(cls, spec: FieldSpec, values, shape=None):
        """Host-side: python ints / ints array -> Montgomery-form FpArray."""
        arr = np.asarray(values, dtype=object)
        if shape is not None:
            arr = arr.reshape(shape)
        flat = arr.reshape(-1)
        out = np.zeros((flat.size, spec.nlimbs), dtype=np.uint32)
        for i, v in enumerate(flat):
            out[i] = int_to_limbs(int(v) % spec.p * spec.r_mod_p % spec.p, spec.nlimbs)
        # keep a host numpy array: safe to cache across jit traces (no tracer
        # leaks when constants are built inside scan bodies / jitted fns)
        return cls(out.reshape(arr.shape + (spec.nlimbs,)), spec, 1)

    @classmethod
    def zeros(cls, spec: FieldSpec, shape=()):
        return cls(jnp.zeros(tuple(shape) + (spec.nlimbs,), dtype=_U32), spec, 1)

    @classmethod
    def ones(cls, spec: FieldSpec, shape=()):
        limbs = jnp.broadcast_to(jnp.asarray(spec.one_limbs),
                                 tuple(shape) + (spec.nlimbs,))
        return cls(limbs, spec, 1)

    def to_ints(self):
        """Host-side: -> numpy object array of canonical python ints."""
        limbs = np.asarray(jax.device_get(self.limbs))
        flat = limbs.reshape(-1, self.spec.nlimbs)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = limbs_to_int(flat[i]) * self.spec.rinv % self.spec.p
        return out.reshape(self.shape)

    # --------------------------------------------------------------- core ops

    def tighten(self):
        """Reduce value to [0, 2p) with one Montgomery multiply by repr(1).

        Every op keeps bounds <= spec.mul_bound_budget, which is exactly the
        precondition for this single REDC to be sound (bound*1*p <= R/2).
        """
        if self.bound <= 2:
            return self
        spec = self.spec
        assert self.bound <= spec.mul_bound_budget, self.bound
        out = _mont_mul_limbs(spec, self.limbs, jnp.asarray(spec.one_limbs))
        return FpArray(out, spec, 2)

    def __add__(self, other):
        other = self._coerce(other)
        spec = self.spec
        a, b = self, other
        if a.bound + b.bound > spec.mul_bound_budget:
            if a.bound >= b.bound:
                a = a.tighten()
            else:
                b = b.tighten()
            if a.bound + b.bound > spec.mul_bound_budget:
                a, b = a.tighten(), b.tighten()
        cols = a.limbs + b.limbs
        out = _resolve2(cols)[..., :spec.nlimbs]
        return FpArray(out, spec, a.bound + b.bound)

    def __sub__(self, other):
        other = self._coerce(other)
        spec = self.spec
        a, b = self, other
        if b.bound > 16:
            b = b.tighten()
        digits, k = spec.sub_digits(b.bound)
        if a.bound + k > spec.mul_bound_budget:
            a = a.tighten()
            if a.bound + k > spec.mul_bound_budget:
                raise ValueError(
                    f"sub bound overflow in {spec.name}: {a.bound}+{k}")
        cols = a.limbs + (jnp.asarray(digits) - b.limbs)
        out = _resolve2(cols)[..., :spec.nlimbs]
        return FpArray(out, spec, a.bound + k)

    def __neg__(self):
        return FpArray.zeros(self.spec, ()) - self

    def __mul__(self, other):
        other = self._coerce(other)
        spec = self.spec
        a, b = self, other
        if a.bound * b.bound > spec.mul_bound_budget:
            if a.bound >= b.bound:
                a = a.tighten()
            else:
                b = b.tighten()
            if a.bound * b.bound > spec.mul_bound_budget:
                a, b = a.tighten(), b.tighten()
        out = _mont_mul_limbs(spec, a.limbs, b.limbs)
        return FpArray(out, spec, 2)

    def smul(self, k: int):
        """Multiply by a small nonnegative integer constant (k < 2**8)."""
        assert 0 <= k < 256
        if k == 0:
            return FpArray.zeros(self.spec, self.shape)
        if k == 1:
            return self
        spec = self.spec
        a = self
        if a.bound * k > spec.mul_bound_budget:
            a = a.tighten()
            assert a.bound * k <= spec.mul_bound_budget, (k, spec.name)
        cols = a.limbs * _U32(k)
        out = _resolve2(cols)[..., :spec.nlimbs]
        return FpArray(out, spec, a.bound * k)

    def double(self):
        return self.smul(2)

    def square(self):
        return self * self

    def pow_const(self, e: int):
        """Raise to a static integer power.

        Small exponents unroll (square-and-multiply); large exponents use a
        `lax.scan` over the exponent bits to keep the traced graph small.
        """
        assert e >= 0
        if e == 0:
            return FpArray.ones(self.spec, self.shape)
        if e.bit_length() <= 16:
            result = None
            base = self
            for bit in bin(e)[2:]:
                if result is not None:
                    result = result.square()
                if bit == "1":
                    result = base if result is None else result * base
            return result
        # scan path: MSB-first bits; stable carry bound of 2.
        base = self.tighten()
        bits = jnp.asarray([int(b) for b in bin(e)[2:]], dtype=jnp.uint32)
        one = FpArray(
            jnp.broadcast_to(jnp.asarray(self.spec.one_limbs),
                             self.shape + (self.spec.nlimbs,)),
            self.spec, 2)

        def step(res, bit):
            res = res.square()
            res = FpArray.select(
                jnp.broadcast_to(bit > 0, res.shape), res * base, res)
            return res, None

        out, _ = jax.lax.scan(step, one, bits)
        return out

    def inv(self):
        """Batched modular inverse via Fermat (x^(p-2)); 0 maps to 0."""
        return self.pow_const(self.spec.p - 2)

    # --------------------------------------------------------- canonicalization

    def canon_limbs(self):
        """Exact canonical limbs of the *Montgomery representative* (< p).
        Sound for equality/zero tests (Montgomery form is a bijection)."""
        return _canonicalize_lt2p(self.spec, self.tighten().limbs)

    def int_limbs(self):
        """Exact canonical limbs of the *integer value* (de-Montgomerized).
        Use for bit extraction (MSM digits, serialization)."""
        spec = self.spec
        x = self if self.bound <= spec.mul_bound_budget else self.tighten()
        raw = _mont_mul_limbs(spec, x.limbs, jnp.asarray(spec.int_one_limbs))
        return _canonicalize_lt2p(spec, raw)

    def is_zero(self):
        return jnp.all(self.canon_limbs() == 0, axis=-1)

    def equals(self, other):
        other = self._coerce(other)
        return jnp.all(self.canon_limbs() == other.canon_limbs(), axis=-1)

    # ------------------------------------------------------------------ misc

    def _coerce(self, other):
        if isinstance(other, FpArray):
            assert other.spec is self.spec, (other.spec, self.spec)
            return other
        if isinstance(other, int):
            return FpArray.from_int(self.spec, np.asarray([other], dtype=object)[0])
        raise TypeError(type(other))

    @staticmethod
    def select(cond, a: "FpArray", b: "FpArray"):
        """Elementwise where(cond, a, b); cond has the batch shape."""
        assert a.spec is b.spec
        limbs = jnp.where(cond[..., None], a.limbs, b.limbs)
        return FpArray(limbs, a.spec, max(a.bound, b.bound))

    @staticmethod
    def concat(arrays, axis=0):
        spec = arrays[0].spec
        bound = max(a.bound for a in arrays)
        return FpArray(jnp.concatenate([a.limbs for a in arrays], axis=axis),
                       spec, bound)

    @staticmethod
    def stack(arrays, axis=0):
        spec = arrays[0].spec
        bound = max(a.bound for a in arrays)
        return FpArray(jnp.stack([a.limbs for a in arrays], axis=axis), spec, bound)

    def __repr__(self):
        return f"FpArray({self.spec.name}, shape={self.shape}, bound={self.bound})"


def fp_from_u32(spec: FieldSpec, vals) -> FpArray:
    """Device u32 values (< 2^30) -> Montgomery-form FpArray (batched)."""
    vals = jnp.asarray(vals, dtype=_U32)
    n = spec.nlimbs
    raw = jnp.zeros(vals.shape + (n,), dtype=_U32)
    raw = raw.at[..., 0].set(vals & MASK)
    raw = raw.at[..., 1].set((vals >> W) & MASK)
    out = _mont_mul_limbs(spec, raw, jnp.asarray(spec.r2_limbs))
    return FpArray(out, spec, 2)


def fp_from_digits(spec: FieldSpec, digits) -> FpArray:
    """Canonical base-2^15 digit tensor [..., nd] (integer value, arbitrary
    width nd) -> Montgomery-form FpArray of the value mod ``spec.p``.

    Device-side re-embedding of an integer bit pattern into a *different*
    prime field — the core of cross-field modulus conversion (reference
    `share/additive.rs:164-181`, `wire/field.rs:1134-1146`).  Works in both
    directions (wide->narrow reduces mod p; narrow->wide zero-extends) via
    chunked Horner: each (nlimbs-1)-digit chunk is lifted to Montgomery form
    exactly (chunk < B^(n-1) keeps the REDC bound budget), then folded with
    the public constant B^(n-1) mod p.
    """
    digits = jnp.asarray(digits, dtype=_U32)
    n = spec.nlimbs
    c = n - 1
    nd = digits.shape[-1]
    k = max(1, -(-nd // c))
    pad = k * c - nd
    if pad:
        digits = jnp.pad(
            digits, [(0, 0)] * (digits.ndim - 1) + [(0, pad)])
    r2 = jnp.asarray(spec.r2_limbs)
    shift = FpArray.from_int(spec, (B ** c) % spec.p)
    acc = None
    for j in reversed(range(k)):
        raw = jnp.zeros(digits.shape[:-1] + (n,), dtype=_U32)
        raw = raw.at[..., :c].set(digits[..., j * c:(j + 1) * c])
        chunk = FpArray(_mont_mul_limbs(spec, raw, r2), spec, 2)
        acc = chunk if acc is None else acc * shift + chunk
    return acc


def fp_geq_const(x_int_limbs, spec: FieldSpec, k: int):
    """x >= k for canonical integer limbs (from int_limbs()) vs a host int."""
    kl = jnp.asarray(int_to_limbs(k, spec.nlimbs))
    return _geq(x_int_limbs, kl)
