"""arkworks v0.3 byte-level compatibility: `test_rng`, `Fp::rand`,
CanonicalSerialize, and ark-marlin's Blake2s Fiat-Shamir RNG.

Parity targets (reference file:line):
- test_rng seed + StdRng=ChaCha12: `arkworks/std/src/rand_helper.rs:31-39`,
  `arkworks/std/Cargo.toml:16` (rand 0.8 -> ChaCha12 StdRng).
- Fp sampling (limb-wise, top-bits shaved, rejection, raw limbs ARE the
  Montgomery repr): `arkworks/algebra/ff/src/fields/arithmetic.rs:194-224`.
- CanonicalSerialize with SWFlags (PositiveY=1<<7, Infinity=1<<6 in the top
  byte): `arkworks/algebra/serialize/src/flags.rs:63-130`,
  `algebra/ff/src/fields/macros.rs` serialize_with_flags,
  `algebra/ec/src/models/short_weierstrass_jacobian.rs:850-876`.
- FiatShamirRng<Blake2s>: seed = H(bytes), absorb: seed = H(new || seed),
  ChaCha20 reseeded from the digest: `arkworks/marlin/src/rng.rs:40-70`.
- Marlin transcript init: H(b"MARLIN-2019" || index_vk || public_input)
  (`arkworks/marlin/src/lib.rs:76,163,346`).
"""

from __future__ import annotations

import hashlib

from .chacha import ChaChaRng
from .. import params

# --- curve constants (BLS12-377, same as the reference's mpc-algebra) ------
FR_P = params.FR_MODULUS          # 253 bits, 4 limbs
FQ_P = params.FQ_MODULUS          # 377 bits, 6 limbs

FR_LIMBS, FR_BITS = 4, 253
FQ_LIMBS, FQ_BITS = 6, 377
FR_R = pow(2, 64 * FR_LIMBS, FR_P)        # Montgomery R
FQ_R = pow(2, 64 * FQ_LIMBS, FQ_P)
FR_R_INV = pow(FR_R, -1, FR_P)
FQ_R_INV = pow(FQ_R, -1, FQ_P)

SW_INFINITY = 1 << 6
SW_POSITIVE_Y = 1 << 7

#: the fixed 32-byte seed of `ark_std::test_rng()` (`rand_helper.rs:33-37`)
ARK_TEST_RNG_SEED = bytes([
    1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])


def test_rng() -> ChaChaRng:
    """`ark_std::test_rng()`: rand 0.8 StdRng (ChaCha12) with the fixed
    seed.  Every reference test drives its randomness from this stream, so
    reproducing it is the key to replaying reference test transcripts."""
    return ChaChaRng(ARK_TEST_RNG_SEED, rounds=12)


def seeded_rng(seed: int) -> ChaChaRng:
    """StdRng-semantics ChaCha12 stream for an arbitrary integer seed.
    seed == 0 is EXACTLY `ark_std::test_rng()` so setups driven by the
    default seed replay the reference's test transcripts; other seeds use
    a Blake2s-derived 32-byte seed (`StdRng::from_seed` semantics)."""
    if seed == 0:
        return test_rng()
    return ChaChaRng(hashlib.blake2s(b"zkmpc-seed:%d"
                                     % seed).digest(), rounds=12)


def fp_rand(rng: ChaChaRng, p: int, nlimbs: int, modulus_bits: int) -> int:
    """`Fp::rand`: sample nlimbs u64s (low limb first), shave the bits above
    modulus_bits off the top limb, reject if >= p.  The accepted limbs are
    the MONTGOMERY representation — the field VALUE is limbs * R^-1 mod p
    (`arithmetic.rs:200-219`)."""
    shave = 64 * nlimbs - modulus_bits
    mask = (1 << (64 - shave)) - 1 if shave < 64 else 0
    r_inv = pow(pow(2, 64 * nlimbs, p), -1, p)
    while True:
        limbs = [rng.next_u64() for _ in range(nlimbs)]
        limbs[-1] &= mask
        tmp = sum(l << (64 * i) for i, l in enumerate(limbs))
        if tmp < p:
            return tmp * r_inv % p


def fr_rand(rng: ChaChaRng) -> int:
    return fp_rand(rng, FR_P, FR_LIMBS, FR_BITS)


def fq_rand(rng: ChaChaRng) -> int:
    return fp_rand(rng, FQ_P, FQ_LIMBS, FQ_BITS)


# --- CanonicalSerialize ----------------------------------------------------

def _buffer_byte_size(bits: int) -> int:
    return (bits + 7) // 8


def fp_to_bytes(v: int, modulus_bits: int) -> bytes:
    """Fp CanonicalSerialize (no flags): canonical int, little-endian,
    ceil(modulus_bits/8) bytes.  BLS12-377: Fr -> 32, Fq -> 48."""
    return int(v).to_bytes(_buffer_byte_size(modulus_bits), "little")


def fp_serialize_with_flags(v: int, modulus_bits: int, flags: int) -> bytes:
    """serialize_with_flags: flag bits OR'd into the MSB of the last byte of
    the ceil((modulus_bits + 2)/8)-byte buffer (macros.rs)."""
    size = _buffer_byte_size(modulus_bits + 2)
    buf = bytearray(int(v).to_bytes(size, "little"))
    buf[-1] |= flags
    return bytes(buf)


def fp_from_bytes(b: bytes, strip_flags: bool = False) -> tuple[int, int]:
    """Inverse: returns (value, flags).  flags are the top two bits of the
    last byte when strip_flags is set."""
    flags = 0
    buf = bytearray(b)
    if strip_flags:
        flags = buf[-1] & 0xC0
        buf[-1] &= 0x3F
    return int.from_bytes(bytes(buf), "little"), flags


def fq2_to_bytes(c0: int, c1: int, flags: int | None = None) -> bytes:
    """QuadExtField: c0 then c1; flags (if any) ride on c1's last byte
    (`quadratic_extension.rs:534-540` + serialize_with_flags)."""
    if flags is None:
        return fp_to_bytes(c0, FQ_BITS) + fp_to_bytes(c1, FQ_BITS)
    return fp_to_bytes(c0, FQ_BITS) + fp_serialize_with_flags(c1, FQ_BITS,
                                                              flags)


def _y_is_positive(y: int, p: int) -> bool:
    """SWFlags::from_y_sign(y > -y): canonical-int comparison."""
    return y > (p - y) % p


def g1_compressed(pt) -> bytes:
    """GroupAffine CanonicalSerialize (compressed): x with y-sign / infinity
    flags (`short_weierstrass_jacobian.rs:850-859`).  pt: (x, y) ints or
    None for infinity.  48 bytes."""
    if pt is None:
        return fp_serialize_with_flags(0, FQ_BITS, SW_INFINITY)
    x, y = pt
    flags = SW_POSITIVE_Y if _y_is_positive(y, FQ_P) else 0
    return fp_serialize_with_flags(x, FQ_BITS, flags)


def g1_uncompressed(pt) -> bytes:
    """x (no flags) then y with flags (`short_weierstrass_jacobian.rs:
    865-876`).  96 bytes."""
    if pt is None:
        return fp_to_bytes(0, FQ_BITS) + fp_serialize_with_flags(
            0, FQ_BITS, SW_INFINITY)
    x, y = pt
    return fp_to_bytes(x, FQ_BITS) + fp_serialize_with_flags(y, FQ_BITS, 0)


def _sqrt_mod(a: int, p: int) -> int | None:
    """Tonelli-Shanks (BLS12-377 Fq has p = 1 mod 4, two-adicity 46)."""
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def g1_decompress(b: bytes):
    """Recover (x, y) (or None) from the 48-byte compressed form using the
    curve equation y^2 = x^3 + 1 (BLS12-377 G1: a=0, b=1)."""
    x, flags = fp_from_bytes(b, strip_flags=True)
    if flags & SW_INFINITY:
        return None
    rhs = (pow(x, 3, FQ_P) + 1) % FQ_P
    y = _sqrt_mod(rhs, FQ_P)
    if y is None:
        raise ValueError("not on curve")
    if _y_is_positive(y, FQ_P) != bool(flags & SW_POSITIVE_Y):
        y = (FQ_P - y) % FQ_P
    return x, y


#: BLS12-377 Fq2 = Fq[u]/(u^2 - NR), NR = -5
#: (`arkworks/curves/bls12_377/src/fields/fq2.rs:12`)
FQ2_NONRESIDUE = FQ_P - 5


def _fq2_sqrt(a0: int, a1: int) -> tuple[int, int] | None:
    """Square root in Fq2 (complex method; `quadratic_extension.rs` sqrt).
    Returns any root or None if a is a non-residue."""
    p = FQ_P
    if a1 == 0:
        r = _sqrt_mod(a0, p)
        if r is not None:
            return r, 0
        # a0 = NR * t^2 -> sqrt = t * u
        t = _sqrt_mod(a0 * pow(FQ2_NONRESIDUE, -1, p) % p, p)
        if t is None:
            return None
        return 0, t
    # norm = a0^2 - NR a1^2 must be a square in Fq
    alpha = (a0 * a0 - FQ2_NONRESIDUE * a1 % p * a1) % p
    n = _sqrt_mod(alpha, p)
    if n is None:
        return None
    inv2 = pow(2, -1, p)
    delta = (a0 + n) * inv2 % p
    x0 = _sqrt_mod(delta, p)
    if x0 is None:
        delta = (a0 - n) % p * inv2 % p
        x0 = _sqrt_mod(delta, p)
        if x0 is None:
            return None
    x1 = a1 * pow(2 * x0 % p, -1, p) % p
    return x0, x1


def g2_decompress(b: bytes):
    """Recover (((x0, x1), (y0, y1)) or None) from the 96-byte compressed
    form: y^2 = x^3 + b' over Fq2, b' = (0, params.G2_B_C1) (BLS12-377 G2
    D-type twist)."""
    x0, _ = fp_from_bytes(b[:48])
    x1, flags = fp_from_bytes(b[48:], strip_flags=True)
    if flags & SW_INFINITY:
        return None
    p = FQ_P
    # x^3 in Fq2
    s0, s1 = (x0 * x0 - 5 * x1 % p * x1) % p, 2 * x0 * x1 % p     # x^2
    c0 = (s0 * x0 - 5 * s1 % p * x1) % p                          # x^3
    c1 = (s0 * x1 + s1 * x0) % p
    rhs0, rhs1 = c0, (c1 + params.G2_B_C1) % p
    y = _fq2_sqrt(rhs0, rhs1)
    if y is None:
        raise ValueError("not on curve")
    y0, y1 = y
    neg = ((p - y1) % p, (p - y0) % p)
    pos = (y1, y0) > neg
    if pos != bool(flags & SW_POSITIVE_Y):
        y0, y1 = (p - y0) % p, (p - y1) % p
    return (x0, x1), (y0, y1)


def g2_compressed(pt) -> bytes:
    """G2 (Fq2 coords): x = (c0, c1) with flags on c1.  96 bytes.
    pt: ((x0, x1), (y0, y1)) or None."""
    if pt is None:
        return fq2_to_bytes(0, 0, SW_INFINITY)
    (x0, x1), (y0, y1) = pt
    # Fq2 Ord compares c1 FIRST, then c0 (`quadratic_extension.rs:411-419`),
    # so y > -y is lexicographic on (c1, c0)
    neg = ((FQ_P - y1) % FQ_P, (FQ_P - y0) % FQ_P)
    pos = (y1, y0) > neg
    return fq2_to_bytes(x0, x1, SW_POSITIVE_Y if pos else 0)


def g2_uncompressed(pt) -> bytes:
    if pt is None:
        return fq2_to_bytes(0, 0) + fq2_to_bytes(0, 0, SW_INFINITY)
    (x0, x1), (y0, y1) = pt
    return fq2_to_bytes(x0, x1) + fq2_to_bytes(y0, y1, 0)


def g1_affine_to_bytes(pt) -> bytes:
    """ToBytes (the FS-absorb encoding, NOT CanonicalSerialize): full-width
    x || y || infinity byte (`short_weierstrass_jacobian.rs:315-322`).
    Fq writes 48 bytes (6 limbs), bool writes 1 byte -> 97 bytes."""
    if pt is None:
        return bytes(48) + bytes(48) + b"\x01"
    x, y = pt
    return (int(x).to_bytes(48, "little") + int(y).to_bytes(48, "little")
            + b"\x00")


# --- Fiat-Shamir -----------------------------------------------------------

class FiatShamirRng:
    """ark-marlin `FiatShamirRng<Blake2s>` (`rng.rs:40-70`):
    seed = Blake2s(init_bytes); ChaCha20 keyed by the seed; absorb(new)
    re-seeds with Blake2s(new || seed).  Blake2s = BLAKE2s-256."""

    def __init__(self, seed_bytes: bytes):
        self.seed = hashlib.blake2s(seed_bytes).digest()
        self.r = ChaChaRng(self.seed, rounds=20)

    def absorb(self, material: bytes):
        self.seed = hashlib.blake2s(material + self.seed).digest()
        self.r = ChaChaRng(self.seed, rounds=20)

    def next_u32(self) -> int:
        return self.r.next_u32()

    def next_u64(self) -> int:
        return self.r.next_u64()

    def fr_challenge(self) -> int:
        """F::rand(&mut fs_rng) — what the Marlin verifier rounds draw
        (`ahp/verifier.rs:59-98`)."""
        return fr_rand(self.r)


def groth16_proof_bytes(a_pt, b_pt, c_pt) -> bytes:
    """ark-groth16 `Proof::serialize` (CanonicalSerialize derive, field
    order a, b, c): compressed G1 (48) + compressed G2 (96) + compressed
    G1 (48) = 192 bytes.  a_pt/c_pt: (x, y) ints or None; b_pt:
    ((x0, x1), (y0, y1)) or None."""
    return g1_compressed(a_pt) + g2_compressed(b_pt) + g1_compressed(c_pt)


def groth16_proof_from_ints(proof_ints) -> bytes:
    """From this repo's `groth16.proof_to_ints` output
    ((ax, ay), ((bx0, bx1), (by0, by1)), (cx, cy))."""
    a, b, c = proof_ints
    return groth16_proof_bytes(a, b, c)


def groth16_proof_from_bytes(blob: bytes):
    """Inverse of `groth16_proof_bytes`: parse the 192-byte ark
    `Proof::deserialize` layout back to ((ax, ay), ((bx0, bx1),
    (by0, by1)), (cx, cy)) host ints (None = infinity per component)."""
    assert len(blob) == 192, f"ark Groth16 proof is 192 bytes, got {len(blob)}"
    a = g1_decompress(blob[0:48])
    b = g2_decompress(blob[48:144])
    c = g1_decompress(blob[144:192])
    return a, b, c


def marlin_fs_init(index_vk_bytes: bytes, public_input_ints) -> FiatShamirRng:
    """Transcript head: H(PROTOCOL_NAME || index_vk || public_input)
    (`marlin/src/lib.rs:163,346`); public inputs serialize as full-width Fr
    limbs via ToBytes (32 bytes LE each)."""
    buf = b"MARLIN-2019" + index_vk_bytes
    for v in public_input_ints:
        buf += int(v).to_bytes(32, "little")
    return FiatShamirRng(buf)
