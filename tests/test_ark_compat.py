"""ark-compat layer: ChaCha keystream vs an independent oracle + known
vectors, arkworks Fp::rand / test_rng stream reproduction, and
CanonicalSerialize byte layouts (`arkworks/std/src/rand_helper.rs:31-39`,
`algebra/serialize/src/flags.rs`, `marlin/src/rng.rs:40-70`).

Everything here is host-side protocol plumbing — no JAX, runs in
milliseconds, so golden vectors from a Rust reference run can be dropped in
and re-checked instantly.
"""

import hashlib

import pytest

from zkmpc_tpu.compat import (ARK_TEST_RNG_SEED, ChaChaRng, FiatShamirRng,
                              SW_INFINITY, SW_POSITIVE_Y, fp_from_bytes,
                              fp_serialize_with_flags, fp_to_bytes,
                              g1_compressed, g1_decompress, g1_uncompressed,
                              g2_compressed)

from zkmpc_tpu.compat import ark
from zkmpc_tpu.spec import curves as SC

# The canonical ChaCha20 zero-key keystream (RFC 8439 A.1 vector 1: zero
# key, zero nonce, counter 0 — identical state layout to rand_chacha's djb
# variant when counter and nonce are zero).
ZERO_KEY_BLOCK0 = bytes.fromhex(
    "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
    "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586")


def test_chacha20_zero_key_known_vector():
    rng = ChaChaRng(bytes(32), rounds=20)
    assert rng.fill_bytes(64) == ZERO_KEY_BLOCK0


def test_chacha20_vs_cryptography_oracle():
    """Our stream vs the OpenSSL-backed ChaCha20 for random keys.  With a
    zero nonce and counter < 2^32, the IETF (32+96) and djb (64+64) state
    layouts coincide, so the oracle covers multi-block counter handling."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms
    for seed_byte in (0x00, 0x01, 0xAB):
        key = bytes([seed_byte ^ i for i in range(32)])
        oracle = Cipher(algorithms.ChaCha20(key, bytes(16)), mode=None)
        enc = oracle.encryptor()
        want = enc.update(bytes(1024))          # keystream = E(0...0)
        assert ChaChaRng(key, rounds=20).fill_bytes(1024) == want


def test_next_u64_straddles_buffer_edge():
    """rand_core BlockRng: a next_u64 at word index 63 takes the last word
    as the LOW half and word 0 of the next refill as the HIGH half."""
    a = ChaChaRng(bytes(32), rounds=20)
    for _ in range(63):
        a.next_u32()
    straddled = a.next_u64()
    b = ChaChaRng(bytes(32), rounds=20)
    words = [b.next_u32() for _ in range(65)]
    assert straddled == (words[64] << 32) | words[63]


def test_ark_test_rng_stream_pinned():
    """Hardcoded pin of the `ark_std::test_rng()` (StdRng = ChaCha12, fixed
    seed) stream, and of the first `Fr::rand(&mut test_rng())` field
    element.  TODO(golden): cross-check against a Rust
    `test_rng().next_u64()` / `Fr::rand` run when a toolchain is available;
    the ChaCha20 core is oracle-verified above and ChaCha12 shares all of
    its code except the round count."""
    rng = ark.test_rng()
    assert [rng.next_u64() for _ in range(3)] == [
        10719222850664546238, 301075827032876239, 17612447688858836480]
    assert ark.fr_rand(ark.test_rng()) == int(
        "75335619249958853853745387605142308400750817346184214176437813683"
        "03694554659")
    assert rng.key == [int.from_bytes(ARK_TEST_RNG_SEED[i * 4:i * 4 + 4],
                                      "little") for i in range(8)]


def test_fp_rand_montgomery_semantics():
    """Fp::rand returns limbs-as-Montgomery: value = limbs * R^-1 mod p
    (`arithmetic.rs:200-219`).  Check against a hand-rolled replay of the
    same stream."""
    rng = ark.test_rng()
    v = ark.fr_rand(rng)
    replay = ark.test_rng()
    while True:
        limbs = [replay.next_u64() for _ in range(4)]
        limbs[-1] &= (1 << (64 - 3)) - 1            # shave 3 bits (253-bit p)
        tmp = sum(l << (64 * i) for i, l in enumerate(limbs))
        if tmp < ark.FR_P:
            assert v == tmp * ark.FR_R_INV % ark.FR_P
            break
    assert 0 <= v < ark.FR_P


def test_fp_serialize_sizes_and_flags():
    # Fr: 253 bits -> 32 bytes; Fq: 377 bits -> 48 bytes
    assert len(fp_to_bytes(1, 253)) == 32
    assert len(fp_to_bytes(1, 377)) == 48
    b = fp_serialize_with_flags(5, 377, SW_POSITIVE_Y)
    assert len(b) == 48 and b[0] == 5 and b[-1] & 0x80
    v, flags = fp_from_bytes(b, strip_flags=True)
    assert v == 5 and flags == SW_POSITIVE_Y


def test_g1_compressed_roundtrip_generator():
    gen = tuple(int(c) for c in SC.G1_GEN)
    b = g1_compressed(gen)
    assert len(b) == 48
    assert g1_decompress(b) == gen
    # a few multiples, exercising both y signs
    for k in (2, 3, 7, 11):
        pt = SC.g1_mul(SC.G1_GEN, k)
        pt = (int(pt[0]), int(pt[1]))
        assert g1_decompress(g1_compressed(pt)) == pt


def test_g1_infinity_and_uncompressed():
    b = g1_compressed(None)
    assert b[-1] & SW_INFINITY and g1_decompress(b) is None
    gen = tuple(int(c) for c in SC.G1_GEN)
    u = g1_uncompressed(gen)
    assert len(u) == 96
    x, _ = fp_from_bytes(u[:48])
    y, fl = fp_from_bytes(u[48:], strip_flags=True)
    assert (x, y) == gen and fl == 0


def test_g2_compressed_layout():
    g2 = SC.G2_GEN
    pt = ((int(g2[0][0]), int(g2[0][1])), (int(g2[1][0]), int(g2[1][1])))
    b = g2_compressed(pt)
    assert len(b) == 96
    x0, _ = fp_from_bytes(b[:48])
    x1, flags = fp_from_bytes(b[48:], strip_flags=True)
    assert (x0, x1) == pt[0]
    assert not flags & SW_INFINITY
    assert g2_compressed(None)[-1] & SW_INFINITY


def test_fiat_shamir_rng_semantics():
    """seed = H(init); absorb: seed = H(new || old_seed); stream re-keyed
    (`rng.rs:44-70`)."""
    fs = FiatShamirRng(b"init")
    assert fs.seed == hashlib.blake2s(b"init").digest()
    first = fs.next_u64()
    # same construction -> same stream
    assert FiatShamirRng(b"init").next_u64() == first
    fs2 = FiatShamirRng(b"init")
    fs2.absorb(b"round1")
    assert fs2.seed == hashlib.blake2s(
        b"round1" + hashlib.blake2s(b"init").digest()).digest()
    assert fs2.next_u64() != first
    # challenges are valid field elements
    c = fs2.fr_challenge()
    assert 0 <= c < ark.FR_P


def test_marlin_fs_init_layout():
    fs = ark.marlin_fs_init(b"vkbytes", [1, 2])
    want = hashlib.blake2s(
        b"MARLIN-2019" + b"vkbytes"
        + (1).to_bytes(32, "little") + (2).to_bytes(32, "little")).digest()
    assert fs.seed == want


def test_groth16_proof_serialization_layout():
    """192-byte ark-groth16 proof layout: G1(48) || G2(96) || G1(48),
    compressed with SWFlags.  TODO(golden): byte-compare against a Rust
    `proof.serialize()` once a toolchain is available — the layout pieces
    are each pinned above."""
    g1 = tuple(int(c) for c in SC.G1_GEN)
    g2 = SC.G2_GEN
    g2pt = ((int(g2[0][0]), int(g2[0][1])), (int(g2[1][0]), int(g2[1][1])))
    blob = ark.groth16_proof_bytes(g1, g2pt, None)
    assert len(blob) == 192
    assert blob[:48] == g1_compressed(g1)
    assert blob[48:144] == g2_compressed(g2pt)
    assert blob[144:] == g1_compressed(None)


def test_g1_affine_tobytes_layout():
    gen = tuple(int(c) for c in SC.G1_GEN)
    b = ark.g1_affine_to_bytes(gen)
    assert len(b) == 97 and b[-1] == 0
    assert ark.g1_affine_to_bytes(None)[-1] == 1
