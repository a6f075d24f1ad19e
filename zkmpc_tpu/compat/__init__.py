"""ark-compat layer: byte-level interoperability with the reference's
arkworks (v0.3) toolchain — CanonicalSerialize encodings, the Blake2s
Fiat-Shamir RNG, and the `test_rng` ChaCha stream — so golden vectors from a
Rust run of the reference drop straight into this repo's tests.
"""

from .chacha import ChaChaRng, chacha_block
from .ark import (ARK_TEST_RNG_SEED, FiatShamirRng, fp_rand, fp_from_bytes,
                  fp_to_bytes, fp_serialize_with_flags, fq2_to_bytes,
                  g1_affine_to_bytes, g1_compressed, g1_uncompressed,
                  g1_decompress, g2_compressed, g2_uncompressed,
                  test_rng, SW_INFINITY, SW_POSITIVE_Y)
