"""Pedersen commitment + CRH over ed-on-bls12-377, MPC-capable.

Mirrors the reference's MPC Pedersen (`mpc-algebra/src/commitment/pedersen/
pedersen.rs:68-190` and `crh/pedersen/pedersen.rs:21-206`): commit a shared
field element by MPC bit-decomposing it and folding the bits into per-bit
generators, plus randomness bits times powers of a blinding generator —
entirely over shared-coordinate TE points, so the whole commitment is a
handful of batched Beaver rounds (the reference pays per-bit round trips).

C(m, r) = sum_i m_i * G_i + sum_j r_j * (2^j * H)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import params
from ..mpc import bits as B
from ..mpc import te as TE
from ..mpc.share import MpcFp
from ..ops.limbs import FR
from ..spec import curves as SC

NBITS = params.FR_MODULUS.bit_length()


@dataclasses.dataclass
class PedersenParams:
    generators: list          # NBITS affine points (message bit bases)
    blind_base: tuple         # H (randomness base)

    @classmethod
    def sample(cls, seed: int = 0):
        """Derive generators deterministically: G_i = hash-to-scalar * G."""
        import random as pyrandom
        rng = pyrandom.Random(seed)
        gens = [SC.te_scalar_mul(SC.TE_GEN, rng.randrange(1, params.ED_FR_MODULUS))
                for _ in range(NBITS)]
        h = SC.te_scalar_mul(SC.TE_GEN, rng.randrange(1, params.ED_FR_MODULUS))
        return cls(gens, h)


def commit(pp: PedersenParams, m: MpcFp, r_bits: MpcFp, key) -> TE.MpcTEPoint:
    """Commit shared scalar(s) m [..] with shared randomness bits
    r_bits [.., NBITS].  Returns a shared-coordinate TE point batch [..]."""
    m_bits = B.bit_decomposition(m, key)             # [.., NBITS]
    xs = np.asarray([g[0] for g in pp.generators], dtype=object)
    ys = np.asarray([g[1] for g in pp.generators], dtype=object)
    msg_pts = TE.select_base(m_bits, (xs, ys))
    msg_sum = TE.tree_sum(msg_pts)
    blind = TE.scalar_mul_bits(pp.blind_base, r_bits)
    return msg_sum.add(blind)


def commit_bits(pp: PedersenParams, m_bits: MpcFp, r_bits: MpcFp) -> TE.MpcTEPoint:
    """Commit already-bit-decomposed shared bits (no decomposition round)."""
    xs = np.asarray([g[0] for g in pp.generators[:m_bits.shape[-1]]],
                    dtype=object)
    ys = np.asarray([g[1] for g in pp.generators[:m_bits.shape[-1]]],
                    dtype=object)
    msg_sum = TE.tree_sum(TE.select_base(m_bits, (xs, ys)))
    blind = TE.scalar_mul_bits(pp.blind_base, r_bits)
    return msg_sum.add(blind)


def commit_public_ints(pp: PedersenParams, m_int: int, r_int: int):
    """Host oracle: the same commitment over plain ints (spec backend)."""
    acc = SC.TE_NEUTRAL
    for i in range(NBITS):
        if (m_int >> i) & 1:
            acc = SC.te_add(acc, pp.generators[i])
    h = pp.blind_base
    j = 0
    r = r_int
    while r:
        if r & 1:
            acc = SC.te_add(acc, h)
        h = SC.te_add(h, h)
        r >>= 1
    return acc


@dataclasses.dataclass
class CrhParams:
    """Pedersen CRH: same window structure, no blinding
    (`crh/pedersen/pedersen.rs:21`)."""
    generators: list

    @classmethod
    def sample(cls, input_bits: int, seed: int = 1):
        import random as pyrandom
        rng = pyrandom.Random(seed)
        gens = [SC.te_scalar_mul(SC.TE_GEN, rng.randrange(1, params.ED_FR_MODULUS))
                for _ in range(input_bits)]
        return cls(gens)


def crh(cp: CrhParams, in_bits: MpcFp) -> TE.MpcTEPoint:
    xs = np.asarray([g[0] for g in cp.generators[:in_bits.shape[-1]]],
                    dtype=object)
    ys = np.asarray([g[1] for g in cp.generators[:in_bits.shape[-1]]],
                    dtype=object)
    return TE.tree_sum(TE.select_base(in_bits, (xs, ys)))


def two_to_one_crh(cp: CrhParams, left_bits: MpcFp,
                   right_bits: MpcFp) -> TE.MpcTEPoint:
    """TwoToOneCRH: hash two equal-length bit strings into one point.

    Mirrors the reference's `TwoToOneCRH` (`mpc-algebra/src/crh.rs:31-60`)
    with the concat-then-CRH semantics its gadget defines
    (`crh/pedersen/constraints.rs:93-121`; the reference's protocol-level
    `evaluate` is `unimplemented!()` — we implement it for real so Merkle
    trees over committed state work outside circuits too)."""
    assert left_bits.shape[-1] == right_bits.shape[-1], \
        "left and right input should be of equal length"
    both = MpcFp.concat([left_bits, right_bits],
                        axis=len(left_bits.shape) - 1)
    return crh(cp, both)


def crh_public_ints(cp: CrhParams, bit_ints) -> tuple:
    """Host oracle: windowed Pedersen CRH over plain 0/1 ints."""
    acc = SC.TE_NEUTRAL
    for i, b in enumerate(bit_ints):
        if b:
            acc = SC.te_add(acc, cp.generators[i])
    return acc
