"""Shared bytes: 8 shared bits per value (reference `MpcU8Field`,
`wire/uint8.rs:18-40`, and the `MpcUInt8` gadget `r1cs_helper/mpc_uint8.rs`).

A batch of bytes is one bit tensor [..., 8] (LSB first); xor/and/or are the
arithmetic bit ops, value() recombines.
"""

from __future__ import annotations

import numpy as np

from ..ops.limbs import FR, FpArray
from .share import MpcFp, PUBLIC
from . import bits as B


class MpcU8:
    """Batch of shared bytes as a [..., 8] bit tensor."""

    __slots__ = ("bits",)

    def __init__(self, bits: MpcFp):
        assert bits.shape[-1] == 8
        self.bits = bits

    @classmethod
    def from_public_ints(cls, vals) -> "MpcU8":
        arr = np.asarray(vals)
        out = np.zeros(arr.shape + (8,), dtype=object)
        for i in range(8):
            out[..., i] = (arr >> i) & 1
        return cls(MpcFp.const(FR, out))

    @property
    def shape(self):
        return self.bits.shape[:-1]

    def xor(self, other: "MpcU8") -> "MpcU8":
        return MpcU8(B.b_xor(self.bits, other.bits))

    def and_(self, other: "MpcU8") -> "MpcU8":
        return MpcU8(B.b_and(self.bits, other.bits))

    def or_(self, other: "MpcU8") -> "MpcU8":
        return MpcU8(B.b_or(self.bits, other.bits))

    def not_(self) -> "MpcU8":
        return MpcU8(B.b_not(self.bits))

    def to_field(self) -> MpcFp:
        """Recombine bits into field values sum 2^i b_i."""
        return B._bits_to_field(self.bits)

    def reveal_ints(self):
        from ..parallel import transport as T
        opened = self.to_field().reveal()
        vals = np.asarray(opened.to_ints())
        if T.current().kind == "stacked":
            vals = vals.reshape(T.current().n_parties, -1)[0]
        return [int(v) for v in vals.reshape(-1)]


def bytes_to_u8(data: bytes) -> MpcU8:
    return MpcU8.from_public_ints(np.asarray(list(data), dtype=object))
