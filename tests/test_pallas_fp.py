"""Pallas Montgomery-mul kernel vs the XLA limb path (interpret mode on CPU).

The Mosaic path is validated on real TPU (see ops/pallas_fp.py notes and the
measured crossovers); this test keeps the kernel semantics covered in CI:
bit-exactness vs host big-int arithmetic for canonical and relaxed inputs,
batch padding, and the constant-operand (1-D b) path.
"""

import random

import numpy as np

from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FpArray
from zkmpc_tpu.ops.pallas_fp import mont_mul_pallas


def _check(spec, n=50, seed=0):
    rng = random.Random(seed)
    xs = [rng.randrange(spec.p) for _ in range(n)]
    ys = [rng.randrange(spec.p) for _ in range(n)]
    a = FpArray.from_int(spec, np.asarray(xs, dtype=object))
    b = FpArray.from_int(spec, np.asarray(ys, dtype=object))
    out = mont_mul_pallas(spec, np.asarray(a.limbs), np.asarray(b.limbs),
                          "interpret")
    got = list(FpArray(np.asarray(out), spec, 2).to_ints())
    assert got == [x * y % spec.p for x, y in zip(xs, ys)]
    # relaxed input bounds (a+a has bound 2)
    a2 = a + a
    out2 = mont_mul_pallas(spec, np.asarray(a2.limbs), np.asarray(b.limbs),
                           "interpret")
    got2 = list(FpArray(np.asarray(out2), spec, 2).to_ints())
    assert got2 == [2 * x * y % spec.p for x, y in zip(xs, ys)]
    # constant-operand path: b is a single element [nlimbs]
    c = FpArray.from_int(spec, np.asarray(ys[0], dtype=object))
    out3 = mont_mul_pallas(spec, np.asarray(a.limbs), np.asarray(c.limbs),
                           "interpret")
    got3 = list(FpArray(np.asarray(out3), spec, 2).to_ints())
    assert got3 == [x * ys[0] % spec.p for x in xs]


def test_mont_mul_pallas_fr():
    _check(L.FR)


def test_mont_mul_pallas_fq():
    _check(L.FQ)


def test_mont_mul_pallas_mnt4q():
    _check(L.MNT4Q, n=20)
