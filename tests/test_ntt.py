"""NTT golden tests against a naive Python DFT."""

import random

import numpy as np
import pytest

from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FpArray
from zkmpc_tpu.ops.ntt import Domain
from zkmpc_tpu.spec import field as SF


@pytest.mark.parametrize("spec,n", [
    (L.FR, 1), (L.FR, 2), (L.FR, 8), (L.FR, 16), (L.MNT4Q, 8),
], ids=lambda v: getattr(v, "name", v))
def test_fft_matches_naive(spec, n):
    import jax

    p = spec.p
    rng = random.Random(42)
    coeffs = np.asarray([rng.randrange(p) for _ in range(n)], dtype=object)
    dom = Domain(spec, n)
    evals = jax.jit(dom.fft)(FpArray.from_int(spec, coeffs)).to_ints()
    expect = SF.naive_dft(list(coeffs), dom.omega, p)
    assert list(evals) == expect


@pytest.mark.parametrize("spec", [L.FR], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [16, 64])
def test_ifft_roundtrip(spec, n):
    import jax

    p = spec.p
    rng = random.Random(7)
    coeffs = np.asarray([rng.randrange(p) for _ in range(n)], dtype=object)
    dom = Domain(spec, n)
    a = FpArray.from_int(spec, coeffs)
    back = jax.jit(lambda x: dom.ifft(dom.fft(x)))(a).to_ints()
    assert (back == coeffs).all()
    back2 = jax.jit(lambda x: dom.coset_ifft(dom.coset_fft(x)))(a).to_ints()
    assert (back2 == coeffs).all()


def test_coset_fft_values():
    spec = L.FR
    p = spec.p
    n = 8
    rng = random.Random(9)
    coeffs = [rng.randrange(p) for _ in range(n)]
    dom = Domain(spec, n)
    evals = dom.coset_fft(FpArray.from_int(spec, np.asarray(coeffs, dtype=object)))
    g = dom.coset_gen
    for i, e in enumerate(evals.to_ints()):
        x = g * pow(dom.omega, i, p) % p
        expect = sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
        assert int(e) == expect


def test_vanishing_constant_on_coset():
    spec = L.FR
    p = spec.p
    n = 16
    dom = Domain(spec, n)
    g = dom.coset_gen
    for i in [0, 3, 7]:
        x = g * pow(dom.omega, i, p) % p
        z = (pow(x, n, p) - 1) % p
        assert z * dom.vanishing_on_coset_inv % p == 1


def test_batched_fft():
    spec = L.FR
    p = spec.p
    rng = random.Random(11)
    n, batch = 16, 3
    coeffs = np.asarray([[rng.randrange(p) for _ in range(n)] for _ in range(batch)],
                        dtype=object)
    dom = Domain(spec, n)
    evals = dom.fft(FpArray.from_int(spec, coeffs)).to_ints()
    for b in range(batch):
        expect = SF.naive_dft(list(coeffs[b]), dom.omega, p)
        assert list(evals[b]) == expect
