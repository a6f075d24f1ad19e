"""Pure-Python (arbitrary-precision int) modular arithmetic.

This is the *specification* backend: a slow, obviously-correct oracle used by
the test suite to validate the TPU limb kernels, and by host-side cold paths
(trusted setup, proof verification) where throughput does not matter.
"""

from __future__ import annotations


def inv(x: int, p: int) -> int:
    if x % p == 0:
        raise ZeroDivisionError("inverse of zero")
    return pow(x, -1, p)


def batch_inv(xs, p):
    return [inv(x, p) for x in xs]


def legendre(x: int, p: int) -> int:
    return pow(x, (p - 1) // 2, p)


def sqrt(x: int, p: int):
    """Tonelli-Shanks square root mod an odd prime; None if non-residue."""
    x %= p
    if x == 0:
        return 0
    if legendre(x, p) != 1:
        return None
    # Write p - 1 = q * 2^s with q odd.
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    # Find a non-residue z.
    z = 2
    while legendre(z, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(x, q, p), pow(x, (q + 1) // 2, p)
    while t != 1:
        t2, i = t, 0
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def two_adic_root_of_unity(p: int, generator: int, two_adicity: int) -> int:
    return pow(generator % p, (p - 1) >> two_adicity, p)


def root_of_unity(p: int, generator: int, two_adicity: int, n: int) -> int:
    """n-th root of unity for power-of-two n (ark `FftField::get_root_of_unity`)."""
    assert n & (n - 1) == 0 and n > 0
    log_n = n.bit_length() - 1
    assert log_n <= two_adicity
    base = two_adic_root_of_unity(p, generator, two_adicity)
    return pow(base, 1 << (two_adicity - log_n), p)


def naive_dft(coeffs, omega: int, p: int):
    n = len(coeffs)
    return [sum(coeffs[j] * pow(omega, i * j, p) for j in range(n)) % p for i in range(n)]
