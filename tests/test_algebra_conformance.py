"""Protocol conformance suite mirroring the reference's 3-party driver
`mpc-algebra/examples/algebra.rs:42-477` (test_add/sub/mul/div/sum,
carries, bit_add, ...).  The bit protocols, comparisons, pedersen-vs-local
and input-share cases from that driver are covered by `test_bits.py`,
`test_crypto.py`, and `test_inputs.py`; this module adds the arithmetic and
binary-adder cases so every algebra.rs case has a named counterpart.
"""

import jax
import numpy as np

from zkmpc_tpu.mpc import bits as B
from zkmpc_tpu.mpc.share import (MpcContext, MpcFp, beaver_div, king_share,
                                 mpc_scope)
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport

P = FR.p


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def reveal_ints(x):
    # stacked reveal replicates across the party axis; read party 0's row
    row = x.reveal().to_ints()[0]
    return [int(v) for v in np.atleast_1d(row)]


def test_add_sub_conformance():
    """algebra.rs:42-60 test_add / test_sub."""
    with scope():
        a = king_share(fr([7, P - 2]), jax.random.PRNGKey(0))
        b = king_share(fr([5, 3]), jax.random.PRNGKey(1))
        assert reveal_ints(a + b) == [12, 1]
        assert reveal_ints(a - b) == [2, P - 5]


def test_mul_div_conformance():
    """algebra.rs:61-76 test_mul / test_div."""
    with scope():
        a = king_share(fr([6, 11]), jax.random.PRNGKey(2))
        b = king_share(fr([7, 4]), jax.random.PRNGKey(3))
        assert reveal_ints(a * b) == [42, 44]
        q = beaver_div(a, b)
        got = reveal_ints(q)
        assert got == [6 * pow(7, -1, P) % P, 11 * pow(4, -1, P) % P]


def test_sum_conformance():
    """algebra.rs:77-88 test_sum: sum of a shared vector."""
    with scope():
        vals = [3, 1, 4, 1, 5]
        a = king_share(fr(vals), jax.random.PRNGKey(4))
        s = a[0]
        for i in range(1, len(vals)):
            s = s + a[i]
        assert reveal_ints(s) == [sum(vals)]


def test_carries_conformance():
    """algebra.rs:326-370 test_carries, exact expected vectors."""
    with scope():
        # a = 5 (LE 1010), b = 12 (LE 0011) -> carries LE [0,0,1,1]
        a = king_share(fr([1, 0, 1, 0]), jax.random.PRNGKey(5))
        b = king_share(fr([0, 0, 1, 1]), jax.random.PRNGKey(6))
        assert reveal_ints(B.carries(a, b)) == [0, 0, 1, 1]
        # a = 19 (LE 110010), b = 42 (LE 010101) -> carries LE [0,1,0,0,0,0]
        a = king_share(fr([1, 1, 0, 0, 1, 0]), jax.random.PRNGKey(7))
        b = king_share(fr([0, 1, 0, 1, 0, 1]), jax.random.PRNGKey(8))
        assert reveal_ints(B.carries(a, b)) == [0, 1, 0, 0, 0, 0]


def test_bit_add_conformance():
    """algebra.rs:372-388 test_bit_add: fold of sum bits = integer a + b."""
    with scope():
        av, bv = 0b101101, 0b110011
        a = king_share(fr([(av >> i) & 1 for i in range(6)]),
                       jax.random.PRNGKey(9))
        b = king_share(fr([(bv >> i) & 1 for i in range(6)]),
                       jax.random.PRNGKey(10))
        s = B.bit_add(a, b)
        got = reveal_ints(s)
        assert len(got) == 7
        assert sum(bit << i for i, bit in enumerate(got)) == av + bv
