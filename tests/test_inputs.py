"""Input subsystem: input_share semantics, InputWithCommit, lifecycle inputs
(reference `src/input.rs`)."""

import jax
import numpy as np
import random as pyrandom

from zkmpc_tpu import inputs as IN
from zkmpc_tpu.crypto import pedersen
from zkmpc_tpu.mpc.share import MpcContext, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def scope(n=3):
    return mpc_scope(MpcContext(StackedTransport(n), backend="semi"))


def test_input_share_opens_to_owner_value():
    with scope():
        for owner in range(3):
            sh = IN.input_share(fr(123 + owner), owner,
                                jax.random.PRNGKey(owner))
            opened = np.asarray(sh.reveal().to_ints()).reshape(-1)
            assert all(int(x) == 123 + owner for x in opened)


def test_input_share_party_rows():
    """Owner-specific rows: in stacked mode a [P, ...] value shares the
    owner's row only."""
    with scope():
        vals = fr([[10], [20], [30]])        # per-party values, batch [1]
        sh = IN.input_share(vals, 1, jax.random.PRNGKey(0))
        opened = np.asarray(sh.reveal().to_ints()).reshape(-1)
        assert all(int(x) == 20 for x in opened)


def test_input_with_commit():
    with scope():
        pp = pedersen.PedersenParams.sample()
        iwc = IN.InputWithCommit.generate(np.asarray(9, dtype=object), 2, pp,
                                          jax.random.PRNGKey(7), r_int=0b101)
        opened = int(np.asarray(iwc.input.reveal().to_ints()).reshape(-1)[0])
        assert opened == 9
        assert iwc.commitment == pedersen.commit_public_ints(pp, 9, 0b101)


def test_sample_mpc_input_lifecycle():
    with scope():
        mi = IN.SampleMpcInput()
        mi.set_public_input(pyrandom.Random(0))
        mi.set_private_input((3, 4))
        mi.generate_input(jax.random.PRNGKey(0))
        assert mi.mode == "shared"
        a = mi.peculiar["a"]
        got = int(np.asarray(a.input.reveal().to_ints()).reshape(-1)[0])
        assert got == 3
        assert a.commitment is not None


def test_werewolf_key_input_lifecycle():
    with scope():
        mi = IN.WerewolfKeyInput()
        mi.set_public_input(pyrandom.Random(0))
        mi.set_private_input(([5, 0, 0], [6, 0, 0], [1, 0, 0]))
        mi.generate_input(jax.random.PRNGKey(1))
        assert mi.mode == "shared"
        xs = mi.peculiar["pub_key_or_dummy_x"]
        assert len(xs) == 3
        assert int(np.asarray(
            xs[0].input.reveal().to_ints()).reshape(-1)[0]) == 5
