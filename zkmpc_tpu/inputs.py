"""MPC input subsystem: the init -> set_public -> set_private -> generate
lifecycle of the reference (`src/input.rs:149-160`), TPU-style.

An `InputWithCommit` bundles a party-owned scalar, its sharing, shared
Pedersen randomness bits, and the public commitment (`input.rs:57-105`).
`generate` mirrors the reference's `generate_input`: the owner's value is
re-shared so every party holds an additive share (`generate_share`,
`input.rs:808-830`: non-owners hold a zero-mean mask, the owner holds the
residual), then the commitment is computed from the opened value with the
common randomness and published (`from_public`) — the reference computes the
commitment *locally on the revealed value* (`input.rs:86-100`), and we keep
that behavior for parity.

The batched werewolf inputs (`WerewolfKeyInput` `input.rs:305-515`,
`WerewolfMpcInput` `input.rs:517-789`) carry whole vectors per field, one
protocol round each.
"""

from __future__ import annotations

import dataclasses
import random as pyrandom

import numpy as np

import jax
import jax.numpy as jnp

from . import params
from .crypto import elgamal as EG
from .crypto import pedersen as PD
from .mpc import rand as R
from .mpc.share import MpcFp, PUBLIC, SHARED, ctx
from .ops.limbs import FR, FpArray
from .parallel import transport as T
from .spec import curves as SC


def input_share(value: FpArray, owner: int, key) -> MpcFp:
    """Additive sharing where party `owner` contributes the value and every
    party adds a zero-sum mask derived from the replicated key (the
    re-randomized form of `generate_share`, `input.rs:808-830`).

    In stacked mode `value` may be party-shaped [P, ...]; the owner's row is
    the one shared.
    """
    c = ctx()
    t = c.transport
    spec = value.spec
    if t.kind == "stacked" and value.ndim and value.shape[0] == t.n_parties:
        batch = value.shape[1:]
        owner_val = FpArray(value.limbs[owner], spec, value.bound)
    else:
        batch = value.shape
        owner_val = value
    # zero-sum mask: r_0..r_{P-2} random, r_{P-1} = -sum
    rmask = R.uniform_fp(key, spec, (t.n_parties - 1,) + tuple(batch))
    last = -_sum_axis0(rmask)
    if t.kind == "stacked":
        base = FpArray.concat(
            [rmask, last.reshape((1,) + tuple(batch))], axis=0)
        idx = t.party_index(len(batch) + 1)
        sel = jnp.reshape(idx == owner, (t.n_parties,) + (1,) * len(batch))
        owner_row = jnp.broadcast_to(
            owner_val.limbs, (t.n_parties,) + tuple(owner_val.limbs.shape))
        add = FpArray(jnp.where(sel[..., None], owner_row,
                                jnp.zeros_like(owner_row)),
                      spec, owner_val.bound)
        sh = base + add
    else:
        idx = t.party_id_scalar()
        mine = FpArray(
            jnp.take(FpArray.concat(
                [rmask, last.reshape((1,) + tuple(batch))], axis=0).limbs,
                idx, axis=0),
            spec, max(rmask.bound, last.bound))
        zero = FpArray.from_int(spec, np.zeros(batch, dtype=object) if batch
                                else np.asarray(0, dtype=object))
        contrib = FpArray.select(
            jnp.broadcast_to(idx == owner, batch), owner_val, zero)
        sh = mine + contrib
    mac = None
    if c.backend == "spdz":
        vparty = FpArray(_rebroadcast_limbs(t, owner_val.limbs), spec,
                         owner_val.bound)
        mac = vparty * c.alpha_for(len(batch))
    return MpcFp(sh, SHARED, mac)


def _sum_axis0(x: FpArray) -> FpArray:
    acc = FpArray(x.limbs[0], x.spec, x.bound)
    for i in range(1, x.shape[0]):
        acc = acc + FpArray(x.limbs[i], x.spec, x.bound)
    return acc


def _rebroadcast_limbs(t, limbs):
    if t.kind == "stacked":
        return jnp.broadcast_to(limbs[None], (t.n_parties,) + tuple(limbs.shape))
    return limbs


# ---------------------------------------------------------------------------
# InputWithCommit
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class InputWithCommit:
    """`input.rs:57-105`."""

    allocation: int                    # owner party id
    input: MpcFp                       # shared scalar (after generate)
    randomness_bits: MpcFp | None      # shared Pedersen randomness bits
    commitment: tuple | None           # public affine TE point

    @classmethod
    def generate(cls, value_ints, allocation: int, pp: PD.PedersenParams,
                 key, n_r_bits: int = 16, r_int: int | None = None):
        """Share the owner's value and publish its Pedersen commitment."""
        k1, k2 = jax.random.split(key)
        val = FpArray.from_int(FR, np.asarray(value_ints, dtype=object))
        shared = input_share(val, allocation, k1)
        # common randomness: replicated int (all parties know it, as the
        # reference's `common_randomness` is itself opened for the commit)
        if r_int is None:
            r_int = int(jax.random.randint(k2, (), 0, 1 << 16))
        rb = [(r_int >> i) & 1 for i in range(n_r_bits)]
        r_bits = MpcFp.const(FR, np.asarray(rb, dtype=object))
        opened = int(np.asarray(shared.reveal().to_ints()).reshape(-1)[0])
        com = PD.commit_public_ints(pp, opened, r_int)
        return cls(allocation, shared, r_bits, com)


# ---------------------------------------------------------------------------
# Lifecycle inputs
# ---------------------------------------------------------------------------


class MpcInput:
    """`MpcInputTrait` (`input.rs:149-160`): subclasses fill `set_*`."""

    def __init__(self):
        self.mode = "init"
        self.common = None
        self.peculiar = None

    def set_public_input(self, rng: pyrandom.Random, inp=None):
        raise NotImplementedError

    def set_private_input(self, inp=None):
        raise NotImplementedError

    def generate_input(self, key):
        raise NotImplementedError


class SampleMpcInput(MpcInput):
    """(a, b) pair of committed inputs (`input.rs:36-47,162-241`)."""

    def set_public_input(self, rng, inp=None):
        self.common = dict(pedersen_param=inp or PD.PedersenParams.sample(
            rng.randrange(1 << 30)))
        self.mode = "public_set"

    def set_private_input(self, inp=None):
        a, b = inp if inp is not None else (0, 0)
        self.peculiar = dict(a_val=a, b_val=b)
        self.mode = "private_set"

    def generate_input(self, key):
        assert self.mode == "private_set"
        pp = self.common["pedersen_param"]
        ka, kb = jax.random.split(key)
        self.peculiar["a"] = InputWithCommit.generate(
            np.asarray(self.peculiar["a_val"], dtype=object), 0, pp, ka)
        self.peculiar["b"] = InputWithCommit.generate(
            np.asarray(self.peculiar["b_val"], dtype=object), 1, pp, kb)
        self.mode = "shared"


class WerewolfKeyInput(MpcInput):
    """Per-player (pk_x, pk_y, is_fortune_teller) vectors
    (`input.rs:305-515`): player i owns slot i of each vector."""

    def set_public_input(self, rng, inp=None):
        self.common = dict(pedersen_param=inp or PD.PedersenParams.sample(
            rng.randrange(1 << 30)))
        self.mode = "public_set"

    def set_private_input(self, inp=None):
        pub_key_or_dummy_x, pub_key_or_dummy_y, is_fortune_teller = inp
        self.peculiar = dict(x_vals=pub_key_or_dummy_x,
                             y_vals=pub_key_or_dummy_y,
                             ft_vals=is_fortune_teller)
        self.mode = "private_set"

    def generate_input(self, key):
        assert self.mode == "private_set"
        pp = self.common["pedersen_param"]
        n = len(self.peculiar["x_vals"])
        keys = jax.random.split(key, 3)
        for name, field in (("pub_key_or_dummy_x", "x_vals"),
                            ("pub_key_or_dummy_y", "y_vals"),
                            ("is_fortune_teller", "ft_vals")):
            vals = self.peculiar[field]
            iwcs = []
            ks = jax.random.split(keys[0] if name.endswith("x") else
                                  keys[1] if name.endswith("y") else keys[2],
                                  n)
            for i, v in enumerate(vals):
                iwcs.append(InputWithCommit.generate(
                    np.asarray(int(v), dtype=object), i, pp, ks[i]))
            self.peculiar[name] = iwcs
        self.mode = "shared"


class WerewolfMpcInput(MpcInput):
    """Divination inputs: is_werewolf / is_target vectors + shared ElGamal
    randomness bits (`input.rs:517-789`)."""

    def set_public_input(self, rng, inp=None):
        inp = inp or {}
        self.common = dict(
            pedersen_param=inp.get("pedersen_param")
            or PD.PedersenParams.sample(rng.randrange(1 << 30)),
            elgamal_pubkey=inp.get("elgamal_pubkey"),
        )
        self.mode = "public_set"

    def set_private_input(self, inp=None):
        is_werewolf, is_target = inp
        self.peculiar = dict(wolf_vals=is_werewolf, target_vals=is_target)
        self.mode = "private_set"

    def generate_input(self, key, n_rand_bits: int | None = None):
        assert self.mode == "private_set"
        pp = self.common["pedersen_param"]
        nbits = n_rand_bits or params.ED_FR_MODULUS.bit_length()
        kw, kt, kr, kb = jax.random.split(key, 4)
        for name, field, kk in (("is_werewolf", "wolf_vals", kw),
                                ("is_target", "target_vals", kt)):
            vals = self.peculiar[field]
            ks = jax.random.split(kk, len(vals))
            self.peculiar[name] = [
                InputWithCommit.generate(np.asarray(int(v), dtype=object),
                                         i, pp, ks[i])
                for i, v in enumerate(vals)]
        # shared ElGamal randomness: random bits, jointly generated
        from .mpc import bits as B
        self.peculiar["randomness_bits"] = B.bit_rand(kr, FR, (nbits,))
        self.mode = "shared"
