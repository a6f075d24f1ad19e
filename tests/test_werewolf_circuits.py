"""Werewolf circuit suite (reference `src/circuits/werewolf.rs`):
satisfiability of each circuit over shared wires, with the out-of-circuit MPC
protocol supplying the public outputs, plus negative checks.
"""

import jax
import numpy as np
import pytest
import random as pyrandom

from zkmpc_tpu.apps import werewolf as WD
from zkmpc_tpu.circuits import werewolf as WC
from zkmpc_tpu.crypto import elgamal as EG
from zkmpc_tpu.crypto import pedersen as PD
from zkmpc_tpu.mpc import bits as B
from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark.r1cs import ConstraintSystem


def fr(v):
    return FpArray.from_int(FR, np.asarray(v, dtype=object))


def shared_scalar(v, key):
    x = king_share(fr([v]), key)
    def f(fp):
        return FpArray(fp.limbs[..., 0, :], fp.spec, fp.bound)
    return MpcFp(f(x.value), x.visibility,
                 None if x.mac is None else f(x.mac))


def shared_vec(vals, key):
    return king_share(fr(list(vals)), key)


def scope():
    return mpc_scope(MpcContext(StackedTransport(3), backend="semi"))


def test_key_publicize_circuit():
    with scope():
        k = jax.random.split(jax.random.PRNGKey(0), 9)
        pk_x = [shared_scalar(v, k[i]) for i, v in enumerate((5, 0, 0))]
        pk_y = [shared_scalar(v, k[3 + i]) for i, v in enumerate((6, 0, 0))]
        is_ft = [shared_scalar(v, k[6 + i]) for i, v in enumerate((1, 0, 0))]
        cs = ConstraintSystem(FR)
        WC.key_publicize_circuit(cs, pk_x, pk_y, is_ft, 5, 6)
        assert cs.is_satisfied_ints()
        # negative: claim the wrong aggregate
        cs2 = ConstraintSystem(FR)
        WC.key_publicize_circuit(cs2, pk_x, pk_y, is_ft, 7, 6)
        assert not cs2.is_satisfied_ints()


@pytest.mark.slow
def test_divination_circuit():
    with scope():
        keys = EG.keygen(3)
        kk = jax.random.split(jax.random.PRNGKey(1), 8)
        is_w = [shared_scalar(v, kk[i]) for i, v in enumerate((0, 1))]
        is_t = [shared_scalar(v, kk[2 + i]) for i, v in enumerate((0, 1))]
        nbits = 8
        r_int = 0b1011_0101
        r_bits = shared_vec([(r_int >> i) & 1 for i in range(nbits)], kk[4])
        # out-of-circuit MPC: hit = sum w*t; M = hit ? G : 0; encrypt
        from zkmpc_tpu.spec import curves as SC
        from zkmpc_tpu.mpc import te as TE
        hit = is_w[0] * is_t[0] + is_w[1] * is_t[1]
        msg_pt = TE.select_base(hit, SC.TE_GEN)
        c1, c2 = EG.encrypt_shared(keys.pk, msg_pt, r_bits)
        c1_xy = c1.reveal_affine_ints()[0]
        c2_xy = c2.reveal_affine_ints()[0]
        # oracle: decrypt must give G (target IS a werewolf)
        assert EG.decrypt_ints(keys, c1_xy, c2_xy) == SC.TE_GEN
        assert (c1_xy, c2_xy) == EG.encrypt_ints(keys.pk, SC.TE_GEN, r_int)

        cs = ConstraintSystem(FR)
        WC.divination_circuit(cs, is_w, is_t, r_bits, keys.pk,
                              c1_xy, c2_xy, kk[5])
        assert cs.is_satisfied_ints()


@pytest.mark.slow
def test_anonymous_voting_circuit():
    with scope():
        kk = jax.random.split(jax.random.PRNGKey(2), 12)
        # votes: players 0,1 vote for 2; player 2 votes for 0 -> winner 2
        votes = [[0, 0, 1], [0, 0, 1], [1, 0, 0]]
        wires = [[shared_scalar(v, kk[3 * j + i]) for i, v in enumerate(row)]
                 for j, row in enumerate(votes)]
        out = WC.calculate_voting_output(wires, kk[9])
        winner = int(np.asarray(out.reveal().to_ints()).reshape(-1)[0])
        assert winner == 2
        cs = ConstraintSystem(FR)
        WC.anonymous_voting_circuit(cs, wires, winner, kk[10])
        assert cs.is_satisfied_ints()


@pytest.mark.slow
def test_winning_judge_circuit():
    with scope():
        kk = jax.random.split(jax.random.PRNGKey(3), 6)
        am_w = [shared_scalar(v, kk[i]) for i, v in enumerate((1, 0, 0))]
        state = WC.calculate_game_state(3, am_w, kk[3])
        state_int = int(np.asarray(state.reveal().to_ints()).reshape(-1)[0])
        assert state_int == 3          # 1 wolf < 2 citizens -> continue
        cs = ConstraintSystem(FR)
        WC.winning_judge_circuit(cs, 3, am_w, state_int, kk[4])
        assert cs.is_satisfied_ints()
        # negative
        cs2 = ConstraintSystem(FR)
        WC.winning_judge_circuit(cs2, 3, am_w, 1, kk[5])
        assert not cs2.is_satisfied_ints()


@pytest.mark.slow
def test_role_assignment_circuit():
    with scope():
        gp = WD.GroupingParameter({
            WD.Role.FORTUNE_TELLER: (1, False),
            WD.Role.WEREWOLF: (1, False),
            WD.Role.VILLAGER: (1, False),
        })
        n = gp.num_players()
        m = gp.num_groups()
        L = n + m
        tau = gp.generate_tau_matrix()
        rng = pyrandom.Random(7)
        shuffles = [WD.generate_individual_shuffle_matrix(n, m, rng)
                    for _ in range(n)]
        roles = [WD.calc_shuffle_matrix(gp, shuffles, pid) for pid in range(n)]
        role_ids = [r[1] for r in roles]

        pp = PD.PedersenParams.sample(11)
        kk = jax.random.split(jax.random.PRNGKey(4), 4 * n + 2)
        shuffle_wires = []
        for s_i, S in enumerate(shuffles):
            ks = jax.random.split(kk[s_i], L)
            shuffle_wires.append(
                [[shared_scalar(int(S[i, j]), jax.random.fold_in(ks[i], j))
                  for j in range(L)] for i in range(L)])
        role_values = [shared_scalar(v, kk[n + i])
                       for i, v in enumerate(role_ids)]
        r_ints = [5 + i for i in range(n)]
        role_r_bits = [shared_vec([(r_ints[i] >> b) & 1 for b in range(8)],
                                  kk[2 * n + i]) for i in range(n)]
        role_coms = [PD.commit_public_ints(pp, role_ids[i], r_ints[i])
                     for i in range(n)]
        cs = ConstraintSystem(FR)
        WC.role_assignment_circuit(cs, tau, shuffle_wires, role_values,
                                   role_r_bits, role_coms, kk[3 * n],
                                   num_players=n, pedersen_pp=pp,
                                   com_nbits=8)
        assert cs.is_satisfied_ints()
