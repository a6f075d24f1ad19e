"""Werewolf domain logic tests (tau matrix & shuffle; reference
`src/werewolf/types.rs:130-150`, `utils.rs:217-241`)."""

import random

from zkmpc_tpu.apps import werewolf as W


def std_grouping():
    # 2 werewolves (not alone), 1 fortune teller, 2 villagers
    return W.GroupingParameter({
        W.Role.FORTUNE_TELLER: (1, False),
        W.Role.WEREWOLF: (2, True),
        W.Role.VILLAGER: (2, False),
    })


def test_tau_shape_and_counts():
    gp = std_grouping()
    assert gp.num_players() == 5
    assert gp.num_groups() == 4     # 1 FT + 1 werewolf-group + 2 villagers
    tau = gp.generate_tau_matrix()
    assert tau.shape == (9, 9)
    # permutation-graph: every row/col has exactly one 1
    assert (tau.sum(axis=0) == 1).all()
    assert (tau.sum(axis=1) == 1).all()


def test_identity_shuffle_assignment():
    gp = std_grouping()
    n, m = gp.num_players(), gp.num_groups()
    import numpy as np
    ident = [np.eye(n + m, dtype=np.int64)]
    roles = []
    for pid in range(n):
        role, role_id, fellows = W.calc_shuffle_matrix(gp, ident, pid)
        roles.append(role)
    assert roles.count(W.Role.WEREWOLF) == 2
    assert roles.count(W.Role.FORTUNE_TELLER) == 1
    assert roles.count(W.Role.VILLAGER) == 2
    # werewolves must see each other as fellows
    wolf_ids = [i for i, r in enumerate(roles) if r is W.Role.WEREWOLF]
    for pid in wolf_ids:
        _, _, fellows = W.calc_shuffle_matrix(gp, ident, pid)
        assert fellows is not None
        assert set(fellows) | {pid} == set(wolf_ids)


def test_random_shuffles_preserve_role_counts():
    gp = std_grouping()
    n, m = gp.num_players(), gp.num_groups()
    rng = random.Random(3)
    mats = [W.generate_individual_shuffle_matrix(n, m, rng) for _ in range(3)]
    roles = [W.calc_shuffle_matrix(gp, mats, pid)[0] for pid in range(n)]
    assert roles.count(W.Role.WEREWOLF) == 2
    assert roles.count(W.Role.FORTUNE_TELLER) == 1
    assert roles.count(W.Role.VILLAGER) == 2
