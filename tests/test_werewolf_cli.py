"""Werewolf CLI game loop (reference `examples/werewolf_cli/`): scripted
games reach consistent end states; role dealing matches the shuffle domain
logic."""

from zkmpc_tpu.cli.werewolf_cli import Game, run_scripted


def test_roles_dealt():
    g = Game(["a", "b", "c"], seed=3)
    roles = sorted(p.role for p in g.players)
    assert roles == ["FortuneTeller", "Villager", "Werewolf"]


def test_villagers_win_by_vote():
    g = Game(["a", "b", "c"], seed=3)
    wolf = next(p.id for p in g.players if p.role == "Werewolf")
    # nobody dies at night; everyone votes the wolf out
    g.night(None, None)
    assert g.morning() == 3
    g.discussion()
    state = g.vote({p.id: wolf for p in g.alive()})
    assert state == 2
    assert g.phase == "Over"


def test_werewolf_win_by_kills():
    g = Game(["a", "b", "c"], seed=3)
    wolf = next(p.id for p in g.players if p.role == "Werewolf")
    victims = [p.id for p in g.players if p.id != wolf]
    g.night(victims[0], None)
    state = g.morning()
    # 1 wolf vs 1 villager -> wolves win
    assert state == 1
    assert g.phase == "Over"


def test_scripted_game():
    g = run_scripted(["a", "b", "c", "d", "e"], "kills=0;votes=1,1,1,1,1",
                     seed=1)
    assert g.day >= 1
    assert not g.players[0].is_alive
