"""Interactive werewolf game — the reference's `werewolf-cli`
(`examples/werewolf_cli/{main,game}.rs`): a terminal game loop over
Night -> Morning -> Discussion -> Voting phases with roles assigned by the
verifiable shuffle, night kills, seer divinations, vote eliminations, and
win-condition checks.  `--prove` runs the per-phase MPC proofs (the
reference's optional proof mode); without it the game logic runs standalone
for fast play/testing.

Usage:
  python -m zkmpc_tpu.cli.werewolf_cli --names alice,bob,carol [--prove]
  python -m zkmpc_tpu.cli.werewolf_cli --script kills=2;votes=1,2,0 ...
    (scripted, non-interactive: used by tests)
"""

from __future__ import annotations

import argparse
import dataclasses
import random as pyrandom
import sys


@dataclasses.dataclass
class Player:
    id: int
    name: str
    role: str              # "Werewolf" | "FortuneTeller" | "Villager"
    is_alive: bool = True


@dataclasses.dataclass
class GameRules:
    """`game.rs:GameRules` — min/max players, werewolf ratio, seer count."""
    min_players: int = 3
    max_players: int = 12
    werewolf_ratio: float = 0.34
    seer_count: int = 1


class Game:
    """`game.rs:Game` — state machine over the four phases."""

    def __init__(self, names, rules: GameRules | None = None, seed: int = 0,
                 prove: bool = False):
        from ..apps import werewolf as WD
        self.rules = rules or GameRules()
        n = len(names)
        assert self.rules.min_players <= n <= self.rules.max_players
        n_wolves = max(1, int(n * self.rules.werewolf_ratio))
        n_seers = self.rules.seer_count
        groups = {WD.Role.FORTUNE_TELLER: (n_seers, n_seers > 1),
                  WD.Role.WEREWOLF: (n_wolves, n_wolves > 1),
                  WD.Role.VILLAGER: (n - n_wolves - n_seers, False)}
        gp = WD.GroupingParameter(groups)
        rng = pyrandom.Random(seed)
        shuffles = [WD.generate_individual_shuffle_matrix(
            gp.num_players(), gp.num_groups(), rng) for _ in range(n)]
        self.gp = gp
        self.shuffles = shuffles
        roles = [WD.calc_shuffle_matrix(gp, shuffles, pid)[0] for pid in
                 range(n)]
        self.players = [Player(i, nm, roles[i].value)
                        for i, nm in enumerate(names)]
        self.day = 1
        self.phase = "Night"
        self.prove = prove
        self.seed = seed
        self.log: list[str] = []

    # ------------------------------------------------------------- helpers

    def alive(self):
        return [p for p in self.players if p.is_alive]

    def wolves_alive(self):
        return [p for p in self.alive() if p.role == "Werewolf"]

    def _say(self, msg):
        self.log.append(msg)
        print(msg)

    # --------------------------------------------------------------- phases

    def night(self, kill_id: int | None, divine_id: int | None = None):
        """Werewolves kill; the seer divines (`game.rs` night phase)."""
        assert self.phase == "Night"
        if divine_id is not None:
            is_wolf = self.players[divine_id].role == "Werewolf"
            if self.prove:
                is_wolf = self._prove_divination(divine_id)
            self._say(f"[seer] player {divine_id} "
                      f"{'IS' if is_wolf else 'is NOT'} a werewolf")
        if kill_id is not None and self.players[kill_id].is_alive:
            self.players[kill_id].is_alive = False
            self._say(f"[night] player {kill_id} "
                      f"({self.players[kill_id].name}) was killed")
        self.phase = "Morning"

    def morning(self):
        assert self.phase == "Morning"
        state = self._judge()
        self._say(f"[morning] day {self.day}: "
                  f"{len(self.alive())} alive, game state = {state}")
        self.phase = "Discussion" if state == 3 else "Over"
        return state

    def discussion(self):
        assert self.phase == "Discussion"
        self.phase = "Voting"

    def vote(self, votes: dict):
        """votes: voter id -> target id.  Most-voted is eliminated
        (ties keep the lowest id, matching the circuit's running argmax)."""
        assert self.phase == "Voting"
        n = len(self.players)
        tally = [0] * n
        for voter, target in votes.items():
            if self.players[voter].is_alive:
                tally[target] += 1
        winner = max(range(n), key=lambda i: (tally[i], -i))
        if self.prove:
            winner = self._prove_vote(votes)
        self.players[winner].is_alive = False
        self._say(f"[vote] player {winner} ({self.players[winner].name}) "
                  f"eliminated with {tally[winner]} votes")
        state = self._judge()
        self.day += 1
        self.phase = "Night" if state == 3 else "Over"
        return state

    def _judge(self) -> int:
        """1 = werewolf win, 2 = villager win, 3 = continue
        (WinningJudgeCircuit semantics)."""
        n_w = len(self.wolves_alive())
        n_alive = len(self.alive())
        if n_w == 0:
            return 2
        if n_w < n_alive - n_w:
            return 3
        return 1

    # ------------------------------------------------- optional MPC proofs

    def _scope(self):
        from ..mpc.share import MpcContext, mpc_scope
        from ..parallel.transport import StackedTransport
        return mpc_scope(MpcContext(StackedTransport(len(self.players)),
                                    backend="semi"))

    def _prove_divination(self, target: int) -> bool:
        import jax
        import numpy as np
        from ..circuits import werewolf as WC
        from ..crypto import elgamal as EG
        from ..mpc import bits as B, te as TE
        from ..ops.limbs import FR
        from ..snark import groth16
        from ..snark.r1cs import ConstraintSystem
        from ..spec import curves as SC
        from .werewolf_game import _shared_scalar

        keys = EG.keygen(self.seed + 99)
        n = len(self.players)
        with self._scope():
            kk = jax.random.split(jax.random.PRNGKey(self.seed + self.day),
                                  2 * n + 3)
            is_w = [_shared_scalar(1 if p.role == "Werewolf" else 0, kk[i])
                    for i, p in enumerate(self.players)]
            is_t = [_shared_scalar(1 if i == target else 0, kk[n + i])
                    for i in range(n)]
            r_bits = B.bit_rand(kk[2 * n], FR, (16,))
            hit = is_w[0] * is_t[0]
            for i in range(1, n):
                hit = hit + is_w[i] * is_t[i]
            c1, c2 = EG.encrypt_shared(keys.pk, TE.select_base(hit, SC.TE_GEN),
                                       r_bits)
            c1_xy = c1.reveal_affine_ints()[0]
            c2_xy = c2.reveal_affine_ints()[0]
            cs = ConstraintSystem(FR)
            WC.divination_circuit(cs, is_w, is_t, r_bits, keys.pk, c1_xy,
                                  c2_xy, kk[2 * n + 1])
            pk = groth16.setup(cs, seed=self.seed + 7)
            proof = groth16.prove(pk.device(), cs, kk[2 * n + 2])
            assert groth16.verify(pk.vk, cs.instance_ints(),
                                  groth16.proof_to_ints(proof)), \
                "divination proof rejected"
        return EG.decrypt_ints(keys, c1_xy, c2_xy) == SC.TE_GEN

    def _prove_vote(self, votes: dict) -> int:
        import jax
        import numpy as np
        from ..circuits import werewolf as WC
        from ..ops.limbs import FR
        from ..snark import groth16
        from ..snark.r1cs import ConstraintSystem
        from .werewolf_game import _shared_scalar

        n = len(self.players)
        voters = [v for v in votes if self.players[v].is_alive]
        with self._scope():
            kk = jax.random.split(
                jax.random.PRNGKey(self.seed + 100 + self.day),
                len(voters) * n + 3)
            wires = [[_shared_scalar(1 if votes[v] == i else 0,
                                     kk[j * n + i]) for i in range(n)]
                     for j, v in enumerate(voters)]
            out = WC.calculate_voting_output(wires, kk[len(voters) * n])
            winner = int(np.asarray(
                out.reveal().to_ints()).reshape(-1)[0])
            cs = ConstraintSystem(FR)
            WC.anonymous_voting_circuit(cs, wires, winner,
                                        kk[len(voters) * n + 1])
            pk = groth16.setup(cs, seed=self.seed + 8)
            proof = groth16.prove(pk.device(), cs, kk[len(voters) * n + 2])
            assert groth16.verify(pk.vk, cs.instance_ints(),
                                  groth16.proof_to_ints(proof)), \
                "voting proof rejected"
        return winner


def run_scripted(names, script: str, seed: int = 0, prove: bool = False):
    """Drive the game from a script 'kills=a,b,..;votes=v0|v1|..;divines=..'
    where votes per round are comma-joined voter->target lists."""
    game = Game(names, seed=seed, prove=prove)
    parts = dict(kv.split("=", 1) for kv in script.split(";") if kv)
    kills = [int(x) for x in parts.get("kills", "").split(",") if x != ""]
    divines = [int(x) for x in parts.get("divines", "").split(",") if x != ""]
    vote_rounds = [vr for vr in parts.get("votes", "").split("|") if vr]
    rnd = 0
    while game.phase != "Over":
        kill = kills[rnd] if rnd < len(kills) else None
        div = divines[rnd] if rnd < len(divines) else None
        game.night(kill, div)
        state = game.morning()
        if game.phase == "Over":
            break
        game.discussion()
        if rnd < len(vote_rounds):
            votes = {i: int(t) for i, t in
                     enumerate(vote_rounds[rnd].split(","))}
        else:
            votes = {p.id: (p.id + 1) % len(names) for p in game.alive()}
        state = game.vote(votes)
        rnd += 1
        if rnd > 20:
            break
    return game


def interactive(names, seed, prove):
    game = Game(names, seed=seed, prove=prove)
    print("roles dealt (secret).  phases: night -> morning -> vote")
    while game.phase != "Over":
        kill = input("night kill id (empty = none): ").strip()
        div = input("seer divines id (empty = none): ").strip()
        game.night(int(kill) if kill else None, int(div) if div else None)
        if game.morning() != 3:
            break
        game.discussion()
        votes = {}
        for p in game.alive():
            t = input(f"player {p.id} ({p.name}) votes for: ").strip()
            votes[p.id] = int(t)
        game.vote(votes)
    print("game over:", "werewolves win" if game._judge() == 1
          else "villagers win")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--names", default="alice,bob,carol")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prove", action="store_true")
    ap.add_argument("--script", default=None)
    args = ap.parse_args(argv)
    names = args.names.split(",")
    if args.script is not None:
        game = run_scripted(names, args.script, args.seed, args.prove)
        sys.exit(0 if game.phase == "Over" or game._judge() != 3 else 1)
    interactive(names, args.seed, args.prove)


if __name__ == "__main__":
    main()
