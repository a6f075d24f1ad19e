"""End-to-end werewolf game with REAL Groth16 proofs per phase — the
reference's north-star flow (`examples/bin_werewolf.rs:254-703`): all six
CLI modes run in sequence at 3 players, each phase proving its circuit
(KeyPublicize, RoleAssignment, Divination, AnonymousVoting, WinningJudge)
and verifying against the spec pairing verifier.

Round-2 gap closed: `cli/werewolf_game.py` had zero automated coverage —
a Groth16 regression in e.g. the RoleAssignment witness map would have
shipped unnoticed.
"""

import argparse
import json
import os

import pytest

from zkmpc_tpu.cli import werewolf_game as WG

pytestmark = pytest.mark.slow


def _args(gamedir, mode_extra=None, **kw):
    base = dict(players=3, gamedir=gamedir, seed=0, slots=8, target=None,
                votes=None, rand_bits=16, zksnark="groth16",
                srs_degree=1 << 11)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def gamedir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("werewolf_game"))


def test_full_game_with_proofs(gamedir):
    # init: role sampling + shuffle matrices
    assert WG.mode_init(_args(gamedir))
    # preprocessing: KeyPublicizeCircuit proof
    assert WG.mode_preprocessing(_args(gamedir))
    # role assignment: RoleAssignmentCircuit proof (permutation + pedersen)
    assert WG.mode_role_assignment(_args(gamedir))
    # night: DivinationCircuit proof (in-circuit ElGamal)
    assert WG.mode_night(_args(gamedir, target=1))
    # vote: AnonymousVotingCircuit proof
    assert WG.mode_vote(_args(gamedir, votes="2,2,0"))
    # judgment: WinningJudgeCircuit proof
    assert WG.mode_judgment(_args(gamedir))
    # the handoff files the reference's bin_werewolf writes exist
    for f in ("elgamal_pubkey.json", "role_commitments.json"):
        assert os.path.exists(os.path.join(gamedir, f)), f


def test_phase_under_universal_marlin_srs(gamedir):
    """One phase proved under Marlin with the SHARED universal SRS — the
    reference's trust model (`bin_werewolf.rs:430`: one universal_setup SRS
    for every phase).  Runs two phases against the SAME SRS file."""
    a = _args(gamedir, zksnark="marlin")
    assert WG.mode_vote(argparse.Namespace(**{**vars(a), "votes": "1,1,0"}))
    srs_path = os.path.join(gamedir, "universal_srs.json")
    assert os.path.exists(srs_path)
    mtime = os.path.getmtime(srs_path)
    assert WG.mode_judgment(a)
    assert os.path.getmtime(srs_path) == mtime, \
        "second phase must REUSE the universal SRS, not regenerate it"
