"""Werewolf game binary — all phases of the reference's `bin-werewolf`
(`examples/bin_werewolf.rs:88-935`), single-process simulation of the
parties (each phase's MPC runs over the stacked transport; state is passed
between phases through `werewolf_game/` JSON files exactly like the
reference's mode-per-invocation design).

Modes:
  init             role assignment files + SPDZ preprocessing (`:166-252`)
  preprocessing    KeyPublicize MPC proof + ElGamal key publication (`:254-355`)
  role_assignment  shuffle + RoleAssignment MPC proof (`:357-486`)
  night            DivinationCircuit MPC proof + seer decryption (`:488-703`)
  vote             AnonymousVoting proof (`:705-782`)
  judgment         WinningJudge proof (`:784-935`)

Usage: python -m zkmpc_tpu.cli.werewolf_game <mode> [--players 3]
       [--gamedir werewolf_game] [--target 1] [--votes 2,2,0]
"""

from __future__ import annotations

import argparse
import json
import os
import random as pyrandom
import sys
import time


def _setup_env():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _state_path(gamedir, name):
    os.makedirs(gamedir, exist_ok=True)
    return os.path.join(gamedir, name)


def _save(gamedir, name, doc):
    with open(_state_path(gamedir, name), "w") as f:
        json.dump(doc, f, indent=1)


def _load(gamedir, name):
    with open(os.path.join(gamedir, name)) as f:
        return json.load(f)


def _scope(n):
    from ..mpc.share import MpcContext, mpc_scope
    from ..parallel.transport import StackedTransport
    return mpc_scope(MpcContext(StackedTransport(n), backend="semi"))


def _fr(vals):
    import numpy as np
    from ..ops.limbs import FR, FpArray
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def _shared_scalar(v, key):
    from ..mpc.share import MpcFp, king_share
    from ..ops.limbs import FpArray
    x = king_share(_fr([int(v)]), key)

    def f(fp):
        return FpArray(fp.limbs[..., 0, :], fp.spec, fp.bound)
    return MpcFp(f(x.value), x.visibility,
                 None if x.mac is None else f(x.mac))


def _universal_srs(args):
    """ONE universal Marlin SRS shared by every phase (the reference proves
    all phases under a single `universal_setup` SRS, `bin_werewolf.rs:430`)
    — set up once, persisted in the gamedir, reloaded by later phases."""
    from ..snark import kzg, marlin
    path = _state_path(args.gamedir, "universal_srs.json")
    if os.path.exists(path):
        return kzg.load_srs(path)
    t0 = time.time()
    srs = marlin.universal_setup(args.srs_degree, seed=args.seed + 99)
    kzg.save_srs(srs, path)
    print(f"universal setup: degree {args.srs_degree} "
          f"({time.time() - t0:.2f}s, one-time, shared by all phases)")
    return srs


def _prove_and_verify(args, cs, key, setup_seed):
    """Prove + verify one phase circuit under the selected zkSNARK.

    marlin: indexes under the SHARED universal SRS (same trust model as the
    reference's bin_werewolf).  groth16: circuit-specific trusted setup via
    the device-assisted MSM path (`device_setup`, not the O(m) host loop)."""
    from ..snark import groth16, marlin
    if getattr(args, "zksnark", "groth16") == "marlin":
        index = marlin.index_with_srs(_universal_srs(args), cs)
        proof = marlin.prove(index, cs, key)
        return marlin.verify(index, cs.instance_ints(), proof)
    dpk = groth16.device_setup(cs, seed=setup_seed)
    proof = groth16.prove(dpk, cs, key)
    return groth16.verify(dpk.pk.vk, cs.instance_ints(),
                          groth16.proof_to_ints(proof))


def _grouping(n_players):
    from ..apps import werewolf as WD
    # the reference's default: 1 fortune teller, 1 werewolf, rest villagers
    groups = {WD.Role.FORTUNE_TELLER: (1, False),
              WD.Role.WEREWOLF: (1, False),
              WD.Role.VILLAGER: (n_players - 2, False)}
    return WD.GroupingParameter(groups)


def mode_init(args):
    """Role files + preprocessing (`bin_werewolf.rs:166-252`)."""
    _setup_env()
    import jax
    from ..apps import werewolf as WD
    from ..she import bgv, preprocessing as PP
    from ..utils import serialize as SER

    n = args.players
    gp = _grouping(n)
    rng = pyrandom.Random(args.seed)
    shuffles = [WD.generate_individual_shuffle_matrix(
        gp.num_players(), gp.num_groups(), rng) for _ in range(n)]
    roles = [WD.calc_shuffle_matrix(gp, shuffles, pid) for pid in range(n)]
    for pid, (role, role_id, fellows) in enumerate(roles):
        _save(args.gamedir, f"role_{pid}.json",
              {"role": role.value, "role_id": role_id,
               "fellows": fellows or []})
    _save(args.gamedir, "public.json",
          {"players": n, "alive": list(range(n)), "seed": args.seed})
    _save(args.gamedir, "shuffles.json",
          {"matrices": [[[int(v) for v in row] for row in S]
                        for S in shuffles]})

    t0 = time.time()
    params = bgv.SheParams(args.slots)
    ctx = PP.make_dealer(params, n, jax.random.PRNGKey(args.seed))
    PP.initialize(ctx, jax.random.PRNGKey(args.seed + 1))
    (r_shares, r_macs), _ = PP.pair(ctx, jax.random.PRNGKey(args.seed + 2))
    PP.triple(ctx, jax.random.PRNGKey(args.seed + 3))
    for i in range(n):
        SER.write_online_setup(
            os.path.join(args.gamedir, str(i), "online_setup.json"), i,
            SER.fparray_to_hex(r_shares[i]), SER.fparray_to_hex(r_macs[i]))
    print(f"init: roles dealt, preprocessing {time.time() - t0:.2f}s")
    return True


def mode_preprocessing(args):
    """KeyPublicize proof: the fortune teller's ElGamal pubkey is summed
    (dummies elsewhere) and published (`bin_werewolf.rs:254-355`)."""
    _setup_env()
    import jax
    import numpy as np
    from ..circuits import werewolf as WC
    from ..crypto import elgamal as EG
    from ..mpc.share import MpcFp
    from ..ops.limbs import FR
    from ..snark import groth16
    from ..snark.r1cs import ConstraintSystem

    n = args.players
    ft_id = _find_role(args.gamedir, n, "FortuneTeller")
    keys = EG.keygen(args.seed + 10)
    _save(args.gamedir, "fortune_teller_key.json",
          {"sk": keys.sk, "pk": [int(keys.pk[0]), int(keys.pk[1])]})

    with _scope(n):
        kk = jax.random.split(jax.random.PRNGKey(args.seed + 11), 3 * n + 2)
        pk_x = [_shared_scalar(keys.pk[0] if i == ft_id else 0, kk[i])
                for i in range(n)]
        pk_y = [_shared_scalar(keys.pk[1] if i == ft_id else 0, kk[n + i])
                for i in range(n)]
        is_ft = [_shared_scalar(1 if i == ft_id else 0, kk[2 * n + i])
                 for i in range(n)]
        cs = ConstraintSystem(FR)
        WC.key_publicize_circuit(cs, pk_x, pk_y, is_ft,
                                 int(keys.pk[0]), int(keys.pk[1]))
        assert cs.is_satisfied_ints()
        t0 = time.time()
        ok = _prove_and_verify(args, cs, kk[3 * n], args.seed + 12)
    _save(args.gamedir, "elgamal_pubkey.json",
          {"pk": [int(keys.pk[0]), int(keys.pk[1])], "verified": bool(ok)})
    print(f"preprocessing: key publicized, proof ok={ok} "
          f"({time.time() - t0:.2f}s, {len(cs.constraints)} constraints)")
    return ok


def mode_role_assignment(args):
    """RoleAssignment MPC proof (`bin_werewolf.rs:357-486`)."""
    _setup_env()
    import jax
    import numpy as np
    from ..apps import werewolf as WD
    from ..circuits import werewolf as WC
    from ..crypto import pedersen as PD
    from ..mpc.share import king_share
    from ..ops.limbs import FR
    from ..snark import groth16
    from ..snark.r1cs import ConstraintSystem

    n = args.players
    gp = _grouping(n)
    L = gp.num_players() + gp.num_groups()
    tau = gp.generate_tau_matrix()
    shuffles = [np.asarray(S, dtype=np.int64) for S in
                _load(args.gamedir, "shuffles.json")["matrices"]]
    roles = [WD.calc_shuffle_matrix(gp, shuffles, pid) for pid in range(n)]
    role_ids = [r[1] for r in roles]

    pp = PD.PedersenParams.sample(args.seed + 20)
    rng = pyrandom.Random(args.seed + 21)
    r_ints = [rng.randrange(1 << 16) for _ in range(n)]
    role_coms = [PD.commit_public_ints(pp, role_ids[i], r_ints[i])
                 for i in range(n)]
    _save(args.gamedir, "role_commitments.json",
          {"commitments": [[int(c[0]), int(c[1])] for c in role_coms],
           "r": r_ints})

    with _scope(n):
        kk = jax.random.split(jax.random.PRNGKey(args.seed + 22), 8)
        shuffle_wires = []
        for s_i, S in enumerate(shuffles):
            ks = jax.random.split(jax.random.fold_in(kk[0], s_i), L)
            shuffle_wires.append(
                [[_shared_scalar(int(S[i, j]), jax.random.fold_in(ks[i], j))
                  for j in range(L)] for i in range(L)])
        role_values = [_shared_scalar(v, jax.random.fold_in(kk[1], i))
                       for i, v in enumerate(role_ids)]
        role_r_bits = [king_share(_fr([(r_ints[i] >> b) & 1
                                       for b in range(16)]),
                                  jax.random.fold_in(kk[2], i))
                       for i in range(n)]
        cs = ConstraintSystem(FR)
        WC.role_assignment_circuit(cs, tau, shuffle_wires, role_values,
                                   role_r_bits, role_coms, kk[3],
                                   num_players=n, pedersen_pp=pp,
                                   com_nbits=16)
        assert cs.is_satisfied_ints()
        t0 = time.time()
        ok = _prove_and_verify(args, cs, kk[4], args.seed + 23)
    print(f"role_assignment: proof ok={ok} ({time.time() - t0:.2f}s, "
          f"{len(cs.constraints)} constraints)")
    return ok


def mode_night(args):
    """Divination: the seer learns whether the target is a werewolf, with an
    MPC proof that the published ciphertext is well-formed
    (`bin_werewolf.rs:488-703`)."""
    _setup_env()
    import jax
    import numpy as np
    from ..circuits import werewolf as WC
    from ..crypto import elgamal as EG
    from ..mpc import te as TE
    from ..mpc.share import king_share
    from ..ops.limbs import FR
    from ..snark import groth16
    from ..snark.r1cs import ConstraintSystem
    from ..spec import curves as SC

    n = args.players
    wolf_id = _find_role(args.gamedir, n, "Werewolf")
    target = args.target if args.target is not None else wolf_id
    ftk = _load(args.gamedir, "fortune_teller_key.json")
    keys = EG.ElGamalKeys(int(ftk["sk"]), tuple(ftk["pk"]))

    with _scope(n):
        kk = jax.random.split(jax.random.PRNGKey(args.seed + 30), 2 * n + 4)
        is_w = [_shared_scalar(1 if i == wolf_id else 0, kk[i])
                for i in range(n)]
        is_t = [_shared_scalar(1 if i == target else 0, kk[n + i])
                for i in range(n)]
        nbits = args.rand_bits
        from ..mpc import bits as B
        r_bits = B.bit_rand(kk[2 * n], FR, (nbits,))
        hit = is_w[0] * is_t[0]
        for i in range(1, n):
            hit = hit + is_w[i] * is_t[i]
        msg_pt = TE.select_base(hit, SC.TE_GEN)
        c1, c2 = EG.encrypt_shared(keys.pk, msg_pt, r_bits)
        c1_xy = c1.reveal_affine_ints()[0]
        c2_xy = c2.reveal_affine_ints()[0]

        cs = ConstraintSystem(FR)
        WC.divination_circuit(cs, is_w, is_t, r_bits, keys.pk,
                              c1_xy, c2_xy, kk[2 * n + 1])
        assert cs.is_satisfied_ints()
        t0 = time.time()
        ok = _prove_and_verify(args, cs, kk[2 * n + 2], args.seed + 31)
    plain = EG.decrypt_ints(keys, c1_xy, c2_xy)
    is_wolf = plain == SC.TE_GEN
    _save(args.gamedir, "divination.json",
          {"target": target, "is_werewolf": bool(is_wolf),
           "verified": bool(ok)})
    print(f"night: target {target} is_werewolf={is_wolf} proof ok={ok} "
          f"({time.time() - t0:.2f}s, {len(cs.constraints)} constraints)")
    return ok


def mode_vote(args):
    """Anonymous voting proof (`bin_werewolf.rs:705-782`)."""
    _setup_env()
    import jax
    import numpy as np
    from ..circuits import werewolf as WC
    from ..ops.limbs import FR
    from ..snark import groth16
    from ..snark.r1cs import ConstraintSystem

    n = args.players
    votes = [int(v) for v in args.votes.split(",")] if args.votes else \
        [(i + 1) % n for i in range(n)]
    with _scope(n):
        kk = jax.random.split(jax.random.PRNGKey(args.seed + 40),
                              n * n + 3)
        wires = [[_shared_scalar(1 if votes[j] == i else 0, kk[j * n + i])
                  for i in range(n)] for j in range(n)]
        out = WC.calculate_voting_output(wires, kk[n * n])
        winner = int(np.asarray(out.reveal().to_ints()).reshape(-1)[0])
        cs = ConstraintSystem(FR)
        WC.anonymous_voting_circuit(cs, wires, winner, kk[n * n + 1])
        assert cs.is_satisfied_ints()
        t0 = time.time()
        ok = _prove_and_verify(args, cs, kk[n * n + 2], args.seed + 41)
    _save(args.gamedir, "vote.json",
          {"votes": votes, "most_voted": winner, "verified": bool(ok)})
    print(f"vote: winner={winner} proof ok={ok} ({time.time() - t0:.2f}s)")
    return ok


def mode_judgment(args):
    """Winning judgment proof (`bin_werewolf.rs:784-935`)."""
    _setup_env()
    import jax
    import numpy as np
    from ..circuits import werewolf as WC
    from ..ops.limbs import FR
    from ..snark import groth16
    from ..snark.r1cs import ConstraintSystem

    n = args.players
    pub = _load(args.gamedir, "public.json")
    alive = pub.get("alive", list(range(n)))
    wolf_id = _find_role(args.gamedir, n, "Werewolf")
    with _scope(n):
        kk = jax.random.split(jax.random.PRNGKey(args.seed + 50), n + 4)
        am_w = [_shared_scalar(1 if i == wolf_id and i in alive else 0,
                               kk[i]) for i in range(n)]
        state = WC.calculate_game_state(len(alive), am_w, kk[n])
        state_int = int(np.asarray(state.reveal().to_ints()).reshape(-1)[0])
        cs = ConstraintSystem(FR)
        WC.winning_judge_circuit(cs, len(alive), am_w, state_int, kk[n + 1])
        assert cs.is_satisfied_ints()
        t0 = time.time()
        ok = _prove_and_verify(args, cs, kk[n + 2], args.seed + 51)
    names = {1: "werewolf win", 2: "villager win", 3: "continue"}
    _save(args.gamedir, "judgment.json",
          {"state": state_int, "meaning": names[state_int],
           "verified": bool(ok)})
    print(f"judgment: {names[state_int]} proof ok={ok} "
          f"({time.time() - t0:.2f}s)")
    return ok


def _find_role(gamedir, n, role_name):
    for pid in range(n):
        doc = _load(gamedir, f"role_{pid}.json")
        if doc["role"] == role_name:
            return pid
    raise SystemExit(f"no player with role {role_name}")


MODES = {"init": mode_init, "preprocessing": mode_preprocessing,
         "role_assignment": mode_role_assignment, "night": mode_night,
         "vote": mode_vote, "judgment": mode_judgment}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=sorted(MODES))
    ap.add_argument("--players", type=int, default=3)
    ap.add_argument("--gamedir", default="werewolf_game")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--target", type=int, default=None)
    ap.add_argument("--votes", default=None,
                    help="comma-separated target ids, one per player")
    ap.add_argument("--rand-bits", type=int, default=32,
                    help="ElGamal randomness bits (251 for full security)")
    ap.add_argument("--zksnark", choices=["groth16", "marlin"],
                    default="groth16",
                    help="marlin = one shared universal SRS for all phases")
    ap.add_argument("--srs-degree", type=int, default=1 << 13,
                    help="universal SRS degree for --zksnark marlin")
    args = ap.parse_args(argv)
    ok = MODES[args.mode](args)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
