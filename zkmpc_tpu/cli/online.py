"""Online-phase binary: preprocessed-share input protocol + collaborative
proof of MyCircuit (reference `examples/online.rs:87-301`).

Reads the per-party `outputs/<i>/online_setup.json` r-shares written by
`cli.main`, runs the SPDZ input protocol (mask the owner's input with the
opened r, correct with the r-shares), proves MyCircuit (a*b=c + Pedersen
commitments) collaboratively, verifies, and reports comm stats.

Usage (in-process simulation of all parties, the default):
    python -m zkmpc_tpu.cli.online inputs.json --outdir outputs

Multi-process over the native TCP mesh (one process per party, the
reference's `run_online.zsh` topology):
    python -m zkmpc_tpu.cli.online inputs.json --id 0 --addrs data/3 &
    python -m zkmpc_tpu.cli.online inputs.json --id 1 --addrs data/3 &
    python -m zkmpc_tpu.cli.online inputs.json --id 2 --addrs data/3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run(inputs_path: str, outdir: str = "outputs", n_parties: int = 3,
        party_id: int | None = None, addrs: str | None = None,
        zksnark: str = "marlin", seed: int = 0) -> bool:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import numpy as np

    from .. import inputs as IN
    from ..circuits import my_circuit
    from ..crypto import pedersen
    from ..mpc.share import MpcContext, MpcFp, PUBLIC, SHARED, mpc_scope
    from ..ops.limbs import FR, FpArray
    from ..parallel.transport import StackedTransport
    from ..snark import groth16, marlin
    from ..snark.r1cs import ConstraintSystem
    from ..utils import serialize as SER

    with open(inputs_path) as f:
        doc = json.load(f)
    p = FR.p
    # party i's peculiar input (`online.rs:87-125`): party 0 owns x, party 1
    # owns y.  In socket mode a party consults the inputs file ONLY for its
    # own value — non-owners never see the plaintext.
    if party_id is None:
        a_int, b_int = int(doc.get("x", 3)), int(doc.get("y", 5))
    else:
        a_int = int(doc.get("x", 3)) if party_id == 0 else None
        b_int = int(doc.get("y", 5)) if party_id == 1 else None

    # load preprocessing r-shares — each party reads ONLY its own file
    # (`online.rs:127-176`).  The stacked (single-process) simulation plays
    # every party, so it loads all N files, exactly like the reference's
    # MpcMultiNet simulation.
    if party_id is None:
        r_rows, br_rows, betas = [], [], []
        for i in range(n_parties):
            fp = os.path.join(outdir, str(i), "online_setup.json")
            _, r, _ = SER.read_online_setup(fp)
            beta_i, br_i = SER.read_online_setup_bracket(fp)
            r_rows.append(r)
            br_rows.append(br_i)
            betas.append(beta_i)
    else:
        fp = os.path.join(outdir, str(party_id), "online_setup.json")
        _, my_r, _ = SER.read_online_setup(fp)
        my_beta, my_br = SER.read_online_setup_bracket(fp)

    if party_id is None:
        transport = StackedTransport(n_parties)
    else:
        from ..parallel.native_net import NativeMeshNet, SocketTransport
        net = NativeMeshNet.from_file(party_id, addrs)
        net.connect()
        transport = SocketTransport(net)

    NB = 48  # field-element wire size (384-bit le, CanonicalSerialize-style)

    key = jax.random.PRNGKey(seed)
    with mpc_scope(MpcContext(transport, backend="semi")):
        # SPDZ input protocol (`online.rs:178-209`): for input slot j owned
        # by party w, the mask r_j = sum_i r_i[j] is opened TO w only (each
        # party sends its r-share to w as a protocol message), w broadcasts
        # eps = x - r_j, and party i's share of x is r_i[j] (+eps for w).
        # No party ever reads another party's r-file, and r_j stays known
        # only to the owner.
        # [r] bracket-checked opening (`serialize.rs:101-147` dual
        # representation, SPDZ [.]-open): when the mask r_j opens TO the
        # owner w, every party also sends its bracket-MAC share under w's
        # key; w checks sum_i gamma_w(r)_i == beta_w * r.  A corrupted
        # r-share (or mac share) now fails loudly at input time.
        def input_share_with_r(x_int, slot, owner):
            if transport.kind == "stacked":
                r_open = sum(r_rows[i][slot] for i in range(n_parties)) % p
                if br_rows[owner] is not None:
                    mac_sum = sum(br_rows[i][owner][slot]
                                  for i in range(n_parties)) % p
                    assert mac_sum == betas[owner] * r_open % p, \
                        "bracket MAC check failed on the opened input mask"
                eps = (x_int - r_open) % p
                rows = [(r_rows[i][slot] + (eps if i == owner else 0)) % p
                        for i in range(n_parties)]
                sh = FpArray.from_int(FR, np.asarray(rows, dtype=object))
                return MpcFp(sh, SHARED)
            me = transport.net.party_id
            have_bracket = my_br is not None
            if me == owner:
                r_open = my_r[slot]
                mac_sum = my_br[owner][slot] if have_bracket else 0
                for i in range(n_parties):
                    if i != me:
                        blob = transport.net.recv_bytes(i, chan=2)
                        r_open += int.from_bytes(blob[:NB], "little")
                        if have_bracket:
                            mac_sum += int.from_bytes(blob[NB:], "little")
                if have_bracket:
                    assert mac_sum % p == my_beta * (r_open % p) % p, \
                        "bracket MAC check failed on the opened input mask"
                eps = (x_int - r_open) % p
                for i in range(n_parties):
                    if i != me:
                        transport.net.send_bytes(
                            i, eps.to_bytes(NB, "little"), chan=2)
            else:
                blob = (my_r[slot] % p).to_bytes(NB, "little")
                if have_bracket:
                    blob += (my_br[owner][slot] % p).to_bytes(NB, "little")
                transport.net.send_bytes(owner, blob, chan=2)
                eps = int.from_bytes(
                    transport.net.recv_bytes(owner, chan=2), "little")
            mine = (my_r[slot] + (eps if me == owner else 0)) % p
            return MpcFp(FpArray.from_int(FR, np.asarray(mine, dtype=object)),
                         SHARED)

        a = input_share_with_r(a_int, 0, owner=0)
        b = input_share_with_r(b_int, 1, owner=1)

        # Pedersen commitments: the OWNER commits to its own input and
        # publishes the commitment (`input.rs:57-105`); blinding randomness
        # is derived from the common seed (16 bits, as in cli.main).
        pp = pedersen.PedersenParams.sample(seed)
        kr = jax.random.fold_in(key, 7)
        ra, rb = (int(x) for x in np.asarray(
            jax.random.randint(kr, (2,), 0, 1 << 16)))
        nb = 16

        def published_commit(x_int, r_int, owner):
            if transport.kind == "stacked":
                return pedersen.commit_public_ints(pp, x_int, r_int)
            me = transport.net.party_id
            if me == owner:
                cx, cy = pedersen.commit_public_ints(pp, x_int, r_int)
                blob = (int(cx).to_bytes(NB, "little")
                        + int(cy).to_bytes(NB, "little"))
            else:
                blob = bytes(2 * NB)     # broadcast frames are equal-length
            got = transport.net.broadcast_bytes(blob, chan=2)
            owned = got[owner]
            return (int.from_bytes(owned[:NB], "little"),
                    int.from_bytes(owned[NB:], "little"))

        a_iwc = IN.InputWithCommit(
            0, a, MpcFp.const(FR, np.asarray(
                [(ra >> i) & 1 for i in range(nb)], dtype=object)),
            published_commit(a_int, ra, 0))
        b_iwc = IN.InputWithCommit(
            1, b, MpcFp.const(FR, np.asarray(
                [(rb >> i) & 1 for i in range(nb)], dtype=object)),
            published_commit(b_int, rb, 1))

        cs = ConstraintSystem(FR)
        # public output c = a*b computed IN MPC and revealed (no party knows
        # both plaintexts in socket mode)
        c_pub = int(np.asarray(
            (a * b).reveal().to_ints()).reshape(-1)[0]) % p
        my_circuit.build(cs, a_iwc, b_iwc, c_pub, pp,
                         jax.random.fold_in(key, 8), com_nbits=16)
        assert cs.is_satisfied_ints(), "online circuit unsatisfied"
        t0 = time.time()
        if zksnark == "marlin":
            index = marlin.setup_and_index(cs, seed=seed + 1)
            proof = marlin.prove(index, cs, jax.random.fold_in(key, 9))
            instance = cs.instance_ints()
            ok = marlin.verify(index, instance, proof)
        else:
            pk = groth16.setup(cs, seed=seed + 1)
            proof = groth16.prove(pk.device(), cs, jax.random.fold_in(key, 9))
            ok = groth16.verify(pk.vk, cs.instance_ints(),
                                groth16.proof_to_ints(proof))
        dt = time.time() - t0
    stats = transport.stats
    print(f"online prove+verify: {dt:.3f}s ok={ok} comm={stats!r}")
    if party_id is not None:
        print("net:", transport.net.stats)
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs")
    ap.add_argument("--outdir", default="outputs")
    ap.add_argument("--parties", type=int, default=3)
    ap.add_argument("--id", type=int, default=None,
                    help="party id for socket transport")
    ap.add_argument("--addrs", default=None,
                    help="address file host:port per line")
    ap.add_argument("--zksnark", choices=["marlin", "groth16"],
                    default="marlin")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    ok = run(args.inputs, args.outdir, args.parties, args.id, args.addrs,
             args.zksnark, args.seed)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
