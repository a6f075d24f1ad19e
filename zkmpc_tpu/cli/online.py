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
    # party i's peculiar input: x (and y for party 1), like online.rs's
    # per-party inputs; we prove a*b with a owned by party 0, b by party 1
    a_int = int(doc.get("x", 3))
    b_int = int(doc.get("y", 5))
    p = FR.p

    # load preprocessing r-shares (one slot per input)
    r_rows = []
    for i in range(n_parties):
        _, r, _ = SER.read_online_setup(
            os.path.join(outdir, str(i), "online_setup.json"))
        r_rows.append(r)

    if party_id is None:
        transport = StackedTransport(n_parties)
    else:
        from ..parallel.native_net import NativeMeshNet, SocketTransport
        net = NativeMeshNet.from_file(party_id, addrs)
        net.connect()
        transport = SocketTransport(net)

    key = jax.random.PRNGKey(seed)
    with mpc_scope(MpcContext(transport, backend="semi")):
        # SPDZ input protocol (`online.rs:178-209`): for input slot j owned
        # by party w, r_j = sum_i r_rows[i][j] is opened to w (here public in
        # the handoff file, as in the reference's simulation), w broadcasts
        # eps = x - r_j, and each party i holds share r_rows[i][j] (+eps on
        # the leader).
        def input_share_with_r(x_int, slot):
            r_open = sum(r_rows[i][slot] for i in range(n_parties)) % p
            eps = (x_int - r_open) % p
            if transport.kind == "stacked":
                rows = [(r_rows[i][slot] + (eps if i == 0 else 0)) % p
                        for i in range(n_parties)]
                sh = FpArray.from_int(FR, np.asarray(rows, dtype=object))
            else:
                mine = (r_rows[transport.party_id][slot]
                        + (eps if transport.party_id == 0 else 0)) % p
                sh = FpArray.from_int(FR, np.asarray(mine, dtype=object))
            return MpcFp(sh, SHARED)

        a = input_share_with_r(a_int, 0)
        b = input_share_with_r(b_int, 1)

        # commitments for a, b (public randomness from the common seed)
        pp = pedersen.PedersenParams.sample(seed)
        kr = jax.random.fold_in(key, 7)
        ra, rb = (int(x) for x in np.asarray(
            jax.random.randint(kr, (2,), 0, 1 << 16)))
        nb = 16
        import dataclasses as _dc
        a_iwc = IN.InputWithCommit(
            0, a, MpcFp.const(FR, np.asarray(
                [(ra >> i) & 1 for i in range(nb)], dtype=object)),
            pedersen.commit_public_ints(pp, a_int, ra))
        b_iwc = IN.InputWithCommit(
            1, b, MpcFp.const(FR, np.asarray(
                [(rb >> i) & 1 for i in range(nb)], dtype=object)),
            pedersen.commit_public_ints(pp, b_int, rb))

        cs = ConstraintSystem(FR)
        c_pub = a_int * b_int % p
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
