"""Preprocessing + committed-input proof binary.

Parity with the reference's `cargo run --bin main {groth16|marlin}
inputs.json` (`src/main.rs:71-237`):

1. SPDZ preprocessing (initialize with ZKPoPKs, pair, triple) over the SHE
   layer — batched across SIMD slots instead of the reference's n=3 scalar
   loop.
2. Build `MySecretInputCircuit` from the JSON input x (range [3, 7) +
   Pedersen commitment), prove collaboratively (Groth16 or the Marlin-style
   prover), verify, and assert a wrong-instance proof fails.
3. Write per-party `outputs/<i>/online_setup.json` r-shares in the
   reference's 0x-hex JSON format (`src/serialize.rs:101-147`).

Usage: python -m zkmpc_tpu.cli.main {groth16|marlin} inputs.json
       [--parties 3] [--outdir outputs] [--slots 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run(zksnark: str, inputs_path: str, n_parties: int = 3,
        outdir: str = "outputs", slots: int = 8, seed: int = 0,
        backend: str = "semi") -> bool:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import numpy as np

    from ..circuits import input_circuit
    from ..config import RunConfig, build_mpc_context
    from ..crypto import pedersen
    from ..mpc.share import MpcContext, mpc_scope, king_share
    from ..ops.limbs import FR, FpArray
    from ..parallel.transport import StackedTransport
    from ..she import bgv, preprocessing as PP
    from ..snark import groth16, marlin
    from ..snark.r1cs import ConstraintSystem
    from ..utils import serialize as SER
    from ..utils.timer import timed

    cfg = RunConfig(n_parties=n_parties, backend=backend, zksnark=zksnark,
                    slots=slots, seed=seed, outdir=outdir)

    with open(inputs_path) as f:
        doc = json.load(f)
    x_int = int(doc["x"])

    key = jax.random.PRNGKey(seed)
    kpre, kshare, kr, kprove = jax.random.split(key, 4)

    # ---- offline phase (`main.rs:99-131`)
    t0 = time.time()
    params = bgv.SheParams(slots)
    ctx = PP.make_dealer(params, n_parties, kpre)
    PP.initialize(ctx, jax.random.fold_in(kpre, 1))
    (r_shares, r_macs), r_bracket = PP.pair(ctx, jax.random.fold_in(kpre, 2))
    (a, ma), (b, mb), (c, mc) = PP.triple(ctx, jax.random.fold_in(kpre, 3))
    # sanity oracle: a*b == c slot-wise (the reference's triple test)
    p = FR.p
    av = np.asarray(_sum_rows(a).to_ints())
    bv = np.asarray(_sum_rows(b).to_ints())
    cv = np.asarray(_sum_rows(c).to_ints())
    assert all(int(x) * int(y) % p == int(z) for x, y, z in zip(av, bv, cv)), \
        "preprocessing triple a*b != c"
    print(f"preprocessing: {time.time() - t0:.3f}s "
          f"({slots} slots x {n_parties} parties)")

    # ---- write per-party online setup files (`serialize.rs:101-147`):
    # BOTH representations — <r> (share + alpha-mac share) and [r]
    # (per-key bracket MAC shares + the party's own key beta_i)
    _, br_macs = r_bracket          # macs: [P_keys, P_holders, n]
    for i in range(n_parties):
        SER.write_online_setup(
            os.path.join(outdir, str(i), "online_setup.json"), i,
            SER.fparray_to_hex(r_shares[i]), SER.fparray_to_hex(r_macs[i]),
            r_bracket_hex=[SER.fparray_to_hex(br_macs[j, i])
                           for j in range(n_parties)],
            beta_hex=SER.field_to_hex(
                int(np.asarray(ctx.beta.to_ints()).reshape(-1)[i]), FR))

    # ---- online: committed-input circuit proof (`main.rs:140-237`)
    pp = pedersen.PedersenParams.sample(seed)
    r_int = int(jax.random.randint(kr, (), 0, 1 << 16))
    commitment = pedersen.commit_public_ints(pp, x_int, r_int)

    mctx = build_mpc_context(cfg, StackedTransport(n_parties), dealer=ctx,
                             key=jax.random.fold_in(kpre, 9))
    with mpc_scope(mctx):
        cs = ConstraintSystem(FR)
        x = _scalar(king_share(_fr([x_int]), kshare))
        r_bits = king_share(_fr([(r_int >> i) & 1 for i in range(16)]),
                            jax.random.fold_in(kshare, 1))
        input_circuit.build(cs, x, r_bits, commitment, pp, lower=3, upper=7,
                            key=jax.random.fold_in(kprove, 1))
        assert cs.is_satisfied_ints(), "circuit unsatisfied"
        print(f"constraints: {len(cs.constraints)}")
        t1 = time.time()
        if zksnark == "groth16":
            pk = groth16.setup(cs, seed=seed + 1)
            proof = groth16.prove(pk.device(), cs,
                                  jax.random.fold_in(kprove, 2))
            pints = groth16.proof_to_ints(proof)
            instance = cs.instance_ints()
            # publish the proof in the ark `Proof::serialize` wire format
            # (192-byte compressed blob, `compat/ark.py`) and verify the
            # PARSED blob — the round-trip is the interop contract with
            # the reference's serialized proofs
            from ..compat import ark as ARK
            blob = ARK.groth16_proof_from_ints(pints)
            os.makedirs(outdir, exist_ok=True)
            with open(os.path.join(outdir, "proof.bin"), "wb") as f:
                f.write(blob)
            with open(os.path.join(outdir, "proof.bin"), "rb") as f:
                parsed = ARK.groth16_proof_from_bytes(f.read())
            ok = groth16.verify(pk.vk, instance, parsed)
            bad = list(instance)
            bad[1] = (bad[1] + 1) % p
            neg = not groth16.verify(pk.vk, bad, parsed)
        elif zksnark == "marlin":
            index = marlin.setup_and_index(cs, seed=seed + 1)
            proof = marlin.prove(index, cs, jax.random.fold_in(kprove, 2))
            instance = cs.instance_ints()
            ok = marlin.verify(index, instance, proof)
            bad = list(instance)
            bad[1] = (bad[1] + 1) % p
            neg = not marlin.verify(index, bad, proof)
        else:
            raise SystemExit(f"unknown zksnark {zksnark!r}")
        print(f"prove+verify: {time.time() - t1:.3f}s ok={ok} negative={neg}")
        if backend == "spdz":
            # batched SPDZ MAC checks over every value opened during the
            # prove — required NON-vacuous: the queues must actually hold
            # residues from authenticated openings
            mctx.assert_field_macs(require_nonempty=True)
            mctx.assert_group_macs(require_nonempty=True)
            print(f"spdz MAC checks passed non-vacuously "
                  f"({mctx.mac_residue_count} field openings checked)")

    # commitment published like the reference's commitment.json
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "commitment.json"), "w") as f:
        json.dump({"x": SER.field_to_hex(commitment[0], FR),
                   "y": SER.field_to_hex(commitment[1], FR)}, f, indent=1)
    return ok and neg


def _fr(vals):
    import numpy as np
    from ..ops.limbs import FR, FpArray
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def _scalar(x):
    from ..mpc.share import MpcFp
    from ..ops.limbs import FpArray

    def f(fp):
        return FpArray(fp.limbs[..., 0, :], fp.spec, fp.bound)
    return MpcFp(f(x.value), x.visibility,
                 None if x.mac is None else f(x.mac))


def _sum_rows(x):
    from ..ops.limbs import FpArray
    acc = FpArray(x.limbs[0], x.spec, x.bound)
    for i in range(1, x.shape[0]):
        acc = acc + FpArray(x.limbs[i], x.spec, x.bound)
    return acc


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("zksnark", choices=["groth16", "marlin"])
    ap.add_argument("inputs", help="JSON file with {'x': int}")
    ap.add_argument("--parties", type=int, default=3)
    ap.add_argument("--outdir", default="outputs")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", choices=["semi", "spdz"], default="semi",
                    help="security model: semi-honest (the reference's "
                         "'honest' feature) or SPDZ malicious-majority "
                         "('malicious'), selected at runtime")
    args = ap.parse_args(argv)
    ok = run(args.zksnark, args.inputs, args.parties, args.outdir,
             args.slots, args.seed, args.backend)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
