"""Full collaborative Groth16 prove over the REAL TCP socket transport:
three parties as threads, each with its own `NativeMeshNet` socket mesh and
its own MPC context, running `cli.online` end-to-end (the reference's
`run_online.zsh` topology, `examples/online.rs:87-301`).

Covers the round-2 gaps: (a) the share layer above one Beaver mul over
sockets — a whole prove; (b) the SPDZ input protocol as protocol messages —
each party reads ONLY its own `online_setup.json`, the mask is opened only
to the input's owner, and non-owners never see plaintext inputs
(`online.rs:127-209`).
"""

import json
import random
import threading

import pytest

from test_native_net import build_native, free_ports

pytestmark = pytest.mark.slow


def test_online_socket_prove(tmp_path):
    from zkmpc_tpu.cli import online
    from zkmpc_tpu.ops.limbs import FR
    from zkmpc_tpu.utils import serialize as SER

    p = FR.p
    rng = random.Random(77)
    outdir = tmp_path / "outputs"
    # per-party preprocessing handoff: 2 input slots of additive mask shares
    # in BOTH representations (<r> and [r], `serialize.rs:101-147`): the
    # bracket MAC shares let the mask's owner verify the [.]-checked opening
    # during the input protocol (cli/online.py)
    n_p, n_slots = 3, 2
    r_sh = [[rng.randrange(p) for _ in range(n_slots)] for _ in range(n_p)]
    r_open = [sum(r_sh[i][s] for i in range(n_p)) % p for s in range(n_slots)]
    betas = [rng.randrange(p) for _ in range(n_p)]
    # macs[j][i][s]: party i's MAC share under key j; sums to beta_j * r
    macs = [[[rng.randrange(p) for _ in range(n_slots)]
             for _ in range(n_p - 1)] for _ in range(n_p)]
    for j in range(n_p):
        last = [(betas[j] * r_open[s] - sum(macs[j][i][s]
                                            for i in range(n_p - 1))) % p
                for s in range(n_slots)]
        macs[j].append(last)
    for i in range(3):
        SER.write_online_setup(
            str(outdir / str(i) / "online_setup.json"), i,
            [SER.field_to_hex(v, FR) for v in r_sh[i]],
            r_bracket_hex=[[SER.field_to_hex(macs[j][i][s], FR)
                            for s in range(n_slots)] for j in range(n_p)],
            beta_hex=SER.field_to_hex(betas[i], FR))
    inputs = tmp_path / "inputs.json"
    inputs.write_text(json.dumps({"x": 3, "y": 5}))

    build_native()
    ports = free_ports(3)
    addr_file = tmp_path / "addrs.txt"
    addr_file.write_text("".join(f"127.0.0.1:{pt}\n" for pt in ports))

    results = [None] * 3
    errors = []

    def worker(i):
        try:
            results[i] = online.run(str(inputs), str(outdir), 3,
                                    party_id=i, addrs=str(addr_file),
                                    zksnark="groth16", seed=0)
        except Exception as e:          # pragma: no cover
            import traceback
            errors.append((i, traceback.format_exc()))
            raise

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=1200)
    assert not errors, errors
    assert all(results), results
