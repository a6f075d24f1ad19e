"""VERDICT r4 #7: the flagship collaborative Groth16 prove with DEVICE
(TPU) tensors over the REAL socket transport.

Three parties run as threads on the TPU host (a single TPU chip is
process-exclusive, so the reference's 3-process `run_online.zsh` topology
maps to 3 party threads sharing the chip — each with its OWN
`NativeMeshNet` TCP mesh endpoint and its own MPC context; the sockets are
real 127.0.0.1 TCP, the tensors are real device arrays fetched at
openings, exactly the per-party deployment dataflow: device compute ->
host fetch -> TCP broadcast -> device re-sum).

Usage:  python experiments/socket_tpu_prove.py
Writes a timing + byte-counter report to stdout; the committed artifact
lives at experiments/artifacts/socket_tpu_prove.log.
"""

import json
import os
import socket
import sys
import tempfile
import threading
import time


def free_ports(n):
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def main():
    import jax
    from zkmpc_tpu.utils import cachedir
    cachedir.configure(jax)
    from zkmpc_tpu.cli import online
    from zkmpc_tpu.parallel.native_net import build_native
    from zkmpc_tpu.ops.limbs import FR
    from zkmpc_tpu.utils import serialize as SER
    import random

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({jax.devices()})")
    p = FR.p
    rng = random.Random(77)
    tmp = tempfile.mkdtemp(prefix="socket_tpu_")
    outdir = os.path.join(tmp, "outputs")
    n_p, n_slots = 3, 2
    r_sh = [[rng.randrange(p) for _ in range(n_slots)] for _ in range(n_p)]
    r_open = [sum(r_sh[i][s] for i in range(n_p)) % p
              for s in range(n_slots)]
    betas = [rng.randrange(p) for _ in range(n_p)]
    macs = [[[rng.randrange(p) for _ in range(n_slots)]
             for _ in range(n_p - 1)] for _ in range(n_p)]
    for j in range(n_p):
        macs[j].append([(betas[j] * r_open[s]
                         - sum(macs[j][i][s] for i in range(n_p - 1))) % p
                        for s in range(n_slots)])
    for i in range(n_p):
        SER.write_online_setup(
            os.path.join(outdir, str(i), "online_setup.json"), i,
            [SER.field_to_hex(v, FR) for v in r_sh[i]],
            r_bracket_hex=[[SER.field_to_hex(macs[j][i][s], FR)
                            for s in range(n_slots)] for j in range(n_p)],
            beta_hex=SER.field_to_hex(betas[i], FR))
    inputs = os.path.join(tmp, "inputs.json")
    with open(inputs, "w") as f:
        json.dump({"x": 3, "y": 5}, f)
    build_native()
    ports = free_ports(3)
    addr_file = os.path.join(tmp, "addrs.txt")
    with open(addr_file, "w") as f:
        f.write("".join(f"127.0.0.1:{pt}\n" for pt in ports))

    results = [None] * 3
    errors = []

    def worker(i):
        try:
            results[i] = online.run(inputs, outdir, 3, party_id=i,
                                    addrs=addr_file, zksnark="groth16",
                                    seed=0)
        except Exception:
            import traceback
            errors.append((i, traceback.format_exc()))

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    for i, tb in errors:
        print(f"party {i} FAILED:\n{tb}")
    ok = all(results) and not errors
    print(f"socket-mode collaborative Groth16 prove on {platform}: "
          f"ok={ok} wall={dt:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
