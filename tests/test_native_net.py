"""Native C++ transport (native/mpcnet.cpp via ctypes): full-mesh bootstrap,
framed broadcast, leader star patterns, byte accounting, and the share layer
running over real sockets — the reference's `mpc-net` test tier
(`mpc-net/src/multi.rs:675-754`, `LocalTestNet` pattern: real TCP on
localhost inside one process).
"""

import socket
import threading

import numpy as np
import pytest

from zkmpc_tpu.parallel.native_net import NativeMeshNet, SocketTransport, \
    build_native


def free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def run_parties(n, fn):
    """Run fn(party_id, net) in n threads over a localhost mesh."""
    build_native()
    ports = free_ports(n)
    addrs = [f"127.0.0.1:{p}" for p in ports]
    nets = [NativeMeshNet(i, addrs) for i in range(n)]
    results = [None] * n
    errors = []

    def worker(i):
        try:
            nets[i].connect()
            results[i] = fn(i, nets[i])
        except Exception as e:         # pragma: no cover
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for net in nets:
        net.close()
    assert not errors, errors
    return results


def test_broadcast_bytes():
    def fn(i, net):
        out = net.broadcast_bytes(bytes([i]) * 8)
        return out

    res = run_parties(3, fn)
    for i in range(3):
        assert res[i] == [bytes([j]) * 8 for j in range(3)]


def test_send_recv_channels():
    def fn(i, net):
        # ring send on channel 2, plus a channel-1 message in flight to show
        # channels don't head-of-line block each other
        nxt = (i + 1) % 3
        prv = (i - 1) % 3
        net.send_bytes(nxt, b"chan2-%d" % i, chan=2)
        net.send_bytes(nxt, b"chan1-%d" % i, chan=1)
        m2 = net.recv_bytes(prv, chan=2)
        m1 = net.recv_bytes(prv, chan=1)
        return (m1, m2)

    res = run_parties(3, fn)
    for i in range(3):
        prv = (i - 1) % 3
        assert res[i] == (b"chan1-%d" % prv, b"chan2-%d" % prv)


def test_gather_scatter_star():
    def fn(i, net):
        gathered = net.gather_to_leader(bytes([10 + i]) * 4)
        if i == 0:
            assert gathered == [bytes([10 + j]) * 4 for j in range(3)]
            out = net.scatter_from_leader(
                [bytes([20 + j]) * 4 for j in range(3)], 4)
        else:
            out = net.scatter_from_leader(None, 4)
        return out

    res = run_parties(3, fn)
    for i in range(3):
        assert res[i] == bytes([20 + i]) * 4


def test_atomic_broadcast():
    def fn(i, net):
        return net.atomic_broadcast_bytes(bytes([i]) * 6)

    res = run_parties(3, fn)
    for i in range(3):
        assert res[i] == [bytes([j]) * 6 for j in range(3)]


def test_atomic_broadcast_arrays():
    """Array-level commit-then-open on the socket transport; the SPMD
    transports' structural equivalent is `Transport.atomic_broadcast`."""
    def fn(i, net):
        t = SocketTransport(net)
        out = t.atomic_broadcast(np.full((4,), i, dtype=np.uint32))
        return np.asarray(out)

    res = run_parties(3, fn)
    want = np.stack([np.full((4,), j, dtype=np.uint32) for j in range(3)])
    for r in res:
        assert (r == want).all()


def test_stats_counters():
    def fn(i, net):
        net.broadcast_bytes(b"x" * 100)
        return net.stats

    res = run_parties(3, fn)
    for st in res:
        assert st["broadcasts"] == 1
        assert st["bytes_sent"] >= 200       # 2 peers x (100 + frame hdr)


def test_share_layer_over_sockets():
    """reveal + batched Beaver mul with the protocol stack unchanged, each
    party a thread with its own socket transport."""
    import jax
    from zkmpc_tpu.mpc.share import MpcContext, MpcFp, mpc_scope
    from zkmpc_tpu.ops.limbs import FR, FpArray

    p = FR.p
    x_int, y_int = 1234567, 7654321
    # fixed additive decompositions
    xs = [11, 22, (x_int - 33) % p]
    ys = [5, 7, (y_int - 12) % p]

    def fn(i, net):
        t = SocketTransport(net)
        with mpc_scope(MpcContext(t, backend="semi")):
            xv = FpArray.from_int(FR, np.asarray(xs[i], dtype=object))
            yv = FpArray.from_int(FR, np.asarray(ys[i], dtype=object))
            from zkmpc_tpu.mpc.share import SHARED
            x = MpcFp(xv, SHARED)
            y = MpcFp(yv, SHARED)
            prod = x * y
            opened = int(np.asarray(prod.reveal().to_ints()).reshape(-1)[0])
            return opened

    res = run_parties(3, fn)
    assert all(r == x_int * y_int % p for r in res)
