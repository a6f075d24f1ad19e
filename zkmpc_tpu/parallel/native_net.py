"""ctypes bindings for the native full-mesh party transport
(`native/mpcnet.cpp`) + a Transport backend that runs the share protocols
over real sockets.

This is the TPU-build's mpc-net (`mpc-net/src/multi.rs`): one OS process per
party, TCP full mesh with framed channels, leader star patterns, byte
accounting.  `SocketTransport` plugs into the same `Transport` interface the
in-process `StackedTransport` / SPMD `MeshTransport` implement
(`parallel/transport.py`), so the whole protocol stack (reveal, Beaver,
bit protocols, provers) runs unchanged across real multi-host parties —
tensors are fetched to host, broadcast as raw little-endian uint32 limb
buffers, and re-summed on device.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from . import transport as T

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cands = [os.path.join(here, "native", "libmpcnet.so"),
             os.environ.get("ZKMPC_NATIVE_LIB", "")]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def build_native(force: bool = False) -> str:
    """Compile native/mpcnet.cpp if the .so is missing (g++ is baked in)."""
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(here, "native", "mpcnet.cpp")
    out = os.path.join(here, "native", "libmpcnet.so")
    if force or not os.path.exists(out) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-pthread",
                        "-std=c++17", "-o", out, src], check=True)
    return out


def lib():
    global _LIB
    if _LIB is None:
        path = _find_lib() or build_native()
        L = ctypes.CDLL(path)
        L.mpcnet_create.restype = ctypes.c_void_p
        L.mpcnet_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.POINTER(ctypes.c_int)]
        L.mpcnet_connect.argtypes = [ctypes.c_void_p]
        L.mpcnet_send.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_char_p, ctypes.c_uint32]
        L.mpcnet_recv.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_uint32)]
        L.mpcnet_broadcast.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_char_p, ctypes.c_uint32,
                                       ctypes.c_char_p]
        L.mpcnet_gather_to_leader.argtypes = L.mpcnet_broadcast.argtypes
        L.mpcnet_scatter_from_leader.argtypes = L.mpcnet_broadcast.argtypes
        for f in ("mpcnet_bytes_sent", "mpcnet_bytes_recv",
                  "mpcnet_num_broadcasts"):
            getattr(L, f).restype = ctypes.c_uint64
            getattr(L, f).argtypes = [ctypes.c_void_p]
        L.mpcnet_destroy.argtypes = [ctypes.c_void_p]
        _LIB = L
    return _LIB


class NativeMeshNet:
    """One party's handle on the TCP full mesh (reference
    `MPCNetConnection`, `multi.rs:112-354`)."""

    def __init__(self, party_id: int, addrs):
        """addrs: list of "host:port" strings, one per party, ordered by id
        (the reference's address-file format, `multi.rs:155-184`)."""
        self.party_id = party_id
        self.n_parties = len(addrs)
        hosts = []
        ports = []
        for a in addrs:
            h, p = a.rsplit(":", 1)
            hosts.append(h.encode())
            ports.append(int(p))
        L = lib()
        arr_h = (ctypes.c_char_p * len(hosts))(*hosts)
        arr_p = (ctypes.c_int * len(ports))(*ports)
        self._h = L.mpcnet_create(party_id, self.n_parties, arr_h, arr_p)
        self._L = L

    @classmethod
    def from_file(cls, party_id: int, path: str):
        with open(path) as f:
            addrs = [ln.strip() for ln in f if ln.strip()]
        return cls(party_id, addrs)

    def connect(self):
        rc = self._L.mpcnet_connect(self._h)
        if rc != 0:
            raise ConnectionError(f"party {self.party_id}: mesh bootstrap failed")

    def send_bytes(self, to: int, data: bytes, chan: int = 0):
        rc = self._L.mpcnet_send(self._h, to, chan, data, len(data))
        if rc != 0:
            raise ConnectionError("send failed")

    def recv_bytes(self, frm: int, max_len: int = 1 << 26,
                   chan: int = 0) -> bytes:
        buf = ctypes.create_string_buffer(max_len)
        ln = ctypes.c_uint32(max_len)
        rc = self._L.mpcnet_recv(self._h, frm, chan, buf, ctypes.byref(ln))
        if rc != 0:
            raise ConnectionError(f"recv failed ({rc})")
        return buf.raw[:ln.value]

    def broadcast_bytes(self, mine: bytes, chan: int = 0) -> list:
        n = self.n_parties
        out = ctypes.create_string_buffer(len(mine) * n)
        rc = self._L.mpcnet_broadcast(self._h, chan, mine, len(mine), out)
        if rc != 0:
            raise ConnectionError("broadcast failed")
        raw = out.raw
        return [raw[i * len(mine):(i + 1) * len(mine)] for i in range(n)]

    def atomic_broadcast_bytes(self, mine: bytes, chan: int = 0) -> list:
        """Commit-then-open broadcast: round 1 exchanges blake2b(salt||msg)
        commitments, round 2 opens salt||msg, and every opening is checked
        against its commitment.  This implements the malicious-security
        semantics the reference stubs out (`channel.rs:55-84` falls back to
        plain broadcast with the commitment code commented)."""
        import hashlib
        import os as _os
        salt = _os.urandom(16)
        com = hashlib.blake2b(salt + mine, digest_size=32).digest()
        coms = self.broadcast_bytes(com, chan=chan)
        opens = self.broadcast_bytes(salt + mine, chan=chan)
        out = []
        for i, (c, o) in enumerate(zip(coms, opens)):
            if hashlib.blake2b(o, digest_size=32).digest() != c:
                raise AssertionError(
                    f"atomic broadcast: party {i} equivocated")
            out.append(o[16:])
        return out

    def gather_to_leader(self, mine: bytes, chan: int = 0):
        """Returns list of all parties' buffers on party 0, None elsewhere
        (`worker_send_or_leader_receive`, `lib.rs:80-124`)."""
        if self.party_id == 0:
            out = ctypes.create_string_buffer(len(mine) * self.n_parties)
            rc = self._L.mpcnet_gather_to_leader(self._h, chan, mine,
                                                 len(mine), out)
            if rc != 0:
                raise ConnectionError("gather failed")
            raw = out.raw
            return [raw[i * len(mine):(i + 1) * len(mine)]
                    for i in range(self.n_parties)]
        rc = self._L.mpcnet_gather_to_leader(self._h, chan, mine, len(mine),
                                             None)
        if rc != 0:
            raise ConnectionError("gather failed")
        return None

    def scatter_from_leader(self, slices, item_len: int, chan: int = 0
                            ) -> bytes:
        """Leader passes list of per-party buffers; others pass None
        (`worker_receive_or_leader_send`, `lib.rs:181`)."""
        if self.party_id == 0:
            flat = b"".join(slices)
            mine = ctypes.create_string_buffer(item_len)
            rc = self._L.mpcnet_scatter_from_leader(self._h, chan, flat,
                                                    item_len, mine)
            if rc != 0:
                raise ConnectionError("scatter failed")
            return mine.raw
        mine = ctypes.create_string_buffer(item_len)
        rc = self._L.mpcnet_scatter_from_leader(self._h, chan, None, item_len,
                                                mine)
        if rc != 0:
            raise ConnectionError("scatter failed")
        return mine.raw

    @property
    def stats(self):
        return dict(bytes_sent=self._L.mpcnet_bytes_sent(self._h),
                    bytes_recv=self._L.mpcnet_bytes_recv(self._h),
                    broadcasts=self._L.mpcnet_num_broadcasts(self._h))

    def close(self):
        if self._h:
            self._L.mpcnet_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class SocketTransport(T.Transport):
    """Transport over the native mesh: each party is its own process, shares
    live un-stacked (no leading party axis), collectives move uint32 limb
    buffers through TCP.  `kind = "socket"` behaves like the mesh layout
    (per-party tensors) for the share layer."""

    kind = "socket"

    def __init__(self, net: NativeMeshNet):
        super().__init__()
        self.net = net
        self.n_parties = net.n_parties
        self.party_id = net.party_id

    def psum(self, x):
        import jax.numpy as jnp
        arr = np.asarray(x)
        parts = self.net.broadcast_bytes(arr.tobytes())
        self.stats.record(arr)
        # limb columns are tightened (< 2^16) before any open, so a sum over
        # parties stays far below 2^32 — same contract as the on-device psum
        acc = np.zeros(arr.shape, dtype=arr.dtype)
        for b in parts:
            acc = acc + np.frombuffer(b, dtype=arr.dtype).reshape(arr.shape)
        return jnp.asarray(acc)     # caller resolves carries / reduces mod p

    def all_gather(self, x):
        import jax.numpy as jnp
        arr = np.asarray(x)
        parts = self.net.broadcast_bytes(arr.tobytes())
        self.stats.record(arr)
        return jnp.stack([jnp.asarray(
            np.frombuffer(b, dtype=arr.dtype).reshape(arr.shape))
            for b in parts])

    def party_index(self, batch_ndim: int):
        import jax.numpy as jnp
        return jnp.asarray(self.party_id, dtype=jnp.int32)

    def party_id_scalar(self):
        import jax.numpy as jnp
        return jnp.asarray(self.party_id, dtype=jnp.int32)

    def leader_mask(self, batch_ndim: int):
        import jax.numpy as jnp
        return jnp.asarray(self.party_id == 0)

    def atomic_broadcast(self, x):
        """Array-level commit-then-open broadcast: the real two-round
        protocol over TCP (blake2b commitments, openings checked) — the
        malicious-security semantics the reference stubs out
        (`channel.rs:55-84`).  Returns [P, ...] like all_gather."""
        import jax.numpy as jnp
        arr = np.asarray(x)
        parts = self.net.atomic_broadcast_bytes(arr.tobytes())
        self.stats.record(arr)
        return jnp.stack([jnp.asarray(
            np.frombuffer(b, dtype=arr.dtype).reshape(arr.shape))
            for b in parts])
