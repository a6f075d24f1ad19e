"""Party transport: the TPU-native replacement for the reference's mpc-net.

The reference connects N party processes over a TCP full mesh and funnels every
share opening through `broadcast_bytes` (reference `mpc-net/src/multi.rs:469`).
Here a party is a *mesh axis*: share openings become XLA collectives (psum /
all_gather over the "parties" axis) riding ICI/DCN, and the whole protocol is
one SPMD program.

Two interchangeable executions of the same protocol code:

- ``StackedTransport``: all parties live in one device tensor with a leading
  party axis P (the analogue of the reference's in-process `LocalTestNet`,
  `mpc-net/src/multi.rs:357`).  Collectives are axis-0 reductions.  This is
  also how single-host simulation and most tests run.
- ``MeshTransport``: code runs under ``shard_map`` over a
  ``jax.sharding.Mesh`` axis named "parties"; collectives are
  ``jax.lax.psum`` / ``all_gather``.  Each real party owns a mesh slice.

Protocol code fetches the ambient transport from a context variable, mirroring
the reference's task-local ``MpcMultiNet`` singleton (`multi.rs:598-625`).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp


class CommStats:
    """Per-transport collective accounting, the analogue of the reference's
    `Stats`/atomic byte counters (`mpc-net/src/lib.rs:35-42`,
    `multi.rs:527-536`).  Counted at trace time: one entry per collective in
    the compiled program (rounds) plus the payload bytes each moves."""

    def __init__(self):
        self.rounds = 0
        self.bytes_moved = 0

    def record(self, x):
        self.rounds += 1
        import numpy as _np
        self.bytes_moved += int(_np.prod(x.shape, dtype=_np.int64)) * x.dtype.itemsize

    def reset(self):
        self.rounds = 0
        self.bytes_moved = 0

    def __repr__(self):
        return f"CommStats(rounds={self.rounds}, bytes={self.bytes_moved})"


class Transport:
    """Interface for the party-collective layer."""

    n_parties: int

    def __init__(self):
        self.stats = CommStats()

    def psum(self, x):
        """Sum an identically-shaped array over all parties."""
        raise NotImplementedError

    def all_gather(self, x):
        """Gather per-party arrays into a leading party axis [P, ...]."""
        raise NotImplementedError

    def party_index(self, batch_ndim: int):
        """Party id, shaped to broadcast against [*(stacked P), batch...]."""
        raise NotImplementedError

    def party_id_scalar(self):
        """Scalar party id (per-party layouts only; undefined for stacked)."""
        raise NotImplementedError

    def leader_mask(self, batch_ndim: int):
        return self.party_index(batch_ndim) == 0

    def atomic_broadcast(self, x):
        """Equivocation-free broadcast of per-party values (the reference's
        commit-then-open `atomic_broadcast`, `mpc-net/src/multi.rs` /
        `channel.rs:55-84`).

        On the SPMD transports (stacked / mesh) atomicity is STRUCTURAL:
        all_gather is a single deterministic collective, so every party
        receives the identical gathered tensor by construction — a party
        cannot send different values to different peers, which is exactly
        the property the commit-then-open round buys on a real network.
        The socket transport implements the real two-round protocol
        (`native_net.py:atomic_broadcast_bytes`: blake2b commitments, then
        openings checked against them)."""
        return self.all_gather(x)


class StackedTransport(Transport):
    """All parties stacked on a leading axis of every tensor (single device)."""

    kind = "stacked"

    def __init__(self, n_parties: int):
        super().__init__()
        self.n_parties = n_parties

    def psum(self, x):
        self.stats.record(x)
        s = jnp.sum(x, axis=0, keepdims=True)
        return jnp.broadcast_to(s, x.shape)

    def all_gather(self, x):
        # x: [P, batch...] -> [P, P, batch...] (every party sees all shares)
        self.stats.record(x)
        return jnp.broadcast_to(x[None], (self.n_parties,) + x.shape)

    def party_index(self, batch_ndim: int):
        idx = jnp.arange(self.n_parties, dtype=jnp.int32)
        return idx.reshape((self.n_parties,) + (1,) * batch_ndim)


class MeshTransport(Transport):
    """Inside shard_map over a mesh axis; each program instance is one party."""

    kind = "mesh"

    def __init__(self, n_parties: int, axis_name: str = "parties"):
        super().__init__()
        self.n_parties = n_parties
        self.axis_name = axis_name

    def psum(self, x):
        self.stats.record(x)
        return jax.lax.psum(x, self.axis_name)

    def all_gather(self, x):
        self.stats.record(x)
        return jax.lax.all_gather(x, self.axis_name, axis=0)

    def party_index(self, batch_ndim: int):
        return jax.lax.axis_index(self.axis_name).reshape((1,) * batch_ndim)

    def party_id_scalar(self):
        return jax.lax.axis_index(self.axis_name)


_CURRENT: contextvars.ContextVar = contextvars.ContextVar(
    "zkmpc_transport", default=None)


def current() -> Transport:
    t = _CURRENT.get()
    if t is None:
        raise RuntimeError(
            "no MPC transport in scope; wrap the protocol in "
            "`with transport.scope(...):`")
    return t


@contextlib.contextmanager
def scope(t: Transport):
    token = _CURRENT.set(t)
    try:
        yield t
    finally:
        _CURRENT.reset(token)
