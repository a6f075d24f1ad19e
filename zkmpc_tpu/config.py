"""Typed run configuration.

The reference scatters its knobs across compile-time cargo features
(`honest` vs `malicious`, `Cargo.toml:51-54`, `src/lib.rs:11-23`), structopt
CLIs, per-call hardcoded protocol parameters (zkpopk params `main.rs:99-106`,
SRS sizes `marlin.rs:43` / `bin_werewolf.rs:270,545,430`), and party-address
files.  Here everything is one dataclass, runtime-selectable, and JSON
round-trippable; `build_mpc_context` turns it into an ambient `MpcContext`
(the security model switch the reference bakes in at compile time).
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class ZkPoPKParams:
    """DPSZ Fig.10 knobs (reference `zkpopk::Parameters::new`,
    `main.rs:99-106`)."""
    v: int = 1
    sec: int = 8            # soundness bits per run
    rho: int = 64           # randomness infinity-norm bound


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """End-to-end run parameters for the preprocessing/online binaries."""
    n_parties: int = 3
    backend: str = "semi"            # "semi" (honest) | "spdz" (malicious)
    zksnark: str = "groth16"         # "groth16" | "marlin"
    slots: int = 8                   # SHE SIMD slots per ciphertext batch
    seed: int = 0
    outdir: str = "outputs"
    addrs: str | None = None         # party address file (multi-process)
    srs_size: int | None = None      # override Marlin/KZG SRS degree
    srs_path: str | None = None      # load/save the SRS here if set
    zkpopk: ZkPoPKParams = dataclasses.field(default_factory=ZkPoPKParams)

    def __post_init__(self):
        assert self.backend in ("semi", "spdz"), self.backend
        assert self.zksnark in ("groth16", "marlin"), self.zksnark
        assert self.n_parties >= 2
        assert self.slots >= 1

    # ------------------------------------------------------------- (de)ser

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        doc = json.loads(text)
        zp = doc.pop("zkpopk", None)
        cfg = cls(**doc, **({"zkpopk": ZkPoPKParams(**zp)} if zp else {}))
        return cfg


def build_mpc_context(cfg: RunConfig, transport, dealer=None, key=None):
    """Build the ambient MpcContext for a run.

    semi: dummy triple source unless a dealer pool is given.
    spdz: requires a preprocessed `DealerContext` (alpha MAC-key shares +
    SHE triple pool) — the reference never closes this loop (its online mul
    always uses `DummyFieldTripleSource`, `wire/field.rs:44-63`); here the
    malicious backend runs end-to-end on real preprocessing output.
    """
    import jax

    from .mpc.share import MpcContext

    if key is None:
        key = jax.random.PRNGKey(cfg.seed + 0x517D)
    if cfg.backend == "semi":
        src = None
        if dealer is not None:
            from .she.preprocessing import SheTripleSource
            src = SheTripleSource(dealer, key)
        return MpcContext(transport, backend="semi", triple_source=src)
    assert dealer is not None and dealer.alpha_shares is not None, \
        "spdz backend needs preprocessing (run initialize first)"
    from .she.preprocessing import SheTripleSource
    return MpcContext(transport, backend="spdz",
                      triple_source=SheTripleSource(dealer, key),
                      alpha_share=dealer.alpha_shares,
                      mac_check_key=jax.random.fold_in(key, 1))
