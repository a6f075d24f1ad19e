"""Typed run configuration (`zkmpc_tpu/config.py`): JSON round-trip and
MpcContext construction for both security backends (the reference's
compile-time honest/malicious feature switch, `src/lib.rs:11-23`)."""

import jax
import pytest

from zkmpc_tpu.config import RunConfig, ZkPoPKParams, build_mpc_context
from zkmpc_tpu.parallel.transport import StackedTransport


def test_runconfig_json_roundtrip():
    cfg = RunConfig(n_parties=4, backend="spdz", zksnark="marlin", slots=16,
                    seed=7, srs_size=4096, zkpopk=ZkPoPKParams(sec=16))
    cfg2 = RunConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_runconfig_validation():
    with pytest.raises(AssertionError):
        RunConfig(backend="bogus")
    with pytest.raises(AssertionError):
        RunConfig(zksnark="plonk")


def test_build_context_semi_default():
    c = build_mpc_context(RunConfig(), StackedTransport(3))
    assert c.backend == "semi"
    # dummy source serves correct (insecure) triples by default
    from zkmpc_tpu.mpc.share import DummyTripleSource
    assert isinstance(c.triple_source, DummyTripleSource)


def test_build_context_spdz_needs_dealer():
    with pytest.raises(AssertionError):
        build_mpc_context(RunConfig(backend="spdz"), StackedTransport(3))


def test_build_context_spdz_from_preprocessing():
    from zkmpc_tpu.she import bgv, preprocessing as PP

    params = bgv.SheParams(4)
    dealer = PP.make_dealer(params, 3, jax.random.PRNGKey(0))
    PP.initialize(dealer, jax.random.PRNGKey(1))
    c = build_mpc_context(RunConfig(backend="spdz", n_parties=3),
                          StackedTransport(3), dealer=dealer)
    assert c.backend == "spdz"
    assert c.alpha_share is not None
    from zkmpc_tpu.she.preprocessing import SheTripleSource
    assert isinstance(c.triple_source, SheTripleSource)


def test_check_eq_public_agreement():
    """Cross-party public-value assert (reference `wire/macros.rs:8-33`)."""
    import numpy as np

    from zkmpc_tpu.mpc.share import (MpcContext, MpcFp, check_eq, king_share,
                                     mpc_scope)
    from zkmpc_tpu.ops.limbs import FR, FpArray

    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        x = MpcFp.const(FR, np.asarray([5, 6], dtype=object))
        assert check_eq(x)
        # disagreement must raise
        bad = FpArray(x.value.limbs.at[1, 0, 0].add(1), FR, x.value.bound)
        with pytest.raises(AssertionError):
            check_eq(bad)
        # shared values are rejected
        sh = king_share(FpArray.from_int(FR, np.asarray([3], dtype=object)),
                        jax.random.PRNGKey(0))
        with pytest.raises(AssertionError):
            check_eq(sh)
