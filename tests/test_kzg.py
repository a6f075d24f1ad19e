"""KZG10 commit/open/verify over shared polynomial coefficients."""

import random

import jax
import numpy as np
import pytest

from zkmpc_tpu.mpc.share import MpcContext, MpcFp, king_share, mpc_scope
from zkmpc_tpu.ops.limbs import FR, FpArray
from zkmpc_tpu.parallel.transport import StackedTransport
from zkmpc_tpu.snark import kzg

pytestmark = pytest.mark.slow  # compile-heavy prover tier

P = FR.p


def test_kzg_commit_open_verify():
    rng = random.Random(4)
    d = 8
    coeffs_int = [rng.randrange(P) for _ in range(d)]
    srs = kzg.setup(d)
    dsrs = srs.device()
    with mpc_scope(MpcContext(StackedTransport(3), backend="semi")):
        coeffs = king_share(
            FpArray.from_int(FR, np.asarray(coeffs_int, dtype=object)),
            jax.random.PRNGKey(0))
        com = kzg.commit(dsrs, coeffs)
        z_int = rng.randrange(P)
        z = FpArray.from_int(FR, np.asarray(z_int, dtype=object))
        w_com, v = kzg.open_at(dsrs, coeffs, z)
        # open everything
        com_pt = com.reveal()[0:1].to_affine_ints()[0]
        w_pt = w_com.reveal()[0:1].to_affine_ints()[0]
        v_int = int(np.asarray(v.reveal().to_ints()).reshape(-1)[0])
    expect_v = sum(c * pow(z_int, i, P) for i, c in enumerate(coeffs_int)) % P
    assert v_int == expect_v
    assert kzg.verify_open(srs, com_pt, z_int, v_int, w_pt)
    # wrong value must fail
    assert not kzg.verify_open(srs, com_pt, z_int, (v_int + 1) % P, w_pt)


def test_srs_save_load_roundtrip(tmp_path):
    """SRS persistence (reference `src/marlin.rs:371-376,456-478`)."""
    from zkmpc_tpu.snark import kzg

    srs = kzg.setup(8, seed=4)
    p = str(tmp_path / "srs.json")
    kzg.save_srs(srs, p)
    s2 = kzg.load_srs(p)
    assert s2.powers == srs.powers
    assert s2.g2 == srs.g2 and s2.beta_g2 == srs.beta_g2
