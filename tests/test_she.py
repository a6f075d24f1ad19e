"""SHE (BGV) + SPDZ preprocessing tests, mirroring the reference's unit tier
(`src/she.rs:125-208`, `preprocessing.rs:984-1218`)."""

import jax
import numpy as np
import pytest

from zkmpc_tpu.ops.limbs import FR, MNT4Q, FpArray
from zkmpc_tpu.she import bgv, preprocessing, ring

pytestmark = pytest.mark.slow  # compile-heavy prover tier

P = FR.p
N = 8


def fr(vals):
    return FpArray.from_int(FR, np.asarray(vals, dtype=object))


def test_negacyclic_mul_matches_schoolbook():
    import random
    rng = random.Random(0)
    q = MNT4Q.p
    a = [rng.randrange(q) for _ in range(N)]
    b = [rng.randrange(q) for _ in range(N)]
    fa = FpArray.from_int(MNT4Q, np.asarray(a, dtype=object))
    fb = FpArray.from_int(MNT4Q, np.asarray(b, dtype=object))
    out = jax.jit(ring.negacyclic_mul)(fa, fb).to_ints()
    expect = [0] * N
    for i in range(N):
        for j in range(N):
            k = i + j
            sgn = 1
            if k >= N:
                k -= N
                sgn = -1
            expect[k] = (expect[k] + sgn * a[i] * b[j]) % q
    assert list(out) == expect


def test_encode_decode_roundtrip():
    import random
    rng = random.Random(1)
    slots = fr([rng.randrange(P) for _ in range(N)])
    back = bgv.decode(bgv.encode(slots)).to_ints()
    assert list(back) == list(slots.to_ints())


def test_lift_reduce_roundtrip():
    vals = fr([0, 1, 5, P - 1, P - 7, P // 2, P // 2 + 1, 12345])
    lifted = ring.lift_centered_p_to_q(vals)
    back = ring.reduce_centered_q_to_p(lifted).to_ints()
    assert list(back) == list(vals.to_ints())


def test_enc_dec_roundtrip():
    params = bgv.SheParams(N)
    sk, pk = bgv.keygen(params, jax.random.PRNGKey(0))
    slots = fr(list(range(1, N + 1)))
    r = bgv.sample_enc_randomness(params, jax.random.PRNGKey(1))
    ct = bgv.encrypt_slots(pk, params, slots, r)
    out = bgv.decrypt_slots(sk, ct).to_ints()
    assert list(out) == list(slots.to_ints())


def test_homomorphic_add_mul():
    params = bgv.SheParams(N)
    sk, pk = bgv.keygen(params, jax.random.PRNGKey(0))
    a = fr([3, 1, 4, 1, 5, 9, 2, 6])
    b = fr([2, 7, 1, 8, 2, 8, 1, 8])
    ra = bgv.sample_enc_randomness(params, jax.random.PRNGKey(1))
    rb = bgv.sample_enc_randomness(params, jax.random.PRNGKey(2))
    ca = bgv.encrypt_slots(pk, params, a, ra)
    cb = bgv.encrypt_slots(pk, params, b, rb)
    s = bgv.decrypt_slots(sk, ca + cb).to_ints()
    assert list(s) == [(x + y) % P for x, y in
                       zip(a.to_ints(), b.to_ints())]
    m = bgv.decrypt_slots(sk, ca.mul(cb)).to_ints()
    assert list(m) == [int(x) * int(y) % P for x, y in
                       zip(a.to_ints(), b.to_ints())]


@pytest.fixture(scope="module")
def dealer():
    params = bgv.SheParams(N)
    ctx = preprocessing.make_dealer(params, 3, jax.random.PRNGKey(7))
    preprocessing.initialize(ctx, jax.random.PRNGKey(8))
    return ctx


def test_initialize_and_alpha(dealer):
    assert dealer.alpha_shares is not None
    # Enc(alpha) decrypts to diag(alpha)
    slots = bgv.decrypt_slots(dealer.sk, dealer.e_alpha).to_ints()
    alpha = sum(int(x) for x in dealer.alpha_shares.to_ints()) % P
    assert all(int(s) == alpha for s in slots)


def test_pair(dealer):
    (r, macs), br = preprocessing.pair(dealer, jax.random.PRNGKey(9))
    alpha = sum(int(x) for x in dealer.alpha_shares.to_ints()) % P
    rv = r.to_ints()
    mv = macs.to_ints()
    for j in range(N):
        rj = sum(int(rv[i][j]) for i in range(3)) % P
        mj = sum(int(mv[i][j]) for i in range(3)) % P
        assert mj == alpha * rj % P
    # bracket representation: per-party MAC keys beta_j
    _, bmacs = br
    bm = bmacs.to_ints()
    betas = dealer.beta.to_ints()
    for jkey in range(3):
        for s in range(N):
            rj = sum(int(rv[i][s]) for i in range(3)) % P
            gj = sum(int(bm[jkey][i][s]) for i in range(3)) % P
            assert gj == int(betas[jkey]) * rj % P


def test_initialize_bracket_alpha(dealer):
    """[alpha]: every party's beta_j authenticates alpha."""
    shares, bmacs = dealer.alpha_bracket
    alpha = sum(int(x) for x in dealer.alpha_shares.to_ints()) % P
    betas = dealer.beta.to_ints()
    bm = bmacs.to_ints()
    for jkey in range(3):
        g = sum(int(bm[jkey][i][0]) for i in range(3)) % P
        assert g == int(betas[jkey]) * alpha % P


def test_inv_pair(dealer):
    (r, mr), (rinv, mrinv) = preprocessing.inv_pair(
        dealer, jax.random.PRNGKey(11))
    alpha = sum(int(x) for x in dealer.alpha_shares.to_ints()) % P
    rv, iv = r.to_ints(), rinv.to_ints()
    mrv, miv = mr.to_ints(), mrinv.to_ints()
    for j in range(N):
        rj = sum(int(rv[i][j]) for i in range(3)) % P
        ij = sum(int(iv[i][j]) for i in range(3)) % P
        assert rj * ij % P == 1
        assert sum(int(mrv[i][j]) for i in range(3)) % P == alpha * rj % P
        assert sum(int(miv[i][j]) for i in range(3)) % P == alpha * ij % P


def test_triple(dealer):
    (a, ma), (b, mb), (c, mc) = preprocessing.triple(
        dealer, jax.random.PRNGKey(10))
    alpha = sum(int(x) for x in dealer.alpha_shares.to_ints()) % P
    av, bv, cv = a.to_ints(), b.to_ints(), c.to_ints()
    mav, mcv = ma.to_ints(), mc.to_ints()
    for j in range(N):
        aj = sum(int(av[i][j]) for i in range(3)) % P
        bj = sum(int(bv[i][j]) for i in range(3)) % P
        cj = sum(int(cv[i][j]) for i in range(3)) % P
        assert cj == aj * bj % P, f"triple broken at slot {j}"
        assert sum(int(mav[i][j]) for i in range(3)) % P == alpha * aj % P
        assert sum(int(mcv[i][j]) for i in range(3)) % P == alpha * cj % P


def test_zkpopk_rejects_wrong_ciphertext(dealer):
    params = dealer.params
    slots = fr(list(range(N)))
    r = bgv.sample_enc_randomness(params, jax.random.PRNGKey(11))
    ct = bgv.encrypt_slots(dealer.pk, params, slots, r)
    proof = preprocessing.zkpopk_prove(dealer, slots, r, ct,
                                       jax.random.PRNGKey(12))
    assert preprocessing.zkpopk_verify(dealer, ct, proof)
    # tamper: different ciphertext must fail
    slots2 = fr(list(range(1, N + 1)))
    ct2 = bgv.encrypt_slots(dealer.pk, params, slots2, r)
    assert not preprocessing.zkpopk_verify(dealer, ct2, proof)


def test_she_triple_source_beaver():
    """End-to-end: SHE-generated triples drive an online Beaver multiply."""
    from zkmpc_tpu.mpc.share import (MpcContext, MpcFp, king_share, mpc_scope)
    from zkmpc_tpu.parallel.transport import StackedTransport

    params = bgv.SheParams(N)
    ctx = preprocessing.make_dealer(params, 3, jax.random.PRNGKey(20))
    preprocessing.initialize(ctx, jax.random.PRNGKey(21))
    src = preprocessing.SheTripleSource(ctx, jax.random.PRNGKey(22))
    t = StackedTransport(3)
    with mpc_scope(MpcContext(t, backend="semi", triple_source=src)):
        x = king_share(fr([6, 7]), jax.random.PRNGKey(23))
        y = king_share(fr([8, 9]), jax.random.PRNGKey(24))
        z = (x * y).reveal().to_ints()[0]
        assert list(z) == [48, 63]
