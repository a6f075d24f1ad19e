"""Groth16: trusted setup + collaborative prover + vanilla verifier.

Layout mirrors the reference's split (`src/groth16.rs`):

- `setup` runs locally/host-side over plain ints (the reference likewise does
  a LOCAL `generate_random_parameters` then lifts the key with `from_public`,
  `src/groth16.rs:309-339`).
- `prove` is the TPU hot path and works over MPC wires: QAP witness map (NTT +
  one batched Beaver round, `src/groth16.rs:240-307`), then 4 MSMs over shared
  scalars (`src/groth16.rs:104-182`), group-Beaver products for s*A and r*B1,
  and a final proof reveal (`groth16/src/reveal.rs:7`).
- `verify` is the standard pairing check on the *opened* proof — identical to
  running the vanilla arkworks verifier (`arkworks/groth16/src/verifier.rs`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import params
from ..mpc import share as MS
from ..mpc.group import MpcSWPoint, mpc_msm
from ..mpc.share import MpcFp, PUBLIC, SHARED
from ..ops.curve import SWPoint
from ..ops.limbs import FR, FpArray
from ..ops.ntt import Domain
from ..spec import curves as SC
from ..spec import pairing as SP
from .qap import DeviceMatrix, witness_map
from .r1cs import ConstraintSystem

R = params.FR_MODULUS


@dataclasses.dataclass
class VerifyingKey:
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    ic: list  # [(x, y) or None] per instance variable


@dataclasses.dataclass
class ProvingKey:
    vk: VerifyingKey
    # host-side affine points
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    a_query: list
    b_g1_query: list
    b_g2_query: list
    h_query: list
    l_query: list
    # circuit shape
    num_instance: int
    num_constraints: int
    domain_n: int
    num_witness: int = 0
    # COO matrices (host ints) so a pickled pk is self-contained
    matrices_coo: tuple | None = None

    def device(self) -> "DeviceProvingKey":
        return DeviceProvingKey(self)


class DeviceProvingKey:
    """Proving key with MSM bases resident on device as point batches."""

    def __init__(self, pk: ProvingKey):
        self.pk = pk
        self.a_query = SWPoint.g1_from_affine_ints(pk.a_query)
        self.b_g1_query = SWPoint.g1_from_affine_ints(pk.b_g1_query)
        self.b_g2_query = SWPoint.g2_from_affine_ints(pk.b_g2_query)
        self.h_query = SWPoint.g1_from_affine_ints(pk.h_query)
        self.l_query = SWPoint.g1_from_affine_ints(pk.l_query) \
            if pk.l_query else None
        self.alpha_g1 = SWPoint.g1_from_affine_ints([pk.alpha_g1])[0]
        self.beta_g1 = SWPoint.g1_from_affine_ints([pk.beta_g1])[0]
        self.beta_g2 = SWPoint.g2_from_affine_ints([pk.beta_g2])[0]
        self.delta_g1 = SWPoint.g1_from_affine_ints([pk.delta_g1])[0]
        self.delta_g2 = SWPoint.g2_from_affine_ints([pk.delta_g2])[0]


def _domain_size(cs: ConstraintSystem) -> int:
    need = len(cs.constraints) + cs.num_instance
    n = 1
    while n < need:
        n <<= 1
    return n


def _toxic_waste(seed: int):
    """alpha, beta, gamma, delta, tau via ark `Fp::rand` semantics on a
    ChaCha12 StdRng stream (`compat/ark.py`; `generator.rs:17` draws the
    trapdoor with `E::Fr::rand(rng)` — seed 0 replays `ark_std::test_rng()`
    draws exactly)."""
    from ..compat import ark as A_
    rng = A_.seeded_rng(seed)
    return tuple(A_.fr_rand(rng) for _ in range(5))


def setup(cs: ConstraintSystem, seed: int = 0) -> ProvingKey:
    """Trusted setup over plain ints (host).  Test-grade toxic waste from seed."""
    alpha, beta, gamma, delta, tau = _toxic_waste(seed)
    n = _domain_size(cs)
    m = cs.num_vars
    nc = len(cs.constraints)
    ninst = cs.num_instance

    # Lagrange coefficients L_i(tau) over the size-n radix-2 domain
    from ..spec import field as SF
    omega = SF.root_of_unity(R, FR.generator, FR.two_adicity, n)
    z_tau = (pow(tau, n, R) - 1) % R
    n_inv = pow(n, -1, R)
    lag = []
    w_i = 1
    for i in range(n):
        lag.append(z_tau * w_i % R * pow((tau - w_i) % R, -1, R) % R * n_inv % R)
        w_i = w_i * omega % R
    # u_j(tau), v_j(tau), w_j(tau)
    u = [0] * m
    v = [0] * m
    w = [0] * m
    matA, matB, matC = cs.matrices()
    for (rows, cols, coeffs), dst in ((matA, u), (matB, v), (matC, w)):
        for r_i, c_i, coef in zip(rows, cols, coeffs):
            dst[c_i] = (dst[c_i] + int(coef) * lag[r_i]) % R
    for j in range(ninst):  # input consistency rows (libsnark/ark convention)
        u[j] = (u[j] + lag[nc + j]) % R

    ginv = pow(gamma, -1, R)
    dinv = pow(delta, -1, R)
    g1, g2 = SC.G1_GEN, SC.G2_GEN

    def e1(k):
        return SC.g1_mul(g1, k % R)

    def e2(k):
        return SC.g2_mul(g2, k % R)

    a_query = [e1(u[j]) for j in range(m)]
    b_g1_query = [e1(v[j]) for j in range(m)]
    b_g2_query = [e2(v[j]) for j in range(m)]
    h_query = [e1(pow(tau, i, R) * z_tau % R * dinv % R) for i in range(n - 1)]
    l_query = [e1((beta * u[j] + alpha * v[j] + w[j]) % R * dinv % R)
               for j in range(ninst, m)]
    ic = [e1((beta * u[j] + alpha * v[j] + w[j]) % R * ginv % R)
          for j in range(ninst)]
    vk = VerifyingKey(e1(alpha), e2(beta), e2(gamma), e2(delta), ic)
    return ProvingKey(
        vk=vk, alpha_g1=e1(alpha), beta_g1=e1(beta), beta_g2=e2(beta),
        delta_g1=e1(delta), delta_g2=e2(delta),
        a_query=a_query, b_g1_query=b_g1_query, b_g2_query=b_g2_query,
        h_query=h_query, l_query=l_query,
        num_instance=ninst, num_constraints=nc, domain_n=n,
        num_witness=m - ninst, matrices_coo=(matA, matB, matC))


def setup_params(cs: ConstraintSystem, seed: int = 0):
    """Host part of setup: toxic waste + QAP evaluations u/v/w at tau (ints).

    Kept separate so the expensive fixed-base scalar multiplications can run
    on device (`device_setup`) for large circuits."""
    alpha, beta, gamma, delta, tau = _toxic_waste(seed)
    n = _domain_size(cs)
    m = cs.num_vars
    nc = len(cs.constraints)
    ninst = cs.num_instance
    from ..spec import field as SF
    omega = SF.root_of_unity(R, FR.generator, FR.two_adicity, n)
    z_tau = (pow(tau, n, R) - 1) % R
    n_inv = pow(n, -1, R)
    lag = []
    w_i = 1
    for i in range(n):
        lag.append(z_tau * w_i % R * pow((tau - w_i) % R, -1, R) % R * n_inv % R)
        w_i = w_i * omega % R
    u = [0] * m
    v = [0] * m
    w = [0] * m
    matA, matB, matC = cs.matrices()
    for (rows, cols, coeffs), dst in ((matA, u), (matB, v), (matC, w)):
        for r_i, c_i, coef in zip(rows, cols, coeffs):
            dst[c_i] = (dst[c_i] + int(coef) * lag[r_i]) % R
    for j in range(ninst):
        u[j] = (u[j] + lag[nc + j]) % R
    return dict(alpha=alpha, beta=beta, gamma=gamma, delta=delta, tau=tau,
                u=u, v=v, w=w, z_tau=z_tau, n=n, m=m, nc=nc, ninst=ninst,
                matrices=(matA, matB, matC))


def device_setup(cs: ConstraintSystem, seed: int = 0) -> "DeviceProvingKey":
    """Full setup with the query scalar-muls batched on device (the host spec
    path in `setup` is O(m) Python scalar muls — fine for tests, intractable
    for benchmark-sized circuits)."""
    import jax

    from ..ops import curve as OC
    from ..ops import msm as OM

    sp = setup_params(cs, seed)
    alpha, beta, gamma, delta, tau = (sp[k] for k in
                                      ("alpha", "beta", "gamma", "delta", "tau"))
    u, v, w, z_tau, n, m, ninst = (sp[k] for k in
                                   ("u", "v", "w", "z_tau", "n", "m", "ninst"))
    ginv = pow(gamma, -1, R)
    dinv = pow(delta, -1, R)

    h_scalars = []
    acc = z_tau * dinv % R
    for i in range(n - 1):
        h_scalars.append(acc)
        acc = acc * tau % R
    l_scalars = [(beta * u[j] + alpha * v[j] + w[j]) % R * dinv % R
                 for j in range(ninst, m)]

    def batch_g1(scalars):
        base = OC.SWPoint.g1_from_affine_ints([SC.G1_GEN])
        s = FpArray.from_int(FR, np.asarray(scalars, dtype=object))
        pts = OM._bcast_sw(base[0], s.shape)
        return jax.jit(OC.sw_scalar_mul)(pts, s)

    def batch_g2(scalars):
        base = OC.SWPoint.g2_from_affine_ints([SC.G2_GEN])
        s = FpArray.from_int(FR, np.asarray(scalars, dtype=object))
        pts = OM._bcast_sw(base[0], s.shape)
        return jax.jit(OC.sw_scalar_mul)(pts, s)

    # host: the handful of constant points + vk (instance-count sized)
    def e1(k):
        return SC.g1_mul(SC.G1_GEN, k % R)

    def e2(k):
        return SC.g2_mul(SC.G2_GEN, k % R)
    ic = [e1((beta * u[j] + alpha * v[j] + w[j]) % R * ginv % R)
          for j in range(ninst)]
    vk = VerifyingKey(e1(alpha), e2(beta), e2(gamma), e2(delta), ic)
    pk = ProvingKey(
        vk=vk, alpha_g1=e1(alpha), beta_g1=e1(beta), beta_g2=e2(beta),
        delta_g1=e1(delta), delta_g2=e2(delta),
        a_query=None, b_g1_query=None, b_g2_query=None,
        h_query=None, l_query=None,
        num_instance=ninst, num_constraints=sp["nc"], domain_n=n,
        num_witness=m - ninst, matrices_coo=sp["matrices"])
    dpk = DeviceProvingKey.__new__(DeviceProvingKey)
    dpk.pk = pk
    dpk.a_query = batch_g1(u)
    dpk.b_g1_query = batch_g1(v)
    dpk.b_g2_query = batch_g2(v)
    dpk.h_query = batch_g1(h_scalars)
    dpk.l_query = batch_g1(l_scalars) if l_scalars else None
    dpk.alpha_g1 = OC.SWPoint.g1_from_affine_ints([pk.alpha_g1])[0]
    dpk.beta_g1 = OC.SWPoint.g1_from_affine_ints([pk.beta_g1])[0]
    dpk.beta_g2 = OC.SWPoint.g2_from_affine_ints([pk.beta_g2])[0]
    dpk.delta_g1 = OC.SWPoint.g1_from_affine_ints([pk.delta_g1])[0]
    dpk.delta_g2 = OC.SWPoint.g2_from_affine_ints([pk.delta_g2])[0]
    return dpk


def device_matrices(cs: ConstraintSystem, n: int):
    A, B, C = cs.matrices()
    return (DeviceMatrix.from_coo(FR, A, n), DeviceMatrix.from_coo(FR, B, n),
            DeviceMatrix.from_coo(FR, C, n))


def device_matrices_from_pk(pk: ProvingKey):
    A, B, C = pk.matrices_coo
    n = pk.domain_n
    return (DeviceMatrix.from_coo(FR, A, n), DeviceMatrix.from_coo(FR, B, n),
            DeviceMatrix.from_coo(FR, C, n))


def prove(dpk: DeviceProvingKey, cs: ConstraintSystem, key,
          matrices=None):
    """Collaborative prove under the ambient MPC scope.  Returns the *opened*
    proof as host affine ints (a, b, c)."""
    pk = dpk.pk
    dom = Domain(FR, pk.domain_n)
    mats = matrices if matrices is not None else device_matrices(cs, pk.domain_n)
    z = cs.full_assignment()
    h = witness_map(FR, mats, z, dom, pk.num_instance, pk.num_constraints)

    import jax
    k_r, k_s = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    r = MS.rand_shared(k_r, FR)
    s = MS.rand_shared(k_s, FR)

    alpha = MpcSWPoint.from_public(dpk.alpha_g1)
    beta1 = MpcSWPoint.from_public(dpk.beta_g1)
    beta2 = MpcSWPoint.from_public(dpk.beta_g2)
    delta1 = MpcSWPoint.from_public(dpk.delta_g1)
    delta2 = MpcSWPoint.from_public(dpk.delta_g2)

    # Every delta-multiple ladder folds into the query MSMs as ONE extra
    # (point, scalar) pair — delta1*r rides the a_query MSM, delta1*s the
    # b_g1 MSM, delta2*s the b_g2 MSM, and -delta1*rs the h MSM — and the
    # four G1 MSMs then fuse into ONE bucketed kernel call.  Compile-size:
    # each separate ladder/MSM construct is ~10-57k XLA ops; this assembly
    # has two MSM constructs (G1 fused + G2) instead of nine.
    rs = r * s
    from ..mpc.group import mpc_msm_many

    def ext(base_pts, extra_pt):
        return SWPoint.concat([base_pts, extra_pt.reshape((1,))], axis=0)

    def exts(scal, extra):
        return MpcFp.concat([scal, extra.reshape(1)], axis=0)

    g1_bases = [ext(dpk.a_query, dpk.delta_g1),
                ext(dpk.b_g1_query, dpk.delta_g1),
                ext(dpk.h_query, dpk.delta_g1)]
    g1_scal = [exts(z, r), exts(z, s), exts(h, -rs)]
    if dpk.l_query is not None:
        g1_bases.append(dpk.l_query)
        g1_scal.append(z[pk.num_instance:])
    g1_msms = mpc_msm_many(g1_bases, g1_scal)

    a_pt = alpha + g1_msms[0]
    b1_pt = beta1 + g1_msms[1]
    b2_pt = beta2 + mpc_msm(ext(dpk.b_g2_query, dpk.delta_g2), exts(z, s))

    # a_pt*s and b1_pt*r fuse into one batched group-Beaver scale
    # (-delta1*rs already rode the h MSM above), and C's terms
    # (h-msm, l-msm, s*A, r*B1) fold in ONE masked log fold (scale_sum)
    from ..mpc.group import scale_sum
    extras = [g1_msms[2]]
    if dpk.l_query is not None:
        extras.append(g1_msms[3])
    c_pt = scale_sum([(a_pt, s), (b1_pt, r)], extra_shared=extras)

    a_open = a_pt.reveal()
    b_open = b2_pt.reveal()
    c_open = c_pt.reveal()
    return a_open, b_open, c_open


def proof_to_ints(proof):
    """Device proof points -> host affine ints ((ax,ay),(bx,by),(cx,cy))."""
    a, b, c = proof
    return (a[0:1].to_affine_ints()[0] if a.shape else a.to_affine_ints()[0],
            b[0:1].to_affine_ints()[0] if b.shape else b.to_affine_ints()[0],
            c[0:1].to_affine_ints()[0] if c.shape else c.to_affine_ints()[0])


def verify(vk: VerifyingKey, instance_ints, proof_ints) -> bool:
    """Vanilla Groth16 verification over the opened proof (host, spec pairing).

    e(A, B) == e(alpha, beta) * e(IC(x), gamma) * e(C, delta)
    """
    a, b, c = proof_ints
    if a is None or b is None or c is None:
        return False
    assert len(instance_ints) == len(vk.ic)
    acc = None
    for x_j, ic_j in zip(instance_ints, vk.ic):
        acc = SC.g1_add(acc, SC.g1_mul(ic_j, x_j % R) if ic_j else None)
    return SP.product_pairing_is_one([
        (SC.g1_neg(a), b),
        (vk.alpha_g1, vk.beta_g2),
        (acc, vk.gamma_g2),
        (c, vk.delta_g2),
    ])
