"""Where does the prove graph's compile mass live?  Counts jaxpr equations
(a good proxy for XLA instruction count / compile time) for the full
PedersenComCircuit prove step and for its sub-components in isolation.

Run on CPU — tracing only, no compile:
    JAX_PLATFORMS=cpu python experiments/profile_graph.py [--bits N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--bits", type=int, default=253)
parser.add_argument("--full", action="store_true",
                    help="also trace the full prove step (slow)")
args = parser.parse_args()
os.environ["ZKMPC_PED_BITS"] = str(args.bits)

import jax
import jax.numpy as jnp
import numpy as np


def count_eqns(jaxpr, seen=None):
    """Total equations including sub-jaxprs (scan/cond bodies count once)."""
    if seen is None:
        seen = set()
    n = 0
    for eqn in jaxpr.eqns:
        n += 1
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                if id(sub) not in seen:
                    seen.add(id(sub))
                    n += count_eqns(sub, seen)
    return n


def _subjaxprs(v):
    from jax._src.core import ClosedJaxpr, Jaxpr
    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _subjaxprs(x)


def trace(name, fn, *a, **kw):
    t0 = time.time()
    jpr = jax.make_jaxpr(fn)(*a, **kw)
    n = count_eqns(jpr.jaxpr)
    print(f"{name:45s} {n:9,d} eqns   (traced in {time.time()-t0:.1f}s)")
    return n


def main():
    from zkmpc_tpu.mpc.share import MpcContext, MpcFp, SHARED, mpc_scope
    from zkmpc_tpu.ops.limbs import FR, FpArray
    from zkmpc_tpu.parallel.transport import StackedTransport
    from zkmpc_tpu.snark import driver, groth16

    N_PARTIES = 3
    print(f"# PED_BITS={args.bits}")

    pk = None
    dpk = driver.cached_pedersen_dpk(N_PARTIES)
    pk = dpk.pk
    mats = groth16.device_matrices_from_pk(pk)
    print(f"# constraints={pk.num_constraints} domain_n={pk.domain_n} "
          f"witness={pk.num_witness}")

    # --- components ---------------------------------------------------
    from zkmpc_tpu.mpc.group import MpcSWPoint, mpc_msm_many, scale_many
    from zkmpc_tpu.ops.ntt import Domain
    from zkmpc_tpu.snark.qap import witness_map
    from zkmpc_tpu.snark.r1cs import ConstraintSystem

    dom = Domain(FR, pk.domain_n)
    m = pk.num_witness + pk.num_instance

    def deal(shape):
        arr = np.zeros((N_PARTIES,) + shape, dtype=object)
        return FpArray.from_int(FR, arr).limbs

    z_limbs = deal((m,))
    h_limbs = deal((pk.domain_n,))

    def in_scope(f):
        def g(*a):
            with mpc_scope(MpcContext(StackedTransport(N_PARTIES),
                                      backend="semi")):
                return f(*a)
        return g

    @in_scope
    def wmap(z_l):
        z = MpcFp(FpArray(z_l, FR, 2), SHARED)
        return witness_map(FR, mats, z, dom, pk.num_instance,
                           pk.num_constraints).value.limbs

    trace("witness_map (NTTs + beaver)", wmap, z_limbs)

    @in_scope
    def g1_fused(z_l, h_l):
        z = MpcFp(FpArray(z_l, FR, 2), SHARED)
        h = MpcFp(FpArray(h_l, FR, 2), SHARED)
        def fit(s_, base):
            n = base.shape[0]
            return s_[:n] if s_.shape[-1] >= n else s_
        bases = [dpk.a_query, dpk.b_g1_query, dpk.h_query, dpk.l_query]
        scal = [fit(z, bases[0]), fit(z, bases[1]), fit(h, bases[2]),
                fit(z[pk.num_instance:], bases[3])]
        outs = mpc_msm_many(bases, scal)
        return [o.point.x.limbs for o in outs]

    trace("G1 fused MSM (4-in-1)", g1_fused, z_limbs, h_limbs)

    @in_scope
    def g2_msm(z_l):
        from zkmpc_tpu.mpc.group import mpc_msm
        z = MpcFp(FpArray(z_l, FR, 2), SHARED)
        return mpc_msm(dpk.b_g2_query, z).point.x.c0.limbs

    trace("G2 MSM", g2_msm, z_limbs)

    @in_scope
    def scale2(z_l, key):
        s = MpcFp(FpArray(z_l[..., 0, :], FR, 2), SHARED)
        a = MpcSWPoint.from_public(dpk.alpha_g1)
        b = MpcSWPoint.from_public(dpk.beta_g1)
        o1, o2 = scale_many([(a, s), (b, s)])
        return o1.point.x.limbs, o2.point.x.limbs

    trace("scale_many (2 group-Beaver scales)", scale2, z_limbs,
          jax.random.PRNGKey(0))

    @in_scope
    def reveal3(z_l):
        z = MpcFp(FpArray(z_l, FR, 2), SHARED)
        from zkmpc_tpu.mpc.group import mpc_msm
        p = mpc_msm(dpk.a_query, z)
        op = p.reveal()
        return op.x.limbs

    trace("G1 MSM + reveal (delta vs plain MSM)", reveal3, z_limbs)

    # --- gadget synthesis (witness generation) ------------------------
    pp, com = driver._pedersen_fixture(N_PARTIES)

    @in_scope
    def synth(m_l, r_l, key):
        cs2 = ConstraintSystem(FR)
        x = MpcFp(FpArray(m_l, FR, 2), SHARED)
        rb = MpcFp(FpArray(r_l, FR, 2), SHARED)
        driver._build_pedersen_cs(cs2, x, rb, pp, com, key)
        return cs2.full_assignment().value.limbs

    m_limbs = deal(())
    r_limbs = deal((driver.PED_R_BITS,))
    trace("pedersen gadget synthesis", synth, m_limbs, r_limbs,
          jax.random.PRNGKey(1))

    if args.full:
        fn, fargs = driver.make_pedersen_prove_fn_dpk(dpk, N_PARTIES)
        trace("FULL prove step", fn, *fargs)


if __name__ == "__main__":
    main()
