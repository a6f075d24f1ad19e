"""Jittable collaborative-prove drivers used by bench.py and __graft_entry__.

Builds a synthetic wide multiplication circuit (n independent a_i*b_i = c_i
gates — the shape of the reference's benchmark circuits' arithmetic load, but
allocated as *vector wires* so all Beaver multiplications batch into one
round), sets it up once on host, and returns a fully jittable prove step
operating on raw share limb tensors.
"""

from __future__ import annotations

import numpy as np

import jax

from ..mpc.share import MpcContext, MpcFp, SHARED, mpc_scope
from ..ops.limbs import FR, FpArray
from ..parallel import transport as T
from ..snark import groth16
from ..snark.r1cs import LC, ConstraintSystem


def build_wide_mul_circuit(cs: ConstraintSystem, a: MpcFp, b: MpcFp):
    """n independent mul gates: a_i * b_i = c_i (c witness), plus one instance
    pinning sum(c) so the proof binds a public output."""
    (n,) = a.shape
    c = a * b                      # ONE batched Beaver round for all n gates
    a_vars = cs.new_witness_vec(a)
    b_vars = cs.new_witness_vec(b)
    c_vars = cs.new_witness_vec(c)
    for i in range(n):
        cs.enforce(LC.of(a_vars[i]), LC.of(b_vars[i]), LC.of(c_vars[i]))
    # bind sum(c) to a public instance: sum_lc * 1 = out
    out = _sum_wire(c)
    out_pub = out.open()
    out_var = cs.new_instance(out_pub)
    sum_lc = LC({v: 1 for v in c_vars})
    cs.enforce(sum_lc, LC.constant(1), LC.of(out_var))
    return out_pub


def _sum_wire(x: MpcFp) -> MpcFp:
    from ..mpc.share import _sum_last_axis
    mac = None if x.mac is None else _sum_last_axis(x.mac)
    return MpcFp(_sum_last_axis(x.value), x.visibility, mac)


def synthesize_cs(n_gates: int, n_parties: int) -> ConstraintSystem:
    """Build the wide-mul circuit structure (dummy public assignment)."""
    t = T.StackedTransport(n_parties)
    with mpc_scope(MpcContext(t, backend="semi")):
        cs = ConstraintSystem(FR)
        vals_a = np.asarray([(i + 2) for i in range(n_gates)], dtype=object)
        vals_b = np.asarray([(i + 5) for i in range(n_gates)], dtype=object)
        from ..mpc.share import _promote_to_shared
        a = _promote_to_shared(MpcFp.from_public(FpArray.from_int(FR, vals_a)))
        b = _promote_to_shared(MpcFp.from_public(FpArray.from_int(FR, vals_b)))
        build_wide_mul_circuit(cs, a, b)
    return cs


def synthesize(n_gates: int, n_parties: int, seed: int = 1):
    """Host-side one-time synthesis + setup.  Returns a self-contained pk."""
    cs = synthesize_cs(n_gates, n_parties)
    return groth16.setup(cs, seed=seed)


def expected_instance(n_gates: int):
    """Host ints: [1, sum_i (i+2)(i+5) mod p] for the wide-mul circuit."""
    s = sum((i + 2) * (i + 5) for i in range(n_gates)) % FR.p
    return [1, s]


def make_core_step_fn(pk: groth16.ProvingKey, n_parties: int):
    """Reduced flagship step for fast compile checks: circuit synthesis (one
    batched Beaver round) -> QAP witness map (NTT + Beaver) -> the h-query
    MSM -> proof-share opening.  This is the Groth16 prover's inner loop
    without the remaining 4 MSMs/ladders (use `make_prove_fn` for those)."""
    from ..mpc.group import mpc_msm
    from ..ops.ntt import Domain
    from ..snark.qap import witness_map

    n_gates = pk.num_witness // 3
    dpk = pk.device()
    mats = groth16.device_matrices_from_pk(pk)
    dom = Domain(FR, pk.domain_n)

    def step(a_limbs, b_limbs, key):
        t = T.StackedTransport(n_parties)
        with mpc_scope(MpcContext(t, backend="semi")):
            cs2 = ConstraintSystem(FR)
            a = MpcFp(FpArray(a_limbs, FR, 2), SHARED)
            b = MpcFp(FpArray(b_limbs, FR, 2), SHARED)
            build_wide_mul_circuit(cs2, a, b)
            z = cs2.full_assignment()
            h = witness_map(FR, mats, z, dom, pk.num_instance,
                            pk.num_constraints)
            h_pt = mpc_msm(dpk.h_query, h)
            opened = h_pt.reveal()
            return (opened.x.limbs, opened.y.limbs, opened.z.limbs, opened.inf)

    def deal(vals):
        arr = np.zeros((n_parties, len(vals)), dtype=object)
        arr[0, :] = vals
        return FpArray.from_int(FR, arr).limbs

    vals_a = [(i + 2) for i in range(n_gates)]
    vals_b = [(i + 5) for i in range(n_gates)]
    return step, (deal(vals_a), deal(vals_b), jax.random.PRNGKey(7))


def make_prove_fn(pk: groth16.ProvingKey, n_parties: int):
    """Returns (fn, example_args): fn(a_limbs, b_limbs, key) -> proof arrays.

    a_limbs/b_limbs: [P, n, nlimbs] additive shares of the gate inputs.
    """
    return make_prove_fn_dpk(pk.device(), n_parties)


def make_prove_fn_dpk(dpk, n_parties: int):
    pk = dpk.pk
    n_gates = pk.num_witness // 3
    mats = groth16.device_matrices_from_pk(pk)

    def step(a_limbs, b_limbs, key):
        t = T.StackedTransport(n_parties)
        with mpc_scope(MpcContext(t, backend="semi")):
            cs2 = ConstraintSystem(FR)
            a = MpcFp(FpArray(a_limbs, FR, 2), SHARED)
            b = MpcFp(FpArray(b_limbs, FR, 2), SHARED)
            build_wide_mul_circuit(cs2, a, b)
            proof = groth16.prove(dpk, cs2, key, matrices=mats)
            a_pt, b_pt, c_pt = proof
            return (a_pt.x.limbs, a_pt.y.limbs, a_pt.z.limbs, a_pt.inf,
                    b_pt.x.c0.limbs, b_pt.x.c1.limbs,
                    b_pt.y.c0.limbs, b_pt.y.c1.limbs,
                    b_pt.z.c0.limbs, b_pt.z.c1.limbs, b_pt.inf,
                    c_pt.x.limbs, c_pt.y.limbs, c_pt.z.limbs, c_pt.inf)

    # deal additive shares on host: party 0 holds the value, rest hold zero
    def deal(vals):
        arr = np.zeros((n_parties, len(vals)), dtype=object)
        arr[0, :] = vals
        return FpArray.from_int(FR, arr).limbs

    vals_a = [(i + 2) for i in range(n_gates)]
    vals_b = [(i + 5) for i in range(n_gates)]
    return step, (deal(vals_a), deal(vals_b), jax.random.PRNGKey(7))


# --- PedersenComCircuit prove driver (the BASELINE.md headline circuit:
# 2,543 constraints, reference MPC proving time 6.572s,
# `docs/benchmark.md:52-58`) ---------------------------------------------

import os as _os

PED_M_INT = 123456789
PED_R_INT = 0x5A5A5A5A5A
#: full-width (253) by default — ZKMPC_PED_BITS shrinks the circuit for
#: CPU smoke runs of bench.py / __graft_entry__ (graph structure identical)
PED_NBITS = int(_os.environ.get("ZKMPC_PED_BITS", 253))
PED_R_BITS = PED_NBITS


def _pedersen_fixture(n_parties):
    from ..crypto import pedersen as PD
    pp = PD.PedersenParams.sample(7)
    com = PD.commit_public_ints(pp, PED_M_INT, PED_R_INT)
    return pp, com


def _build_pedersen_cs(cs, x_wire, r_bits_wire, pp, com, key):
    from ..circuits.pedersen_gadget import pedersen_com_circuit
    from ..snark.gadgets import Boolean, FpVar
    from ..mpc import bits as B
    x = FpVar.new_witness(cs, x_wire)
    r_bools = [Boolean.new_witness(cs, B._index_last(r_bits_wire, i))
               for i in range(PED_R_BITS)]
    pedersen_com_circuit(cs, x, r_bools, com, pp, key, nbits=PED_NBITS)


def synthesize_pedersen_cs(n_parties: int) -> ConstraintSystem:
    """Host-side structural build of the PedersenComCircuit (in-circuit
    commitment, MPC bit-decomposed witness)."""
    t = T.StackedTransport(n_parties)
    pp, com = _pedersen_fixture(n_parties)
    with mpc_scope(MpcContext(t, backend="semi")):
        from ..mpc.share import king_share
        cs = ConstraintSystem(FR)
        x = king_share(FpArray.from_int(FR, np.asarray(PED_M_INT,
                                                       dtype=object)),
                       jax.random.PRNGKey(3))
        rb = king_share(FpArray.from_int(FR, np.asarray(
            [(PED_R_INT >> i) & 1 for i in range(PED_R_BITS)], dtype=object)),
            jax.random.PRNGKey(4))
        _build_pedersen_cs(cs, x, rb, pp, com, jax.random.PRNGKey(5))
    return cs


def make_pedersen_prove_fn_dpk(dpk, n_parties: int):
    """Jittable full prove of the PedersenComCircuit: MPC witness synthesis
    (batched bit-decomposition + log-depth Pedersen point tree) + QAP + the
    5 Groth16 MSMs + proof opening, all in ONE traced step."""
    pk = dpk.pk
    mats = groth16.device_matrices_from_pk(pk)
    pp, com = _pedersen_fixture(n_parties)

    def step(m_limbs, r_limbs, key):
        t = T.StackedTransport(n_parties)
        with mpc_scope(MpcContext(t, backend="semi")):
            cs2 = ConstraintSystem(FR)
            x = MpcFp(FpArray(m_limbs, FR, 2), SHARED)
            rb = MpcFp(FpArray(r_limbs, FR, 2), SHARED)
            k1, k2 = jax.random.split(key)
            _build_pedersen_cs(cs2, x, rb, pp, com, k1)
            proof = groth16.prove(dpk, cs2, k2, matrices=mats)
            a_pt, b_pt, c_pt = proof
            return (a_pt.x.limbs, a_pt.y.limbs, a_pt.z.limbs, a_pt.inf,
                    b_pt.x.c0.limbs, b_pt.x.c1.limbs,
                    b_pt.y.c0.limbs, b_pt.y.c1.limbs,
                    b_pt.z.c0.limbs, b_pt.z.c1.limbs, b_pt.inf,
                    c_pt.x.limbs, c_pt.y.limbs, c_pt.z.limbs, c_pt.inf)

    def deal(vals):
        vals = np.asarray(vals, dtype=object)
        arr = np.zeros((n_parties,) + vals.shape, dtype=object)
        arr[0, ...] = vals
        return FpArray.from_int(FR, arr).limbs

    r_bits = [(PED_R_INT >> i) & 1 for i in range(PED_R_BITS)]
    return step, (deal(PED_M_INT), deal(r_bits), jax.random.PRNGKey(11))


def expected_pedersen_instance(n_parties: int):
    _, com = _pedersen_fixture(n_parties)
    return [1, int(com[0]), int(com[1])]


def dpk_to_host(dpk):
    """Device proving key -> picklable host doc (for the setup cache)."""
    def pt(p):
        from ..ops.fp2 import Fp2Array
        if p is None:
            return None

        def f(c):
            if isinstance(c, Fp2Array):
                return ("fp2", np.asarray(jax.device_get(c.c0.limbs)),
                        np.asarray(jax.device_get(c.c1.limbs)))
            return ("fp", np.asarray(jax.device_get(c.limbs)))
        return (f(p.x), f(p.y), f(p.z), np.asarray(jax.device_get(p.inf)))
    return dict(pk=dpk.pk,
                pts={k: pt(getattr(dpk, k)) for k in
                     ("a_query", "b_g1_query", "b_g2_query", "h_query",
                      "l_query", "alpha_g1", "beta_g1", "beta_g2",
                      "delta_g1", "delta_g2")})


def dpk_from_host(doc):
    from ..ops.curve import SWPoint
    from ..ops.fp2 import Fp2Array
    from ..ops.limbs import FQ
    from .groth16 import DeviceProvingKey

    def coord(c):
        if c[0] == "fp2":
            return Fp2Array(FpArray(c[1], FQ, 2), FpArray(c[2], FQ, 2))
        return FpArray(c[1], FQ, 2)

    def pt(t):
        if t is None:
            return None
        return SWPoint(coord(t[0]), coord(t[1]), coord(t[2]), t[3])
    dpk = DeviceProvingKey.__new__(DeviceProvingKey)
    dpk.pk = doc["pk"]
    for k, v in doc["pts"].items():
        setattr(dpk, k, pt(v))
    return dpk


def cached_pedersen_dpk(n_parties: int, cache_dir: str | None = None):
    """Device setup for the PedersenComCircuit, pickled across runs (shared
    by bench.py and __graft_entry__ so the one-time setup is paid once)."""
    import os
    import pickle
    import sys
    import time

    from . import groth16

    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"dpk_pedersen_{PED_NBITS}b_{n_parties}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return dpk_from_host(pickle.load(f))
    t0 = time.time()
    cs = synthesize_pedersen_cs(n_parties)
    print(f"# pedersen cs: {len(cs.constraints)} constraints",
          file=sys.stderr)
    dpk = groth16.device_setup(cs, seed=1)
    print(f"# setup (device-assisted, one-time): {time.time() - t0:.1f}s",
          file=sys.stderr)
    with open(path, "wb") as f:
        pickle.dump(dpk_to_host(dpk), f)
    return dpk


def proof_arrays_to_ints(outs):
    """Decode step() outputs back into ((ax,ay),(bx,by),(cx,cy)) host ints."""
    from ..ops.curve import SWPoint
    from ..ops.fp2 import Fp2Array
    from ..ops.limbs import FQ
    (ax, ay, az, ainf, bx0, bx1, by0, by1, bz0, bz1, binf,
     cx, cy, cz, cinf) = outs

    def g1(x, y, z, inf):
        return SWPoint(FpArray(np.asarray(x), FQ, 2), FpArray(np.asarray(y), FQ, 2),
                       FpArray(np.asarray(z), FQ, 2), np.asarray(inf))

    def fp2(c0, c1):
        return Fp2Array(FpArray(np.asarray(c0), FQ, 2),
                        FpArray(np.asarray(c1), FQ, 2))
    a = g1(ax, ay, az, ainf)
    b = SWPoint(fp2(bx0, bx1), fp2(by0, by1), fp2(bz0, bz1), binf)
    c = g1(cx, cy, cz, cinf)
    return groth16.proof_to_ints((a, b, c))
