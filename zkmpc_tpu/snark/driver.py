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
