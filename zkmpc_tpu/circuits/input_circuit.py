"""MySecretInputCircuit: range-checked committed secret input.

Mirrors the reference's flagship circuit (`src/circuits/input_circuit.rs:10-82`,
driven by `src/main.rs`): prove knowledge of a secret x such that
lower <= x < upper (interval check via enforce_cmp) and a public Pedersen
commitment opens to x.  Works identically over local (public) or shared
wires — the dual instantiation pattern of the reference's
`ConstraintSynthesizer<Fr>` / `<MFr>` impls.
"""

from __future__ import annotations

import numpy as np

from ..crypto import pedersen
from ..mpc.share import MpcFp
from ..snark.gadgets import Boolean, FpVar
from ..snark.r1cs import ConstraintSystem
from ..ops.limbs import FR


def build(cs: ConstraintSystem, x_wire: MpcFp, r_bits_wire: MpcFp,
          commitment_xy, pp: pedersen.PedersenParams, lower: int, upper: int,
          key, n_r_bits: int = 16):
    """Synthesize the circuit.

    - x_wire: shared scalar (the secret input)
    - r_bits_wire: shared randomness bits [n_r_bits]
    - commitment_xy: public affine TE point (the commitment), instance input
    """
    import jax
    from .pedersen_gadget import TEAffineVar, pedersen_commit_gadget

    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = FpVar.new_witness(cs, x_wire)

    # range check: lower <= x < upper
    lo = FpVar.constant(cs, lower)
    hi = FpVar.constant(cs, upper)
    lo.enforce_cmp(x, k1, allow_equal=True)
    x.enforce_cmp(hi, k2, allow_equal=False)

    # commitment: bits of x and r folded against the Pedersen bases
    m_bits = x.to_bits(k3)
    r_bools = []
    for i in range(n_r_bits):
        from ..mpc import bits as B
        r_bools.append(Boolean.new_witness(cs, B._index_last(r_bits_wire, i)))
    com = pedersen_commit_gadget(cs, m_bits, r_bools, pp)

    cx = FpVar.new_input(cs, MpcFp.const(FR, int(commitment_xy[0])))
    cy = FpVar.new_input(cs, MpcFp.const(FR, int(commitment_xy[1])))
    com.x.enforce_equal(cx)
    com.y.enforce_equal(cy)
    return cs
