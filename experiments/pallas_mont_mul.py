import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from zkmpc_tpu.ops import limbs as L
from zkmpc_tpu.ops.limbs import FpArray, MASK, W

spec = L.FQ
n = spec.nlimbs

def _placed(B, total, piece, offset):
    parts = []
    if offset > 0:
        parts.append(jnp.zeros((B, offset), jnp.uint32))
    parts.append(piece)
    tail = total - offset - piece.shape[1]
    if tail > 0:
        parts.append(jnp.zeros((B, tail), jnp.uint32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def conv2d(a, b, total):
    """[B,n]x[B,n] -> [B,total] column sums via unrolled shifted adds (2-D only)."""
    B = a.shape[0]
    acc = jnp.zeros((B, total), jnp.uint32)
    for i in range(min(n, total)):
        p = a[:, i:i+1] * b                  # [B, n]
        lo = (p & MASK)[:, :min(n, total - i)]
        acc = acc + _placed(B, total, lo, i)
        hi_w = min(n, total - i - 1)
        if hi_w > 0:
            hi = (p >> W)[:, :hi_w]
            acc = acc + _placed(B, total, hi, i + 1)
    return acc

def resolve2(cols):
    c = cols >> W
    lo = cols & MASK
    y = jnp.concatenate([lo[:, :1], lo[:, 1:] + c[:, :-1], c[:, -1:]], axis=-1)
    c2 = y >> W
    z = y & MASK
    z = jnp.concatenate([z[:, :1], z[:, 1:] + c2[:, :-1]], axis=-1)
    return z

def kernel(a_ref, b_ref, pp_ref, p_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    B = a.shape[0]
    pp = jnp.broadcast_to(pp_ref[:], (B, n))
    pl_ = jnp.broadcast_to(p_ref[:], (B, n))
    t_cols = conv2d(a, b, 2*n)
    t = resolve2(t_cols)
    m = resolve2(conv2d(t[:, :n], pp, n))[:, :n]
    u_cols = conv2d(m, pl_, 2*n) + t_cols
    u = resolve2(u_cols)
    carry = (jnp.max(u[:, :n].astype(jnp.int32), axis=-1) > 0).astype(jnp.uint32)
    res = u[:, n:2*n]
    res = jnp.concatenate([res[:, :1] + carry[:, None], res[:, 1:]], axis=-1)
    o_ref[:] = res

B = 512
f0 = pl.pallas_call(kernel,
    out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*4,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
pp = jnp.asarray(spec.pprime_limbs).reshape(1, n)
pl_l = jnp.asarray(spec.p_limbs).reshape(1, n)
f = lambda x, y: f0(x, y, pp, pl_l)

import random
rng = random.Random(0)
xs = [rng.randrange(spec.p) for _ in range(B)]
ys = [rng.randrange(spec.p) for _ in range(B)]
a = FpArray.from_int(spec, np.asarray(xs, dtype=object))
b = FpArray.from_int(spec, np.asarray(ys, dtype=object))
t0=time.time()
out = jax.jit(f)(jnp.asarray(a.limbs), jnp.asarray(b.limbs))
jax.block_until_ready(out)
print("pallas mont_mul compile+run: %.2fs" % (time.time()-t0))
got = FpArray(np.asarray(jax.device_get(out)), spec, 2).to_ints()
expect = [x*y % spec.p for x, y in zip(xs, ys)]
print("exact:", list(got) == expect)

def chain50(x, y):
    z = x
    for _ in range(50):
        z = f(z, y)
    return z
t0=time.time()
r = jax.jit(chain50)(jnp.asarray(a.limbs), jnp.asarray(b.limbs)); jax.block_until_ready(r)
print("50x pallas muls compile+run: %.2fs" % (time.time()-t0))
t0=time.time()
jax.block_until_ready(jax.jit(chain50)(jnp.asarray(a.limbs), jnp.asarray(b.limbs)))
print("50x pallas runtime: %.3fs" % (time.time()-t0))
# compare runtime vs XLA path
from zkmpc_tpu.ops.limbs import _mont_mul_limbs
def xchain50(x, y):
    z = x
    for _ in range(50):
        z = _mont_mul_limbs(spec, z, y)
    return z
t0=time.time()
r = jax.jit(xchain50)(jnp.asarray(a.limbs), jnp.asarray(b.limbs)); jax.block_until_ready(r)
print("50x XLA muls compile+run: %.2fs" % (time.time()-t0))
t0=time.time()
jax.block_until_ready(jax.jit(xchain50)(jnp.asarray(a.limbs), jnp.asarray(b.limbs)))
print("50x XLA runtime: %.3fs" % (time.time()-t0))
