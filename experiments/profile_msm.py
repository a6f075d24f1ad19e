"""Phase-level profile of sw_msm_bucketed on real TPU: digits+sort, bucket
accumulation, merge, suffix walk, horner.  Each phase is jitted separately
with block_until_ready between, so the split is wall-clock accurate.

    PYTHONPATH=.:/root/.axon_site python experiments/profile_msm.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2], out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    from zkmpc_tpu.ops import msm_pippenger as MP
    from zkmpc_tpu.ops.curve import SWPoint, sw_add_complete, sw_double
    from zkmpc_tpu.ops.limbs import FR, FpArray
    from zkmpc_tpu.ops.msm_pippenger import (_digits, _gather, _point_bound2,
                                             _tighten2)
    from zkmpc_tpu.spec import curves as SC

    _tmap = jax.tree_util.tree_map
    print(f"backend: {jax.default_backend()}  n={n}")

    base = SWPoint.g1_from_affine_ints(
        [SC.g1_mul(SC.G1_GEN, k) for k in range(2, 34)])
    points = _tmap(lambda l: jnp.take(l, jnp.arange(n) % 32, 0), base)
    ks = np.asarray([int(x) % FR.p for x in range(2, 2 + n)], dtype=object)
    scalars = FpArray.from_int(FR, ks)

    c = 8
    nbits = FR.p.bit_length()
    nwin = -(-nbits // c)
    Bt = 1
    N = n
    D = 1 << c
    nb_total = Bt * nwin * D
    M = Bt * nwin * N
    L = int(min(16384, max(64, 2 ** int(np.ceil(np.log2(max(M // 64, 1)))))))
    S = -(-M // L)
    print(f"nwin={nwin} M={M} L={L} S={S} nb_total={nb_total}")

    # phase 1: digits + sort
    def phase1(scalars):
        digits = _digits(scalars, c, nwin).reshape((Bt, N, nwin))
        digits = jnp.moveaxis(digits, -1, 1)
        flat_d = digits.reshape((-1,))
        bw = jnp.repeat(jnp.arange(Bt * nwin, dtype=jnp.uint32), N)
        keys = bw * jnp.uint32(D) + flat_d
        perm = jnp.argsort(keys)
        return keys[perm], (perm % N).astype(jnp.int32)

    t1, (skeys, spoint_idx) = timeit(jax.jit(phase1), scalars)

    pad = L * S - M
    SENT = jnp.uint32(0xFFFFFFFF)
    skeys = jnp.concatenate([skeys, jnp.full((pad,), SENT, jnp.uint32)])
    spoint_idx = jnp.concatenate([spoint_idx, jnp.zeros((pad,), jnp.int32)])
    skeys = skeys.reshape(L, S)
    spoint_idx = spoint_idx.reshape(L, S)

    pts = _point_bound2(points.tighten())
    inf_L = _point_bound2(
        SWPoint.infinity_like(_gather(pts, jnp.zeros(L, jnp.int32))))

    # phase 2: bucket accumulation loop
    def phase2(skeys, spoint_idx):
        def mkbuf(leaf):
            return jnp.zeros((L, S) + leaf.shape[1:], leaf.dtype)
        bufs0 = _tmap(mkbuf, inf_L)

        def body(s, carry):
            acc, bufs = carry
            k = jax.lax.dynamic_slice_in_dim(skeys, s, 1, axis=1)[:, 0]
            kprev = jax.lax.dynamic_slice_in_dim(
                skeys, jnp.maximum(s - 1, 0), 1, axis=1)[:, 0]
            idx = jax.lax.dynamic_slice_in_dim(spoint_idx, s, 1, axis=1)[:, 0]
            p = _gather(pts, idx)
            p = SWPoint.select(k == SENT, inf_L, p)
            same = (k == kprev) & (s > 0)
            acc = SWPoint.select(same, sw_add_complete(acc, p), p)
            acc = _tighten2(acc)
            bufs = _tmap(
                lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
                    buf, val[:, None], s, axis=1), bufs, acc)
            return acc, bufs

        _, bufs = jax.lax.fori_loop(0, S, body, (inf_L, bufs0))
        return bufs

    t2, bufs = timeit(jax.jit(phase2), skeys, spoint_idx)

    # phase 3: compaction sort + merge rounds
    K = int(min(nb_total + L, L * S))

    def phase3(skeys, bufs):
        nxt = jnp.concatenate(
            [skeys[:, 1:], jnp.full((L, 1), SENT, jnp.uint32)], axis=1)
        is_end = (skeys != nxt) | (
            jnp.arange(S, dtype=jnp.int32)[None, :] == S - 1)
        ends = (is_end & (skeys != SENT)).reshape(-1)
        cand_keys = jnp.where(ends, skeys.reshape(-1), SENT)
        order = jnp.argsort(cand_keys)[:K]
        ckeys = cand_keys[order]
        parts = _tmap(
            lambda buf: buf.reshape((L * S,) + buf.shape[2:])[order], bufs)
        parts = SWPoint(parts.x, parts.y, parts.z, parts.inf | (ckeys == SENT))
        rounds = int(np.ceil(np.log2(max(L, 2)))) + 1
        iota_k = jnp.arange(K)

        def merge_body(r, pts_):
            d = jnp.left_shift(1, r)
            shifted = _tmap(lambda leaf: jnp.roll(leaf, d, axis=0), pts_)
            keys_sh = jnp.roll(ckeys, d)
            samek = (iota_k >= d) & (ckeys == keys_sh)
            out = SWPoint.select(samek, sw_add_complete(pts_, shifted), pts_)
            return _tighten2(out)

        parts = jax.lax.fori_loop(0, rounds, merge_body, _tighten2(parts))
        last = jnp.concatenate(
            [ckeys[1:] != ckeys[:-1], jnp.ones((1,), bool)])
        final_mask = last & (ckeys != SENT)
        tgt = jnp.where(final_mask, ckeys,
                        jnp.uint32(nb_total)).astype(jnp.int32)
        inf_grid = _point_bound2(SWPoint.infinity_like(
            _gather(pts, jnp.zeros(nb_total, jnp.int32))))
        grid = _tmap(lambda g, src: g.at[tgt].set(src, mode="drop"),
                     inf_grid, parts)
        return _tmap(
            lambda leaf: leaf.reshape((Bt * nwin, D) + leaf.shape[1:]), grid)

    t3, grid = timeit(jax.jit(phase3), skeys, bufs)

    # phase 4: suffix-sum walk
    def col(pt, j):
        return _tmap(lambda leaf: jax.lax.dynamic_index_in_dim(
            leaf, j, axis=1, keepdims=False), pt)

    def phase4(grid):
        zero_bw = _point_bound2(SWPoint.infinity_like(col(grid, 0)))

        def suffix_body(j, carry):
            run, tot = carry
            dd = D - 1 - j
            run = _tighten2(sw_add_complete(run, col(grid, dd)))
            tot = _tighten2(sw_add_complete(tot, run))
            return run, tot

        _, tot = jax.lax.fori_loop(0, D - 1, suffix_body, (zero_bw, zero_bw))
        return tot

    t4, tot = timeit(jax.jit(phase4), grid)

    # phase 5: horner over windows
    def phase5(tot):
        win = _tmap(lambda leaf: leaf.reshape((Bt, nwin) + leaf.shape[1:]),
                    tot)
        res0 = col(win, nwin - 1)

        def horner_body(j, res):
            w = nwin - 2 - j
            res = jax.lax.fori_loop(0, c, lambda i, r: sw_double(r), res)
            return _tighten2(sw_add_complete(res, col(win, w)))

        return jax.lax.fori_loop(0, nwin - 1, horner_body, res0).x.limbs

    t5, _ = timeit(jax.jit(phase5), tot)

    tot_t = t1 + t2 + t3 + t4 + t5
    for name, t in [("digits+sort", t1), ("bucket-accum", t2),
                    ("merge+scatter", t3), ("suffix-walk", t4),
                    ("horner", t5), ("TOTAL", tot_t)]:
        print(f"{name:>14}: {t*1e3:8.2f} ms  ({100*t/tot_t:5.1f}%)")


if __name__ == "__main__":
    main()
