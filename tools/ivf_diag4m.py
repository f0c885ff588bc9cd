"""Diagnose WHERE 4M-scale IVF recall is lost (real TPU).

Rebuilds the exact corpus + index `bench.py ivf 4` uses, then attributes
every missed true neighbor at several nprobe points to its mechanism:

  * own-choice   -- the post sits in one of its top-C centroid choices
                    that simply was not probed (centroid grid too fine /
                    nprobe too small)
  * displaced    -- the post exhausted the probed own choices and was
                    balance-displaced into a later (foreign) choice list
  * overflow     -- the post sits in an always-probed overflow list (a
                    miss here would be a scoring bug, expected 0)

Also prints the first-choice count distribution vs the packed capacity
(the structural overfill pressure) and the per-list final fill.

Usage: python tools/ivf_diag4m.py [n_millions] [nlist]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_posts = n_m * 1_000_000
    dim, k = 1024, 10
    nc = 1024
    per = n_posts // nc
    n_posts = nc * per
    nlist = (int(sys.argv[2]) if len(sys.argv) > 2
             else int(2 * (n_posts ** 0.5) // 64 * 64))

    from fancyrec_tpu.serving.ivf import IVFIndex, _top_choices
    from fancyrec_tpu.ops.similarity import quantize_rows_int8, retrieval_topk

    k1, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 3)
    centers = jax.random.normal(k1, (nc, dim), jnp.float32)
    cpb = 64
    chunk = per * cpb

    def gen(lo, hi):
        c0, c1 = lo // per, -(-hi // per)
        noise = jax.vmap(lambda c: jax.random.normal(
            jax.random.fold_in(k3, c), (per, dim), jnp.float32)
        )(jnp.arange(c0, c1))
        rows = (centers[c0:c1, None, :] + 0.5 * noise).reshape(-1, dim)
        return rows[lo - c0 * per: hi - c0 * per]

    t0 = time.time()
    ivf = IVFIndex.build_chunked(gen, n_posts, dim, nlist=nlist,
                                 iters=10, quantize="int8", chunk=chunk)
    print("build %.1fs nlist=%d cap=%d overflow_lists=%d spill=%.4f"
          % (time.time() - t0, ivf.nlist, ivf.cap, ivf.overflow_lists,
             ivf.spill_frac), flush=True)

    # ---- structural pressure: first-choice counts vs capacity ----------
    choices = np.concatenate([
        np.asarray(_top_choices(
            jnp.asarray(gen(lo, min(lo + chunk, n_posts)), jnp.float32),
            ivf.centroids, 8))
        for lo in range(0, n_posts, chunk)])
    fc = np.bincount(choices[:, 0], minlength=nlist)
    capv = ivf.cap
    print("first-choice counts: mean %.0f p50 %d p90 %d p99 %d max %d  "
          "cap %d  lists>cap %d  mass>cap %d (%.3f%%)"
          % (fc.mean(), *np.percentile(fc, [50, 90, 99]).astype(int),
             fc.max(), capv, (fc > capv).sum(),
             np.maximum(fc - capv, 0).sum(),
             100 * np.maximum(fc - capv, 0).sum() / n_posts), flush=True)

    # final placement of every post: list id from packed_idx
    pidx = np.asarray(ivf.packed_idx)          # (n_lists, cap)
    place = np.empty(n_posts, np.int64)
    valid = pidx >= 0
    rows_of = np.repeat(np.arange(pidx.shape[0]), capv).reshape(pidx.shape)
    place[pidx[valid]] = rows_of[valid]
    in_choice = (place[:, None] == choices).any(axis=1)
    rank_of_choice = np.full(n_posts, -1)
    eq = place[:, None] == choices
    has = eq.any(axis=1)
    rank_of_choice[has] = eq[has].argmax(axis=1)
    n_over = (place >= nlist).sum()
    print("placement: first-choice %.3f%%  choice2-3 %.3f%%  "
          "choice4-8(foreign-risk) %.3f%%  overflow %.3f%%"
          % (100 * (rank_of_choice == 0).mean(),
             100 * ((rank_of_choice >= 1) & (rank_of_choice <= 2)).mean(),
             100 * (rank_of_choice >= 3).mean(),
             100 * n_over / n_posts), flush=True)

    # ---- queries + exact ground truth ----------------------------------
    q8buf = jnp.zeros((n_posts, dim), jnp.int8)
    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def put_chunk(buf, rows, lo):
        q, i = quantize_rows_int8(rows)
        return jax.lax.dynamic_update_slice(buf, q, (lo, 0)), i

    inv_host = np.zeros(n_posts, np.float32)
    for lo in range(0, n_posts, chunk):
        q8buf, i = put_chunk(q8buf, gen(lo, lo + chunk), lo)
        inv_host[lo: lo + chunk] = np.asarray(i)
    qinv = jnp.asarray(inv_host)
    queries = (centers[jax.random.randint(k4, (8,), 0, 1024)]
               + 0.5 * jax.random.normal(k4, (8, dim), jnp.float32))
    exact_fn = jax.jit(lambda q, p, i: retrieval_topk(
        q, p, k, block=4096, posts_inv=i))
    _, e_idx = exact_fn(queries, q8buf, qinv)
    e_idx = np.asarray(e_idx)
    del q8buf, qinv

    # ---- attribute misses at each nprobe --------------------------------
    cents_np = np.asarray(ivf.centroids)
    qn = np.asarray(queries)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    cscore = qn @ cents_np.T                       # (8, nlist)
    probe_rank = np.argsort(np.argsort(-cscore, axis=1), axis=1)

    for npb in (64, 128, 256, 512):
        _, i_idx = ivf.query(np.asarray(queries), k=k, nprobe=npb)
        i_idx = np.asarray(i_idx)
        missed, own, disp, over = 0, 0, 0, 0
        ranks = []
        for qi in range(8):
            got = set(i_idx[qi].tolist())
            for t in e_idx[qi]:
                if int(t) in got:
                    continue
                missed += 1
                lst = place[int(t)]
                if lst >= nlist:
                    over += 1
                    continue
                r = int(probe_rank[qi, lst])
                ranks.append(r)
                if rank_of_choice[int(t)] >= 3:
                    disp += 1
                else:
                    own += 1
        rec = 1 - missed / (8 * k)
        print("nprobe %4d  recall %.4f  missed %2d  "
              "[own-choice %d | displaced %d | overflow %d]  "
              "list-ranks %s"
              % (npb, rec, missed, own, disp, over,
                 sorted(ranks)[:12]), flush=True)


if __name__ == "__main__":
    main()
