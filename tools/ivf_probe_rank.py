"""Why do own-choice lists rank 154-400 in the query's probe order?

tools/ivf_diag4m.py attributed the 4M recall loss to probe SELECTION:
every missed true neighbor sits in one of its own top-8 choice lists,
but that list's centroid ranks 154-400 in the query's centroid ordering
(nprobe 128 never reaches it). Two candidate mechanisms:

  (a) blend-centroid misranking -- k-means leaves some lists holding
      rows from several near-orthogonal topics; the normalized mean of
      a k-topic blend has dot ~0.89/sqrt(k) with a query from any of
      its topics, so the list ranks BELOW pure lists of other topics
      even though it holds the neighbor.  Fix: rank lists by list
      CONTENT (max dot over a few representative member rows), not by
      the single centroid.
  (b) genuine centroid crowding -- the query's topic hosts hundreds of
      centroids and intra-topic centroid ranking is noise.  Fix: only
      coarser lists (smaller nlist / bigger cap).

This tool rebuilds the exact bench.py-ivf corpus/index, then measures
WITHOUT any kernel change (recall computed as placement-in-probe-set):

  * topic attribution: how many of the query's top-128 lists belong to
    its topic; the rank + centroid dot of each missed list vs the dot
    at the probe frontier (rank 128);
  * placement-recall curves for centroid ranking vs representative
    ranking (R random member rows per list, score = max rep dot) vs
    the blend max(centroid, reps).

Usage: python tools/ivf_probe_rank.py [n_millions] [nlist] [R]
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
    n_rep = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from fancyrec_tpu.serving.ivf import IVFIndex
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

    # final placement of every post
    pidx = np.asarray(ivf.packed_idx)              # (n_lists, cap)
    cap = pidx.shape[1]
    place = np.empty(n_posts, np.int64)
    valid = pidx >= 0
    rows_of = np.repeat(np.arange(pidx.shape[0]), cap).reshape(pidx.shape)
    place[pidx[valid]] = rows_of[valid]

    # queries + exact ground truth (same keys as bench.py ivf / diag4m)
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
    qtopics = jax.random.randint(k4, (8,), 0, 1024)
    queries = (centers[qtopics]
               + 0.5 * jax.random.normal(k4, (8, dim), jnp.float32))
    exact_fn = jax.jit(lambda q, p, i: retrieval_topk(
        q, p, k, block=4096, posts_inv=i))
    _, e_idx = exact_fn(queries, q8buf, qinv)
    e_idx = np.asarray(e_idx)
    qtopics = np.asarray(qtopics)
    del q8buf, qinv

    # ---- representative member rows per list (int8 direction ~ f32) ----
    t0 = time.time()
    rng = np.random.RandomState(0)
    n_lists = pidx.shape[0]
    rep_slots = np.zeros((n_lists, n_rep), np.int32)
    for li in range(n_lists):
        v = np.nonzero(valid[li])[0]
        if v.size == 0:
            continue
        rep_slots[li] = v[rng.randint(0, v.size, n_rep)]
    flat = (np.arange(n_lists)[:, None] * cap + rep_slots).ravel()
    packed_flat = ivf.packed.reshape(-1, dim)
    reps = np.asarray(packed_flat[jnp.asarray(flat, jnp.int32)]
                      ).astype(np.float32)
    reps /= np.maximum(np.linalg.norm(reps, axis=1, keepdims=True), 1e-12)
    reps = reps.reshape(n_lists, n_rep, dim)
    print("reps gathered %.1fs (R=%d)" % (time.time() - t0, n_rep),
          flush=True)

    cents_np = np.asarray(ivf.centroids)
    qn = np.asarray(queries)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    cscore = qn @ cents_np.T                           # (8, nlist)
    rscore = np.einsum("qd,lrd->qlr", qn, reps).max(-1)  # (8, n_lists)
    rscore_core = rscore[:, :nlist]
    blend = np.maximum(cscore, rscore_core)

    # ---- topic attribution under centroid ranking -----------------------
    centers_n = np.asarray(centers)
    centers_n = centers_n / np.linalg.norm(centers_n, axis=1, keepdims=True)
    list_topic = np.argmax(cents_np @ centers_n.T, axis=1)   # (nlist,)
    order_c = np.argsort(-cscore, axis=1)
    for qi in range(8):
        top128 = order_c[qi, :128]
        own = int((list_topic[top128] == qtopics[qi]).sum())
        n_topic_lists = int((list_topic == qtopics[qi]).sum())
        frontier = cscore[qi, order_c[qi, 127]]
        missed = [int(t) for t in e_idx[qi]
                  if place[int(t)] < nlist
                  and place[int(t)] not in set(top128.tolist())]
        det = ", ".join(
            "L%d(c=%.3f,rep=%.3f,topic%s)"
            % (place[t], cscore[qi, place[t]], rscore_core[qi, place[t]],
               "=q" if list_topic[place[t]] == qtopics[qi] else
               str(list_topic[place[t]]))
            for t in missed[:4])
        print("q%d topic %4d: topic has %3d lists, %3d/128 probed are "
              "own-topic, frontier dot %.3f%s%s"
              % (qi, qtopics[qi], n_topic_lists, own, frontier,
                 "  missed: " if det else "", det), flush=True)

    # ---- placement-recall curves ----------------------------------------
    def placement_recall(score):
        out = []
        for npb in (32, 64, 96, 128, 256, 512):
            hits = 0
            top = np.argsort(-score, axis=1)[:, :npb]
            for qi in range(8):
                probed = set(top[qi].tolist())
                for t in e_idx[qi]:
                    lst = int(place[int(t)])
                    if lst >= nlist or lst in probed:
                        hits += 1
            out.append((npb, hits / (8 * k)))
        return out

    for name, score in (("centroid", cscore), ("rep-max", rscore_core),
                        ("blend", blend)):
        print("placement-recall %-8s  %s"
              % (name, "  ".join("@%d %.4f" % t
                                 for t in placement_recall(score))),
              flush=True)


if __name__ == "__main__":
    main()
