"""A/B the radius-bound probe ranking at 4M scale (real TPU).

Same corpus + build as tools/ivf_diag4m.py (1024 Gaussian topics,
noise 0.5, int8 chunked build). One build, then recall@10 and
single-query latency for probe="cosine" (legacy centroid ranking) vs
probe="bound" (reachability ranking) at several
nprobe points. The diag run attributed every nprobe-128 miss to true
neighbors in lists the query ranked 154-400 by cosine; the bound
promotes wide lists, which is exactly those.

Usage: python tools/ivf_bound4m.py [n_millions] [nlist]
"""
import sys
import time
from functools import partial

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
    rad = np.asarray(ivf.radii)
    print("build %.1fs nlist=%d cap=%d overflow=%d spill=%.4f  "
          "radii deg: p10 %.1f p50 %.1f p90 %.1f max %.1f"
          % (time.time() - t0, ivf.nlist, ivf.cap, ivf.overflow_lists,
             ivf.spill_frac, *np.degrees(
                 np.percentile(rad, [10, 50, 90, 100]))), flush=True)

    # ---- exact ground truth over the same int8 contract ----------------
    q8buf = jnp.zeros((n_posts, dim), jnp.int8)

    @partial(jax.jit, donate_argnums=0)
    def put_chunk(buf, rows, lo):
        q, i = quantize_rows_int8(rows)
        return jax.lax.dynamic_update_slice(buf, q, (lo, 0)), i

    inv_host = np.zeros(n_posts, np.float32)
    for lo in range(0, n_posts, chunk):
        q8buf, i = put_chunk(q8buf, gen(lo, lo + chunk), lo)
        inv_host[lo: lo + chunk] = np.asarray(i)
    qinv = jnp.asarray(inv_host)
    k4a, k4b = jax.random.split(k4)   # distinct keys: center pick vs noise
    queries = (centers[jax.random.randint(k4a, (32,), 0, nc)]
               + 0.5 * jax.random.normal(k4b, (32, dim), jnp.float32))
    exact_fn = jax.jit(lambda q, p, i: retrieval_topk(
        q, p, k, block=4096, posts_inv=i))
    _, e_idx = exact_fn(queries, q8buf, qinv)
    e_idx = np.asarray(e_idx)
    del q8buf, qinv

    q_np = np.asarray(queries)
    q1 = jnp.asarray(q_np[:1])

    def recall(mode, npb):
        _, i_idx = ivf.query(q_np, k=k, nprobe=npb, probe=mode)
        return np.mean([len(set(e_idx[i]) & set(np.asarray(i_idx)[i])) / k
                        for i in range(len(e_idx))])

    def latency(mode, npb, iters=100):
        fn = ivf._jitted_query(1, k, npb, mode)
        args = (q1, ivf.packed, ivf.packed_idx, ivf.centroids,
                ivf.inv_norms, ivf.radii if mode == "bound" else None)
        out = fn(*args)
        _ = np.asarray(out[0][0, :1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(out[0][0, :1])
        return (time.perf_counter() - t0) / iters * 1e3

    for npb in (64, 128, 256, 512):
        rc = recall("cosine", npb)
        rb = recall("bound", npb)
        print("nprobe %4d  recall cosine %.4f  bound %.4f" % (npb, rc, rb),
              flush=True)
    print("latency @128: cosine %.2f ms  bound %.2f ms"
          % (latency("cosine", 128), latency("bound", 128)), flush=True)


if __name__ == "__main__":
    main()
