"""Trace capacity-refinement convergence on the exact k-means sample the
4M chunked build trains on: per-round displaced mass, heavy-list counts,
and the first-choice distribution of the SAMPLE -- isolates whether the
4M recall loss comes from the refinement loop (sample level) or from
sample->full-corpus scaling.

Usage: python tools/ivf_refine_trace.py [n_millions] [nlist] [rounds]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_posts = n_m * 1_000_000
    dim = 1024
    nc = 1024
    per = n_posts // nc
    n_posts = nc * per
    nlist = (int(sys.argv[2]) if len(sys.argv) > 2
             else int(2 * (n_posts ** 0.5) // 64 * 64))
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    k1, k3, _ = jax.random.split(jax.random.PRNGKey(0), 3)
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

    # exact replication of build_chunked's sample selection
    train_rows = 524288
    step = min(chunk, n_posts)
    if n_posts <= train_rows:
        starts = list(range(0, n_posts, step))
    else:
        step = min(step, max(1, train_rows))
        n_train_chunks = -(-train_rows // step)
        stride = max(step, (n_posts // n_train_chunks) // step * step)
        starts = list(range(0, n_posts, stride))[:n_train_chunks]
    train = np.concatenate(
        [np.asarray(gen(lo, min(lo + step, n_posts)), np.float32)
         for lo in starts])[:train_rows]
    cap = -(-int(np.ceil(1.3 * n_posts / nlist)) // 32) * 32
    cap_target = cap * len(train) / n_posts
    print("sample %d rows  nlist %d  cap %d  cap_target(sample) %.1f  "
          "mean(sample)/list %.1f"
          % (len(train), nlist, cap, cap_target, len(train) / nlist),
          flush=True)

    # ---- inline copy of spherical_kmeans with per-round tracing --------
    from fancyrec_tpu.serving.ivf import _l2norm

    x = _l2norm(jnp.asarray(train, jnp.float32))
    n = x.shape[0]
    block = 65536
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    nb = xp.shape[0] // block
    key = jax.random.PRNGKey(0)
    init = x[jax.random.choice(key, n, (nlist,), replace=n < nlist)]

    @jax.jit
    def lloyd(cents, x, xp):
        def assign_block(blk):
            return jnp.argmax(blk @ cents.T, axis=1).astype(jnp.int32)
        a = jax.lax.map(assign_block,
                        xp.reshape(nb, block, dim)).reshape(-1)[:n]
        sums = jnp.zeros((nlist, dim), jnp.float32).at[a].add(x)
        cnt = jnp.zeros((nlist,), jnp.int32).at[a].add(1)
        new = jnp.where(cnt[:, None] > 0, _l2norm(sums), cents)
        return new, cnt

    cents = _l2norm(init)
    cnt = None
    t0 = time.time()
    for it in range(10):
        cents, cnt = lloyd(cents, x, xp)
        c = np.array(cnt)
        print("lloyd %2d  displaced %7d  heavy %4d  max %5d  p99 %5d"
              % (it, np.maximum(c - cap_target, 0).sum(),
                 (c > cap_target).sum(), c.max(),
                 int(np.percentile(c, 99))), flush=True)
    print("lloyd done %.1fs" % (time.time() - t0), flush=True)

    rng = np.random.RandomState(1)
    for r in range(rounds):
        counts = np.array(cnt)
        order = np.argsort(counts, kind="stable")
        heavy = [int(c) for c in order[::-1] if counts[c] > cap_target]
        donors = [int(c) for c in order if counts[c] < 0.9 * cap_target]
        ch = np.array(cents)
        moved, di = False, 0
        split_done = 0
        for over in heavy:
            need = int(np.ceil(counts[over] / cap_target)) - 1
            take = min(need, len(donors) - di)
            if take <= 0:
                break
            for _j in range(take):
                eps = rng.randn(dim).astype(np.float32)
                eps *= 1e-3 / max(np.linalg.norm(eps), 1e-12)
                ch[donors[di]] = ch[over] + eps
                di += 1
                moved = True
            split_done += 1
        if not moved:
            print("round %2d: nothing moved, stop" % r, flush=True)
            break
        cents, cnt = lloyd(_l2norm(jnp.asarray(ch)), x, xp)
        c = np.array(cnt)
        print("round %2d  heavy_in %4d  split %4d  donors_used %5d  ->  "
              "displaced %7d  heavy %4d  max %5d"
              % (r, len(heavy), split_done, di,
                 np.maximum(c - cap_target, 0).sum(),
                 (c > cap_target).sum(), c.max()), flush=True)


if __name__ == "__main__":
    main()
