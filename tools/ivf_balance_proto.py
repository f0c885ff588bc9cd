"""Prototype: dual-biased balanced Lloyd vs the split-donate refinement.

Runs on the exact k-means sample the 4M chunked build trains on.
After plain Lloyd, runs `rounds` biased iterations: assignment is
argmax(x @ C.T - lam) with per-cluster dual penalties lam updated by
eta * (count - cap_target) / cap_target -- hot clusters price
themselves out, empty clusters become attractive. Prints per-round
displaced mass under the PLAIN (unbiased) first-choice counts, which is
what packing/probing actually see.

Usage: python tools/ivf_balance_proto.py [n_millions] [nlist] [rounds] [eta]
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
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    eta = float(sys.argv[4]) if len(sys.argv) > 4 else 0.01

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
          "mean(sample)/list %.1f  eta %.4f"
          % (len(train), nlist, cap, cap_target, len(train) / nlist, eta),
          flush=True)

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
    def lloyd(cents, lam, x, xp):
        def assign_block(blk):
            return jnp.argmax(blk @ cents.T - lam, axis=1).astype(jnp.int32)
        a = jax.lax.map(assign_block,
                        xp.reshape(nb, block, dim)).reshape(-1)[:n]
        sums = jnp.zeros((nlist, dim), jnp.float32).at[a].add(x)
        cnt = jnp.zeros((nlist,), jnp.int32).at[a].add(1)
        new = jnp.where(cnt[:, None] > 0, _l2norm(sums), cents)
        return new, cnt

    @jax.jit
    def plain_counts(cents, x, xp):
        def assign_block(blk):
            return jnp.argmax(blk @ cents.T, axis=1).astype(jnp.int32)
        a = jax.lax.map(assign_block,
                        xp.reshape(nb, block, dim)).reshape(-1)[:n]
        return jnp.zeros((nlist,), jnp.int32).at[a].add(1)

    zlam = jnp.zeros((nlist,), jnp.float32)
    cents = _l2norm(init)
    t0 = time.time()
    for it in range(10):
        cents, cnt = lloyd(cents, zlam, x, xp)
    c = np.array(cnt)
    print("plain lloyd done %.1fs  displaced %d  heavy %d  max %d"
          % (time.time() - t0,
             int(np.maximum(c - cap_target, 0).sum()),
             int((c > cap_target).sum()), int(c.max())), flush=True)

    lam = np.zeros(nlist, np.float32)
    t0 = time.time()
    for r in range(rounds):
        cents, cnt = lloyd(cents, jnp.asarray(lam), x, xp)
        c = np.array(cnt).astype(np.float64)
        lam += eta * (c - cap_target) / cap_target
        lam -= lam.mean()          # gauge: only differences matter
        pc = np.array(plain_counts(cents, x, xp))
        print("round %2d  biased[displ %7d heavy %4d max %5d]  "
              "plain[displ %7d heavy %4d max %5d p99 %4d]  lam[%.3f..%.3f]"
              % (r,
                 int(np.maximum(c - cap_target, 0).sum()),
                 int((c > cap_target).sum()), int(c.max()),
                 int(np.maximum(pc - cap_target, 0).sum()),
                 int((pc > cap_target).sum()), int(pc.max()),
                 int(np.percentile(pc, 99)),
                 float(lam.min()), float(lam.max())), flush=True)
    print("biased rounds done %.1fs" % (time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
