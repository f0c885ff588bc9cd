"""Prototype: member-seeded hot-cluster splits vs perturb-and-settle.

Runs on the exact k-means sample the 4M chunked build trains on.
Each round: every cluster with first-choice count > cap_target is split
into ceil(count/cap_target) centroids seeded at RANDOM DISTINCT MEMBER
rows of that cluster (donating the lightest clusters < 0.9*cap_target),
then `settles` global Lloyd steps re-partition. Member seeding spreads
the copies across the hot blob at the data's own scale, so one settle
step yields a genuine Voronoi split -- unlike the 1e-3 perturbation
seeding, whose near-identical copies separate only asymptotically
(traced: displaced mass 181k -> 51k over 12 rounds, then plateau).

Prints per-round displaced mass / heavy count / max under first-choice
counts -- what packing and probing actually see.

RESULT (v5e, 4M uniform-topic corpus, nlist 3968, 16 rounds x 2 settles):
NEGATIVE. Member-seeded splits OSCILLATE: displaced mass 246k-380k every
round vs plain Lloyd's 181k -- the settle steps after a member-seeded
reseed tear down light clusters faster than they relieve heavy ones
(max count climbs to ~3.9k). Combined with the biased-Lloyd prototype
(tools/ivf_balance_proto.py, also negative: 271k-495k), the k-means
balance angle is exhausted; the recall loss at 4M is NOT a balance
problem (see tools/ivf_diag4m.py: misses are own-choice lists at probe
ranks 154-400, i.e. probe-SELECTION, not placement).

Usage: python tools/ivf_split_proto.py [n_millions] [nlist] [rounds] [settles]
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
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    settles = int(sys.argv[4]) if len(sys.argv) > 4 else 2

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
    # device-resident sample: same strided row selection as
    # build_chunked, minus the 2 GB device->host->device roundtrip the
    # production path pays (irrelevant to the question measured here)
    train = jnp.concatenate(
        [gen(lo, min(lo + step, n_posts)) for lo in starts])[:train_rows]
    cap = -(-int(np.ceil(1.3 * n_posts / nlist)) // 32) * 32
    cap_target = cap * len(train) / n_posts
    print("sample %d rows  nlist %d  cap %d  cap_target(sample) %.1f  "
          "mean(sample)/list %.1f  settles %d"
          % (len(train), nlist, cap, cap_target, len(train) / nlist,
             settles), flush=True)

    from fancyrec_tpu.serving.ivf import _l2norm

    x = _l2norm(train)
    del train
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
        return new, cnt, a

    cents = _l2norm(init)
    t0 = time.time()
    for it in range(10):
        cents, cnt, a = lloyd(cents, x, xp)
    c = np.array(cnt)
    print("plain lloyd done %.1fs  displaced %d  heavy %d  max %d"
          % (time.time() - t0,
             int(np.maximum(c - cap_target, 0).sum()),
             int((c > cap_target).sum()), int(c.max())), flush=True)

    rng = np.random.RandomState(1)
    t0 = time.time()
    best = (int(np.maximum(c - cap_target, 0).sum()), np.array(cents))
    for r in range(rounds):
        counts = np.array(cnt)
        assign = np.array(a)
        order = np.argsort(counts, kind="stable")
        heavy = [int(cc) for cc in order[::-1] if counts[cc] > cap_target]
        if not heavy:
            break
        donors = [int(cc) for cc in order
                  if counts[cc] < 0.9 * cap_target]
        dest, seed_rows = [], []
        di = 0
        for over in heavy:
            need = int(np.ceil(counts[over] / cap_target)) - 1
            take = min(need, len(donors) - di)
            if take <= 0:
                break
            members = np.nonzero(assign == over)[0]
            seeds = rng.choice(members, size=take + 1, replace=False)
            dest.append(over)
            dest.extend(donors[di:di + take])
            seed_rows.extend(seeds.tolist())
            di += take
        if not dest:
            break
        # one small device gather of the seed rows; never pull x to host
        ch = np.array(cents)
        ch[np.asarray(dest)] = np.asarray(
            x[jnp.asarray(seed_rows, jnp.int32)])
        cents = jnp.asarray(ch)
        for _s in range(settles):
            cents, cnt, a = lloyd(cents, x, xp)
        c = np.array(cnt)
        d = int(np.maximum(c - cap_target, 0).sum())
        if d < best[0]:
            best = (d, np.array(cents))
        print("round %2d  displ %7d  heavy %4d  max %5d  p99 %4d"
              % (r, d, int((c > cap_target).sum()), int(c.max()),
                 int(np.percentile(c, 99))), flush=True)
    print("split rounds done %.1fs  best displ %d"
          % (time.time() - t0, best[0]), flush=True)


if __name__ == "__main__":
    main()
