"""IVF-Flat approximate retrieval: single-query serving beyond 10M posts.

Why it exists (and when NOT to use it): the exact kernels in
ops/similarity amortize one full index read across a whole 51-brand
query batch -- for batched queries brute force is already
bandwidth-optimal and IVF cannot help (51 queries x 64 probes touch
essentially every cluster). A SINGLE brand query, though, pays the full
index read alone: ~1 GB at 1M x 1024 int8, ~10 GB at 10M. IVF probes
`nprobe` of `nlist` coarse clusters, reading nprobe/nlist of the index
per query -- the classic inverted-file design (Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011, minus the PQ
codes: scoring stays exact over the probed subset, so the only recall
loss is posts whose nearest centroid was not probed).

TPU-native shape of the classic design:
  * spherical k-means runs jitted on device -- assignment is a blockwise
    (block, D) x (D, nlist) matmul argmax under lax.map (never
    materializing the (N, nlist) score matrix), the update is a
    scatter-add -- no host round-trips inside an iteration.
  * the packed index is a dense (nlist + overflow, cap, D) tensor: every
    cluster padded to the SAME capacity so a query is gather -> one
    einsum -> one top_k with no dynamic shapes. Capacity overflow is
    handled at build time by spilling posts to their next-best centroid
    (top-C choices), keeping shapes static instead of chasing
    FAISS-style variable-length lists that XLA cannot tile. Hot-topic
    overflow beyond the choices is defused twice: capacity-aware k-means
    splits clusters that exceed the packed capacity (centroid density
    tracks data density), and whatever still spills lands in
    always-probed overflow lists -- a small per-query latency cost
    instead of the recall ceiling round-robin spill used to impose.
  * int8 mode reuses the exact-int32 MXU scoring contract from
    ops/similarity (per-row max-abs quantization; cosine is
    scale-invariant per row so only 1/||q|| sidecars survive).

The reference has no ANN at all (its tester re-scores every post every
run, reference tester.py:106-113); this is a beyond-parity serving
component.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _kcenter_init(xp: jnp.ndarray, n: int, nlist: int, key) -> jnp.ndarray:
    """Gonzalez farthest-point (k-center) seeding -> (nlist,) row indices.

    Uniform-random row init allocates centroids proportional to data
    MASS, never to data SPREAD: on corpora made of many tight,
    near-orthogonal topic blobs a topic can start with zero centroids
    (Poisson tail), and Lloyd cannot fix it -- a centroid has no
    gradient across an orthogonal gap, so init coverage is frozen.
    Uncovered topics' posts then scatter at noise-level dots into other
    lists, polluting their means, and the 4M probe measured the end
    state: most query topics had NO aligned list at all while a few
    hoarded ~30 each (tools/ivf_probe_rank.py), recall@10 0.81 at
    nprobe 128.

    Farthest-point traversal is the coverage-maximal seeding (Gonzalez's
    2-approximation for k-center): each step takes the row with maximal
    cosine distance to its nearest chosen seed, so no region is left
    unseeded while another holds two (measured on the orthogonal-topic
    fixture: 64/64 topics vs ~50/64 for D^2 sampling -- on tight blobs
    the covered residual mass out-competes the uncovered tail under any
    sampled rule). The classic caveat -- isolated outlier rows attract
    seeds -- costs at most one near-empty list per outlier, healed by
    the Lloyd iterations that follow; mis-seeding a whole region costs
    its recall. Deterministic given the key (only the first seed is
    random). One jitted fori_loop, nlist matvec passes over the rows:
    ~10 s at the 4M build's 524k x 1024 sample.
    """
    nfull = xp.shape[0]
    first = jax.random.randint(key, (), 0, n)

    @jax.jit
    def run(xp, first):
        mind = 1.0 - xp @ xp[first]
        if nfull > n:
            # zero pad rows score 1 - 0: mask them out of every argmax
            mind = mind.at[n:].set(-jnp.inf)
        idx0 = jnp.zeros((nlist,), jnp.int32).at[0].set(
            first.astype(jnp.int32))

        def step(i, carry):
            idx, mind = carry
            p = jnp.argmax(mind).astype(jnp.int32)
            # a chosen row's own distance becomes 0: never re-chosen
            # while any unseeded spread remains
            return (idx.at[i].set(p),
                    jnp.minimum(mind, 1.0 - xp @ xp[p]))

        idx, _ = jax.lax.fori_loop(1, nlist, step, (idx0, mind))
        return idx

    return run(xp, first)


# A cluster may donate its centroid to a hot region only if its nearest
# sibling centroid is at least this close (cosine): members of a donated
# cluster must have somewhere nearby to land. Same-blob sibling
# centroids measure ~0.8 on the 4M probe's geometry (blob self-cosine
# at its noise scale) and real embedding manifolds put nearest centroids
# far above this; a centroid BELOW the floor is the sole coverage of its
# region and donating it strands every post there.
_DONOR_REDUNDANCY_FLOOR = 0.4


def _select_donors(counts: np.ndarray, cap_target: float,
                   maxcos: np.ndarray, sib: np.ndarray,
                   redundancy_floor: float = _DONOR_REDUNDANCY_FLOOR,
                   light_frac: float = 0.9) -> list:
    """Donor clusters for one capacity-refinement round, lightest first.

    A donor must be light (count < light_frac * cap_target) AND
    redundant (nearest sibling cosine >= redundancy_floor). Donating it
    protects its nearest sibling -- the absorber of its members -- from
    donating in the same round, and a cluster whose own absorber already
    donated is skipped. Without these two rules one round could drain
    EVERY list of a region: at the default 1.3x capacity overprovision
    the light line (0.9 * target = 1.17x the mean count) sits ABOVE the
    mean, so in a balanced solution every list is "light" and the old
    lightest-first rule preferentially emptied the best-covered topics
    wholesale. The 4M probe measured the resulting death spiral: donated
    topics' posts scatter at noise dots, pollute other means into junk,
    recall@10 stuck at 0.81 @ nprobe 128 with most topics holding zero
    aligned lists (tools/ivf_probe_rank.py).
    """
    order = np.argsort(counts, kind="stable")
    out = []
    protected, moved = set(), set()
    for c in order:
        c = int(c)
        if counts[c] >= light_frac * cap_target:
            break                      # ascending order: rest is heavier
        if maxcos[c] < redundancy_floor or c in protected:
            continue
        absorber = int(sib[c])
        if absorber in moved:
            continue                   # its absorber left this round
        protected.add(absorber)
        moved.add(c)
        out.append(c)
    return out


def spherical_kmeans(embs: jnp.ndarray, nlist: int, iters: int = 10,
                     seed: int = 0, block: int = 65536,
                     cap_target: Optional[float] = None,
                     balance_rounds: int = 12) -> jnp.ndarray:
    """K-means on the unit sphere (cosine assignment) -> (nlist, D) f32.

    Seeding is farthest-point k-center (see _kcenter_init): coverage
    of every data region is decided AT INIT -- Lloyd cannot move a
    centroid across an orthogonal gap -- so seeds are spread by
    distance, not drawn by mass. Jitted Lloyd iterations follow;
    assignment never materializes the full (N, nlist) score matrix
    (blockwise argmax under lax.map). Empty clusters keep their
    previous centroid.

    cap_target: capacity-aware refinement. Plain Lloyd under-splits hot
    regions in few iterations, leaving clusters whose population exceeds
    the packed capacity -- those posts get displaced to far choice
    clusters or spilled, the measured recall ceiling on topic-clustered
    corpora (recall@10 0.80 at nprobe 128 on the 4M/1024-topic probe).
    With a target, up to `balance_rounds` extra rounds split every
    cluster with count > cap_target into ceil(count/cap_target) copies
    (tiny deterministic perturbations around the hot centroid, then one
    Lloyd step to settle -- the settle step Voronoi-partitions the hot
    cluster's members among the copies), donating light clusters whose
    members have a nearby sibling to absorb them (_select_donors; the
    redundancy gate and per-round absorber protection are what keep the
    refinement from draining whole regions -- the 4M-measured failure
    mode of the earlier lightest-first rule). Because late donation
    rounds can transiently regress (a donor's displaced members can
    push a neighbor over target), the refinement tracks displaced mass
    per round and returns the best centroid set seen, not the last.
    """
    n, d = embs.shape
    x = _l2norm(jnp.asarray(embs, jnp.float32))
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    nb = xp.shape[0] // block
    key = jax.random.PRNGKey(seed)
    if nlist < n:
        init = xp[_kcenter_init(xp, n, nlist, key)]
    else:
        init = x[jax.random.choice(key, n, (nlist,), replace=True)]

    # x/xp ride as ARGUMENTS: a jit closing over them bakes gigabytes of
    # index into the executable as constants (doubling HBM at 1M x 1024)
    @jax.jit
    def lloyd(cents, x, xp):
        def assign_block(blk):
            return jnp.argmax(blk @ cents.T, axis=1).astype(jnp.int32)

        a = jax.lax.map(assign_block,
                        xp.reshape(nb, block, d)).reshape(-1)[:n]
        sums = jnp.zeros((nlist, d), jnp.float32).at[a].add(x)
        cnt = jnp.zeros((nlist,), jnp.int32).at[a].add(1)
        new = jnp.where(cnt[:, None] > 0, _l2norm(sums), cents)
        return new, cnt

    cents = _l2norm(init)
    cnt = None
    for _ in range(iters):
        cents, cnt = lloyd(cents, x, xp)

    # iters=0 means "init centroids, unrefined" -- there is no count to
    # balance against (cnt is None), so capacity refinement must not run
    if cap_target is not None and nlist > 1 and cnt is not None:
        rng = np.random.RandomState(seed + 1)

        @jax.jit
        def sibling(cents):
            # nearest OTHER centroid per centroid: absorber candidates
            s = cents @ cents.T - 2.0 * jnp.eye(nlist, dtype=cents.dtype)
            return jnp.max(s, axis=1), jnp.argmax(s, axis=1)

        def displaced(counts):
            return int(np.maximum(counts - cap_target, 0).sum())

        best = (displaced(np.array(cnt)), np.array(cents))
        for _ in range(balance_rounds):
            counts = np.array(cnt)      # writable host copy
            order = np.argsort(counts, kind="stable")     # light -> heavy
            heavy = [int(c) for c in order[::-1]
                     if counts[c] > cap_target]
            if not heavy:
                break
            maxcos, sib = (np.asarray(a) for a in sibling(cents))
            donors = _select_donors(counts, cap_target, maxcos, sib)
            ch = np.array(cents)        # writable host copy
            moved, di = False, 0
            for over in heavy:
                need = int(np.ceil(counts[over] / cap_target)) - 1
                take = min(need, len(donors) - di)
                if take <= 0:
                    break               # donor pool exhausted this round
                for _j in range(take):
                    eps = rng.randn(d).astype(np.float32)
                    eps *= 1e-3 / max(np.linalg.norm(eps), 1e-12)
                    ch[donors[di]] = ch[over] + eps
                    di += 1
                    moved = True
            if not moved:
                break
            cents, cnt = lloyd(
                _l2norm(jnp.asarray(ch)), x, xp)   # settle the split
            cur = displaced(np.array(cnt))
            if cur < best[0]:
                best = (cur, np.array(cents))
            if cur == 0:
                break
        if best[0] < displaced(np.array(cnt)):
            cents = jnp.asarray(best[1])
    return cents


@partial(jax.jit, static_argnums=(2, 3, 4))
def _top_choices_blocks(xp, cents, n_choices, nb, block):
    # module-level jit: build_chunked calls _top_choices once per chunk,
    # and a per-call closure would re-trace + re-compile an identical
    # program every time (tens of seconds each over a TPU tunnel)
    d = xp.shape[1]

    def blk(b):
        _, idx = jax.lax.top_k(b @ cents.T, n_choices)
        return idx.astype(jnp.int32)

    return jax.lax.map(blk, xp.reshape(nb, block, d))


def _top_choices(embs: jnp.ndarray, cents: jnp.ndarray, n_choices: int,
                 block: int = 65536) -> np.ndarray:
    """Per post: indices of the n_choices nearest centroids -> (N, C)."""
    n, d = embs.shape
    x = _l2norm(jnp.asarray(embs, jnp.float32))
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    nb = xp.shape[0] // block
    out = _top_choices_blocks(xp, cents, n_choices, nb, block)
    return np.asarray(out).reshape(-1, n_choices)[:n]


def balanced_assign(choices: np.ndarray, nlist: int, cap: int,
                    spill: str = "round_robin") -> np.ndarray:
    """Host-side capacity-balanced assignment from per-post top-C choices.

    Round c: posts still unassigned bid for their c-th choice; within a
    cluster, bids are granted in post order until the remaining capacity
    runs out (vectorized via a per-cluster running count).

    Posts that exhaust all C choices are handled per `spill`:
      * "round_robin": into whatever clusters still have room -- those
        become invisible to probes of their true neighborhood, so the
        spill fraction is a RECALL CEILING (measured 2% spills at 4M
        posts over 1024 synthetic topics with nlist=2048). Kept for the
        historical layout; production builds use "overflow".
      * "overflow": into virtual list ids nlist, nlist+1, ... (cap posts
        each) that IVFIndex packs as ALWAYS-PROBED overflow lists --
        spilled posts stay exactly searchable at any nprobe, eliminating
        the spill recall ceiling for a per-query cost of n_overflow
        extra scored lists. Capacity-aware k-means (spherical_kmeans
        cap_target) keeps the overflow small in the first place.
    """
    n, n_choices = choices.shape
    if spill == "round_robin":
        assert nlist * cap >= n, "capacity %d*%d < %d posts" % (
            nlist, cap, n)
    assign = np.full(n, -1, np.int64)
    used = np.zeros(nlist, np.int64)
    for c in range(n_choices):
        todo = np.nonzero(assign < 0)[0]
        if todo.size == 0:
            break
        want = choices[todo, c].astype(np.int64)
        order = np.argsort(want, kind="stable")
        w_sorted = want[order]
        seg_start = np.concatenate([[True], w_sorted[1:] != w_sorted[:-1]])
        pos_in_seg = np.arange(todo.size) - np.maximum.accumulate(
            np.where(seg_start, np.arange(todo.size), 0))
        slot = used[w_sorted] + pos_in_seg
        ok = slot < cap
        granted = todo[order][ok]
        assign[granted] = w_sorted[ok]
        np.add.at(used, w_sorted[ok], 1)
    todo = np.nonzero(assign < 0)[0]
    if todo.size:
        if spill == "overflow":
            assign[todo] = nlist + np.arange(todo.size) // cap
        else:
            free_clusters = np.repeat(np.arange(nlist), cap - used)
            assign[todo] = free_clusters[: todo.size]
    return assign


class IVFIndex:
    """Packed IVF-Flat index over post embeddings.

    build() -> an index holding:
      centroids   (nlist, D)  f32, unit rows
      packed      (nlist + overflow_lists, cap, D)  f32 or int8 rows
                  (l2-normalized f32 / max-abs int8 of the normalized
                  rows); rows past nlist are the ALWAYS-PROBED overflow
                  lists holding posts that exhausted their centroid
                  choices at build time
      packed_idx  (same leading dims, cap) int32 original post index,
                  -1 = empty slot

    query(q, k, nprobe): top-nprobe lists plus every overflow list,
    score only those lists' slots, exact top-k over the probed subset.
    nprobe=nlist degrades gracefully to exact brute force over the
    packed layout.

    Probe SELECTION defaults to raw centroid cosine. An alternative
    radius-aware ranking is available as query(..., probe="bound")
    whenever `radii` is present (built indexes always carry them):
    lists rank by the triangle-inequality upper bound on their best
    possible member score, cos(max(theta_qc - r_list, 0)), where
    r_list is the p95 member angle to the list centroid. The bound
    promotes a list in proportion to how far its members can reach
    toward the query, the exact miss mode the 4M-corpus diagnosis
    attributed (tools/ivf_diag4m.py: every residual nprobe-128 miss
    sat in wide capacity-split / topic-boundary lists the query
    cosine-ranked 154-400).

    Why cosine stays the default -- the measured 4M A/B
    (tools/ivf_bound4m.py, v5e-1, 4M x 1024 int8, nlist 3968,
    2026-08-20): recall@10 cosine/bound = 0.731/0.713 @ nprobe 64,
    0.816/0.819 @ 128, 0.919/0.922 @ 256, 0.975/0.991 @ 512; latency
    @ 128 = 1.90/2.66 ms. At realistic-dimension scale the member
    radii concentrate near orthogonality (p10..max spanned 85.8-86.7
    deg on that corpus -- the high-d concentration of measure), so the
    bound max(theta - r, 0) clamps to ~0 for most lists and adds
    discrimination only deep in the probe tail: bound LOSES at nprobe
    64, ties at 128-256, and only pays (+0.016 recall) at 512 -- while
    costing 1.4x query latency (arccos + the extra rank arithmetic per
    centroid). Use probe="bound" for recall-critical configs running
    nprobe >= 256; the hand-built wide-vs-tight geometry where bound
    provably wins at nprobe=1 lives in tests/test_ivf.py.
    """

    def __init__(self, centroids, packed, packed_idx, inv_norms=None,
                 radii=None):
        self.centroids = jnp.asarray(centroids)
        self.packed = jnp.asarray(packed)
        self.packed_idx = jnp.asarray(packed_idx, jnp.int32)
        self.inv_norms = (None if inv_norms is None
                          else jnp.asarray(inv_norms, jnp.float32))
        # (nlist,) f32 angular radius per REAL list (overflow lists are
        # always probed, they need no rank): p95 member angle to the
        # centroid, radians. None = legacy cosine-ranked probing.
        self.radii = (None if radii is None
                      else jnp.asarray(radii, jnp.float32))
        n_lists, self.cap = self.packed_idx.shape
        self.nlist = int(self.centroids.shape[0])
        # lists past the centroid count are overflow: probed on EVERY
        # query, so build-time spill costs latency, never recall
        self.overflow_lists = n_lists - self.nlist
        # fraction of posts that exhausted their top-C centroid choices
        # at build time. With overflow lists (the production build) they
        # remain exactly searchable -- the fraction is a per-query cost
        # (overflow_lists extra scored lists), no longer a recall
        # ceiling. None when unknown (hand-constructed indexes).
        self.spill_frac = None
        # row count of the store this sidecar was built from: saved into
        # ivf_meta.json so PostIndex.ivf() can refuse a sidecar whose
        # packed row indices no longer match the store (appends/rebuilds).
        # Part of save() so ANY save path stamps it, not just
        # build_ivf_sidecar's (a re-saved sidecar must not go stale).
        self.source_posts = None
        # set by shard_to_mesh: packed lists sharded over mesh[mesh_axis]
        self.mesh = None
        self.mesh_axis = "data"
        self._cache = {}

    # ---------------------------------------------------------- radii --

    def compute_radii(self, quantile: float = 0.95) -> None:
        """Per-list member angular radius (radians) -> self.radii.

        One jitted pass over the packed real lists: cos(member,
        centroid) per slot (int8 packs recover the member direction
        through the inv_norms sidecar, the exact contract the query
        kernel scores with), arccos, then the `quantile` order
        statistic of the valid members. p95 rather than max: the
        radius prices how far the list's MASS reaches toward a query;
        a single outlier member should not make the whole list look
        wide. Empty lists get radius 0 (the probe bound degrades to
        pure cosine ranking there).
        """
        nlist, cap = self.nlist, self.cap
        int8 = self.packed.dtype == jnp.int8
        qf = float(quantile)

        @jax.jit
        def run(packed, idx, cents, inv):
            def per_list(c):
                blk = jax.lax.dynamic_index_in_dim(packed, c, 0,
                                                   keepdims=False)
                ids = jax.lax.dynamic_index_in_dim(idx, c, 0,
                                                   keepdims=False)
                cent = cents[c]
                if int8:
                    pinv = jax.lax.dynamic_index_in_dim(inv, c, 0,
                                                        keepdims=False)
                    cos = (blk.astype(jnp.float32) @ cent) * pinv
                else:
                    cos = blk @ cent
                valid = ids >= 0
                ang = jnp.where(valid,
                                jnp.arccos(jnp.clip(cos, -1.0, 1.0)),
                                -jnp.inf)
                m = jnp.sum(valid)
                srt = -jnp.sort(-ang)          # descending, empties last
                # descending index of the q-quantile: 0 = widest member
                r = jnp.floor(
                    (1.0 - qf) * jnp.maximum(m - 1, 0).astype(jnp.float32)
                ).astype(jnp.int32)
                val = srt[jnp.clip(r, 0, cap - 1)]
                return jnp.where(m > 0, val, 0.0)

            return jax.lax.map(per_list, jnp.arange(nlist))

        self.radii = run(self.packed, self.packed_idx, self.centroids,
                         self.inv_norms)

    # ---------------------------------------------------------- build --

    @classmethod
    def build(cls, post_embs: np.ndarray, nlist: Optional[int] = None,
              cap: Optional[int] = None, iters: int = 10, seed: int = 0,
              quantize: str = "", n_choices: int = 8) -> "IVFIndex":
        if quantize not in ("", "int8"):
            raise ValueError("quantize must be '' or 'int8'")
        n, d = post_embs.shape
        if nlist is None:
            nlist = max(1, min(n, int(np.sqrt(n) * 2)))
        if cap is None:
            cap = max(1, int(np.ceil(1.3 * n / nlist)))
        # round the capacity up to the int8 sublane tile (32 rows): the
        # query's per-cluster dynamic slice runs at memcpy speed only
        # when slices start on tile boundaries -- measured 3.99 ms ->
        # 0.60 ms per 1M-post query for cap 537 -> 544 (v5e-1)
        cap = -(-cap // 32) * 32
        x = jnp.asarray(post_embs, jnp.float32)
        cents = spherical_kmeans(x, nlist, iters=iters, seed=seed,
                                 cap_target=cap)
        choices = _top_choices(x, cents, min(n_choices, nlist))
        assign = balanced_assign(choices, nlist, cap, spill="overflow")
        spill_frac = float(np.mean(assign >= nlist))
        n_lists = max(nlist, int(assign.max()) + 1)

        # device packing: only the (N, C) choices and the (N,) balanced
        # assignment cross the host boundary (a 1M x 1024 index never
        # leaves HBM -- device->host of the embeddings would dominate
        # build time on transfer-bound hosts)
        @jax.jit
        def pack(x, assign):
            order = jnp.argsort(assign)                 # cluster-contiguous
            counts = jnp.bincount(assign, length=n_lists)
            starts = jnp.concatenate(
                [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
            rows = assign[order]
            cols = jnp.arange(n) - starts[rows]
            slots = rows * cap + cols
            xn = _l2norm(x)
            packed = jnp.zeros((n_lists * cap, d), jnp.float32
                               ).at[slots].set(xn[order])
            packed_idx = jnp.full((n_lists * cap,), -1, jnp.int32
                                  ).at[slots].set(order.astype(jnp.int32))
            return packed, packed_idx.reshape(n_lists, cap)

        packed, packed_idx = pack(x, jnp.asarray(assign, jnp.int32))
        del x
        inv = None
        if quantize == "int8":
            from fancyrec_tpu.ops.similarity import quantize_rows_int8
            packed, inv = jax.jit(quantize_rows_int8)(packed)
            inv = inv.reshape(n_lists, cap)
        out = cls(cents, packed.reshape(n_lists, cap, d), packed_idx, inv)
        out.spill_frac = spill_frac
        out.compute_radii()
        return out

    @classmethod
    def build_chunked(cls, row_source, n: int, d: int,
                      nlist: Optional[int] = None, cap: Optional[int] = None,
                      iters: int = 10, seed: int = 0, quantize: str = "int8",
                      n_choices: int = 8, chunk: int = 262144,
                      train_rows: int = 524288) -> "IVFIndex":
        """Memory-lean build for indexes too large to materialize in f32.

        The f32 corpus never exists as one array: rows stream through
        `row_source(lo, hi) -> (hi-lo, d) float32` (a BigFile read, a
        decode stage, on-device generation), and the device holds only
        the packed index (1 byte/elem in int8 mode) plus one in-flight
        chunk. That is what makes the module docstring's 10M-x-1024
        scale actually buildable: 10M f32 is 40 GB (over HBM *and* this
        host's RAM), the packed int8 index is 10 GB.

        k-means trains on an evenly-strided sample of `train_rows` rows
        (full corpus when n <= train_rows). With a full-sample k-means
        the result is BIT-IDENTICAL to build() on the same data/seed
        (pinned in tests): quantization is per-row, slot assignment is
        the same host math, and the scatter writes the same bytes.
        """
        if quantize not in ("", "int8"):
            raise ValueError("quantize must be '' or 'int8'")
        if nlist is None:
            nlist = max(1, min(n, int(np.sqrt(n) * 2)))
        if cap is None:
            cap = max(1, int(np.ceil(1.3 * n / nlist)))
        cap = -(-cap // 32) * 32            # int8 sublane tile (see build)

        if n <= 0:
            raise ValueError("build_chunked needs a non-empty corpus")
        # ---- k-means on a strided sample (full corpus if it fits) ----
        step = min(chunk, n)        # a chunk larger than the corpus must
        if n <= train_rows:         # not empty the sample (range(0, n<0))
            starts = list(range(0, n, step))
        else:
            # a train_rows below one chunk must still be honored: shrink
            # the sample read size so the cap is real, not floored at
            # min(chunk, n) rows
            step = min(step, max(1, train_rows))
            # ceil the chunk count, then trim: flooring silently halved
            # the requested sample (e.g. train_rows 500000 with the
            # default 262144 chunk trained on one 262144-row chunk)
            n_train_chunks = -(-train_rows // step)
            stride = max(step, (n // n_train_chunks) // step * step)
            starts = list(range(0, n, stride))[:n_train_chunks]
        train = np.concatenate(
            [np.asarray(row_source(lo, min(lo + step, n)), np.float32)
             for lo in starts])[:train_rows]
        # the capacity target scales to the sample: a cluster holding s
        # sample rows holds ~s * n / len(train) corpus rows
        cents = spherical_kmeans(jnp.asarray(train), nlist, iters=iters,
                                 seed=seed,
                                 cap_target=cap * len(train) / n)
        del train

        # ---- per-row top-C choices, streamed ----
        choices = np.concatenate([
            np.asarray(_top_choices(
                jnp.asarray(row_source(lo, min(lo + chunk, n)), jnp.float32),
                cents, min(n_choices, nlist)))
            for lo in range(0, n, chunk)])
        assign = balanced_assign(choices, nlist, cap, spill="overflow")
        spill_frac = float(np.mean(assign >= nlist))
        n_lists = max(nlist, int(assign.max()) + 1)

        # ---- slot per global row (same math as build()'s pack, host) --
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=n_lists)
        starts_c = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rows_srt = assign[order]
        cols = np.arange(n) - starts_c[rows_srt]
        slot_of = np.empty(n, np.int64)
        slot_of[order] = rows_srt * cap + cols

        # ---- streamed scatter into the packed device buffer ----------
        int8 = quantize == "int8"
        packed = jnp.zeros((n_lists * cap, d),
                           jnp.int8 if int8 else jnp.float32)
        inv_host = np.zeros(n_lists * cap, np.float32) if int8 else None

        @partial(jax.jit, donate_argnums=0)
        def scatter(packed, rows, slots):
            xn = _l2norm(rows)
            if int8:
                from fancyrec_tpu.ops.similarity import quantize_rows_int8
                q, qinv = quantize_rows_int8(xn)
                return packed.at[slots].set(q), qinv
            return packed.at[slots].set(xn), jnp.zeros((rows.shape[0],))

        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            rows = jnp.asarray(row_source(lo, hi), jnp.float32)
            packed, qinv = scatter(packed, rows,
                                   jnp.asarray(slot_of[lo:hi]))
            if int8:
                inv_host[slot_of[lo:hi]] = np.asarray(qinv)

        packed_idx = np.full(n_lists * cap, -1, np.int32)
        packed_idx[slot_of] = np.arange(n, dtype=np.int32)
        inv = (jnp.asarray(inv_host.reshape(n_lists, cap)) if int8 else None)
        out = cls(cents, packed.reshape(n_lists, cap, d),
                  packed_idx.reshape(n_lists, cap), inv)
        out.spill_frac = spill_frac
        out.compute_radii()
        return out

    # ------------------------------------------------------- sharding --

    def shard_to_mesh(self, mesh, axis: str = "data") -> "IVFIndex":
        """Shard the packed lists over `mesh[axis]`: the capacity story.

        The single-chip bound is HBM. int8 packed lists cost
        (nlist + overflow) * cap * dim bytes: the measured 4M x 1024
        build (nlist 3968, cap 1312 at the 1.3x overprovision) packs
        ~5.3 GB, so ~10-11M posts brushes a v5e's 16 GB before compile
        workspace -- the cap README documents. Sharding splits the LIST
        axis contiguously over the mesh: each device holds n_lists/S
        lists (the axis pads with empty lists to the shard multiple;
        their slots carry id -1 and mask to -inf like any empty slot),
        centroids/radii stay replicated (nlist x dim f32 = 16 MB at the
        4M shape), and capacity scales linearly with S.

        Query results are IDENTICAL to single-device: probe selection
        runs replicated on every device (cheap centroid math over the
        replicated centroids -> the same top-nprobe list set
        everywhere), each device scans all probe slots but substitutes
        a dummy local list for slots it does not own (masked to -inf;
        the dummy DMA keeps shapes static), and an all-gather + top-k
        merges per-shard candidates. Per-device scan latency therefore
        stays at the single-chip figure -- this buys capacity, not
        speed; the win is that a corpus S times past single-chip HBM
        still serves at single-chip latency.
        """
        S = int(mesh.devices.shape[list(mesh.axis_names).index(axis)])
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_lists = self.packed_idx.shape[0]
        pad = (-n_lists) % S
        if pad:
            self.packed = jnp.concatenate(
                [self.packed,
                 jnp.zeros((pad,) + self.packed.shape[1:],
                           self.packed.dtype)])
            self.packed_idx = jnp.concatenate(
                [self.packed_idx,
                 jnp.full((pad, self.cap), -1, jnp.int32)])
            if self.inv_norms is not None:
                self.inv_norms = jnp.concatenate(
                    [self.inv_norms,
                     jnp.ones((pad, self.cap), jnp.float32)])
        self.packed = jax.device_put(
            self.packed, NamedSharding(mesh, P(axis, None, None)))
        self.packed_idx = jax.device_put(
            self.packed_idx, NamedSharding(mesh, P(axis, None)))
        if self.inv_norms is not None:
            self.inv_norms = jax.device_put(
                self.inv_norms, NamedSharding(mesh, P(axis, None)))
        rep = NamedSharding(mesh, P())
        self.centroids = jax.device_put(self.centroids, rep)
        if self.radii is not None:
            self.radii = jax.device_put(self.radii, rep)
        self.mesh, self.mesh_axis = mesh, axis
        self._cache = {}
        return self

    def _jitted_query_sharded(self, n_q: int, k: int, nprobe: int,
                              mode: str):
        key = ("sharded", n_q, k, nprobe, mode)
        fn = self._cache.get(key)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh, axis = self.mesh, self.mesh_axis
        cap, nlist = self.cap, self.nlist
        n_over = self.overflow_lists
        per = self.packed_idx.shape[0] // \
            int(mesh.devices.shape[list(mesh.axis_names).index(axis)])
        int8 = self.packed.dtype == jnp.int8
        # per-shard candidate pool must cover the worst case (one shard
        # owning EVERY probed list) or the merge could drop true top-k
        kk = min(k, (nprobe + n_over) * cap)

        def local(qs, packed_l, idx_l, cents, *opt):
            opt = list(opt)
            inv_l = opt.pop(0) if int8 else None
            radii = opt.pop(0) if mode == "bound" else None
            me = jax.lax.axis_index(axis)

            def one_query(q):
                # replicated probe selection: every device ranks the
                # same (replicated) centroids -> identical probe set,
                # so no collective is needed to agree on it
                qn_ = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
                cscore = cents @ qn_
                if mode == "bound":
                    theta = jnp.arccos(jnp.clip(cscore, -1.0, 1.0))
                    rank_key = (-jnp.maximum(theta - radii, 0.0)
                                - 1e-3 * theta)
                    _, probe = jax.lax.top_k(rank_key, nprobe)
                else:
                    _, probe = jax.lax.top_k(cscore, nprobe)
                if n_over:
                    probe = jnp.concatenate(
                        [probe, jnp.arange(nlist, nlist + n_over,
                                           dtype=probe.dtype)])
                owner = probe // per
                mine = owner == me
                lidx = jnp.where(mine, probe % per, 0)
                if int8:
                    amax = jnp.max(jnp.abs(q))
                    scale = jnp.where(amax > 0, 127.0 / amax, 0.0)
                    q8 = jnp.clip(jnp.round(q * scale),
                                  -127, 127).astype(jnp.int8)
                    inv_q = jax.lax.rsqrt(jnp.maximum(
                        jnp.sum(jnp.square(q8.astype(jnp.float32))), 1.0))
                qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)

                def body(_, cm):
                    c, m = cm
                    blk = jax.lax.dynamic_index_in_dim(packed_l, c, 0,
                                                       keepdims=False)
                    ids = jax.lax.dynamic_index_in_dim(idx_l, c, 0,
                                                       keepdims=False)
                    if int8:
                        pinv = jax.lax.dynamic_index_in_dim(
                            inv_l, c, 0, keepdims=False)
                        acc = jax.lax.dot_general(
                            blk, q8[:, None], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)[:, 0]
                        s = acc.astype(jnp.float32) * inv_q * pinv
                    else:
                        s = blk @ qn
                    # not-owned probe slots scanned a dummy local list:
                    # void their ids so the scores mask to -inf
                    ids = jnp.where(m, ids, -1)
                    return None, (s, ids)

                _, (scores, idxs) = jax.lax.scan(body, None, (lidx, mine))
                s = scores.reshape(-1)
                s = jnp.where(idxs.reshape(-1) < 0, -jnp.inf, s)
                vals, local_top = jax.lax.top_k(s, kk)
                out_idx = idxs.reshape(-1)[local_top]
                # cross-shard merge (each post lives in exactly one
                # list, so candidates never duplicate across shards)
                av = jax.lax.all_gather(vals, axis).reshape(-1)
                ai = jax.lax.all_gather(out_idx, axis).reshape(-1)
                mvals, sel = jax.lax.top_k(av, min(k, av.shape[0]))
                midx = ai[sel]
                if k > mvals.shape[0]:
                    padlen = k - mvals.shape[0]
                    mvals = jnp.concatenate(
                        [mvals, jnp.full(padlen, -jnp.inf, mvals.dtype)])
                    midx = jnp.concatenate(
                        [midx, jnp.full(padlen, -1, midx.dtype)])
                return mvals, midx

            vals, idxs = jax.lax.map(one_query, qs)
            # emit on a size-1 sharded leading axis; the caller reads
            # shard 0 (avoids a static replication proof in out_specs)
            return vals[None], idxs[None]

        in_specs = [P(), P(axis, None, None), P(axis, None), P()]
        if int8:
            in_specs.append(P(axis, None))
        if mode == "bound":
            in_specs.append(P())
        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=tuple(in_specs),
                               out_specs=(P(axis, None, None),
                                          P(axis, None, None))))
        self._cache[key] = fn
        return fn

    # ---------------------------------------------------------- query --

    def _jitted_query(self, n_q: int, k: int, nprobe: int,
                      mode: str = "cosine"):
        key = (n_q, k, nprobe, mode)
        fn = self._cache.get(key)
        if fn is not None:
            return fn
        cap, nlist = self.cap, self.nlist
        n_over = self.overflow_lists
        int8 = self.packed.dtype == jnp.int8

        def one_query(q, packed, packed_idx, cents, inv, radii):
            qn_ = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
            cscore = cents @ qn_                            # (nlist,)
            if mode == "bound":
                # rank by the reachability bound cos(max(theta - r, 0)):
                # equivalently minimize max(theta - r, 0), theta in
                # radians. Lists the query is INSIDE (theta <= r) all
                # bound to 1.0 -- break those ties by centroid angle so
                # tight well-aligned lists still come first.
                theta = jnp.arccos(jnp.clip(cscore, -1.0, 1.0))
                rank_key = -jnp.maximum(theta - radii, 0.0) - 1e-3 * theta
                _, probe = jax.lax.top_k(rank_key, nprobe)  # (nprobe,)
            else:
                _, probe = jax.lax.top_k(cscore, nprobe)    # (nprobe,)
            if n_over:
                # overflow lists hold build-time spill; probing them on
                # every query keeps spilled posts exactly searchable
                probe = jnp.concatenate(
                    [probe, jnp.arange(nlist, nlist + n_over,
                                       dtype=probe.dtype)])
            if int8:
                # exact-int32 MXU contract (ops/similarity
                # quantize_rows_int8): cosine of the quantized vectors =
                # (q8 . p8) / (||q8|| ||p8||), int8 x int8 -> int32 dot
                amax = jnp.max(jnp.abs(q))
                scale = jnp.where(amax > 0, 127.0 / amax, 0.0)
                q8 = jnp.clip(jnp.round(q * scale),
                              -127, 127).astype(jnp.int8)
                inv_q = jax.lax.rsqrt(jnp.maximum(
                    jnp.sum(jnp.square(q8.astype(jnp.float32))), 1.0))
            qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)

            # probe clusters via lax.scan + per-cluster dynamic slice:
            # one (cap, D) contiguous DMA per probe. A batched gather
            # (packed[probe]) lowers to an element-granularity copy on
            # TPU -- measured 9.6 ms vs 0.6 ms for the scan form at
            # 64 x 544 x 1024 int8 (v5e-1)
            def body(_, c):
                blk = jax.lax.dynamic_index_in_dim(packed, c, 0,
                                                   keepdims=False)
                ids = jax.lax.dynamic_index_in_dim(packed_idx, c, 0,
                                                   keepdims=False)
                if int8:
                    pinv = jax.lax.dynamic_index_in_dim(inv, c, 0,
                                                        keepdims=False)
                    acc = jax.lax.dot_general(
                        blk, q8[:, None], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)[:, 0]
                    s = acc.astype(jnp.float32) * inv_q * pinv
                else:
                    s = blk @ qn
                return None, (s, ids)

            _, (scores, idxs) = jax.lax.scan(body, None, probe)
            s = scores.reshape(-1)
            s = jnp.where(idxs.reshape(-1) < 0, -jnp.inf, s)
            vals, local = jax.lax.top_k(s, min(k, (nprobe + n_over) * cap))
            out_idx = idxs.reshape(-1)[local]
            if k > vals.shape[0]:
                padlen = k - vals.shape[0]
                vals = jnp.concatenate(
                    [vals, jnp.full(padlen, -jnp.inf, vals.dtype)])
                out_idx = jnp.concatenate(
                    [out_idx, jnp.full(padlen, -1, out_idx.dtype)])
            return vals, out_idx

        @jax.jit
        def run(qs, packed, packed_idx, cents, inv, radii):
            return jax.lax.map(
                lambda q: one_query(q, packed, packed_idx, cents, inv,
                                    radii), qs)

        fn = run
        self._cache[key] = fn
        return fn

    def query(self, query_embs: np.ndarray, k: int = 10, nprobe: int = 8,
              probe: Optional[str] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (scores (Q, k), original post indices (Q, k)); slots past
        the probed posts carry -inf / -1. Queries run under lax.map so
        device memory stays O(nprobe * cap * D) regardless of Q.

        probe: "cosine" (raw centroid-cosine ranking, the measured
        production default -- see the class docstring for the 4M A/B
        that pinned it) or "bound" (radius-aware reachability ranking;
        pays at nprobe >= 256, needs radii, so unavailable on legacy
        sidecars saved without radii.npy)."""
        qs = jnp.atleast_2d(jnp.asarray(query_embs, jnp.float32))
        nprobe = min(nprobe, self.nlist)
        mode = probe or "cosine"
        if mode == "bound" and self.radii is None:
            raise ValueError("probe='bound' needs radii; this index has "
                             "none (legacy sidecar) -- compute_radii() "
                             "or query with probe='cosine'")
        if mode not in ("bound", "cosine"):
            raise ValueError("probe must be 'bound' or 'cosine'")
        if self.mesh is not None:
            fn = self._jitted_query_sharded(qs.shape[0], k, nprobe, mode)
            args = [qs, self.packed, self.packed_idx, self.centroids]
            if self.packed.dtype == jnp.int8:
                args.append(self.inv_norms)
            if mode == "bound":
                args.append(self.radii)
            vals, idxs = fn(*args)
            return np.asarray(vals[0]), np.asarray(idxs[0])
        fn = self._jitted_query(qs.shape[0], k, nprobe, mode)
        vals, idxs = fn(qs, self.packed, self.packed_idx, self.centroids,
                        self.inv_norms,
                        self.radii if mode == "bound" else None)
        return np.asarray(vals), np.asarray(idxs)

    # ------------------------------------------------------- save/load --

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "centroids.npy"),
                np.asarray(self.centroids))
        np.save(os.path.join(path, "packed_idx.npy"),
                np.asarray(self.packed_idx))
        np.asarray(self.packed).tofile(os.path.join(path, "packed.bin"))
        meta = {"nlist": int(self.nlist), "cap": int(self.cap),
                "overflow_lists": int(self.overflow_lists),
                "spill_frac": self.spill_frac,
                "dim": int(self.packed.shape[-1]),
                "dtype": str(np.dtype(np.asarray(self.packed).dtype))}
        if self.source_posts is not None:
            meta["source_posts"] = int(self.source_posts)
        if self.inv_norms is not None:
            np.save(os.path.join(path, "inv_norms.npy"),
                    np.asarray(self.inv_norms))
        if self.radii is not None:
            np.save(os.path.join(path, "radii.npy"),
                    np.asarray(self.radii))
        with open(os.path.join(path, "ivf_meta.json"), "w") as f:
            f.write(json.dumps(meta))

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with open(os.path.join(path, "ivf_meta.json")) as f:
            meta = json.loads(f.read())
        packed = np.fromfile(os.path.join(path, "packed.bin"),
                             np.dtype(meta["dtype"]))
        n_lists = meta["nlist"] + meta.get("overflow_lists", 0)
        packed = packed.reshape(n_lists, meta["cap"], meta["dim"])
        inv_path = os.path.join(path, "inv_norms.npy")
        inv = np.load(inv_path) if os.path.exists(inv_path) else None
        rad_path = os.path.join(path, "radii.npy")
        rad = np.load(rad_path) if os.path.exists(rad_path) else None
        out = cls(np.load(os.path.join(path, "centroids.npy")), packed,
                  np.load(os.path.join(path, "packed_idx.npy")), inv,
                  radii=rad)
        out.spill_frac = meta.get("spill_frac")
        out.source_posts = meta.get("source_posts")
        return out
