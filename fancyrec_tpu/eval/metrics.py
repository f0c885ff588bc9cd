"""Retrieval metric kernels: AUC, NDCG@10/50, MedR, MeanR, R@1/5/10.

Two implementations with identical semantics:

  * ranking_metrics_oracle -- plain numpy, a faithful port of the reference
    evaluator loop (reference evaluator.py:85-143, util/ndcg.py) used as the
    golden oracle in tests and for small CPU-side evaluation.

  * ranking_metrics_jax -- a single batched XLA computation: per-brand sort +
    searchsorted order statistics instead of the reference's per-brand Python
    loop over (score, brand) tuples. Runs the whole brands x posts metric
    block on-device; posts axis is shardable for the scaled (1M-post) config.

Cost at index scale: exact AUC needs full per-brand order statistics, so
the single-device kernel is bound by one batched (brands, posts) co-sort
-- 26 ms at 51 x 4k, ~1.2 s at 51 x 1M on v5e-1 (the XLA sort floor).
That is the offline-eval path only; serving-scale retrieval uses the
top-k kernels in ops/similarity (16 ms at 1M), which never rank the full
index.

For meshes, ranking_metrics_sharded computes the SAME metrics exactly
without ever gathering the (brands, posts) matrix: per-shard sorts plus
a cross-shard rank reconstruction (binary-search counting against each
shard's sorted rows + an all-gather of only the N "own-brand" diagonal
scores), so per-device memory and sort work drop by the shard count.

Semantics notes (kept bit-faithful):
  - AUC uses *strict* comparisons: tied pos/neg scores earn zero credit.
  - Brands with no positive posts are skipped for MedR/MeanR/AUC/NDCG but
    their entry in `ranks` stays 0, which the reference counts as a R@K hit
    (evaluator.py:105,127-131). Replicated as-is.
  - NDCG discount is "method 0": weights [1, 1, 1/log2(3), 1/log2(4), ...].
  - Sorting is descending and stable (Python sorted semantics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RankingMetrics(NamedTuple):
    medr: float
    meanr: float
    auc: float
    ndcg10: float
    ndcg50: float
    r1: float
    r5: float
    r10: float


def composite_score(m: RankingMetrics) -> float:
    """Reference model-selection score (trainer.py:412-413)."""
    return (m.auc + m.ndcg10 + m.ndcg50) * 100.0 + m.r1 + m.r5 + m.r10


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def l2norm_np(x: np.ndarray) -> np.ndarray:
    return x / np.sqrt((x ** 2).sum(axis=1, keepdims=True))


def cosine_sim_matrix(brand_embs: jnp.ndarray, post_embs: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize rows of both and matmul -> (brands, posts) similarity."""
    b = brand_embs / jnp.linalg.norm(brand_embs, axis=1, keepdims=True)
    p = post_embs / jnp.linalg.norm(post_embs, axis=1, keepdims=True)
    return jnp.dot(b, p.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# numpy oracle (reference-faithful)
# ---------------------------------------------------------------------------

def _dcg_at_k(r: np.ndarray, k: int) -> float:
    r = np.asarray(r, dtype=np.float64)[:k]
    if r.size:
        return r[0] + np.sum(r[1:] / np.log2(np.arange(2, r.size + 1)))
    return 0.0


def _ndcg_at_k(r, k: int) -> float:
    dcg_max = _dcg_at_k(np.sort(r)[::-1], k)
    if not dcg_max:
        return 0.0
    return _dcg_at_k(np.asarray(r), k) / dcg_max


def ranking_metrics_oracle(scores: np.ndarray, brands: np.ndarray,
                           brand_num: int) -> RankingMetrics:
    """Numpy port of reference evaluator.test_post_ranking (evaluator.py:103-143).

    scores: (brand_num, n_posts) similarity matrix.
    brands: (n_posts,) integer brand label of each post.
    """
    scores = np.asarray(scores)
    brands = np.asarray(brands)
    queries = []
    ranks = np.zeros(scores.shape[0])

    for b in range(scores.shape[0]):
        s = scores[b]
        # kind="stable" matches the reference's Python sorted() in its
        # AUC/NDCG loop (evaluator.py:110). Its R@K path separately uses an
        # UNSTABLE np.argsort (evaluator.py:124), so on exact score ties the
        # reference can disagree with itself; we are stable-consistent
        # everywhere (ties are measure-zero on float scores).
        order = np.argsort(-s, kind="stable")
        sorted_brands = brands[order]
        sorted_scores = s[order]
        pos = sorted_scores[sorted_brands == b]
        neg = sorted_scores[sorted_brands != b]
        if len(pos) == 0:
            continue
        auc_num = np.sum([np.sum(neg < e) for e in pos])
        rel = (sorted_brands == b).astype(np.float64)
        rank_of_first_pos = int(np.argmax(rel))
        queries.append((
            rank_of_first_pos,
            float(auc_num) / (len(pos) * len(neg)),
            _ndcg_at_k(rel, 10),
            _ndcg_at_k(rel, 50),
        ))
        ranks[b] = rank_of_first_pos

    r1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    r5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    r10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)
    cols = list(zip(*queries))
    return RankingMetrics(
        medr=float(np.floor(np.median(cols[0]))),
        meanr=float(np.floor(np.mean(cols[0]))),
        auc=float(np.average(cols[1])),
        ndcg10=float(np.average(cols[2])),
        ndcg50=float(np.average(cols[3])),
        r1=r1, r5=r5, r10=r10,
    )


# ---------------------------------------------------------------------------
# JAX batched kernel
# ---------------------------------------------------------------------------

_NDCG_KMAX = 50


def _dcg_weights(k: int) -> np.ndarray:
    w = np.ones(k, dtype=np.float64)
    if k > 1:
        w[1:] = 1.0 / np.log2(np.arange(2, k + 1))
    return w


def _per_brand_stats(s: jnp.ndarray, brands: jnp.ndarray, b: jnp.ndarray,
                     w10: jnp.ndarray, w50: jnp.ndarray):
    """Metrics for one brand row. s: (N,) scores; brands: (N,) labels.

    Only one O(N log N) sort (the AUC order statistics); NDCG uses
    lax.top_k(50) and the first-positive rank is computed by counting,
    both tie-consistent with a stable descending sort (lower original
    index wins ties, matching the oracle's Python sorted())."""
    n = s.shape[0]
    # posts with label < 0 are padding (distributed eval pads the post axis
    # to the shard count): scored -inf and excluded from both pos and neg
    pad_mask = brands < 0
    s = jnp.where(pad_mask, -jnp.inf, s)
    pos_mask = brands == b
    p_cnt = jnp.sum(pos_mask)
    n_cnt = n - p_cnt - jnp.sum(pad_mask)

    # --- AUC via one co-sort + prefix counts (strict "neg < pos") ---
    # searchsorted lowers to per-query binary-search gathers (slow on TPU);
    # instead co-sort (score, is_neg) ascending and count negatives before
    # each tie group with O(N) scans.
    isneg = (~pos_mask & ~pad_mask).astype(jnp.int32)
    vals, isneg_s = jax.lax.sort((s, isneg), dimension=0, num_keys=1)
    neg_prefix = jnp.cumsum(isneg_s) - isneg_s       # negs strictly before i
    idx = jnp.arange(n)
    changed = jnp.concatenate([jnp.ones(1, bool), vals[1:] != vals[:-1]])
    first_occ = jax.lax.cummax(jnp.where(changed, idx, 0))
    cnt_neg_below = neg_prefix[first_occ]            # negs with score < vals[i]
    # per-positive ratio, summed in f32: the pair-count form overflows
    # int32 at index scale (p_cnt*n_cnt ~ 1.9e10 at 1M posts; the int32
    # sum of counts likewise). Counts are <= N < 2^24 so each ratio is
    # exact in f32; the tree-reduced mean is accurate to ~1e-6.
    ratio = cnt_neg_below.astype(jnp.float32) / jnp.maximum(
        n_cnt, 1).astype(jnp.float32)
    auc = (jnp.sum(jnp.where(isneg_s == 0, ratio, 0.0))
           / jnp.maximum(p_cnt, 1).astype(jnp.float32))

    # --- NDCG@10/50 from the top-k only (lax.top_k breaks ties by lower
    # index, same as the stable descending order) ---
    k = min(_NDCG_KMAX, n)
    _, top_idx = jax.lax.top_k(s, k)
    rel50 = (brands[top_idx] == b).astype(jnp.float32)
    dcg10 = jnp.sum(rel50[:10] * w10[: rel50[:10].shape[0]])
    dcg50 = jnp.sum(rel50 * w50[: rel50.shape[0]])

    # ideal DCG: prefix-sum of weights up to min(P, k)
    c10 = jnp.cumsum(w10)
    c50 = jnp.cumsum(w50)
    idcg10 = jnp.where(p_cnt > 0, c10[jnp.clip(p_cnt, 1, 10) - 1], 0.0)
    idcg50 = jnp.where(p_cnt > 0, c50[jnp.clip(p_cnt, 1, _NDCG_KMAX) - 1], 0.0)
    ndcg10 = jnp.where(idcg10 > 0, dcg10 / jnp.maximum(idcg10, 1e-30), 0.0)
    ndcg50 = jnp.where(idcg50 > 0, dcg50 / jnp.maximum(idcg50, 1e-30), 0.0)

    # --- first-positive rank by counting (no argsort): entries strictly
    # above the best positive score, plus equal-score entries whose
    # original index precedes the first best positive ---
    masked = jnp.where(pos_mask, s, -jnp.inf)
    p_star = jnp.max(masked)
    idx_star = jnp.argmax(masked)
    ahead = jnp.sum(s > p_star) + jnp.sum(
        (s == p_star) & (jnp.arange(n) < idx_star))
    rank_first = ahead  # 0 when no positives exist; gated by `valid`
    valid = p_cnt > 0
    return valid, rank_first, auc, ndcg10, ndcg50


def _masked_median_floor(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """floor(median over valid entries), numpy midpoint interpolation."""
    big = jnp.float32(1e18)
    v = jnp.where(valid, vals.astype(jnp.float32), big)
    v = jnp.sort(v)
    cnt = jnp.sum(valid)
    lo = v[jnp.maximum((cnt - 1) // 2, 0)]
    hi = v[jnp.maximum(cnt // 2, 0)]
    return jnp.floor((lo + hi) / 2.0)


def ranking_metrics_jax(scores: jnp.ndarray, brands: jnp.ndarray,
                        brand_num: int) -> RankingMetrics:
    """Batched on-device equivalent of ranking_metrics_oracle.

    Call under jit (it is pure); returns a RankingMetrics of 0-d arrays.
    """
    scores = jnp.asarray(scores, dtype=jnp.float32)
    brands = jnp.asarray(brands, dtype=jnp.int32)
    w10 = jnp.asarray(_dcg_weights(10))
    w50 = jnp.asarray(_dcg_weights(_NDCG_KMAX))
    brand_ids = jnp.arange(brand_num, dtype=jnp.int32)

    valid, rank_first, auc, ndcg10, ndcg50 = jax.vmap(
        _per_brand_stats, in_axes=(0, None, 0, None, None)
    )(scores[:brand_num], brands, brand_ids, w10, w50)
    return _assemble_metrics(valid, rank_first, auc, ndcg10, ndcg50,
                             brand_num)


def _assemble_metrics(valid, rank_first, auc, ndcg10, ndcg50,
                      brand_num: int) -> RankingMetrics:
    """Per-brand stats -> RankingMetrics (shared by the single-device and
    sharded kernels; semantics of reference evaluator.py:129-143)."""
    vcnt = jnp.maximum(jnp.sum(valid), 1)
    ranks = jnp.where(valid, rank_first, 0)  # invalid brands keep rank 0 (ref quirk)
    r1 = 100.0 * jnp.sum(ranks < 1) / brand_num
    r5 = 100.0 * jnp.sum(ranks < 5) / brand_num
    r10 = 100.0 * jnp.sum(ranks < 10) / brand_num

    medr = _masked_median_floor(rank_first, valid)
    meanr = jnp.floor(jnp.sum(jnp.where(valid, rank_first, 0)) / vcnt)
    mean = lambda x: jnp.sum(jnp.where(valid, x, 0.0)) / vcnt
    return RankingMetrics(
        medr=medr, meanr=meanr,
        auc=mean(auc), ndcg10=mean(ndcg10), ndcg50=mean(ndcg50),
        r1=r1, r5=r5, r10=r10,
    )


# ---------------------------------------------------------------------------
# sharded kernel: exact metrics without gathering the (B, N) matrix
# ---------------------------------------------------------------------------


def _searchsorted_rows(sorted_rows: jnp.ndarray, row_ids: jnp.ndarray,
                       queries: jnp.ndarray) -> jnp.ndarray:
    """count of entries < query in sorted_rows[row_ids[i]] for each query.

    Batched bisect_left with a per-query row: jnp.searchsorted cannot
    index a different row per query, so run the binary search manually on
    the flattened table (log2(n) rounds of N gathers -- the TPU-friendly
    alternative to materializing an (N, n) comparison)."""
    n = sorted_rows.shape[1]
    flat = sorted_rows.reshape(-1)
    base = row_ids.astype(jnp.int32) * n
    lo = jnp.zeros_like(base)
    hi = jnp.full_like(base, n)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = flat[base + jnp.minimum(mid, n - 1)]
        right = (v < queries) & (lo < hi)
        return (jnp.where(right, mid + 1, lo),
                jnp.where(right | (lo >= hi), hi, mid))

    steps = max(1, int(n).bit_length())
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _same_label_strictly_below(labels: jnp.ndarray,
                               vals: jnp.ndarray) -> jnp.ndarray:
    """For each i: count of j with labels[j]==labels[i] and vals[j]<vals[i].

    One (label, val) co-sort + segment arithmetic; labels < 0 are ignored
    by the caller (their counts are meaningless but well-defined)."""
    n = vals.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    lab_s, val_s, idx_s = jax.lax.sort((labels, vals, idx), num_keys=2)
    seg_start = jnp.concatenate(
        [jnp.ones(1, bool), lab_s[1:] != lab_s[:-1]])
    pair_change = seg_start | jnp.concatenate(
        [jnp.ones(1, bool), val_s[1:] != val_s[:-1]])
    seg_first = jax.lax.cummax(jnp.where(seg_start, idx, 0))
    pair_first = jax.lax.cummax(jnp.where(pair_change, idx, 0))
    cnt_sorted = pair_first - seg_first       # strictly-below within segment
    return jnp.zeros(n, jnp.int32).at[idx_s].set(cnt_sorted.astype(jnp.int32))


def _sharded_brand_stats(scores_l: jnp.ndarray, brands_l: jnp.ndarray,
                         brand_num: int, axis_name: str):
    """Per-shard body (under shard_map): exact per-brand stats from the
    local (B, n_l) score block plus O(N) replicated vectors.

    Key identity: the only scores that can be POSITIVE for some brand are
    the N "diagonal" entries score[brands[i], i] -- one per post. Gather
    those (4 MB at 1M posts) instead of the (B, N) matrix (204 MB):
      neg_below(q, b) = all_below(q, row b) - same_brand_below(q)
    where all_below is a local binary-search count psum'd across shards
    and same_brand_below comes from one co-sort of the gathered diagonal.
    """
    n_l = scores_l.shape[1]
    shard = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    pad_l = brands_l < 0
    # local "diagonal": each post's score with its own brand
    d_l = scores_l[jnp.clip(brands_l, 0, brand_num - 1),
                   jnp.arange(n_l)]
    d_l = jnp.where(pad_l, -jnp.inf, d_l)
    d_g = jax.lax.all_gather(d_l, axis_name, tiled=True)        # (N,)
    l_g = jax.lax.all_gather(brands_l, axis_name, tiled=True)   # (N,)
    n_total = d_g.shape[0]
    valid_g = l_g >= 0

    # --- global per-brand positive counts and negative counts ---
    pos_cnt = jnp.bincount(jnp.clip(l_g, 0, brand_num - 1),
                           weights=valid_g.astype(jnp.float32),
                           length=brand_num)                    # (B,) f32
    n_valid = jnp.sum(valid_g)
    n_neg = n_valid.astype(jnp.float32) - pos_cnt               # (B,)

    # --- AUC: strict below-counts for every diagonal query ---
    # local rows sorted ascending with pads pushed to the top
    s_rows = jnp.where(pad_l[None, :], jnp.inf, scores_l)
    s_sorted = jnp.sort(s_rows, axis=1)                         # (B, n_l)
    all_below_l = _searchsorted_rows(
        s_sorted, jnp.clip(l_g, 0, brand_num - 1), d_g)         # (N,)
    all_below = jax.lax.psum(all_below_l, axis_name)            # global count
    pos_below = _same_label_strictly_below(l_g, d_g)            # replicated
    neg_below = (all_below - pos_below).astype(jnp.float32)
    ratio = jnp.where(
        valid_g,
        neg_below / jnp.maximum(n_neg[jnp.clip(l_g, 0, brand_num - 1)], 1.0),
        0.0)
    auc_sum = jnp.bincount(jnp.clip(l_g, 0, brand_num - 1),
                           weights=ratio, length=brand_num)
    auc = auc_sum / jnp.maximum(pos_cnt, 1.0)

    # --- first-positive rank: count entries ranked above the best
    # positive (strictly greater score, or equal score with a lower
    # global index -- stable-descending tie semantics). Segment max/min
    # scatters keep this O(N), never materializing a (B, N) mask ---
    brand_ids = jnp.arange(brand_num, dtype=jnp.int32)
    lab_c = jnp.clip(l_g, 0, brand_num - 1)
    p_star = jnp.full((brand_num,), -jnp.inf, jnp.float32).at[lab_c].max(
        jnp.where(valid_g, d_g, -jnp.inf))                      # (B,)
    is_star = valid_g & (d_g == p_star[lab_c])
    idx_star = jnp.full((brand_num,), n_total, jnp.int32).at[lab_c].min(
        jnp.where(is_star, jnp.arange(n_total, dtype=jnp.int32), n_total))
    gidx = shard * n_l + jnp.arange(n_l, dtype=jnp.int32)       # global idx
    live = (~pad_l)[None, :]
    ahead_l = (jnp.sum((scores_l > p_star[:, None]) & live, axis=1)
               + jnp.sum((scores_l == p_star[:, None]) & live
                         & (gidx[None, :] < idx_star[:, None]), axis=1))
    rank_first = jax.lax.psum(ahead_l, axis_name)               # (B,)

    # --- NDCG@10/50: local top-50 per row, cross-shard merge ---
    k = min(_NDCG_KMAX, n_l)
    top_v, top_i = jax.lax.top_k(jnp.where(pad_l[None, :], -jnp.inf,
                                           scores_l), k)        # (B, k)
    top_rel = (brands_l[top_i] == brand_ids[:, None])
    # guard: a -inf pad entry that sneaks into a short shard's top-k can
    # never be relevant (pads have label -1), rel already False
    vals_g = jax.lax.all_gather(top_v, axis_name)               # (S, B, k)
    rel_g = jax.lax.all_gather(top_rel, axis_name)
    vals_m = jnp.transpose(vals_g, (1, 0, 2)).reshape(brand_num, -1)
    rel_m = jnp.transpose(rel_g, (1, 0, 2)).reshape(brand_num, -1)
    kk = min(_NDCG_KMAX, vals_m.shape[1])
    _, merged_i = jax.lax.top_k(vals_m, kk)                     # shard-major ties
    rel50 = jnp.take_along_axis(rel_m, merged_i, axis=1).astype(jnp.float32)
    w10 = jnp.asarray(_dcg_weights(10), jnp.float32)
    w50 = jnp.asarray(_dcg_weights(_NDCG_KMAX), jnp.float32)
    r10p = rel50[:, :10]
    dcg10 = jnp.sum(r10p * w10[None, : r10p.shape[1]], axis=1)
    dcg50 = jnp.sum(rel50 * w50[None, : rel50.shape[1]], axis=1)
    c10, c50 = jnp.cumsum(w10), jnp.cumsum(w50)
    pc = pos_cnt.astype(jnp.int32)
    idcg10 = jnp.where(pc > 0, c10[jnp.clip(pc, 1, 10) - 1], 0.0)
    idcg50 = jnp.where(pc > 0, c50[jnp.clip(pc, 1, _NDCG_KMAX) - 1], 0.0)
    ndcg10 = jnp.where(idcg10 > 0, dcg10 / jnp.maximum(idcg10, 1e-30), 0.0)
    ndcg50 = jnp.where(idcg50 > 0, dcg50 / jnp.maximum(idcg50, 1e-30), 0.0)

    valid = pos_cnt > 0
    return valid, rank_first, auc, ndcg10, ndcg50


def ranking_metrics_sharded(scores, brands, brand_num: int, mesh,
                            axis_name: str = "data") -> RankingMetrics:
    """Exact distributed ranking metrics over a post-sharded score matrix.

    scores: (B, N) with N sharded over `axis_name` (N divisible by the
    shard count; pad posts labeled -1). Identical results to
    ranking_metrics_jax / the numpy oracle, but per-device memory and
    sort cost scale as N/shards: the full matrix is never gathered --
    only the N own-brand diagonal scores (plus per-shard top-50 blocks
    and psum'd count vectors) cross shards.
    """
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def run(scores, brands):
        return jax.shard_map(
            lambda s, b: _sharded_brand_stats(s, b, brand_num, axis_name),
            mesh=mesh,
            in_specs=(P(None, axis_name), P(axis_name)),
            out_specs=P(),
            # outputs ARE replicated (all_gather + psum reductions), but
            # the static vma check cannot infer that through the gathers
            check_vma=False,
        )(scores, brands)

    stats = run(jnp.asarray(scores, jnp.float32),
                jnp.asarray(brands, jnp.int32))
    # final scalar assembly in f64 on host (5 tiny (B,) vectors): the
    # reference assembles in numpy f64, and under jit XLA rewrites f32
    # division-by-constant into reciprocal multiplies (r1 for 3/3 brands
    # came out nextafter(100.0))
    valid, rank_first, auc, ndcg10, ndcg50 = [np.asarray(x) for x in stats]
    vcnt = max(int(valid.sum()), 1)
    ranks = np.where(valid, rank_first, 0)
    mean = lambda x: float(np.sum(np.where(valid, x.astype(np.float64), 0.0))
                           / vcnt)
    return RankingMetrics(
        medr=float(np.floor(np.median(rank_first[valid]))
                   if valid.any() else 0.0),
        meanr=float(np.floor(np.sum(rank_first[valid]) / vcnt)),
        auc=mean(auc), ndcg10=mean(ndcg10), ndcg50=mean(ndcg50),
        r1=100.0 * int((ranks < 1).sum()) / brand_num,
        r5=100.0 * int((ranks < 5).sum()) / brand_num,
        r10=100.0 * int((ranks < 10).sum()) / brand_num,
    )
