"""IVF-Flat approximate retrieval (serving/ivf.py).

Beyond-parity serving component (the reference has no ANN; its tester
re-scores every post every run, reference tester.py:106-113). Contracts
under test: balanced packing is a lossless permutation, nprobe=nlist
equals exact brute force, recall on clustered data is high at small
nprobe, and int8 matches the ops/similarity quantization contract.
"""

import numpy as np
import pytest

from fancyrec_tpu.serving.ivf import (
    IVFIndex, _select_donors, balanced_assign, spherical_kmeans)


def _clustered(n=4000, d=32, n_clusters=16, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(n_clusters, d) * 3.0
    lab = rng.randint(0, n_clusters, n)
    return (means[lab] + rng.randn(n, d)).astype(np.float32)


def _exact_topk(embs, q, k):
    en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    s = en @ (q / np.linalg.norm(q))
    return np.argsort(-s, kind="stable")[:k]


def test_kmeans_clusters_separate_data():
    x = _clustered()
    cents = np.asarray(spherical_kmeans(x, nlist=16, iters=8, seed=1))
    assert cents.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0,
                               atol=1e-5)
    # assignment must give a decent spread (no single mega-cluster)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    a = np.argmax(xn @ cents.T, axis=1)
    assert len(np.unique(a)) >= 8
    assert np.bincount(a, minlength=16).max() < len(x) * 0.5


def test_kmeans_iters_zero_returns_init_centroids():
    """iters=0 means 'init centroids, unrefined'. Regression: capacity
    refinement used to dereference the (None) Lloyd counts and crash with
    a TypeError -- and IVFIndex.build always passes cap_target, so every
    iters=0 build hit it."""
    x = _clustered(n=300, d=16, n_clusters=4)
    cents = np.asarray(spherical_kmeans(x, nlist=8, iters=0, seed=1,
                                        cap_target=50))
    assert cents.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0,
                               atol=1e-5)
    ivf = IVFIndex.build(x, nlist=8, iters=0, seed=1)   # end-to-end path
    assert ivf.packed_idx.shape[0] == 8


def test_kmeanspp_init_covers_orthogonal_topics():
    """Seeding is D^2 (k-means++/||), not uniform row draws: on tight
    near-orthogonal topic blobs, coverage is decided at init (Lloyd has
    no gradient across an orthogonal gap). With nlist == n_topics a
    mass-proportional draw leaves ~1/e of the topics seedless (Poisson);
    D^2 must seed essentially all of them. This is the 4M probe's
    recall mechanism in miniature (tools/ivf_probe_rank.py: missed
    neighbors all belonged to topics with zero aligned lists)."""
    nc, per, d = 64, 32, 64
    rng = np.random.RandomState(3)
    centers = rng.randn(nc, d).astype(np.float32)
    x = (centers[:, None, :]
         + 0.5 * rng.randn(nc, per, d).astype(np.float32)
         ).reshape(-1, d)
    # iters=0 returns the seeds themselves
    seeds = np.asarray(spherical_kmeans(x, nlist=nc, iters=0, seed=0))
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    covered = int(((seeds @ cn.T) > 0.6).any(axis=0).sum())
    assert covered >= nc - 2, covered
    # and a full build keeps every topic probeable at tiny nprobe
    ivf = IVFIndex.build(x, nlist=nc, iters=6, seed=0)
    cents = np.asarray(ivf.centroids)
    assert int(((cents @ cn.T) > 0.6).any(axis=0).sum()) >= nc - 2


def test_select_donors_redundancy_gate_and_protection():
    """The refinement may only donate clusters whose members have a
    close absorber, and never the absorber itself (nor a cluster whose
    absorber already left) in the same round -- the rules that stop one
    round from draining every list of a region (the 4M-measured
    stranding spiral)."""
    counts = np.array([10, 10, 10, 10, 200])
    cap_target = 50.0          # light line at 45: lists 0-3 are light
    maxcos = np.array([0.9, 0.9, 0.1, 0.8, 0.5])
    sib = np.array([1, 0, 4, 0, 0])
    donors = _select_donors(counts, cap_target, maxcos, sib)
    # 0 donates and protects its absorber 1; 2 is sole coverage (below
    # the redundancy floor); 3's absorber 0 already moved this round
    assert donors == [0]

    # mutual siblings: exactly one of the pair may leave per round
    counts = np.array([5, 6, 300])
    maxcos = np.array([0.95, 0.95, 0.2])
    sib = np.array([1, 0, 0])
    assert _select_donors(counts, 50.0, maxcos, sib) == [0]


def test_balanced_assign_respects_capacity():
    rng = np.random.RandomState(0)
    choices = rng.randint(0, 8, (100, 3))
    cap = 15
    a = balanced_assign(choices, nlist=8, cap=cap)
    assert (a >= 0).all()
    assert np.bincount(a, minlength=8).max() <= cap
    # posts keep one of their choices when capacity allows
    first_choice_kept = (a == choices[:, 0]).mean()
    assert first_choice_kept > 0.5


def test_balanced_assign_overflow_errors():
    with pytest.raises(AssertionError):
        balanced_assign(np.zeros((10, 2), np.int64), nlist=3, cap=3)


def test_packing_is_lossless_permutation():
    x = _clustered(n=500, d=16, n_clusters=8)
    idx = IVFIndex.build(x, nlist=8, iters=4).packed_idx
    filled = np.asarray(idx).reshape(-1)
    filled = filled[filled >= 0]
    assert sorted(filled.tolist()) == list(range(500))


def test_full_probe_equals_exact():
    """nprobe == nlist scores every post: top-k must equal brute force."""
    x = _clustered(n=1000, d=24, n_clusters=8, seed=3)
    ivf = IVFIndex.build(x, nlist=8, iters=5, seed=0)
    rng = np.random.RandomState(7)
    for _ in range(5):
        q = rng.randn(24).astype(np.float32)
        vals, idxs = ivf.query(q, k=10, nprobe=8)
        exact = _exact_topk(x, q, 10)
        # scores strictly ordered -> same set; ties are measure-zero
        assert set(idxs[0].tolist()) == set(exact.tolist())
        en = x / np.linalg.norm(x, axis=1, keepdims=True)
        want = en[idxs[0]] @ (q / np.linalg.norm(q))
        np.testing.assert_allclose(vals[0], want, atol=1e-5)


def test_recall_at_small_nprobe():
    """Clustered data: probing 4/32 clusters keeps recall@10 high."""
    x = _clustered(n=8000, d=32, n_clusters=24, seed=1)
    ivf = IVFIndex.build(x, nlist=32, iters=8, seed=0)
    rng = np.random.RandomState(2)
    hits = tot = 0
    for _ in range(20):
        q = (x[rng.randint(len(x))]
             + 0.1 * rng.randn(32)).astype(np.float32)  # near-post query
        _, idxs = ivf.query(q, k=10, nprobe=4)
        exact = set(_exact_topk(x, q, 10).tolist())
        hits += len(exact & set(idxs[0].tolist()))
        tot += 10
    assert hits / tot >= 0.9, hits / tot


def test_int8_mode_close_to_f32():
    x = _clustered(n=2000, d=32, n_clusters=8, seed=5)
    f32 = IVFIndex.build(x, nlist=8, iters=5, seed=0)
    q8 = IVFIndex.build(x, nlist=8, iters=5, seed=0, quantize="int8")
    assert q8.packed.dtype == np.int8
    rng = np.random.RandomState(1)
    q = rng.randn(32).astype(np.float32)
    v32, i32 = f32.query(q, k=10, nprobe=8)
    v8, i8 = q8.query(q, k=10, nprobe=8)
    # ~1e-3 rounding: same leading results, scores close
    assert len(set(i32[0][:5].tolist()) & set(i8[0].tolist())) >= 4
    np.testing.assert_allclose(v8[0], v32[0], atol=5e-3)


def test_batched_queries_and_k_padding():
    x = _clustered(n=300, d=16, n_clusters=4, seed=2)
    ivf = IVFIndex.build(x, nlist=64, cap=8, iters=3)
    # a query reaches (nprobe + overflow_lists) * cap slots at most;
    # ask for more so the tail must be -inf / -1 padding
    probed = (2 + ivf.overflow_lists) * ivf.cap
    k = probed + 8
    qs = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    vals, idxs = ivf.query(qs, k=k, nprobe=2)
    assert vals.shape == (3, k) and idxs.shape == (3, k)
    assert np.isneginf(vals[:, probed:]).all()
    assert (idxs[:, probed:] == -1).all()
    # the probed clusters hold a handful of 300 posts: at least a few
    # real hits, never a fabricated id in the -inf tail
    assert np.isfinite(vals[:, :3]).all()
    assert (idxs[np.isneginf(vals)] == -1).all()


def test_chunked_build_bit_identical_to_monolithic():
    """build_chunked (the streamed path used by fancyrec-index ivf-build)
    must produce byte-identical centroids/packed/packed_idx/inv_norms to
    the monolithic build when k-means sees the full corpus: quantization
    is per-row, slot assignment is the same host math, and the scatter
    writes the same bytes -- for both int8 and f32 modes, with a chunk
    size that does not divide the row count."""
    x = _clustered(n=3001, d=32, n_clusters=8, seed=5)

    for quant in ("int8", ""):
        mono = IVFIndex.build(x, nlist=8, iters=4, seed=3, quantize=quant)
        chunked = IVFIndex.build_chunked(
            lambda lo, hi: x[lo:hi], len(x), 32, nlist=8, iters=4, seed=3,
            quantize=quant, chunk=512, train_rows=1 << 20)
        np.testing.assert_array_equal(np.asarray(mono.centroids),
                                      np.asarray(chunked.centroids))
        np.testing.assert_array_equal(np.asarray(mono.packed),
                                      np.asarray(chunked.packed))
        np.testing.assert_array_equal(np.asarray(mono.packed_idx),
                                      np.asarray(chunked.packed_idx))
        if quant == "int8":
            np.testing.assert_array_equal(np.asarray(mono.inv_norms),
                                          np.asarray(chunked.inv_norms))
        else:
            assert mono.inv_norms is None and chunked.inv_norms is None


def test_chunked_build_small_corpus_large_chunk():
    """chunk > n with a k-means subsample threshold between them must not
    empty the training sample (regression: range(0, n - chunk + 1) was
    empty and np.concatenate([]) raised)."""
    x = _clustered(n=600, d=16, n_clusters=4, seed=7)
    ivf = IVFIndex.build_chunked(
        lambda lo, hi: x[lo:hi], len(x), 16, nlist=4, iters=3,
        quantize="int8", chunk=1024, train_rows=500)
    vals, idxs = ivf.query(x[5][None], k=3, nprobe=4)
    assert (idxs[0] >= 0).all() and idxs[0][0] == 5


def test_chunked_build_subsampled_kmeans_still_exact_scoring():
    """With a k-means training subsample (the >train_rows regime) the
    centroids differ from the monolithic build, but scoring stays exact
    over the probed subset: full-probe query == exact brute force."""
    x = _clustered(n=4000, d=32, n_clusters=16, seed=6)
    ivf = IVFIndex.build_chunked(
        lambda lo, hi: x[lo:hi], len(x), 32, nlist=8, iters=4, seed=0,
        quantize="", chunk=1000, train_rows=2000)
    q = x[123]
    vals, idxs = ivf.query(q[None], k=5, nprobe=8)    # probe everything
    expect = _exact_topk(x, q, 5)
    assert list(idxs[0]) == list(expect)


def test_chunked_kmeans_sample_honors_train_rows():
    """The k-means training sample must cover (at least) the requested
    train_rows (regression: floor'd chunk count trained on as little as
    half the requested sample, e.g. 500k -> one 262144-row chunk)."""
    x = _clustered(n=3000, d=16, n_clusters=8, seed=9)
    calls = []

    def src(lo, hi):
        calls.append((lo, hi))
        return x[lo:hi]

    IVFIndex.build_chunked(src, len(x), 16, nlist=8, iters=2,
                           quantize="", chunk=400, train_rows=1000)
    # the k-means sample reads are every call before the per-row choices
    # stream restarts at row 0
    train_calls = []
    for i, c in enumerate(calls):
        if i > 0 and c[0] == 0:
            break
        train_calls.append(c)
    assert sum(hi - lo for lo, hi in train_calls) >= 1000


def _skewed(n=12000, d=32, n_topics=12, seed=0, zipf=1.0):
    """Topic-clustered corpus with a power-law topic-size skew: the
    hot-topic regime where plain Lloyd k-means under-allocates centroids
    and packed capacity overflows (the 4M-probe recall ceiling)."""
    rng = np.random.RandomState(seed)
    w = (1.0 / np.arange(1, n_topics + 1) ** zipf)
    sizes = np.maximum(1, (w / w.sum() * n).astype(int))
    means = rng.randn(n_topics, d) * 4.0
    rows = np.concatenate([
        means[t] + rng.randn(s, d) for t, s in enumerate(sizes)])
    return rows.astype(np.float32), sizes


def test_capacity_refine_splits_hot_clusters():
    """spherical_kmeans with cap_target must leave no cluster holding
    more posts than the packed capacity on a zipf-skewed corpus (plain
    Lloyd leaves the head topic several times over capacity)."""
    x, _ = _skewed()
    nlist, cap = 48, 352             # ample total capacity, tight per list
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    plain = np.asarray(spherical_kmeans(x, nlist, iters=8, seed=0))
    c_plain = np.bincount(np.argmax(xn @ plain.T, 1), minlength=nlist)
    assert c_plain.max() > cap       # the problem is real on this corpus

    refined = np.asarray(spherical_kmeans(x, nlist, iters=8, seed=0,
                                          cap_target=cap))
    c_ref = np.bincount(np.argmax(xn @ refined.T, 1), minlength=nlist)
    assert c_ref.max() <= cap, c_ref.max()


def test_overflow_pool_keeps_spilled_posts_searchable():
    """Force heavy spill (1 centroid choice, tight capacity): spilled
    posts land in always-probed overflow lists and remain findable at
    nprobe=1 -- the spill fraction costs latency, never recall."""
    x, _ = _skewed(n=3000, d=16, n_topics=4, seed=2)
    # nlist*cap barely covers n and only 1 choice: spill is guaranteed
    # even after refinement (per-cluster argmax counts != packed caps)
    ivf = IVFIndex.build(x, nlist=8, cap=416, iters=4, n_choices=1)
    assert ivf.spill_frac > 0, "fixture must actually spill"
    assert ivf.overflow_lists >= 1
    # every post is packed exactly once (overflow included)
    filled = np.asarray(ivf.packed_idx).reshape(-1)
    assert sorted(filled[filled >= 0].tolist()) == list(range(len(x)))
    # querying AT a spilled post finds it even at the minimum probe count
    spilled = np.asarray(ivf.packed_idx)[8:].reshape(-1)
    spilled = spilled[spilled >= 0]
    for pid in spilled[:20]:
        _, idxs = ivf.query(x[pid][None], k=1, nprobe=1)
        assert idxs[0][0] == pid


def test_balanced_assign_overflow_mode():
    rng = np.random.RandomState(0)
    choices = rng.randint(0, 4, (100, 2))
    a = balanced_assign(choices, nlist=4, cap=10, spill="overflow")
    # real lists respect capacity; the rest went to virtual overflow ids
    real = a[a < 4]
    assert np.bincount(real, minlength=4).max() <= 10
    over = a[a >= 4]
    assert over.size == 100 - real.size
    # overflow ids are dense, cap posts per list
    assert over.min() == 4 and np.bincount(over - 4).max() <= 10


def _uniform_topics(nc=64, per=286, d=64, seed=0):
    """UNIFORM-topic corpus at the 4M probe's capacity tightness
    (packed cap / mean cluster count = 1.30). This is the geometry where
    the original `< cap_target/2` donor rule starved: counts bunch
    around the mean (~77% of target), so no cluster sits below half
    target and the capacity refinement silently stalled -- the 4M probe
    measured recall@10 stuck at 0.775 @ nprobe 128 (zipf-skewed corpora
    never trip this: their tail topics are natural donors)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(nc, d).astype(np.float32)
    x = (centers[:, None, :]
         + 0.5 * rng.randn(nc, per, d).astype(np.float32)).reshape(-1, d)
    return x, centers


def test_uniform_corpus_recall_bar():
    """Donor-starvation regression: uniform topics, ~3.9 centroids per
    topic, cap only 1.30x the mean cluster count. The lightest-first
    0.9-target donor rule must keep recall@10 >= 0.95 at an nprobe
    fraction matching the 4M probe's 128/3968."""
    x, centers = _uniform_topics()
    nlist = 248
    ivf = IVFIndex.build(x, nlist=nlist, iters=8, seed=0)
    assert ivf.cap / (len(x) / nlist) < 1.35, "fixture drifted loose"
    rng = np.random.RandomState(7)
    hits = tot = 0
    for _ in range(40):
        q = (centers[rng.randint(len(centers))]
             + 0.5 * rng.randn(x.shape[1])).astype(np.float32)
        exact = set(_exact_topk(x, q, 10).tolist())
        _, idx = ivf.query(q, k=10, nprobe=8)       # ~128/3968 of nlist
        hits += len(exact & set(idx[0].tolist()))
        tot += 10
    assert hits / tot >= 0.95, hits / tot


def test_skewed_corpus_recall_bar():
    """The round-3 probe's failure mode in miniature: zipf topic skew,
    topology-mismatched nlist, tight caps. With capacity-aware k-means +
    overflow lists, recall@10 at a small probe count must clear 0.95
    (the pre-fix design measured 0.80 at the equivalent probe fraction
    on the 4M corpus)."""
    x, _ = _skewed(n=16000, d=32, n_topics=24, seed=4, zipf=1.2)
    ivf = IVFIndex.build(x, nlist=64, iters=8, seed=0)
    # capacity-aware k-means leaves nothing to spill on this corpus
    assert ivf.spill_frac == 0.0, ivf.spill_frac
    rng = np.random.RandomState(5)
    hits8 = hits16 = tot = 0
    for _ in range(30):
        q = (x[rng.randint(len(x))] + 0.1 * rng.randn(32)).astype(
            np.float32)
        exact = set(_exact_topk(x, q, 10).tolist())
        _, i8 = ivf.query(q, k=10, nprobe=8)        # 1/8 of the lists
        _, i16 = ivf.query(q, k=10, nprobe=16)
        hits8 += len(exact & set(i8[0].tolist()))
        hits16 += len(exact & set(i16[0].tolist()))
        tot += 10
    assert hits8 / tot >= 0.95, hits8 / tot
    assert hits16 / tot >= 0.99, hits16 / tot


def test_save_load_roundtrip(tmp_path):
    x = _clustered(n=600, d=16, n_clusters=8)
    ivf = IVFIndex.build(x, nlist=8, iters=4, quantize="int8")
    # the staleness stamp is part of save()'s own meta: any save path --
    # including a user re-save through the public API -- must carry it
    ivf.source_posts = 600
    ivf.save(str(tmp_path / "ivf"))
    back = IVFIndex.load(str(tmp_path / "ivf"))
    assert back.source_posts == 600
    q = np.random.RandomState(3).randn(16).astype(np.float32)
    v1, i1 = ivf.query(q, k=5, nprobe=3)
    v2, i2 = back.query(q, k=5, nprobe=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    # a load -> re-save must not lose the stamp (it would be permanently
    # flagged stale by PostIndex.ivf())
    back.save(str(tmp_path / "ivf2"))
    assert IVFIndex.load(str(tmp_path / "ivf2")).source_posts == 600


# -- radius-aware probe ranking (VERDICT r4 #2 / ADVICE r4) --------------

def _unit(theta_deg, d=8):
    t = np.deg2rad(theta_deg)
    v = np.zeros(d, np.float32)
    v[0], v[1] = np.cos(t), np.sin(t)
    return v


def _wide_vs_tight_index():
    """Hand-built geometry where centroid-cosine probing provably loses:
    the query's true nearest neighbor sits on the FRINGE of one wide
    list (members spread 5..80 deg, centroid ~42 deg away from the
    query) while three tight lists (radius ~2 deg) park their centroids
    closer to the query (20/25/30 deg) but hold no member nearer than
    18 deg. Cosine ranks the tight centroids first and misses at
    nprobe=1; the reachability bound max(theta - r, 0) ranks the wide
    list first (42 - ~37 < 20 - 2). This is exactly the miss mode the
    4M diagnosis attributed (tools/ivf_diag4m.py): fringe members of
    wide topic-boundary lists."""
    cap, d = 16, 8
    lists, ids, next_id = [], [], 0

    wide = np.stack([_unit(a, d) for a in range(5, 85, 5)])   # 16 members
    lists.append(wide)
    ids.append(np.arange(next_id, next_id + 16))
    next_id += 16
    for i in range(3):
        c = -(20 + 5 * i)
        mem = np.stack([_unit(c + (2 if j % 2 else -2), d)
                        for j in range(8)])
        lists.append(np.concatenate(
            [mem, np.zeros((cap - 8, d), np.float32)]))
        ids.append(np.concatenate(
            [np.arange(next_id, next_id + 8), np.full(cap - 8, -1)]))
        next_id += 8
    # one empty list: compute_radii must give it radius 0, not nan
    lists.append(np.zeros((cap, d), np.float32))
    ids.append(np.full(cap, -1))

    packed = np.stack(lists)
    packed_idx = np.stack(ids).astype(np.int32)
    cents = np.zeros((5, d), np.float32)
    for i in range(4):
        m = packed[i][packed_idx[i] >= 0]
        cents[i] = m.mean(0) / np.linalg.norm(m.mean(0))
    cents[4, 2] = 1.0                       # empty list: point elsewhere
    ivf = IVFIndex(cents, packed, packed_idx)
    ivf.compute_radii()
    return ivf


def test_compute_radii_values():
    ivf = _wide_vs_tight_index()
    radii = np.asarray(ivf.radii)
    assert radii.shape == (5,)
    # wide list: members 5..80 deg, centroid ~42.5 deg -> widest member
    # ~37.5 deg from it (p95 of 16 members = the widest, index 0)
    assert np.deg2rad(30) < radii[0] < np.deg2rad(45)
    # tight lists: all members within 2 deg of the centroid
    assert np.all(radii[1:4] < np.deg2rad(4))
    assert radii[4] == 0.0                  # empty list, not nan


def test_bound_probe_beats_cosine_on_wide_lists():
    ivf = _wide_vs_tight_index()
    q = _unit(0.0)                          # true NN: wide member at 5 deg
    vb, ib = ivf.query(q, k=1, nprobe=1, probe="bound")
    vc, ic = ivf.query(q, k=1, nprobe=1, probe="cosine")
    assert ib[0, 0] == 0                    # bound probes the wide list
    assert ic[0, 0] != 0                    # cosine probes a tight list
    assert vb[0, 0] > vc[0, 0]              # and returns a worse neighbor
    # cosine is the production default even with radii present (the 4M
    # A/B pinned it: bound loses at nprobe 64 and costs 1.4x latency)
    vd, idx_d = ivf.query(q, k=1, nprobe=1)
    np.testing.assert_array_equal(idx_d, ic)
    # probing everything recovers exactness in both modes
    for mode in ("bound", "cosine"):
        _, i_all = ivf.query(q, k=1, nprobe=ivf.nlist, probe=mode)
        assert i_all[0, 0] == 0


def test_probe_mode_validation():
    ivf = _wide_vs_tight_index()
    with pytest.raises(ValueError, match="probe must be"):
        ivf.query(_unit(0.0), k=1, nprobe=1, probe="euclid")
    ivf.radii = None
    with pytest.raises(ValueError, match="legacy sidecar"):
        ivf.query(_unit(0.0), k=1, nprobe=1, probe="bound")


def test_legacy_sidecar_without_radii_falls_back_to_cosine(tmp_path):
    """A sidecar saved before radii existed (no radii.npy) must load and
    query in cosine mode; compute_radii() upgrades it in place and a
    re-save persists the radii."""
    import os

    x = _clustered(n=600, d=16, n_clusters=8)
    ivf = IVFIndex.build(x, nlist=8, iters=4, quantize="int8")
    assert ivf.radii is not None            # production builds carry radii
    path = str(tmp_path / "ivf")
    ivf.save(path)
    os.remove(os.path.join(path, "radii.npy"))

    legacy = IVFIndex.load(path)
    assert legacy.radii is None
    q = np.random.RandomState(3).randn(16).astype(np.float32)
    v_leg, i_leg = legacy.query(q, k=5, nprobe=8)      # nprobe=nlist: exact
    v_cos, i_cos = ivf.query(q, k=5, nprobe=8, probe="cosine")
    np.testing.assert_array_equal(i_leg, i_cos)
    with pytest.raises(ValueError, match="legacy sidecar"):
        legacy.query(q, k=5, nprobe=2, probe="bound")

    legacy.compute_radii()
    np.testing.assert_allclose(np.asarray(legacy.radii),
                               np.asarray(ivf.radii), atol=1e-5)
    path2 = str(tmp_path / "ivf2")
    legacy.save(path2)
    assert os.path.exists(os.path.join(path2, "radii.npy"))
    assert IVFIndex.load(path2).radii is not None


def test_sharded_query_matches_single_device_exactly():
    """Packed lists sharded over the 8-device mesh (shard_to_mesh) must
    return EXACTLY the single-device ranking at every nprobe and in both
    probe modes: the probe set is replicated (same centroid math on
    every device), per-list scoring is identical arithmetic, and the
    all-gather merge is lossless (each post lives in exactly one list).
    This is the capacity-scaling mode for corpora past single-chip HBM;
    list counts deliberately do NOT divide 8 so the pad path runs."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh

    x = _clustered(n=1500, d=32, n_clusters=12, seed=5)
    q = x[[3, 77, 512]] + 0.01
    mesh = build_mesh("8,1")
    for quant in ("int8", ""):
        ivf = IVFIndex.build(x, nlist=10, iters=5, quantize=quant)
        base = {npb: ivf.query(q, k=7, nprobe=npb) for npb in (2, 5, 10)}
        base_bound = ivf.query(q, k=7, nprobe=3, probe="bound")

        assert ivf.shard_to_mesh(mesh) is ivf
        assert ivf.packed_idx.shape[0] % 8 == 0      # padded to multiple
        for npb, (bv, bi) in base.items():
            sv, si = ivf.query(q, k=7, nprobe=npb)
            np.testing.assert_array_equal(si, bi)
            np.testing.assert_allclose(sv, bv, rtol=0, atol=1e-6)
        sv, si = ivf.query(q, k=7, nprobe=3, probe="bound")
        np.testing.assert_array_equal(si, base_bound[1])
        np.testing.assert_allclose(sv, base_bound[0], rtol=0, atol=1e-6)


def test_sharded_query_k_past_pool_pads():
    """k larger than the probed candidate pool pads with -inf/-1 in the
    sharded kernel exactly like the single-device one."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh

    x = _clustered(n=96, d=16, n_clusters=3, seed=7)
    ivf = IVFIndex.build(x, nlist=3, iters=3)
    k = int(ivf.cap) * (1 + ivf.overflow_lists) + 5   # past one probe's pool
    bv, bi = ivf.query(x[:2], k=k, nprobe=1)
    ivf.shard_to_mesh(build_mesh("8,1"))
    sv, si = ivf.query(x[:2], k=k, nprobe=1)
    np.testing.assert_array_equal(si, bi)
    np.testing.assert_allclose(sv, bv, rtol=0, atol=1e-6)
    assert np.isneginf(sv[:, -1]).all() and (si[:, -1] == -1).all()
