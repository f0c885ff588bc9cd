"""Serving index: build from a trained checkpoint, query top-k posts."""

import json
import os

import numpy as np
import pytest

from fancyrec_tpu.serving.index import PostIndex, build_index, main as index_main
from fancyrec_tpu.utils.fixture import make_fixture
from fancyrec_tpu.train import trainer
from tests.test_e2e import COMMON_ARGS


@pytest.mark.slow
def test_build_and_query_index(tmp_path, capsys):
    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "srv_run",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
    ])
    ckpt = os.path.join(root, "model", "srv_run", "model_best.pth.tar")
    idx_dir = str(tmp_path / "index")
    n = build_index(ckpt, root, "insCartest", idx_dir, batch_size=4)
    assert n == 24

    index = PostIndex(idx_dir)
    assert index.meta["n_posts"] == 24
    vals, names = index.query([0, 1, 2], k=5)
    assert vals.shape == (3, 5)
    assert all(len(row) == 5 for row in names)
    # scores descending
    assert (np.diff(vals, axis=1) <= 1e-6).all()
    # the model trained to near-perfect retrieval: each brand's top hits
    # should mostly belong to that brand
    brands = index.brands
    name2brand = {cid: int(b) for cid, b in zip(index.cap_ids, brands)}
    hits = sum(name2brand[names[b][0]] == b for b in range(3))
    assert hits >= 2

    # a rebuild into the same dir must remove any int8 sidecar cache:
    # mtime ordering alone cannot detect a same-mtime rebuild with an
    # unchanged row count, so a fresh build starts with no cache
    qpath = os.path.join(idx_dir, "feature.int8.bin")
    ipath = os.path.join(idx_dir, "inv_norms.npy")
    with open(qpath, "wb") as f:
        f.write(b"\x01" * (24 * index.meta["dim"]))
    np.save(ipath, np.ones(24, np.float32))
    build_index(ckpt, root, "insCartest", idx_dir, batch_size=4)
    assert not os.path.exists(qpath)
    assert not os.path.exists(ipath)

    # CLI query path
    capsys.readouterr()  # flush earlier training output
    index_main(["query", idx_dir, "--brands", "0,2", "--k", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(line) for line in out]
    assert recs[0]["brand"] == 0 and len(recs[0]["results"]) == 3

    # bucketed builds: a checkpoint carrying train-time bucket config
    # routes the index encode through length-sorted loading + bucketed
    # dynamic padding (the tester wiring) -- rows land in the same
    # cap_id order (idxs scatter). Tolerance note, attributed by
    # bisection: bucket SLICING is ~5e-7 (reduction reassociation), but
    # changing the batch COMPOSITION alone (sort, identical static
    # shapes) moves trained-model outputs ~1.2e-4 -- the reference's own
    # semantics (its convs run over the zero-pad region up to the BATCH
    # max length, reference model.py:177-181 / data_provider.py:32-44,
    # so per-post embeddings depend on what shares the batch; replicated
    # for parity, models/encoders.py docstring). Zero-bias random init
    # shows exact equality, confirming the conv-bias mechanism.
    from fancyrec_tpu.io.bigfile import BigFileReader
    from fancyrec_tpu.train import checkpoints

    loaded = checkpoints.load_checkpoint(ckpt)
    bcfg = loaded["config"]
    bcfg.token_buckets, bcfg.frame_buckets = "4", "2"
    bcfg.length_grouped = True
    bcfg.finalize()
    bucket_ckpt = os.path.join(root, "model", "srv_run", "bucketed.pth.tar")
    checkpoints.save_checkpoint(
        bucket_ckpt, bcfg, loaded["model"]["params"],
        loaded["model"].get("batch_stats", {}), loaded["epoch"],
        loaded["best_rsum"], loaded["Eiters"])
    idx_bucketed = str(tmp_path / "index_bucketed")
    assert build_index(bucket_ckpt, root, "insCartest", idx_bucketed,
                       batch_size=4) == 24
    a = BigFileReader(idx_dir, delimiter="\t")
    b = BigFileReader(idx_bucketed, delimiter="\t")
    assert a.names == b.names
    np.testing.assert_allclose(a.read_rows(np.arange(24)),
                               b.read_rows(np.arange(24)), atol=1e-3)


def _toy_index(idx_dir, n_posts=100, dim=16, brand_num=4, seed=0):
    """Write a synthetic PostIndex directory (no training needed)."""
    from fancyrec_tpu.io.bigfile import BigFileWriter

    rng = np.random.RandomState(seed)
    embs = rng.randn(n_posts, dim).astype(np.float32)
    names = ["post%d#enc#0" % i for i in range(n_posts)]
    with BigFileWriter(idx_dir, ndims=dim, delimiter="\t") as w:
        w.write_batch(names, embs)
    np.save(os.path.join(idx_dir, "brands.npy"),
            rng.randint(0, brand_num, n_posts))
    np.save(os.path.join(idx_dir, "brand_embeddings.npy"),
            rng.randn(brand_num, dim).astype(np.float32))
    with open(os.path.join(idx_dir, "index_meta.json"), "w") as f:
        f.write(json.dumps({"collection": "toy", "checkpoint": "none",
                            "brand_num": brand_num, "dim": dim,
                            "n_posts": n_posts}))
    return embs


def test_query_is_jitted_and_cached(tmp_path):
    idx_dir = str(tmp_path / "toy")
    _toy_index(idx_dir)
    index = PostIndex(idx_dir)
    v1, n1 = index.query([0, 1], k=7)
    assert len(index._query_cache) == 1
    v2, n2 = index.query([0, 1], k=7)   # same signature: cache hit
    assert len(index._query_cache) == 1
    np.testing.assert_array_equal(v1, v2)
    assert n1 == n2
    index.query([0, 1], k=3)            # new k: new entry
    assert len(index._query_cache) == 2


def test_sharded_query_matches_single_device(tmp_path):
    """Posts sharded over the 8-device mesh (97 rows pad to 104) must
    return exactly the single-device ranking."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh

    idx_dir = str(tmp_path / "toy")
    _toy_index(idx_dir, n_posts=97)     # not divisible by 8: pads + masks
    single = PostIndex(idx_dir)
    sv, sn = single.query([0, 1, 2, 3], k=9)

    mesh = build_mesh("8,1")
    sharded = PostIndex(idx_dir, mesh=mesh)
    assert sharded.posts().shape[0] == 104  # padded to the shard multiple
    mv, mn = sharded.query([0, 1, 2, 3], k=9)
    np.testing.assert_allclose(mv, sv, atol=1e-5)
    assert mn == sn


def _separated_index(idx_dir, brand_num=4, winners=8, n_posts=400, dim=32,
                     seed=3):
    """Toy index with planted winners: each brand's top posts are scaled
    copies of its embedding + small noise, so top-k sets are robust to the
    int8 rounding error (clear score gaps)."""
    from fancyrec_tpu.io.bigfile import BigFileWriter

    rng = np.random.RandomState(seed)
    brand_embs = rng.randn(brand_num, dim).astype(np.float32)
    embs = rng.randn(n_posts, dim).astype(np.float32)
    for b in range(brand_num):
        for j in range(winners):
            embs[b * winners + j] = (brand_embs[b] * (1.0 + 0.1 * j)
                                     + 0.02 * rng.randn(dim))
    names = ["post%d#enc#0" % i for i in range(n_posts)]
    with BigFileWriter(idx_dir, ndims=dim, delimiter="\t") as w:
        w.write_batch(names, embs)
    np.save(os.path.join(idx_dir, "brands.npy"),
            rng.randint(0, brand_num, n_posts))
    np.save(os.path.join(idx_dir, "brand_embeddings.npy"), brand_embs)
    with open(os.path.join(idx_dir, "index_meta.json"), "w") as f:
        f.write(json.dumps({"collection": "toy", "checkpoint": "none",
                            "brand_num": brand_num, "dim": dim,
                            "n_posts": n_posts}))


def test_quantized_index_matches_f32_ranking(tmp_path):
    """quantize='int8' serves the same top-k sets as the f32 index on
    separated data, stores the index int8 on device, and shards."""
    import jax
    import jax.numpy as jnp
    import pytest

    idx_dir = str(tmp_path / "toy")
    _separated_index(idx_dir)
    f32 = PostIndex(idx_dir)
    fv, fn = f32.query([0, 1, 2, 3], k=8)

    q8 = PostIndex(idx_dir, quantize="int8")
    assert q8.posts().dtype == jnp.int8
    assert q8._posts_inv is not None
    qv, qn = q8.query([0, 1, 2, 3], k=8)
    for b in range(4):
        assert set(qn[b]) == set(fn[b])
    np.testing.assert_allclose(qv, fv, atol=2e-2)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the sharded variant")
    from fancyrec_tpu.parallel.mesh import build_mesh
    mesh = build_mesh("8,1")
    sharded = PostIndex(idx_dir, mesh=mesh, quantize="int8")
    assert sharded.posts().shape[0] == 400   # divisible: no pad rows
    sv, sn = sharded.query([0, 1, 2, 3], k=8)
    np.testing.assert_allclose(sv, qv, atol=1e-5)
    assert sn == qn


def test_fused_query_matches_matrix_path(tmp_path):
    """fused=True routes int8 queries through the Pallas fused
    score+top-k kernel (interpret mode off-TPU): the staged index pads to
    the kernel block ONCE at load, results match the matrix path exactly,
    and k > 128 falls back instead of failing."""
    import jax.numpy as jnp
    from fancyrec_tpu.serving import index as index_mod

    idx_dir = str(tmp_path / "toy")
    _separated_index(idx_dir)
    q8 = PostIndex(idx_dir, quantize="int8")
    qv, qn = q8.query([0, 1, 2, 3], k=8)

    fused = PostIndex(idx_dir, quantize="int8", fused=True)
    assert fused._fused_eligible()
    staged = fused.posts()
    assert staged.dtype == jnp.int8
    assert staged.shape[0] == index_mod._FUSED_BLOCK    # 400 padded up
    fv, fn = fused.query([0, 1, 2, 3], k=8)
    assert fn == qn
    np.testing.assert_allclose(fv, qv, rtol=1e-6)

    # k > the fused kernel's 128 cap: the same instance serves via the
    # padded-matrix fallback (pad rows masked by n_valid), filler None
    bv, bn = fused.query([0], k=129)
    mv, mn = q8.query([0], k=129)
    assert bn == mn
    np.testing.assert_allclose(
        np.where(np.isfinite(bv), bv, 0), np.where(np.isfinite(mv), mv, 0),
        atol=1e-6)


@pytest.mark.slow   # 8-device interpret-mode kernel over 64k staged rows
def test_fused_sharded_query_matches_single_device(tmp_path):
    """mesh + quantize=int8 + fused=True: capacity mode runs the fused
    Pallas kernel per shard (dynamic SMEM valid counts; staging pads each
    shard's slice to the kernel block) and must reproduce the
    single-device int8 matrix results."""
    import jax
    import jax.numpy as jnp
    from fancyrec_tpu.serving import index as index_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh

    idx_dir = str(tmp_path / "toy")
    _separated_index(idx_dir)
    q8 = PostIndex(idx_dir, quantize="int8")
    qv, qn = q8.query([0, 1, 2, 3], k=8)

    mesh = build_mesh("8,1")
    sf = PostIndex(idx_dir, mesh=mesh, quantize="int8", fused=True)
    assert sf._fused_eligible()
    staged = sf.posts()
    assert staged.dtype == jnp.int8
    # 400 rows pad so each of the 8 shards is one full kernel block
    assert staged.shape[0] == index_mod._FUSED_BLOCK * 8
    fv, fn = sf.query([0, 1, 2, 3], k=8)
    assert fn == qn
    np.testing.assert_allclose(fv, qv, rtol=1e-6)


def test_quantized_sidecar_cache(tmp_path, monkeypatch):
    """The on-disk int8 sidecar makes quantized reloads read 1 byte/elem:
    fresh instances load it without requantizing, appends extend it
    tail-only, and a newer feature.bin (rebuild) invalidates it."""
    import fancyrec_tpu.ops.similarity as sim
    from fancyrec_tpu.serving.index import append_to_index

    idx_dir = str(tmp_path / "toy")
    _separated_index(idx_dir, n_posts=96, dim=16)
    q8 = PostIndex(idx_dir, quantize="int8")
    v1, n1 = q8.query([0, 1], k=5)
    qpath = os.path.join(idx_dir, "feature.int8.bin")
    assert os.path.getsize(qpath) == 96 * 16
    assert np.load(os.path.join(idx_dir, "inv_norms.npy")).size == 96

    calls = {"n": 0}
    real = sim.quantize_rows_int8_np

    def counting(rows):
        calls["n"] += 1
        return real(rows)

    monkeypatch.setattr(sim, "quantize_rows_int8_np", counting)

    # a fresh instance reads the sidecar -- no requantization
    q8b = PostIndex(idx_dir, quantize="int8")
    v2, n2 = q8b.query([0, 1], k=5)
    assert calls["n"] == 0
    np.testing.assert_array_equal(v1, v2)
    assert n1 == n2

    # append keeps the sidecar in sync, quantizing only the new tail
    rng = np.random.RandomState(0)
    append_to_index(idx_dir, ["extra0"],
                    rng.randn(1, 16).astype(np.float32), [0])
    assert calls["n"] == 1
    assert os.path.getsize(qpath) == 97 * 16
    q8c = PostIndex(idx_dir, quantize="int8")
    assert calls["n"] == 1              # still served from the sidecar
    assert q8c.posts().shape[0] == 97

    # a rebuilt (newer) feature.bin invalidates the cache in full
    os.utime(os.path.join(idx_dir, "feature.bin"))
    PostIndex(idx_dir, quantize="int8")
    assert calls["n"] == 2


def test_incremental_append_and_refresh(tmp_path):
    """append_to_index adds rows without a rebuild; a refreshed PostIndex
    ranks old and new posts together, equal to a from-scratch index."""
    import pytest
    from fancyrec_tpu.serving.index import append_to_index

    rng = np.random.RandomState(7)
    idx_dir = str(tmp_path / "toy")
    old = _toy_index(idx_dir, n_posts=40, dim=16, seed=7)
    index = PostIndex(idx_dir)
    index.query([0, 1], k=5)  # populate caches pre-append

    new_embs = rng.randn(15, 16).astype(np.float32)
    new_names = ["new%d#enc#0" % i for i in range(15)]
    new_brands = rng.randint(0, 4, 15)
    total = append_to_index(idx_dir, new_names, new_embs, new_brands)
    assert total == 55

    index.refresh()
    assert index.n_posts == 55
    assert index.cap_ids[-1] == "new14#enc#0"
    np.testing.assert_array_equal(index.brands[-15:], new_brands)
    vals, names = index.query([0, 1, 2, 3], k=8)

    # equal to an index built from scratch over the same 55 rows
    full_dir = str(tmp_path / "full")
    from fancyrec_tpu.io.bigfile import BigFileWriter
    with BigFileWriter(full_dir, ndims=16, delimiter="\t") as w:
        w.write_batch(["post%d#enc#0" % i for i in range(40)], old)
        w.write_batch(new_names, new_embs)
    for aux in ("brands.npy", "brand_embeddings.npy", "index_meta.json"):
        import shutil
        shutil.copy(os.path.join(idx_dir, aux), os.path.join(full_dir, aux))
    fresh = PostIndex(full_dir)
    fvals, fnames = fresh.query([0, 1, 2, 3], k=8)
    np.testing.assert_allclose(vals, fvals, atol=1e-6)

    # duplicates and dim mismatches are rejected
    with pytest.raises(ValueError, match="duplicate"):
        append_to_index(idx_dir, ["new0#enc#0"], rng.randn(1, 16), [0])
    with pytest.raises(ValueError, match="dim mismatch"):
        append_to_index(idx_dir, ["x"], rng.randn(1, 8), [0])


def test_query_k_exceeding_posts_yields_none_filler(tmp_path):
    """k > n_posts: filler slots carry score -inf and name None -- the
    kernels pad indices with 0, which must not surface as a real cap_id."""
    idx_dir = str(tmp_path / "idx")
    _toy_index(idx_dir, n_posts=6)
    index = PostIndex(idx_dir)
    vals, names = index.query([0, 1], k=10)
    assert vals.shape == (2, 10)
    for vrow, nrow in zip(vals, names):
        assert np.isneginf(vrow[6:]).all()
        assert all(n is None for n in nrow[6:])
        assert all(n is not None for n in nrow[:6])


def test_ivf_sidecar_build_and_query(tmp_path, capsys):
    """ivf-build CLI + PostIndex.query(nprobe=...): full-probe equals the
    exact path; small-probe returns valid high-scoring posts."""
    from fancyrec_tpu.serving.index import build_ivf_sidecar

    idx_dir = str(tmp_path / "toy")
    _toy_index(idx_dir, n_posts=240, dim=16)
    info = build_ivf_sidecar(idx_dir, nlist=8, iters=5)
    assert info["posts"] == 240 and os.path.isdir(info["out"])

    index = PostIndex(idx_dir, device_resident=False)
    v_exact, n_exact = index.query([1], k=5)
    v_full, n_full = index.query([1], k=5, nprobe=8)     # probe everything
    assert n_full[0] == n_exact[0]
    np.testing.assert_allclose(v_full[0], v_exact[0], atol=1e-5)

    v_small, n_small = index.query([1], k=5, nprobe=2)
    assert all(n is not None for n in n_small[0])
    assert set(n_small[0]) <= set(index.cap_ids)
    # approximate top-1 still lands in the exact top-5 on toy data
    assert n_small[0][0] in n_exact[0]

    # CLI: ivf-build then query --nprobe
    capsys.readouterr()
    index_main(["ivf-build", idx_dir, "--nlist", "8"])
    index_main(["query", idx_dir, "--brands", "1", "--k", "3",
                "--nprobe", "2"])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["brand"] == 1 and len(rec["results"]) == 3

    # nprobe without a sidecar raises a pointed error
    bare = str(tmp_path / "bare")
    _toy_index(bare, n_posts=40, dim=16)
    import pytest
    with pytest.raises(ValueError, match="ivf-build"):
        PostIndex(bare, device_resident=False).query([0], k=3, nprobe=2)


def test_ivf_sidecar_staleness_guard(tmp_path):
    """The ANN sidecar's packed row indices point into the store it was
    built from: appending posts (or rebuilding the index) must make the
    nprobe path refuse with a rebuild hint, never silently serve stale
    rankings -- and the exact path must keep working throughout."""
    import pytest
    from fancyrec_tpu.serving.index import append_to_index, build_ivf_sidecar

    idx_dir = str(tmp_path / "toy")
    _toy_index(idx_dir, n_posts=120, dim=16)
    build_ivf_sidecar(idx_dir, nlist=4, iters=3)

    index = PostIndex(idx_dir, device_resident=False)
    index.query([0], k=3, nprobe=2)     # sidecar valid: works

    rng = np.random.RandomState(9)
    append_to_index(idx_dir, ["late0#enc#0"],
                    rng.randn(1, 16).astype(np.float32), [0])
    index.refresh()
    with pytest.raises(ValueError, match="stale"):
        index.query([0], k=3, nprobe=2)
    index.query([0], k=3)               # exact path unaffected
    # a fresh PostIndex over the same dir must detect it too (the check
    # is against on-disk metadata, not in-memory state)
    with pytest.raises(ValueError, match="stale"):
        PostIndex(idx_dir, device_resident=False).query([0], k=3, nprobe=2)

    # rebuilding the sidecar clears the staleness
    build_ivf_sidecar(idx_dir, nlist=4, iters=3)
    index.refresh()
    v, names = index.query([0], k=3, nprobe=4)
    assert all(n is not None for n in names[0])


def test_rebuild_removes_ivf_sidecar(tmp_path, monkeypatch):
    """build_index over an existing dir deletes the IVF sidecar: its row
    indices would address the OLD store's rows. Checkpoint load + encode
    are stubbed; the full write path (the part under test) runs."""
    import types

    import fancyrec_tpu.eval.evaluator as evaluator_mod
    import fancyrec_tpu.train.checkpoints as ckpt_mod
    from fancyrec_tpu.serving import index as index_mod
    from fancyrec_tpu.serving.index import build_ivf_sidecar

    idx_dir = str(tmp_path / "toy")
    _toy_index(idx_dir, n_posts=60, dim=16)
    build_ivf_sidecar(idx_dir, nlist=4, iters=3)
    assert os.path.isdir(os.path.join(idx_dir, "ivf"))

    rng = np.random.RandomState(3)
    cfg = types.SimpleNamespace(common_embedding_size=16, brand_num=4)
    new_embs = rng.randn(24, 16).astype(np.float32)

    monkeypatch.setattr(ckpt_mod, "load_any", lambda p: {"stub": True})
    monkeypatch.setattr(
        index_mod, "_encode_collection",
        lambda *a, **k: (["re%d#enc#0" % i for i in range(24)],
                         rng.randint(0, 4, 24), new_embs, cfg, None, None))
    monkeypatch.setattr(evaluator_mod, "brand_embeddings",
                        lambda model, params, n: rng.randn(n, 16))

    n = index_mod.build_index("stub.ckpt", "root", "coll", idx_dir)
    assert n == 24
    assert not os.path.exists(os.path.join(idx_dir, "ivf"))
    # the rebuilt index serves the NEW rows on the exact path
    fresh = PostIndex(idx_dir, device_resident=False)
    assert fresh.n_posts == 24 and fresh.cap_ids[0] == "re0#enc#0"


def test_append_writes_gated_to_primary(tmp_path, monkeypatch):
    """On a pod every process computes the append (collective encode) but
    only the primary may touch the shared filesystem -- a non-primary
    append_to_index must validate, return the new total, and write
    NOTHING (every-host appends would duplicate rows)."""
    import fancyrec_tpu.parallel.distributed as dist
    from fancyrec_tpu.serving.index import append_to_index

    idx_dir = str(tmp_path / "idx")
    _toy_index(idx_dir, n_posts=20, dim=16)
    before = {f: os.path.getsize(os.path.join(idx_dir, f))
              for f in os.listdir(idx_dir)}

    monkeypatch.setattr(dist, "is_primary", lambda: False)
    rng = np.random.RandomState(0)
    total = append_to_index(idx_dir, ["new0", "new1"],
                            rng.randn(2, 16).astype(np.float32),
                            np.array([0, 1], np.int32))
    assert total == 22   # the logical total every process agrees on
    after = {f: os.path.getsize(os.path.join(idx_dir, f))
             for f in os.listdir(idx_dir)}
    assert after == before   # nothing written off-primary

    # the primary path still writes
    monkeypatch.setattr(dist, "is_primary", lambda: True)
    total = append_to_index(idx_dir, ["new0", "new1"],
                            rng.randn(2, 16).astype(np.float32),
                            np.array([0, 1], np.int32))
    assert total == 22
    assert os.path.getsize(os.path.join(idx_dir, "feature.bin")) > \
        before["feature.bin"]


def test_ivf_sharded_sidecar_matches_single_device(tmp_path):
    """PostIndex with a mesh shards the IVF sidecar's packed lists over
    the devices (IVFIndex.shard_to_mesh) and the ANN route returns
    exactly the single-device ranking -- the capacity mode for indexes
    past single-chip HBM."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh
    from fancyrec_tpu.serving.index import build_ivf_sidecar

    idx_dir = str(tmp_path / "toy")
    _toy_index(idx_dir, n_posts=240, dim=16)
    build_ivf_sidecar(idx_dir, nlist=6, iters=5)

    single = PostIndex(idx_dir, device_resident=False)
    sv, sn = single.query([0, 1, 2], k=5, nprobe=3)

    sharded = PostIndex(idx_dir, device_resident=False,
                        mesh=build_mesh("8,1"))
    assert sharded.ivf().mesh is not None
    mv, mn = sharded.query([0, 1, 2], k=5, nprobe=3)
    assert mn == sn
    np.testing.assert_allclose(mv, sv, rtol=0, atol=1e-6)
