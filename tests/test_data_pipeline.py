import os

import numpy as np
import pytest

from fancyrec_tpu.data.dataset import PostDataset, load_info
from fancyrec_tpu.data.loader import BatchLoader, prefetch_to_device
from fancyrec_tpu.data.tokenizer import WordPieceTokenizer, write_minimal_bert_vocab
from fancyrec_tpu.io.bigfile import ImageBigFile
from fancyrec_tpu.io.dictfile import read_dict
from fancyrec_tpu.io.vocab import Bow2Vec, load_vocab
from fancyrec_tpu.utils.fixture import make_fixture


# ---------------------------------------------------------------------------
# tokenizer vs HF BertTokenizer (offline, local vocab)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wp_vocab(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "vocab.txt")
    words = ["the", "car", "drive", "##s", "##ing", "fast", "un", "##able",
             "road", "!", ",", "a", "red"]
    write_minimal_bert_vocab(path, words)
    return path


def test_wordpiece_matches_hf(wp_vocab):
    from transformers import BertTokenizer
    hf = BertTokenizer(wp_vocab, do_lower_case=True)
    ours = WordPieceTokenizer(wp_vocab)
    cases = [
        "The car drives fast",
        "a red car, driving!",
        "unable roads",
        "Unknownword here",
        "café driving",          # accent stripping
        "",
    ]
    for text in cases:
        want = hf.encode(text)
        got = ours.encode(text)
        assert got == want, (text, got, want)


def test_wordpiece_batch_padding(wp_vocab):
    ours = WordPieceTokenizer(wp_vocab)
    enc = ours.batch_encode(["the car", "a"], pad_to=10)
    assert enc["input_ids"].shape == (2, 10)
    assert enc["attention_mask"][0].sum() == 4  # [CLS] the car [SEP]
    assert enc["attention_mask"][1].sum() == 3
    assert enc["input_ids"][0, 4:].sum() == 0   # [PAD]=0


def test_wordpiece_truncation(wp_vocab):
    ours = WordPieceTokenizer(wp_vocab)
    ids = ours.encode("car " * 50, max_length=10)
    assert len(ids) == 10
    assert ids[0] == ours.cls_id and ids[-1] == ours.sep_id


# ---------------------------------------------------------------------------
# dataset + loader over the synthetic fixture
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("inscar"))
    info = make_fixture(root, brand_num=3, videos_per_brand=2,
                        imgs_per_brand=2, feat_dim=16, frames_per_video=4)
    return info


def _build_dataset(info, coll="insCartrain", **kw):
    root = info["root"]
    video_feat = ImageBigFile(os.path.join(root, coll, "FeatureData",
                                           info["video_feature"]))
    img_feat = ImageBigFile(os.path.join(root, coll, "FeatureData",
                                         info["img_feature"]))
    video2frames = read_dict(os.path.join(root, coll, "FeatureData",
                                          info["video_feature"],
                                          "video2frames.txt"))
    img_info, cls_info = load_info(root)
    bow_vocab = load_vocab(os.path.join(root, "insCartrain", "TextData",
                                        "vocabulary", "bow", "word_vocab_5.pkl"))
    rnn_vocab = load_vocab(os.path.join(root, "insCartrain", "TextData",
                                        "vocabulary", "rnn", "word_vocab_5.pkl"))
    tok = WordPieceTokenizer(info["bert_vocab"])
    cap_file = os.path.join(root, coll, "TextData", "%s.caption.txt" % coll)
    return PostDataset(cap_file, video_feat, img_feat, Bow2Vec(bow_vocab),
                       rnn_vocab=rnn_vocab, tokenizer=tok,
                       video2frames=video2frames, img_info=img_info,
                       cls_info=cls_info, max_frames=8, max_tokens=24,
                       max_words=16, **kw)


def test_dataset_resolves_brands_and_features(fixture_root):
    ds = _build_dataset(fixture_root)
    assert len(ds) == 3 * 2 + 3 * 2  # videos + images
    # brand ids span the 3 brands
    assert set(ds.brand_ids.tolist()) == {0, 1, 2}

    batch = ds.gather_batch(list(range(len(ds))))
    assert batch["frames"].shape == (12, 8, 16)
    assert batch["tokens"].shape == (12, 24)
    # video items have 4 frames, image items 1
    counts = sorted(set(batch["vmask"].sum(axis=1).tolist()))
    assert counts == [1.0, 4.0]
    # mean_origin equals mean of valid frames (all fit under the cap here)
    for bi in range(12):
        k = int(batch["vmask"][bi].sum())
        np.testing.assert_allclose(batch["origin"][bi],
                                   batch["frames"][bi, :k].mean(0), rtol=1e-5)
    # batch is sorted by caption length descending
    lens = [ds._caption_sort_key(i) for i in batch["idxs"]]
    assert lens == sorted(lens, reverse=True)
    # bows non-empty for every item (captions are vocab words)
    assert (batch["bows"].sum(axis=1) > 0).all()


def test_dataset_rnn_tokens(fixture_root):
    ds = _build_dataset(fixture_root, text_net="bi-gru")
    batch = ds.gather_batch([0, 1, 2])
    v = ds.rnn_vocab
    for bi in range(3):
        n = int(batch["tmask"][bi].sum())
        assert batch["tokens"][bi, 0] == v("<start>")
        assert batch["tokens"][bi, n - 1] == v("<end>")


def test_loader_epochs_and_padding(fixture_root):
    ds = _build_dataset(fixture_root)
    train = BatchLoader(ds, batch_size=5, shuffle=True, final_batch="drop")
    batches = list(train)
    assert len(batches) == len(ds) // 5
    order1 = [b["idxs"].tolist() for b in batches]
    order2 = [b["idxs"].tolist() for b in list(train)]
    assert order1 != order2  # reshuffled across epochs

    ev = BatchLoader(ds, batch_size=5, shuffle=False, final_batch="pad")
    batches = list(ev)
    assert len(batches) == (len(ds) + 4) // 5
    assert batches[-1]["frames"].shape[0] == 5      # padded to full size
    assert batches[-1]["n_valid"] == len(ds) % 5 or batches[-1]["n_valid"] == 5
    # all real indices appear exactly once across the epoch
    seen = [i for b in batches for i in b["idxs"][:].tolist()]
    assert set(range(len(ds))) <= set(seen)


def test_prefetch_to_device(fixture_root):
    ds = _build_dataset(fixture_root)
    loader = BatchLoader(ds, batch_size=4, final_batch="drop")
    out = list(prefetch_to_device(iter(loader), size=2))
    assert len(out) == len(loader)
    assert hasattr(out[0]["frames"], "devices")  # on-device arrays


def test_prefetch_is_deterministic(fixture_root):
    """The threaded prefetch path must yield byte-identical batches to the
    synchronous iteration (no race-dependent batch assembly)."""
    ds = _build_dataset(fixture_root)
    sync = [b for b in BatchLoader(ds, batch_size=4, shuffle=True, seed=7,
                                   final_batch="drop")]
    pre = list(prefetch_to_device(
        iter(BatchLoader(ds, batch_size=4, shuffle=True, seed=7,
                         final_batch="drop")), size=3))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_prefetch_propagates_producer_exception(fixture_root):
    """A mid-epoch IO failure in the producer thread must raise in the
    consumer instead of silently truncating the epoch."""
    import pytest

    ds = _build_dataset(fixture_root)
    loader = BatchLoader(ds, batch_size=4, final_batch="drop")

    def failing_iter():
        it = iter(loader)
        yield next(it)
        raise OSError("mmap gather failed mid-epoch")

    stream = prefetch_to_device(failing_iter(), size=2)
    next(stream)  # the batch before the failure still arrives
    with pytest.raises(OSError, match="mid-epoch"):
        for _ in stream:
            pass


def test_wordpiece_edge_cases_match_hf(wp_vocab):
    from transformers import BertTokenizer
    hf = BertTokenizer(wp_vocab, do_lower_case=True)
    ours = WordPieceTokenizer(wp_vocab)
    cases = [
        "汽车 drives fast",          # CJK chars -> per-char tokens ([UNK] here)
        "!!!",                        # punctuation only
        "CAR\tfast\ncar",            # control whitespace
        "a" * 150,                    # > max_chars_per_word -> [UNK]
        "don't stop",                # apostrophe splitting
    ]
    for text in cases:
        assert ours.encode(text) == hf.encode(text), text


def test_prefetch_stage_on_consumer(fixture_root):
    """stage_on_consumer moves device_put to the consumer thread (the
    multi-process-safe mode): the device_put callable must run on the
    MAIN thread, yield identical batches, and still propagate errors."""
    import threading

    ds = _build_dataset(fixture_root)
    main = threading.get_ident()
    put_threads = []

    def tracking_put(batch):
        put_threads.append(threading.get_ident())
        return batch

    base = [b for b in BatchLoader(ds, batch_size=4, final_batch="drop")]
    out = list(prefetch_to_device(
        iter(BatchLoader(ds, batch_size=4, final_batch="drop")),
        size=2, device_put=tracking_put, stage_on_consumer=True))
    assert len(out) == len(base)
    assert put_threads and all(t == main for t in put_threads)
    for a, b in zip(base, out):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    # default mode stages on the producer thread (overlap) -- guard the
    # distinction so a refactor doesn't silently serialize everything
    put_threads.clear()
    list(prefetch_to_device(
        iter(BatchLoader(ds, batch_size=4, final_batch="drop")),
        size=2, device_put=tracking_put))
    assert put_threads and all(t != main for t in put_threads)


def test_process_sharded_loader_slices_match_global(fixture_root):
    """Multi-host IO sharding: each process's local slice, concatenated
    in process order, must reproduce the global batch exactly, with
    global bookkeeping (idxs/n_valid/length maxima) identical on every
    process."""
    ds = _build_dataset(fixture_root)
    bs, pcount = 6, 2
    global_batches = list(BatchLoader(ds, bs, shuffle=True, seed=7,
                                      final_batch="pad"))
    shards = [list(BatchLoader(ds, bs, shuffle=True, seed=7,
                               final_batch="pad",
                               process_shard=(p, pcount)))
              for p in range(pcount)]
    arr_keys = ["brand_ids", "frames", "origin", "vmask", "bows",
                "tokens", "type_ids", "tmask"]
    for bi, gb in enumerate(global_batches):
        locals_ = [shards[p][bi] for p in range(pcount)]
        for k in arr_keys:
            merged = np.concatenate([lb[k] for lb in locals_], axis=0)
            np.testing.assert_array_equal(merged, gb[k], err_msg=k)
        for lb in locals_:
            assert lb["frames"].shape[0] == bs // pcount
            np.testing.assert_array_equal(lb["idxs"], gb["idxs"])
            assert lb["n_valid"] == gb["n_valid"]
            assert lb["tlen_max"] == int(gb["tmask"].sum(1).max())
            assert lb["flen_max"] == int(gb["vmask"].sum(1).max())


def test_process_sharded_loader_rejects_indivisible(fixture_root):
    ds = _build_dataset(fixture_root)
    with pytest.raises(ValueError, match="process_count"):
        BatchLoader(ds, 5, process_shard=(0, 2))


def test_bucket_batch_explicit_maxima():
    from fancyrec_tpu.data.loader import bucket_batch
    rng = np.random.RandomState(0)
    tmask = (np.arange(16)[None] < 2).astype(np.int32) * np.ones((4, 1), np.int32)
    vmask = (np.arange(8)[None] < 1).astype(np.float32) * np.ones((4, 1), np.float32)
    batch = {
        "tokens": rng.randint(1, 9, (4, 16)).astype(np.int32) * tmask,
        "type_ids": np.zeros((4, 16), np.int32),
        "tmask": tmask,
        "frames": rng.randn(4, 8, 6).astype(np.float32),
        "vmask": vmask,
    }
    # local slice max is (2 tokens, 1 frame) but the GLOBAL maxima
    # (another process holds longer rows) govern the bucket choice
    out = bucket_batch(batch, token_buckets=[4, 16], frame_buckets=[2, 8],
                       maxima={"tlen_max": 3, "flen_max": 2})
    assert out["tokens"].shape == (4, 4)
    assert out["frames"].shape == (4, 2, 6)


def test_process_batch_shard_guards(monkeypatch):
    """The IO-sharding guard verifies actual device ownership and batch
    divisibility; any violation falls back to full-batch-per-host."""
    import types

    import jax
    from fancyrec_tpu.parallel.mesh import process_batch_shard

    def mesh_owned_by(rows):   # rows: list of per-data-row owner lists
        devs = np.empty((len(rows), len(rows[0])), object)
        for i, row in enumerate(rows):
            for j, p in enumerate(row):
                devs[i, j] = types.SimpleNamespace(process_index=p)
        return types.SimpleNamespace(devices=devs)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    good = mesh_owned_by([[0], [0], [1], [1]])
    assert process_batch_shard(good, 8) == (1, 2)
    # batch must divide the DATA AXIS (8 % 4 ok, 6 % 4 not): non-dividing
    # batches take the replicate fallback, invalid for local slices
    assert process_batch_shard(good, 6) is None
    # interleaved ownership: rows not contiguous per process
    assert process_batch_shard(mesh_owned_by(
        [[0], [1], [0], [1]]), 8) is None
    # a data row spanning two processes
    assert process_batch_shard(mesh_owned_by(
        [[0, 0], [0, 1], [1, 1], [0, 1]]), 8) is None
    # wrong process order (process 1 owns the leading block)
    assert process_batch_shard(mesh_owned_by(
        [[1], [1], [0], [0]]), 8) is None
    # single process: always None
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert process_batch_shard(good, 8) is None
