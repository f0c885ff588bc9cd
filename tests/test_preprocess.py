"""Preprocess pipeline: synthetic scrape tree -> trainable collection."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

from fancyrec_tpu.preprocess import pipeline, videos
from fancyrec_tpu.preprocess.txt2bin import process as txt2bin_process
from fancyrec_tpu.io.bigfile import ImageBigFile
from fancyrec_tpu.io.dictfile import read_dict


def _write_video(path, n_frames=20, fps=10, size=(64, 48), seed=0):
    rng = np.random.RandomState(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert vw.isOpened(), "mp4v codec unavailable"
    for _ in range(n_frames):
        vw.write(rng.randint(0, 255, (size[1], size[0], 3), np.uint8))
    vw.release()


def _ig_json(items):
    return {"GraphImages": items}


@pytest.fixture(scope="module")
def scrape_tree(tmp_path_factory):
    src = str(tmp_path_factory.mktemp("scrape"))
    for b, brand in enumerate(["audi", "bmw"]):
        d = os.path.join(src, brand)
        os.makedirs(d)
        items = []
        for i in range(2):
            code = "%s_vid%d" % (brand, i)
            _write_video(os.path.join(d, code + ".mp4"), seed=b * 10 + i)
            items.append({
                "__typename": "GraphVideo", "is_video": True,
                "shortcode": code,
                "edge_media_to_caption": {"edges": [
                    {"node": {"text": "a fast %s car drives at night #%d" % (brand, i)}}]},
                "tags": ["car", brand],
            })
        for i in range(20):
            code = "%s_img%d" % (brand, i)
            Image.fromarray(np.full((32, 32, 3), (b * 40 + i) % 255,
                                    np.uint8)).save(os.path.join(d, code + ".jpg"))
            items.append({
                "__typename": "GraphImage", "is_video": False,
                "shortcode": code,
                "edge_media_to_caption": {"edges": [
                    {"node": {"text": "new red %s on the road %d" % (brand, i)}}]},
            })
        with open(os.path.join(d, "scrape.json"), "w") as f:
            json.dump(_ig_json(items), f)
    return src


def _fake_extractor(images):
    """Stand-in for the jitted ResNet: cheap deterministic 32-d features."""
    x = images.astype(np.float32) / 255.0
    pooled = x.mean(axis=(1, 2))          # (B, 3)
    feats = np.concatenate([pooled ** (i + 1) for i in range(11)], axis=1)
    return np.concatenate([feats[:, :32 - 33 + 33], feats], axis=1)[:, :32]


def test_frame_sampling_rate(scrape_tree):
    frames = list(videos.iter_video_frames(
        os.path.join(scrape_tree, "audi", "audi_vid0.mp4")))
    # 20 frames at 10 fps, interval 5 -> samples at counts 0,5,10,...
    counts = [c for c, _ in frames]
    assert all(c % 5 == 0 for c in counts)
    assert len(counts) >= 3


@pytest.mark.slow
def test_full_pipeline_to_training(scrape_tree, tmp_path):
    target = str(tmp_path / "out")
    out = pipeline.run(scrape_tree, target, dataset_name="mini",
                       feat_dim_name="resnet152_dim_32",
                       img_feat_name="imgfeat_dim_32",
                       batch_size=8, vocab_threshold=1,
                       extract_fn=_fake_extractor)
    root = out["out_dir"]

    # artifacts exist and are self-consistent
    vf = ImageBigFile(os.path.join(root, "minitrain", "FeatureData",
                                   "resnet152_dim_32"))
    assert vf.ndims == 32 and vf.nr_of_images > 0
    v2f = read_dict(os.path.join(root, "minitrain", "FeatureData",
                                 "resnet152_dim_32", "video2frames.txt"))
    for vid, frames in v2f.items():
        for fr in frames:
            assert fr in vf.name2index
    assert os.path.exists(os.path.join(root, "img_info.txt"))
    assert os.path.exists(os.path.join(root, "cls.txt"))

    # caption grammar; with only 2 videos per brand the per-brand 20ths
    # split floors to 0 train/val pieces, so videos all land in test
    # (reference split semantics, preprocess_captions.py:186-194)
    cap = open(os.path.join(root, "minitrain", "TextData",
                            "minitrain.caption.txt")).read().splitlines()
    assert all("#enc#0 " in line for line in cap)
    assert any(line.startswith("img") for line in cap)
    cap_test = open(os.path.join(root, "minitest", "TextData",
                                 "minitest.caption.txt")).read().splitlines()
    assert any(line.startswith("video") for line in cap_test)

    # and the tree trains end-to-end (1 epoch, bi-gru)
    from fancyrec_tpu.data.tokenizer import write_minimal_bert_vocab
    write_minimal_bert_vocab(os.path.join(root, "bert_vocab.txt"),
                             ["car", "fast", "audi", "bmw", "red", "road"])
    from fancyrec_tpu.train import trainer
    best = trainer.main([
        "minitrain", "minival", "minitest", "--rootpath", root,
        "--brand_num", "2", "--brand_aspect", "8",
        "--video_feature", "resnet152_dim_32",
        "--img_feature", "imgfeat_dim_32",
        "--common_embedding_size", "16", "--visual_rnn_size", "8",
        "--text_rnn_size", "8", "--visual_kernel_num", "4",
        "--text_kernel_num", "4", "--text_mapping_size", "16",
        "--visual_mapping_size", "16", "--word_dim", "8",
        "--text_net", "bi-gru", "--fusion_style", "fc", "--loss_fun", "cl",
        "--cost_style", "mean", "--batch_size", "2",
        "--accumulation_step", "2", "--num_epochs", "1",
        "--overwrite", "1", "--postfix", "pp_run", "--vocab", "word_vocab_1",
        "--max_frames", "6", "--max_words", "16",
    ])
    assert np.isfinite(best)


def test_txt2bin_roundtrip(tmp_path):
    txt = tmp_path / "f.txt"
    txt.write_text("name one 1.0 2.0 3.0\nother 4.0 5.0 6.0\n"
                   "bad nan 1.0 2.0\n")
    outdir = str(tmp_path / "bin")
    txt2bin_process(3, [str(txt)], outdir, overwrite=1)
    r = ImageBigFile(outdir)
    assert r.shape() == [2, 3]
    assert r.names == ["name one", "other"]  # spaces in names survive
    np.testing.assert_allclose(r.read_one("other"), [4.0, 5.0, 6.0])


def test_extract_features_propagates_decode_exception(tmp_path):
    """A decode failure in the producer thread must fail the extraction,
    not silently truncate the BigFile."""
    from fancyrec_tpu.preprocess.features import extract_features

    def failing_stream():
        yield "img0", np.zeros((8, 8, 3), np.uint8)
        raise OSError("decode failed")

    def fake_extract(images):
        return np.ones((images.shape[0], 4), np.float32)

    with pytest.raises(OSError, match="decode failed"):
        extract_features(failing_stream(), str(tmp_path / "out"),
                         batch_size=2, extract_fn=fake_extract)


@pytest.mark.parametrize("backend", ["thread", "process"])
def test_parallel_decode_matches_serial(scrape_tree, backend):
    """iter_sampled_frames_parallel must yield the exact serial stream
    (names and pixels) so BigFile id.txt ordering stays identical --
    for BOTH worker pool kinds (spawned processes pickle frames back)."""
    brands = sorted(os.listdir(scrape_tree))
    serial = list(videos.iter_sampled_frames(scrape_tree, brands))
    par = list(videos.iter_sampled_frames_parallel(scrape_tree, brands,
                                                   workers=3,
                                                   backend=backend))
    assert [n for n, _ in serial] == [n for n, _ in par]
    for (_, a), (_, b) in zip(serial, par):
        np.testing.assert_array_equal(a, b)


def test_parallel_decode_workers1_is_serial(scrape_tree):
    """workers=1 degrades to the serial path (no pool at all)."""
    brands = sorted(os.listdir(scrape_tree))
    serial = list(videos.iter_sampled_frames(scrape_tree, brands))
    one = list(videos.iter_sampled_frames_parallel(scrape_tree, brands,
                                                   workers=1))
    assert [n for n, _ in serial] == [n for n, _ in one]


def test_bench_preprocess_smoke(monkeypatch):
    """bench.py preprocess end-to-end with a stub extractor: synthesizes
    mp4s, runs the fused decode->extract->BigFile pipeline, and reports a
    consistent frame accounting + overlap attribution."""
    import bench

    def fake_extract(images):
        return np.asarray(images, np.float32).reshape(len(images), -1)[:, :4]

    r = bench.bench_preprocess(n_videos=2, frames_per_video=40,
                               size=(64, 48), fps=10, batch_size=4,
                               workers=2, extract_fn=fake_extract)
    assert r["decoded_frames"] == 80
    # 10 fps -> interval 5; reference sampling skips the first frame, so
    # 40 frames yield ceil(39/5) = 8 samples per video
    assert r["sampled_frames"] == 16
    assert r["e2e_decoded_fps"] > 0 and r["decode_only_fps"] > 0
    assert 0.0 <= r["tpu_starved_frac"] <= 1.0
    assert r["overlap_speedup"] > 0
