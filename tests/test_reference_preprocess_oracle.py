"""Preprocess artifact parity against the ACTUAL reference writers.

The reference's txt2bin / get_frameInfo / vocab builders run offline (no
weights, no network); these tests execute them on the same inputs as our
implementations and compare artifacts byte-for-byte (feature.bin /
id.txt / shape.txt / video2frames.txt) or content-for-content (vocab
word->index maps), replacing author-written golden bytes with the
reference's own output.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def refpp():
    """Import the reference preprocess modules (they import from util/ and
    sibling-module style, so both roots go on sys.path)."""
    if not hasattr(np, "asfarray"):  # removed in numpy 2.0
        np.asfarray = lambda a, dtype=float: np.asarray(a, dtype=dtype)
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "preprocess"))
    try:
        import txt2bin as ref_txt2bin
        import get_frameInfo as ref_frameinfo
        import vocab as ref_vocab
        yield types.SimpleNamespace(txt2bin=ref_txt2bin,
                                    frameinfo=ref_frameinfo,
                                    vocab=ref_vocab)
    finally:
        sys.path.remove(os.path.join(REF, "preprocess"))
        sys.path.remove(REF)


def _feature_txt(path, rng, n=17, dim=6):
    """Feature lines incl. a duplicate name and a NaN row (dedup/drop)."""
    names = ["item%03d" % i for i in range(n)]
    rows = rng.randn(n, dim).astype(np.float32)
    lines = []
    for name, row in zip(names, rows):
        lines.append(name + " " + " ".join("%g" % v for v in row))
    lines.append(lines[3])                       # duplicate -> dedup
    bad = rng.randn(dim).astype(np.float32)
    lines.append("badrow " + " ".join(
        ("nan" if i == 2 else "%g" % v) for i, v in enumerate(bad)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return names


def _read(p):
    with open(p, "rb") as f:
        return f.read()


def test_txt2bin_byte_parity_with_reference(refpp, tmp_path):
    from fancyrec_tpu.preprocess.txt2bin import process as our_process

    rng = np.random.RandomState(0)
    txt = str(tmp_path / "features.txt")
    _feature_txt(txt, rng)

    ref_dir = str(tmp_path / "ref_out")
    our_dir = str(tmp_path / "our_out")
    refpp.txt2bin.process(6, [txt], ref_dir, 1)
    our_process(6, [txt], our_dir, overwrite=1)

    for fname in ("feature.bin", "shape.txt", "id.txt"):
        assert _read(os.path.join(ref_dir, fname)) == \
            _read(os.path.join(our_dir, fname)), fname


def test_frameinfo_parity_with_reference(refpp, tmp_path, monkeypatch):
    from fancyrec_tpu.io.bigfile import BigFileWriter
    from fancyrec_tpu.preprocess.frameinfo import get_frame_info

    rng = np.random.RandomState(1)
    # frames stored out of order across 3 videos (the writer order is the
    # extraction order, not the frame order)
    frames = ["video%d_%d_cls%d" % (v, f, v % 2)
              for v in (1, 2, 3) for f in (45, 0, 15, 30)]
    rng.shuffle(frames)

    dirs = {}
    for which in ("ref", "ours"):
        d = str(tmp_path / which)
        with BigFileWriter(d, ndims=4) as w:
            w.write_batch(frames, rng.randn(len(frames), 4).astype(np.float32))
        dirs[which] = d

    refpp.frameinfo.get_frame_info(dirs["ref"], 1)
    get_frame_info(dirs["ours"], overwrite=1)

    ref_txt = _read(os.path.join(dirs["ref"], "video2frames.txt"))
    our_txt = _read(os.path.join(dirs["ours"], "video2frames.txt"))
    assert ref_txt == our_txt


def test_vocab_parity_with_reference(refpp, tmp_path):
    from fancyrec_tpu.io.vocab import build_vocab as our_build

    caps = [
        "video1#enc#0 a Fast red CAR drives past the fast red car!!",
        "video2#enc#0 the city road is busy tonight, busy busy",
        "img3#enc#0 fast electric car on the road",
        "img4#enc#0 a car a road a car a night",
    ]
    coll = str(tmp_path / "mini")
    with open(coll + ".caption.txt", "w") as f:
        f.write("\n".join(caps) + "\n")

    for style in ("bow", "rnn"):
        ref_vocab, _ = refpp.vocab.build_vocab(
            "mini", style, threshold=2, rootpath=str(tmp_path))
        ours, _ = our_build(
            [line.split(" ", 1)[1] for line in caps], style, threshold=2)
        assert ours.word2idx == ref_vocab.word2idx, style
        assert len(ours) == len(ref_vocab)


def test_caption_splits_match_reference(refpp, tmp_path):
    """The seeded 80/5/15 per-brand splits and the emitted caption files
    must be byte-identical to the reference's videos_split / imgs_split /
    merge functions run on the same intermediate artifacts."""
    import json
    import shutil

    from fancyrec_tpu.preprocess import captions as C
    from fancyrec_tpu.preprocess import pipeline as P
    from fancyrec_tpu.preprocess import videos as V

    import preprocess_captions as ref_caps  # /root/reference/preprocess

    # --- scrape tree: 21 videos (files only; never decoded) + 21 jpgs ---
    src = str(tmp_path / "scrape")
    from PIL import Image
    for b, brand in enumerate(["audi", "bmw", "cadillac"]):
        d = os.path.join(src, brand)
        os.makedirs(d)
        items = []
        for i in range(21):
            code = "%s_vid%02d" % (brand, i)
            open(os.path.join(d, code + ".mp4"), "wb").close()
            items.append({
                "__typename": "GraphVideo", "is_video": True,
                "shortcode": code,
                "edge_media_to_caption": {"edges": [
                    {"node": {"text": "a fast %s car at night #%d"
                              % (brand, i)}}]},
                "tags": ["car", brand]})
        for i in range(21):
            code = "%s_img%02d" % (brand, i)
            Image.new("RGB", (8, 8), (b * 30 + i, 0, 0)).save(
                os.path.join(d, code + ".jpg"))
            items.append({
                "__typename": "GraphImage", "is_video": False,
                "shortcode": code,
                "edge_media_to_caption": {"edges": [
                    {"node": {"text": "new red %s on the road %d!"
                              % (brand, i)}}]}})
        with open(os.path.join(d, "scrape.json"), "w") as f:
            json.dump({"GraphImages": items}, f)

    # --- shared intermediates through OUR extractors/info writers ---
    vertical = "insCar"
    ours_root = str(tmp_path / "ours")
    out_dir = os.path.join(ours_root, vertical)
    C.extract_video_captions(src, src, out_dir)
    C.extract_image_captions(src, src, out_dir)
    V.video2idx_and_idx2video(src, src, os.path.join(out_dir, "video_info.txt"))
    P.img2idx_and_idx2img(src, src, os.path.join(out_dir, "img_info.txt"))

    ref_root = str(tmp_path / "ref")
    shutil.copytree(out_dir, os.path.join(ref_root, vertical))

    # --- ours ---
    C.videos_split_train_val_test(src, out_dir, vertical, src)
    C.imgs_split_train_val_test(src, out_dir, vertical, src)
    C.merge_captions(out_dir, vertical)

    # --- reference ---
    ref_caps.videos_split_train_val_test(src, ref_root, vertical, src)
    ref_caps.imgs_split_train_val_test(src, ref_root, vertical, src)
    ref_caps.merge_captions_in_videos_and_imgs(ref_root, vertical)

    for split in ("train", "val", "test"):
        for kind in (".caption.txt", ".img_caption.txt"):
            fname = "%s%s%s" % (vertical, split, kind)
            assert _read(os.path.join(ref_root, vertical, fname)) == \
                _read(os.path.join(out_dir, fname)), fname
    # sanity: the 16/1/3-of-20 sizes actually materialized
    train = _read(os.path.join(out_dir, "insCartrain.caption.txt"))
    assert train.count(b"\n") == 2 * 3 * 16  # 16 videos + 16 imgs per brand
