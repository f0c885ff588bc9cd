import os

import numpy as np
import pytest

from fancyrec_tpu.io import BigFileWriter, ImageBigFile, WordBigFile
from fancyrec_tpu.io.dictfile import read_dict, write_dict, get_visual_id


def test_roundtrip_bytes(tmp_path):
    d = str(tmp_path / "feat")
    rng = np.random.RandomState(0)
    mat = rng.randn(7, 5).astype(np.float32)
    names = ["video%d_0_cls%d" % (i, i % 3) for i in range(7)]
    with BigFileWriter(d, ndims=5) as w:
        w.write_batch(names, mat)

    # exact on-disk contract
    raw = np.fromfile(os.path.join(d, "feature.bin"), dtype=np.float32)
    assert np.array_equal(raw.reshape(7, 5), mat)
    assert open(os.path.join(d, "shape.txt")).read() == "7 5"
    assert open(os.path.join(d, "id.txt")).read() == "#".join(names)

    r = ImageBigFile(d)
    assert r.shape() == [7, 5]
    assert np.allclose(r.read_one(names[3]), mat[3])
    got = r.read_by_names([names[6], names[0]])
    assert np.array_equal(got, mat[[6, 0]])


def test_reference_read_semantics(tmp_path):
    """read() de-dups, drops unknowns, returns storage order."""
    d = str(tmp_path / "feat")
    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    with BigFileWriter(d) as w:
        w.write_batch(["a", "b", "c", "dd"], mat)
    r = ImageBigFile(d)
    names, vecs = r.read(["dd", "b", "b", "zzz"])
    assert names == ["b", "dd"]
    assert np.allclose(vecs, mat[[1, 3]])
    names, vecs = r.read([3, 0], isname=False)
    assert names == ["a", "dd"]


def test_writer_drops_nan_and_dups(tmp_path):
    d = str(tmp_path / "feat")
    with BigFileWriter(d, ndims=2) as w:
        assert w.write("x", [1.0, 2.0])
        assert not w.write("x", [9.0, 9.0])        # duplicate skipped
        assert not w.write("y", [np.nan, 1.0])     # NaN row dropped
        assert w.failed == 1
    r = ImageBigFile(d)
    assert r.shape() == [1, 2]


def test_dim_mismatch_raises(tmp_path):
    with BigFileWriter(str(tmp_path / "f"), ndims=3) as w:
        with pytest.raises(ValueError):
            w.write("a", [1.0, 2.0])


def test_word_bigfile_space_delimited(tmp_path):
    d = str(tmp_path / "w2v")
    with BigFileWriter(d, ndims=4, delimiter=" ") as w:
        w.write_batch(["hello", "world"], np.ones((2, 4), np.float32))
    r = WordBigFile(d)
    assert "hello" in r
    assert np.allclose(r.read_one("world"), np.ones(4))


def test_dictfile_roundtrip(tmp_path):
    p = str(tmp_path / "video2frames.txt")
    d = {"video1": ["video1_0_cls3", "video1_15_cls3"], "video2": []}
    write_dict(p, d)
    assert read_dict(p) == d


def test_get_visual_id():
    assert get_visual_id("video12#enc#0") == "video12"
    assert get_visual_id("img7#enc#0") == "img7"
    assert get_visual_id("clip.mp4#enc#0") == "clip"
    assert get_visual_id("pic.jpg#enc#0") == "pic"


def test_iter_rows_streams_in_storage_order(tmp_path):
    """iter_rows == the reference StreamFile's sequential (name, vector)
    walk (util/wordbigfile.py:63-98)."""
    from fancyrec_tpu.io.bigfile import BigFileWriter, WordBigFile

    rng = np.random.RandomState(0)
    names = ["w%d" % i for i in range(10)]
    mat = rng.randn(10, 4).astype(np.float32)
    d = str(tmp_path / "w2v")
    with BigFileWriter(d, ndims=4, delimiter=" ") as w:
        w.write_batch(names, mat)

    store = WordBigFile(d)
    got = list(store.iter_rows(batch=3))
    assert [n for n, _ in got] == names
    np.testing.assert_allclose(np.stack([r for _, r in got]), mat)


def test_format_check_flags_corruption(tmp_path, capsys):
    """io/format_check (the reference's missing util/format_check.py, made
    real) passes a clean store and flags truncation / NaN rows / dangling
    video2frames references."""
    import json
    from fancyrec_tpu.io.bigfile import BigFileWriter
    from fancyrec_tpu.io.dictfile import write_dict
    from fancyrec_tpu.io.format_check import check_feature_dir, main

    rng = np.random.RandomState(0)
    good = str(tmp_path / "good")
    names = ["video1_%d_cls0" % i for i in range(6)]
    with BigFileWriter(good, ndims=4) as w:
        w.write_batch(names, rng.randn(6, 4).astype(np.float32))
    write_dict(os.path.join(good, "video2frames.txt"), {"video1": names})
    assert check_feature_dir(good) == []
    assert main([good]) == 0

    bad = str(tmp_path / "bad")
    mat = rng.randn(6, 4).astype(np.float32)
    mat[2, 1] = np.inf  # NaN rows are dropped by the writer; inject inf
    with BigFileWriter(bad, ndims=4) as w:
        w.write_batch(names, mat)
    with open(os.path.join(bad, "feature.bin"), "ab") as f:
        f.write(b"\x00" * 7)  # trailing junk
    write_dict(os.path.join(bad, "video2frames.txt"),
               {"video1": names + ["video1_99_cls0"]})
    problems = check_feature_dir(bad)
    text = "\n".join(problems)
    assert "trailing" in text
    assert "non-finite" in text
    assert "unknown frames" in text
    assert main([bad]) == 1


def test_writer_does_not_finalize_on_error(tmp_path):
    """A crashed extraction must not leave a valid-looking store:
    id.txt/shape.txt mark completion (preprocess resume guards key on
    shape.txt), so they are only written on a clean exit."""
    import os
    import numpy as np
    import pytest as _pytest
    from fancyrec_tpu.io.bigfile import BigFileWriter

    d = str(tmp_path / "store")
    with _pytest.raises(RuntimeError):
        with BigFileWriter(d) as w:
            w.write("a", np.zeros(4, np.float32))
            raise RuntimeError("mid-extraction crash")
    assert not os.path.exists(os.path.join(d, "shape.txt"))
    assert not os.path.exists(os.path.join(d, "id.txt"))
