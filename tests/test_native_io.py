"""Native C++ gather engine: correctness vs the numpy memmap path."""

import numpy as np
import pytest

from fancyrec_tpu.io import native
from fancyrec_tpu.io.bigfile import BigFileWriter, ImageBigFile


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nat") / "feat")
    rng = np.random.RandomState(0)
    mat = rng.randn(500, 64).astype(np.float32)
    with BigFileWriter(d, ndims=64) as w:
        w.write_batch(["r%d" % i for i in range(500)], mat)
    return d, mat


def test_native_builds_and_gathers(store):
    d, mat = store
    if not native.available():
        pytest.skip("no C++ toolchain available to build the native lib")
    g = native.NativeGather(d + "/feature.bin", 500, 64)
    idx = np.array([499, 0, 7, 7, 123], np.int64)
    g.prefetch(idx)
    out = g.gather(idx)
    np.testing.assert_array_equal(out, mat[idx])
    g.close()


def test_native_rejects_bad_index(store):
    d, _ = store
    if not native.available():
        pytest.skip("native lib unavailable")
    g = native.NativeGather(d + "/feature.bin", 500, 64)
    with pytest.raises(IndexError):
        g.gather(np.array([500], np.int64))
    g.close()


def test_bigfile_uses_native_transparently(store):
    d, mat = store
    r = ImageBigFile(d)
    idx = np.random.RandomState(1).randint(0, 500, 200)
    got = r.read_rows(idx)
    np.testing.assert_array_equal(got, mat[idx])
    if native.available():
        assert r._native is not None  # the fast path actually engaged


def test_large_gather_multithreaded_path(store):
    d, mat = store
    if not native.available():
        pytest.skip("native lib unavailable")
    g = native.NativeGather(d + "/feature.bin", 500, 64)
    idx = np.random.RandomState(2).randint(0, 500, 5000).astype(np.int64)
    out = g.gather(idx)  # n >= 64 engages the thread pool
    np.testing.assert_array_equal(out, mat[idx])
    g.close()


def test_stale_handle_after_slot_reuse_fails_cleanly(tmp_path, store):
    """Handle-reuse ABA: after close, a slot reused by a DIFFERENT file
    must reject the old handle (generation check) instead of silently
    serving the new file's rows."""
    import ctypes

    d, mat = store
    if not native.available():
        pytest.skip("native lib unavailable")
    other_dir = str(tmp_path / "other")
    other = np.arange(500 * 64, dtype=np.float32).reshape(500, 64)
    with BigFileWriter(other_dir, ndims=64) as w:
        w.write_batch(["o%d" % i for i in range(500)], other)

    g1 = native.NativeGather(d + "/feature.bin", 500, 64)
    lib, h1 = g1._lib, g1._handle
    lib.frio_close(h1)                  # close behind the wrapper's back
    g2 = native.NativeGather(other_dir + "/feature.bin", 500, 64)
    try:
        idx = np.zeros(1, np.int64)
        out = np.empty((1, 64), np.float32)
        rc = lib.frio_gather(
            h1, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 1,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        assert rc == -1                 # stale handle: clean error
        # the new handle still serves the right file
        np.testing.assert_array_equal(g2.gather(np.array([0], np.int64)),
                                      other[[0]])
    finally:
        g1._handle = -1                 # already closed above
        g2.close()


def test_concurrent_close_does_not_corrupt_gathers(store):
    """ctypes releases the GIL around foreign calls, so a prefetch-thread
    gather can overlap a main-thread close. The per-store reader/writer
    lock must make every gather either fully valid data or a clean error
    -- never a use-after-munmap (crash) or a torn copy."""
    import threading

    d, mat = store
    if not native.available():
        pytest.skip("native lib unavailable")
    idx = np.random.RandomState(3).randint(0, 500, 2000).astype(np.int64)
    expected = mat[idx]
    for _ in range(5):
        g = native.NativeGather(d + "/feature.bin", 500, 64)
        results = []

        def reader():
            try:
                results.append(np.array_equal(g.gather(idx), expected))
            except (IndexError, OSError, RuntimeError):
                results.append(True)    # clean error after close: fine
        threads = [threading.Thread(target=reader) for _ in range(3)]
        for t in threads:
            t.start()
        g.close()                       # races the in-flight gathers
        for t in threads:
            t.join()
        assert all(results), "torn gather under concurrent close"
