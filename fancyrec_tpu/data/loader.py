"""Batch iteration + host->device prefetch.

Replaces torch DataLoader worker processes with a single-process pipeline:
the dataset's vectorized mmap gathers are cheap enough to run inline, and a
background thread keeps `size` batches resident on device ahead of the
consumer (double buffering host->HBM), so the TPU never waits on host IO.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from fancyrec_tpu.data.dataset import PostDataset


def _pick_bucket(need: int, buckets, cap: int) -> int:
    for b in buckets:
        if b >= need:
            return min(b, cap)
    return cap


def bucket_batch(batch: Dict[str, np.ndarray], token_buckets=None,
                 frame_buckets=None, maxima: Optional[Dict[str, int]] = None
                 ) -> Dict[str, np.ndarray]:
    """Slice the pad axes down to the smallest configured bucket covering
    the batch's max valid length (quantized dynamic padding).

    Works on single batches (B, T) and stacked super-batches (A, B, T):
    token arrays are sliced on the last axis, frames on axis -2. One jit
    program compiles per distinct bucket shape. Exact in real arithmetic
    vs the full static pad: every model reduction is bounded by the
    dynamic batch-max length / mask (models/layers.py module docstring),
    so removing all-pad tail columns cannot change any output. In f32 the
    residual is pure XLA reduction-reassociation noise (different shapes
    tile reductions differently; measured max 2e-7) -- pinned by
    tests/test_buckets.py.
    """
    out = dict(batch)
    if token_buckets:
        cap = batch["tmask"].shape[-1]
        # explicit maxima (multi-host: the GLOBAL batch max, so every
        # process slices identical shapes from its local slice)
        need = (maxima["tlen_max"] if maxima
                else int(batch["tmask"].sum(-1).max()))
        tl = _pick_bucket(max(need, 1), token_buckets, cap)
        if tl < cap:
            for k in ("tokens", "type_ids", "tmask"):
                out[k] = np.ascontiguousarray(batch[k][..., :tl])
    if frame_buckets:
        cap = batch["vmask"].shape[-1]
        need = (maxima["flen_max"] if maxima
                else int(batch["vmask"].sum(-1).max()))
        fl = _pick_bucket(max(need, 1), frame_buckets, cap)
        if fl < cap:
            out["frames"] = np.ascontiguousarray(batch["frames"][..., :fl, :])
            out["vmask"] = np.ascontiguousarray(batch["vmask"][..., :fl])
    return out


class BatchLoader:
    """Deterministic epoch iterator over a PostDataset.

    final_batch: 'drop' (train default: contrastive losses want full
    batches), or 'pad' (eval: repeat-pad to full size; padding rows are
    marked by n_valid and skipped at scatter time).
    """

    def __init__(self, dataset: PostDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 2,
                 final_batch: str = "drop", grouped: str = "off",
                 process_shard: Optional[tuple] = None):
        assert final_batch in ("drop", "pad")
        # 'sort': global length-sort (eval -- composition-free, embeddings
        # scatter back by dataset index); 'window': shuffle, then sort
        # within windows of 64 batches and shuffle the batch order
        # (train -- keeps batches random-ish while length-homogeneous)
        assert grouped in ("off", "sort", "window")
        # process_shard=(pid, pcount): multi-host IO sharding. Every
        # process computes the identical GLOBAL batch order (the epoch
        # permutation and collate sort are deterministic in (seed,
        # epoch)), then gathers only its contiguous 1/pcount slice of
        # the rows -- per-host feature IO scales down with host count
        # instead of every host assembling the full global batch. The
        # yielded dict carries LOCAL arrays plus global bookkeeping
        # ('idxs' = full ordered index list, 'n_valid', and the global
        # length maxima for bucketing); pair with
        # parallel.mesh.shard_batch(process_local=True).
        if process_shard is not None:
            pid, pcount = process_shard
            assert 0 <= pid < pcount
            if batch_size % pcount:
                raise ValueError(
                    "process-sharded loading needs batch_size %% "
                    "process_count == 0 (got %d %% %d)"
                    % (batch_size, pcount))
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.final_batch = final_batch
        self.grouped = grouped
        self.process_shard = process_shard
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.final_batch == "drop":
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        rng = np.random.RandomState(self.seed + self.epoch)
        if self.shuffle:
            rng.shuffle(order)
        self.epoch += 1
        bs = self.batch_size
        if self.grouped == "sort":
            keys = self.dataset.length_keys()
            order = order[np.argsort(keys[order], kind="stable")]
        elif self.grouped == "window":
            keys = self.dataset.length_keys()
            win = bs * 64
            order = np.concatenate([
                chunk[np.argsort(keys[chunk], kind="stable")]
                for chunk in (order[s: s + win]
                              for s in range(0, n, win))])
        stop = (n // bs) * bs if self.final_batch == "drop" else n
        starts = list(range(0, stop, bs))
        if self.grouped == "window":
            # batches stay length-homogeneous; their ORDER re-randomizes
            # so the model never sees a shortest->longest curriculum
            rng.shuffle(starts)
        for start in starts:
            idx = order[start: start + bs]
            if self.process_shard is None:
                yield self.dataset.gather_batch(idx, pad_to=bs)
                continue
            pid, pcount = self.process_shard
            ordered = self.dataset.collate_order(idx, pad_to=bs)
            lo = len(ordered) * pid // pcount
            hi = len(ordered) * (pid + 1) // pcount
            batch = self.dataset.gather_batch(ordered[lo:hi], presort=False)
            batch["idxs"] = np.asarray(ordered, np.int64)
            batch["n_valid"] = len(idx)
            # global labels for the eval scatter (the device arrays are
            # this process's slice; idxs/brand_ids bookkeeping is global)
            batch["brand_ids_global"] = self.dataset.brand_ids[
                np.asarray(ordered)]
            batch.update(self.dataset.length_maxima(ordered))
            yield batch


def prefetch_to_device(iterator, size: int = 2,
                       device_put: Optional[Callable] = None,
                       stage_on_consumer: bool = False):
    """Run `iterator` in a background thread, staging batches on device.

    Keeps up to `size` batches in flight; jax.device_put is asynchronous, so
    the host thread races ahead building + transferring the next batch while
    the device computes on the current one.

    stage_on_consumer=True applies `device_put` on the CONSUMER thread
    instead: host batch assembly still overlaps compute, but every device
    interaction stays on the main thread. Required on multi-process
    meshes -- device_put of global arrays from a background thread,
    concurrent with main-thread collectives, deadlocks the XLA:CPU gloo
    backend (bisected by tests/test_multiprocess.py).
    """
    put = device_put or jax.device_put
    thread_put = (lambda b: b) if stage_on_consumer else put
    consumer_put = put if stage_on_consumer else (lambda b: b)
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item):
        # bounded put that gives up when the consumer is gone: a consumer
        # that raised mid-epoch abandons the generator, and a producer
        # blocked forever on a full queue would pin `size` device-staged
        # batches in HBM for the process lifetime
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # a producer failure must reach the consumer: swallowing it would
        # silently truncate the epoch and keep training on partial data
        try:
            for batch in iterator:
                if not _put(thread_put(batch)):
                    return
            _put(_END)
        except BaseException as exc:  # noqa: BLE001 - re-raised below
            _put(_ProducerError(exc))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, _ProducerError):
                raise item.exc
            yield consumer_put(item)
    finally:
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


class _ProducerError:
    """Wraps an exception crossing the producer-thread queue boundary."""

    def __init__(self, exc: BaseException):
        self.exc = exc
