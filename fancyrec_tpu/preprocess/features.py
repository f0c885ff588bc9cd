"""Feature extraction driver: images/frames -> BigFile, through the jitted
ResNet-152 with host-side double buffering.

The reference path is: dump jpgs -> torch DataLoader -> resnet -> txt lines
-> txt2bin (extract_frame_feature.py, preprocess_images.py:78-113). Here the
decode/resize runs on host threads while the TPU crunches the previous
batch, and rows stream straight into a BigFileWriter -- same artifacts
(feature.bin/id.txt/shape.txt), no intermediate txt (an optional writer
emits the txt lines for byte-level pipeline parity checks).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np

from fancyrec_tpu.io.bigfile import BigFileWriter


def iter_image_files(image_dir: str, names: Optional[Iterable[str]] = None,
                     resize=(224, 224)) -> Iterator[Tuple[str, np.ndarray]]:
    """(name_without_ext, 224x224x3 uint8 RGB) over jpgs in a directory."""
    from PIL import Image

    names = sorted(names) if names is not None else sorted(os.listdir(image_dir))
    for fname in names:
        if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        path = os.path.join(image_dir, fname)
        try:
            img = Image.open(path).convert("RGB").resize(resize)
        except Exception:
            continue
        yield os.path.splitext(fname)[0], np.asarray(img, np.uint8)


def _batched(stream, batch_size: int):
    names, imgs = [], []
    for name, img in stream:
        names.append(name)
        imgs.append(img)
        if len(names) == batch_size:
            yield names, np.stack(imgs)
            names, imgs = [], []
    if names:
        pad = batch_size - len(names)
        yield names, np.concatenate(
            [np.stack(imgs), np.zeros((pad,) + imgs[0].shape, np.uint8)])


def extract_features(stream: Iterable[Tuple[str, np.ndarray]],
                     out_dir: str, batch_size: int = 128,
                     params=None, extract_fn: Optional[Callable] = None,
                     txt_path: Optional[str] = None,
                     prefetch: int = 2,
                     stats: Optional[dict] = None) -> int:
    """Stream (name, image) pairs through the extractor into a BigFile.

    Returns the number of feature rows written. Decode (producer thread)
    overlaps with TPU compute (consumer); batches are fixed-size (the tail
    is zero-padded and trimmed after the forward pass) so the extractor
    compiles once.

    If `stats` is a dict, it is filled with wall-clock attribution for the
    consumer side: `wait_s` (blocked on the decode/prefetch queue — producer
    starvation), `compute_s` (extractor forward + device fetch), `write_s`
    (BigFile append), and `batches`. wait_s / sum is the fraction of the
    pipeline NOT hidden behind decode — the decode/extract overlap signal
    bench.py's preprocess mode reports.
    """
    if extract_fn is None:
        from fancyrec_tpu.models.resnet import init_random_params, make_extractor
        params = params if params is not None else init_random_params()
        extract_fn = make_extractor(params, batch_size)

    # decode runs on the prefetch thread, overlapping the TPU forward;
    # producer exceptions re-raise here (never silently truncate the
    # BigFile) -- same machinery as the training loader
    from fancyrec_tpu.data.loader import prefetch_to_device
    batches = prefetch_to_device(_batched(stream, batch_size),
                                 size=prefetch, device_put=lambda x: x)

    txt = open(txt_path, "w") if txt_path else None
    written = 0
    wait_s = compute_s = write_s = 0.0
    n_batches = 0
    it = iter(batches)
    with BigFileWriter(out_dir) as w:
        while True:
            t0 = time.perf_counter()
            try:
                names, images = next(it)
            except StopIteration:
                break
            t1 = time.perf_counter()
            feats = np.asarray(extract_fn(images))[: len(names)]
            t2 = time.perf_counter()
            written += w.write_batch(names, feats)
            if txt is not None:
                for n, row in zip(names, feats):
                    txt.write(n + " " + " ".join("%g" % v for v in row) + "\n")
            t3 = time.perf_counter()
            wait_s += t1 - t0
            compute_s += t2 - t1
            write_s += t3 - t2
            n_batches += 1
    if txt is not None:
        txt.close()
    if stats is not None:
        stats.update(wait_s=wait_s, compute_s=compute_s, write_s=write_s,
                     batches=n_batches)
    return written
