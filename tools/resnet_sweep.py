"""ResNet extractor throughput sweep + exact-FLOPs MFU (real TPU).

Usage: python tools/resnet_sweep.py [batch ...]
Prints one JSON line per batch size with frames/s and MFU from XLA's own
cost analysis, for the batch/stem tuning recorded in CLAUDE.md/README.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.models.resnet import init_random_params, make_extractor


def measure(batch_size: int, iters: int = 40, warmup: int = 4,
            stem_s2d: bool = True) -> dict:
    params = init_random_params()
    extract = make_extractor(params, batch_size, stem_s2d=stem_s2d)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3),
                                     np.uint8))
    cost = extract.lower(images).compile().cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))

    _ = np.asarray(extract(images)[0])
    for _ in range(warmup):
        out = extract(images)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(images)
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    fps = batch_size * iters / dt
    tflops = flops * iters / dt / 1e12 if flops else 0.0
    return {"batch": batch_size, "stem_s2d": stem_s2d,
            "frames_per_sec": round(fps, 1),
            "flops_per_batch": flops,
            "tflops_per_sec": round(tflops, 1),
            "mfu_vs_bf16_peak": round(tflops / 197.0, 4)}


if __name__ == "__main__":
    batches = [int(x) for x in sys.argv[1:]] or [96, 128, 144, 160, 192]
    for b in batches:
        print(json.dumps(measure(b)))
