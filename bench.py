"""Headline benchmark: ResNet-152 frame-feature extraction throughput.

Runs on the default platform (the real TPU chip under the driver). Measures
steady-state frames/sec through the jitted bf16 NHWC extractor -- the
reference pipeline's dominant preprocessing cost (extract_frame_feature.py)
and the BASELINE.md north-star metric (target: >= 5000 frames/sec/chip).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N/5000}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.models.resnet import init_random_params, make_extractor

BASELINE_FPS = 5000.0


def bench_resnet152(batch_size: int = 128, iters: int = 40,
                    warmup: int = 4) -> float:
    params = init_random_params()
    extract = make_extractor(params, batch_size)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3),
                                     np.uint8))
    for _ in range(warmup):
        extract(images).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(images)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    fps = bench_resnet152(batch_size=batch)
    print(json.dumps({
        "metric": "resnet152_feature_extraction_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
