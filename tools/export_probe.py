"""Does deploying via StableHLO artifacts cost serving performance?

Exports the recipe-dims model's encode_post (serving/export.py), reloads
it with ExportedModel (no model code), and times it against the live
jitted forward at the same batch on the real chip -- both amortized
(the tunnel has a ~1 ms per-dispatch floor). Also probes the symbolic
(batch=0) artifact vs a fixed-batch artifact: shape polymorphism can in
principle inhibit XLA optimizations, so measure it.

Usage: python tools/export_probe.py [batch]
"""

import json
import os
import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as g  # noqa: E402
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
from fancyrec_tpu.serving.export import ExportedModel, export_model
from fancyrec_tpu.train import checkpoints
from fancyrec_tpu.train.state import init_state


def timeit(fn, *args, iters=100, label=""):
    print("compiling", label, flush=True)
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = g._flagship_cfg().finalize()
    model, state = init_state(cfg)
    rng = np.random.RandomState(0)
    mb = g._example_batch(cfg, batch, rng)
    mb = {k: jax.device_put(v) for k, v in mb.items()}
    v = VisualBatch(frames=mb["frames"], mean_origin=mb["origin"],
                    mask=mb["vmask"])
    t = TextBatch(bows=mb["bows"], tokens=mb["tokens"],
                  type_ids=mb["type_ids"], mask=mb["tmask"])

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    variables = jax.device_put(variables)

    @jax.jit
    def live(variables, v, t):
        # variables are an ARGUMENT: a closure would bake 400 MB of f32
        # params into the compile request (the axon tunnel 413s on it)
        return model.apply(variables, v, t, deterministic=True,
                           method=model.embed_post)

    res = {"batch": batch}
    res["live_jit_ms"] = timeit(live, variables, v, t, label="live")

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "model_best.pth.tar")
        checkpoints.save_checkpoint(ckpt, cfg, state.params,
                                    state.batch_stats, epoch=1,
                                    best_rsum=0.0, eiters=1)
        for name, b in (("symbolic", 0), ("fixed", batch)):
            out = os.path.join(tmp, name)
            t0 = time.perf_counter()
            export_model(ckpt, out, platforms=("cpu", "tpu"), batch=b,
                         entries=["encode_post"])
            res["export_%s_s" % name] = round(time.perf_counter() - t0, 1)
            loaded = ExportedModel(out)
            res["artifact_%s_ms" % name] = timeit(
                lambda: loaded.encode_post(mb), label=name)

    posts_s = batch / (res["artifact_symbolic_ms"] / 1e3)
    res["artifact_posts_per_s"] = int(posts_s)
    print(json.dumps({k: (round(x, 2) if isinstance(x, float) else x)
                      for k, x in res.items()}))


if __name__ == "__main__":
    main()
