"""Serialized serving artifacts: jax.export / StableHLO model export.

The reference deploys by shipping the model *code* plus a torch checkpoint
and re-instantiating FancyRec at load time (reference tester.py:51-70).
The TPU-native deployment path serializes the jitted serving programs
themselves: each entry point is lowered once with `jax.export` to
versioned StableHLO bytes that reload and execute WITHOUT the model code
(and on a different platform than the one that exported them -- artifacts
are multi-platform lowered for cpu+tpu by default). Weights stay an
ARGUMENT of the exported program and ship alongside as one msgpack file,
so the N entry points share a single copy of the 100M-param state and the
.stablehlo files stay small.

Artifact layout (out_dir/):
  manifest.json      entry-point signatures, platforms, jax version,
                     model dims (brand_num, common dim, shape caps)
  params.msgpack     {"params": ..., "batch_stats": ...} (flax msgpack)
  <entry>.stablehlo  serialized jax.export.Exported, one per entry point

Entry points (all deterministic forwards, batch dim symbolic by default):
  encode_post  (params, batch_stats, frames, origin, vmask, bows,
                tokens, type_ids, tmask) -> (B, common) fused post embs
  embed_brand  (params, batch_stats) -> (brand_num, common) all brands
  embed_vis    visual-only modality embedding (reference
                VisDataSet4DualEncoding serving path)
  embed_txt    text-only modality embedding

Tracing runs under ops.dispatch.portable_lowering() so the auto-gated
Pallas kernels pick their pure-XLA fallbacks: a Mosaic custom call baked
into the bytes would pin the artifact to the exporting topology.

Artifacts are SINGLE-DEVICE programs by design: serving scales by
replication (one artifact per chip behind a balancer -- encode is
embarrassingly batch-parallel), while the sharded-index path
(serving/index.py with a mesh) covers the one serving stage that needs
multi-chip memory, the 1M+ post top-k. For deployments that DO want one
encode program spanning chips, the supported path is live jit over a
mesh (eval/evaluator.encode_data(mesh=...) / fancyrec-serve
--mesh_shape); the two paths are pinned numerically equal in
tests/test_export.py::test_export_artifact_matches_multichip_live_jit,
so mixing them introduces no numeric seam. Lowering the artifacts
themselves with shardings would bake one topology into the bytes --
exactly the portability the export path exists to avoid.

CLI:
  fancyrec-export out/ --checkpoint model_best.pth.tar [--batch 0]
                       [--platforms cpu,tpu]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from fancyrec_tpu.ops.dispatch import portable_lowering

MANIFEST = "manifest.json"
PARAMS_FILE = "params.msgpack"

# model-input array order of the encode_post entry point; must match the
# loader's batch-dict keys (data/dataset.py:275-278)
POST_ARGS = ("frames", "origin", "vmask", "bows", "tokens", "type_ids",
             "tmask")
VIS_ARGS = ("frames", "origin", "vmask")
TXT_ARGS = ("bows", "tokens", "type_ids", "tmask")


def _batch_specs(cfg, batch) -> Dict[str, jax.ShapeDtypeStruct]:
    """ShapeDtypeStructs of one loader batch. batch==0 -> symbolic 'b'."""
    b = jexport.symbolic_shape("b")[0] if batch == 0 else int(batch)
    tok = cfg.max_tokens if cfg.text_net == "transformers" else cfg.max_words
    f32, i32 = jnp.float32, jnp.int32
    return {
        "frames": jax.ShapeDtypeStruct(
            (b, cfg.max_frames, cfg.visual_feat_dim), f32),
        "origin": jax.ShapeDtypeStruct((b, cfg.visual_feat_dim), f32),
        "vmask": jax.ShapeDtypeStruct((b, cfg.max_frames), f32),
        "bows": jax.ShapeDtypeStruct((b, cfg.bow_vocab_size), f32),
        "tokens": jax.ShapeDtypeStruct((b, tok), i32),
        "type_ids": jax.ShapeDtypeStruct((b, tok), i32),
        "tmask": jax.ShapeDtypeStruct((b, tok), i32),
    }


def _entry_fns(model, cfg):
    """name -> (fn(params, batch_stats, *arrays), arg-name tuple)."""
    from fancyrec_tpu.models.encoders import TextBatch, VisualBatch

    def _vars(params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def encode_post(params, batch_stats, frames, origin, vmask, bows,
                    tokens, type_ids, tmask):
        v = VisualBatch(frames=frames, mean_origin=origin, mask=vmask)
        t = TextBatch(bows=bows, tokens=tokens, type_ids=type_ids,
                      mask=tmask)
        return model.apply(_vars(params, batch_stats), v, t,
                           deterministic=True, method=model.embed_post)

    def embed_brand(params, batch_stats):
        ids = jnp.arange(cfg.brand_num, dtype=jnp.int32)
        return model.apply(_vars(params, batch_stats), ids,
                           deterministic=True, method=model.embed_brand)

    def embed_vis(params, batch_stats, frames, origin, vmask):
        v = VisualBatch(frames=frames, mean_origin=origin, mask=vmask)
        return model.apply(_vars(params, batch_stats), v,
                           deterministic=True, method=model.embed_vis)

    def embed_txt(params, batch_stats, bows, tokens, type_ids, tmask):
        t = TextBatch(bows=bows, tokens=tokens, type_ids=type_ids,
                      mask=tmask)
        return model.apply(_vars(params, batch_stats), t,
                           deterministic=True, method=model.embed_txt)

    entries = {"encode_post": (encode_post, POST_ARGS),
               "embed_brand": (embed_brand, ())}
    if not cfg.single_modal_text:       # visual tower exists
        entries["embed_vis"] = (embed_vis, VIS_ARGS)
    if not cfg.single_modal_visual:     # text tower exists
        entries["embed_txt"] = (embed_txt, TXT_ARGS)
    return entries


def export_model(checkpoint_path: str, out_dir: str,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 batch: int = 0,
                 entries: Optional[Sequence[str]] = None) -> dict:
    """Export every serving entry point of a trained checkpoint.

    batch: 0 = shape-polymorphic batch dim (one artifact serves every
    batch size); N = fixed batch (pad at call time).
    Returns the manifest dict.
    """
    from flax import serialization as fser
    from fancyrec_tpu.models import FancyRec
    from fancyrec_tpu.train import checkpoints

    ckpt = checkpoints.load_any(checkpoint_path)
    cfg = ckpt["config"]
    if cfg.bow_vocab_size <= 0 or (
            cfg.text_net == "bi-gru" and cfg.vocab_size <= 0):
        raise ValueError(
            "checkpoint config has no vocab sizes -- was it saved by "
            "fancyrec-train? (bow_vocab_size=%d)" % cfg.bow_vocab_size)

    state = {"params": ckpt["model"]["params"],
             "batch_stats": ckpt["model"].get("batch_stats", {})}
    # round-trip the state through msgpack BEFORE tracing: the artifact is
    # called with the restored pytree, so trace with exactly that
    # structure (plain dicts of np arrays) -- a FrozenDict/dict mismatch
    # would fail at call time, not export time
    state_bytes = fser.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, state))
    state = fser.msgpack_restore(state_bytes)

    model = FancyRec(cfg)
    specs = _batch_specs(cfg, batch)
    fns = _entry_fns(model, cfg)
    if entries:
        unknown = set(entries) - set(fns)
        if unknown:
            raise ValueError("unknown entry points: %s (have %s)"
                             % (sorted(unknown), sorted(fns)))
        fns = {k: v for k, v in fns.items() if k in entries}

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "format": "fancyrec-stablehlo-v1",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": batch,
        "params_file": PARAMS_FILE,
        "model": {
            "brand_num": int(cfg.brand_num),
            "common_dim": int(cfg.common_embedding_size),
            "text_net": cfg.text_net,
            "fusion_style": cfg.fusion_style,
            "max_frames": int(cfg.max_frames),
            "visual_feat_dim": int(cfg.visual_feat_dim),
            "bow_vocab_size": int(cfg.bow_vocab_size),
            "tokens": int(cfg.max_tokens if cfg.text_net == "transformers"
                          else cfg.max_words),
        },
        "entries": {},
    }
    with portable_lowering():
        for name, (fn, arg_names) in fns.items():
            args = [state["params"], state["batch_stats"]]
            args += [specs[a] for a in arg_names]
            exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
                *args)
            blob = exp.serialize()
            with open(os.path.join(out_dir, name + ".stablehlo"), "wb") as f:
                f.write(blob)
            manifest["entries"][name] = {
                "args": list(arg_names),
                "arg_shapes": {a: [str(d) for d in specs[a].shape]
                               for a in arg_names},
                "arg_dtypes": {a: jnp.dtype(specs[a].dtype).name
                               for a in arg_names},
                "out_shape": [str(d) for d in exp.out_avals[0].shape],
                "bytes": len(blob),
            }
    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(state_bytes)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        f.write(json.dumps(manifest, indent=1))
    return manifest


class ExportedModel:
    """Run exported serving artifacts -- no model code, no Config.

    >>> m = ExportedModel("artifacts/")
    >>> post_embs = m.encode_post(batch)      # loader batch dict
    >>> brands = m.embed_brand()              # (brand_num, common_dim)
    """

    def __init__(self, artifact_dir: str):
        from flax import serialization as fser

        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            self.manifest = json.loads(f.read())
        if self.manifest.get("format") != "fancyrec-stablehlo-v1":
            raise ValueError("not a fancyrec export dir: %s" % artifact_dir)
        with open(os.path.join(artifact_dir,
                               self.manifest["params_file"]), "rb") as f:
            state = fser.msgpack_restore(f.read())
        # commit weights to device ONCE at load: leaving them as host
        # numpy would re-stage ~400 MB of f32 params on every call
        state = jax.device_put(state)
        self._params = state["params"]
        self._batch_stats = state["batch_stats"]
        self._fns = {}
        for name in self.manifest["entries"]:
            with open(os.path.join(artifact_dir,
                                   name + ".stablehlo"), "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            # jit-wrap once: a bare Exported.call re-lowers/compiles on
            # EVERY invocation (~20-40 s each over the axon tunnel); under
            # jit the program compiles once per call shape and is cached
            self._fns[name] = jax.jit(exp.call)

    @property
    def entry_points(self):
        return sorted(self._fns)

    def _call(self, name: str, batch: Optional[dict]):
        if name not in self._fns:
            raise KeyError("entry %r not in artifact (has %s)"
                           % (name, self.entry_points))
        entry = self.manifest["entries"][name]
        arg_names = entry["args"]
        args = [self._params, self._batch_stats]
        if arg_names:
            # cast via the manifest dtypes: JSON/python-list inputs arrive
            # as float64/int64, which the traced program would reject
            dts = entry.get("arg_dtypes", {})
            args += [jnp.asarray(batch[a], dtype=dts.get(a))
                     for a in arg_names]
        return self._fns[name](*args)

    def encode_post(self, batch: dict) -> jnp.ndarray:
        return self._call("encode_post", batch)

    def embed_brand(self) -> jnp.ndarray:
        return self._call("embed_brand", None)

    def embed_vis(self, batch: dict) -> jnp.ndarray:
        return self._call("embed_vis", batch)

    def embed_txt(self, batch: dict) -> jnp.ndarray:
        return self._call("embed_txt", batch)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export serving entry points as StableHLO artifacts")
    p.add_argument("out_dir")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch", type=int, default=0,
                   help="0 = shape-polymorphic batch dim (default); "
                        "N = fixed batch size")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--entries", default="",
                   help="comma-separated subset of entry points "
                        "(default: all)")
    a = p.parse_args(argv)
    manifest = export_model(
        a.checkpoint, a.out_dir,
        platforms=[s for s in a.platforms.split(",") if s],
        batch=a.batch,
        entries=[s for s in a.entries.split(",") if s] or None)
    print(json.dumps({"out": a.out_dir,
                      "entries": sorted(manifest["entries"]),
                      "platforms": manifest["platforms"]}))


if __name__ == "__main__":
    main()
