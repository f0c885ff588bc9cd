"""Checkpoint save/load.

Artifact-level parity with the reference (trainer.py:294-301,417-422):
files named checkpoint_epoch_<e>.pth.tar + model_best.pth.tar, each holding
{epoch, model state, best_rsum, config, Eiters}; the tester reconstructs
the full train-time config from the checkpoint alone (tester.py:63-65).
Contents are msgpack (flax.serialization) + JSON config -- device-agnostic
by construction (the reference's CUDA-only pickles cannot restore on CPU;
ours restore anywhere).

load_any() also ingests *reference torch checkpoints* directly: the
list-form state dict is converted via fancyrec_tpu.models.torch_import, so
GPU-trained reference models evaluate on TPU.

Why not Orbax: single-file artifacts with the reference's exact names and
an embedded config make the tester/workflow parity trivial and keep the
torch-ingestion path symmetric; flax.serialization gives the same
device-agnostic restore guarantees at this model size. Orbax would add
sharded/async saving which matters only far beyond this state size.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from fancyrec_tpu.config import Config

_MAGIC = b"FRTPU1\n"


def save_checkpoint(path: str, cfg: Config, params, batch_stats,
                    epoch: int, best_rsum: float, eiters: int,
                    opt_state=None, extra_meta=None) -> None:
    """opt_state (optional): full optimizer moments, so an elastic resume
    continues the exact Adam trajectory (the reference drops optimizer
    state on resume, trainer.py:262-279). extra_meta: additional scalar
    state to persist (LR-decay/early-stop counters)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = {"epoch": epoch, "best_rsum": best_rsum, "Eiters": eiters,
            "has_opt_state": opt_state is not None}
    meta.update(extra_meta or {})
    payload = {
        "model": serialization.to_bytes(
            {"params": jax.device_get(params),
             "batch_stats": jax.device_get(batch_stats)}),
        "config": cfg.to_json().encode(),
        "meta": json.dumps(meta).encode(),
        "opt": (serialization.to_bytes(jax.device_get(opt_state))
                if opt_state is not None else b""),
    }
    # atomic write: a preemption mid-save must never leave a truncated
    # file that _latest_epoch_checkpoint would pick as the newest
    # checkpoint and auto_resume would then crash-loop on
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        for key in ("config", "meta", "model", "opt"):
            blob = payload[key]
            f.write(struct.pack("<Q", len(blob)))
            f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template=None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError("not a fancyrec-tpu checkpoint: %s" % path)
        blobs = []
        while True:
            size = f.read(8)
            if len(size) < 8:
                break
            (n,) = struct.unpack("<Q", size)
            blobs.append(f.read(n))
    cfg = Config.from_json(blobs[0].decode())
    meta = json.loads(blobs[1].decode())
    if template is not None:
        model_state = serialization.from_bytes(template, blobs[2])
    else:
        model_state = serialization.msgpack_restore(blobs[2])
    out = {"config": cfg, "model": model_state, **meta}
    if meta.get("has_opt_state") and len(blobs) > 3 and blobs[3]:
        out["opt_state_bytes"] = blobs[3]
    return out


def prune_old_checkpoints(state_dir: str, keep: int) -> None:
    """Delete all but the newest `keep` epoch checkpoint files (by epoch
    number). keep <= 0 keeps everything -- the reference's behavior
    (one ~1.3 GB file per improving epoch at recipe scale adds up fast).
    model_best.pth.tar is a COPY, never pruned, and auto_resume's
    latest-epoch scan only ever needs the newest file."""
    import re
    if keep <= 0 or not os.path.isdir(state_dir):
        return
    epochs = []
    for f in os.listdir(state_dir):
        m = re.match(r"checkpoint_epoch_(\d+)\.pth\.tar$", f)
        if m:
            epochs.append((int(m.group(1)), f))
    for _, f in sorted(epochs)[:-keep]:
        try:
            os.remove(os.path.join(state_dir, f))
        except OSError:
            pass


def maybe_save_best(state_dir: str, cfg: Config, params, batch_stats,
                    epoch: int, score: float, best_rsum: float,
                    eiters: int, best_epoch: Optional[int],
                    opt_state=None, extra_meta=None) -> float:
    """Reference checkpoint policy (trainer.py:417-422): save the epoch file
    when score > best*0.99 (or no best yet), copy to model_best on
    improvement, return the new best.

    The checkpoint records the RUNNING best (max of score and the best so
    far). Deliberate fix, listed in README fidelity notes: the reference
    stores the current epoch's score as 'best_rsum'
    (trainer.py:294-297), so a resume from a non-best epoch file would
    let a later, globally-worse epoch overwrite model_best."""
    filename = os.path.join(state_dir, "checkpoint_epoch_%s.pth.tar" % epoch)
    new_best = max(score, best_rsum)
    if best_epoch is None or score > best_rsum * 0.99:
        save_checkpoint(filename, cfg, params, batch_stats, epoch + 1,
                        new_best, eiters, opt_state=opt_state,
                        extra_meta=extra_meta)
    if score > best_rsum:
        shutil.copyfile(filename, os.path.join(state_dir, "model_best.pth.tar"))
    prune_old_checkpoints(state_dir, getattr(cfg, "keep_checkpoints", 0))
    return new_best


def restore_opt_state(ckpt: Dict[str, Any], opt_state_template):
    """Deserialize the saved optimizer moments onto a freshly-built
    opt_state pytree (returns the template unchanged if absent)."""
    blob = ckpt.get("opt_state_bytes")
    if not blob:
        return opt_state_template, False
    return serialization.from_bytes(opt_state_template, blob), True


def load_any(path: str, cfg_hint: Optional[Config] = None) -> Dict[str, Any]:
    """Load ours or a reference torch checkpoint (auto-detected)."""
    with open(path, "rb") as f:
        head = f.read(len(_MAGIC))
    if head == _MAGIC:
        return load_checkpoint(path)

    # torch checkpoint: {'epoch','model' (list form),'best_rsum','opt','Eiters'}
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    opt = ckpt.get("opt")
    if cfg_hint is not None:
        cfg = cfg_hint
    else:
        known = {f.name for f in __import__("dataclasses").fields(Config)}
        raw = {k: v for k, v in vars(opt).items() if k in known}
        # reference mutates these into lists during setup; undo for Config
        for k in ("text_mapping_size", "visual_mapping_size"):
            if isinstance(raw.get(k), (list, tuple)):
                raw[k] = raw[k][1]
        for k in ("text_kernel_sizes", "visual_kernel_sizes"):
            if isinstance(raw.get(k), (list, tuple)):
                raw[k] = "-".join(str(x) for x in raw[k])
        raw.pop("optimizer", None)  # reference stores the optimizer object here
        cfg = Config(**{k: v for k, v in raw.items()
                        if not k.startswith("_")}).finalize()
    from fancyrec_tpu.models.torch_import import fancyrec_variables_from_reference
    variables = fancyrec_variables_from_reference(ckpt["model"], cfg)
    return {
        "config": cfg,
        "model": {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})},
        "epoch": ckpt.get("epoch", 0),
        "best_rsum": ckpt.get("best_rsum", 0.0),
        "Eiters": ckpt.get("Eiters", 0),
    }
