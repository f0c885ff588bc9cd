"""jax.export serving artifacts: export, reload WITHOUT model code, run.

The exported StableHLO programs must reproduce the live model bit-for-bit
(same platform, pure-XLA lowering) and -- with the default symbolic batch
dim -- serve any batch size from one artifact.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fancyrec_tpu.config import Config
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
from fancyrec_tpu.serving.export import (
    ExportedModel, export_model, main as export_main)
from fancyrec_tpu.train import checkpoints
from fancyrec_tpu.train.state import init_state


def _tiny_cfg(text_net="transformers"):
    return Config(
        brand_num=4, brand_aspect=8, common_embedding_size=16,
        visual_rnn_size=8, text_rnn_size=8, visual_kernel_num=4,
        text_kernel_num=4, visual_feat_dim=12, bow_vocab_size=20,
        vocab_size=32, text_transformers_hidden_size=24,
        text_net=text_net, fusion_style="ph", loss_fun="cl",
        cost_style="mean", queue_size=16, text_mapping_size=16,
        visual_mapping_size=16, max_frames=6, max_tokens=10,
        max_words=8, batch_size=4, accumulation_step=1).finalize()


def _batch(cfg, b, seed=0):
    rng = np.random.RandomState(seed)
    tok = cfg.max_tokens if cfg.text_net == "transformers" else cfg.max_words
    flen = rng.randint(1, cfg.max_frames + 1, b)
    tlen = rng.randint(1, tok + 1, b)
    return {
        "frames": rng.randn(b, cfg.max_frames, cfg.visual_feat_dim)
                     .astype(np.float32),
        "origin": rng.randn(b, cfg.visual_feat_dim).astype(np.float32),
        "vmask": (np.arange(cfg.max_frames)[None] < flen[:, None])
                    .astype(np.float32),
        "bows": rng.rand(b, cfg.bow_vocab_size).astype(np.float32),
        "tokens": (rng.randint(1, 30, (b, tok))
                   * (np.arange(tok)[None] < tlen[:, None])).astype(np.int32),
        "type_ids": np.zeros((b, tok), np.int32),
        "tmask": (np.arange(tok)[None] < tlen[:, None]).astype(np.int32),
    }


def _make_ckpt(tmp_path, cfg):
    model, state = init_state(cfg, seed=0)
    path = str(tmp_path / "model_best.pth.tar")
    checkpoints.save_checkpoint(path, cfg, state.params, state.batch_stats,
                                epoch=1, best_rsum=0.0, eiters=1)
    return model, state, path


def _direct(model, state, cfg, batch, method):
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    v = VisualBatch(frames=jnp.asarray(batch["frames"]),
                    mean_origin=jnp.asarray(batch["origin"]),
                    mask=jnp.asarray(batch["vmask"]))
    t = TextBatch(bows=jnp.asarray(batch["bows"]),
                  tokens=jnp.asarray(batch["tokens"]),
                  type_ids=jnp.asarray(batch["type_ids"]),
                  mask=jnp.asarray(batch["tmask"]))
    if method == "encode_post":
        return model.apply(variables, v, t, deterministic=True,
                           method=model.embed_post)
    if method == "embed_vis":
        return model.apply(variables, v, deterministic=True,
                           method=model.embed_vis)
    if method == "embed_txt":
        return model.apply(variables, t, deterministic=True,
                           method=model.embed_txt)
    raise KeyError(method)


@pytest.mark.slow
def test_export_roundtrip_polymorphic_batch(tmp_path):
    cfg = _tiny_cfg()
    model, state, ckpt = _make_ckpt(tmp_path, cfg)
    out = str(tmp_path / "artifacts")
    manifest = export_model(ckpt, out, platforms=("cpu",), batch=0)
    assert set(manifest["entries"]) == {
        "encode_post", "embed_brand", "embed_vis", "embed_txt"}
    # symbolic batch dim recorded in the manifest
    assert manifest["entries"]["encode_post"]["arg_shapes"]["frames"][0] == "b"

    loaded = ExportedModel(out)
    # no model code involved from here on: only manifest + stablehlo bytes
    for b in (4, 7):   # one artifact, two batch sizes
        batch = _batch(cfg, b, seed=b)
        for entry in ("encode_post", "embed_vis", "embed_txt"):
            got = np.asarray(loaded._call(entry, batch))
            want = np.asarray(_direct(model, state, cfg, batch, entry))
            assert got.shape == want.shape == (b, cfg.common_embedding_size)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    brands = np.asarray(loaded.embed_brand())
    ids = jnp.arange(cfg.brand_num, dtype=jnp.int32)
    want = np.asarray(model.apply({"params": state.params}, ids,
                                  deterministic=True,
                                  method=model.embed_brand))
    np.testing.assert_allclose(brands, want, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_export_fixed_batch_and_bigru(tmp_path):
    cfg = _tiny_cfg(text_net="bi-gru")
    model, state, ckpt = _make_ckpt(tmp_path, cfg)
    out = str(tmp_path / "artifacts")
    manifest = export_model(ckpt, out, platforms=("cpu",), batch=3,
                            entries=["encode_post"])
    assert list(manifest["entries"]) == ["encode_post"]
    # bi-gru path: token axis is max_words, not max_tokens
    assert manifest["entries"]["encode_post"]["arg_shapes"]["tokens"] == \
        ["3", str(cfg.max_words)]
    loaded = ExportedModel(out)
    batch = _batch(cfg, 3, seed=1)
    got = np.asarray(loaded.encode_post(batch))
    want = np.asarray(_direct(model, state, cfg, batch, "encode_post"))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # entry points absent from the artifact raise, not silently misroute
    with pytest.raises(KeyError):
        loaded.embed_vis(batch)


@pytest.mark.slow   # 31 s: serializes a cpu+tpu multi-platform artifact
def test_export_multiplatform_lowering(tmp_path):
    """cpu+tpu multi-platform lowering must serialize from a CPU-only
    process (cross-platform deployment is the point of the artifact)."""
    cfg = _tiny_cfg()
    _, _, ckpt = _make_ckpt(tmp_path, cfg)
    out = str(tmp_path / "artifacts")
    manifest = export_model(ckpt, out, platforms=("cpu", "tpu"), batch=0,
                            entries=["encode_post", "embed_brand"])
    assert manifest["platforms"] == ["cpu", "tpu"]
    loaded = ExportedModel(out)   # still callable on the CPU side
    got = loaded.encode_post(_batch(cfg, 2))
    assert np.isfinite(np.asarray(got)).all()


def test_export_cli(tmp_path, capsys):
    cfg = _tiny_cfg()
    _, _, ckpt = _make_ckpt(tmp_path, cfg)
    out = str(tmp_path / "artifacts")
    export_main([out, "--checkpoint", ckpt, "--platforms", "cpu",
                 "--entries", "embed_brand"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["entries"] == ["embed_brand"]
    assert os.path.exists(os.path.join(out, "manifest.json"))
    assert os.path.exists(os.path.join(out, "embed_brand.stablehlo"))
    assert os.path.exists(os.path.join(out, "params.msgpack"))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="cross-platform artifact check needs a TPU")
def test_export_artifact_runs_on_tpu(tmp_path):
    """The cpu+tpu multi-platform artifact must EXECUTE on real TPU
    hardware and match the live model run on the same chip (run with
    FANCYREC_TEST_TPU=1 on the v5e)."""
    cfg = _tiny_cfg()
    model, state, ckpt = _make_ckpt(tmp_path, cfg)
    out = str(tmp_path / "artifacts")
    export_model(ckpt, out, platforms=("cpu", "tpu"), batch=0)
    loaded = ExportedModel(out)
    batch = _batch(cfg, 4, seed=2)
    got = np.asarray(loaded.encode_post(batch))
    want = np.asarray(_direct(model, state, cfg, batch, "encode_post"))
    # both sides run on the same TPU; exported vs live jit may fuse
    # differently (f32 reassociation only)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    brands = np.asarray(loaded.embed_brand())
    assert brands.shape == (cfg.brand_num, cfg.common_embedding_size)
    assert np.isfinite(brands).all()


@pytest.mark.slow
def test_export_artifact_matches_multichip_live_jit(tmp_path):
    """Pins the multi-chip serving scope decision (serving/export.py
    docstring): artifacts are single-device by design, and the SUPPORTED
    multi-chip serving path is live jit over a mesh. This test is the
    evidence that the two paths agree -- the single-device artifact and
    the live encode forward data-sharded over the full 8-device mesh
    produce the same embeddings (f32 reassociation tolerance), so an
    operator can mix replicated-artifact serving with mesh live-jit
    serving without a numeric seam."""
    from fancyrec_tpu.parallel.mesh import build_mesh, shard_batch

    cfg = _tiny_cfg()
    model, state, ckpt = _make_ckpt(tmp_path, cfg)
    out = str(tmp_path / "artifacts")
    export_model(ckpt, out, platforms=("cpu",), batch=0,
                 entries=["encode_post"])
    loaded = ExportedModel(out)

    mesh = build_mesh()           # all 8 virtual devices on the data axis
    assert mesh.devices.size == len(jax.devices())
    b = 2 * mesh.devices.size     # divisible batch, 2 rows per device
    batch = _batch(cfg, b, seed=3)

    got_artifact = np.asarray(loaded.encode_post(batch))

    dev_batch = shard_batch(mesh, {k: jnp.asarray(v)
                                   for k, v in batch.items()})
    v = VisualBatch(frames=dev_batch["frames"],
                    mean_origin=dev_batch["origin"],
                    mask=dev_batch["vmask"])
    t = TextBatch(bows=dev_batch["bows"], tokens=dev_batch["tokens"],
                  type_ids=dev_batch["type_ids"], mask=dev_batch["tmask"])
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    live = jax.jit(lambda vars_, vb, tb: model.apply(
        vars_, vb, tb, deterministic=True, method=model.embed_post))
    got_live = np.asarray(live(variables, v, t))

    assert got_live.shape == got_artifact.shape == (
        b, cfg.common_embedding_size)
    np.testing.assert_allclose(got_live, got_artifact, rtol=0, atol=1e-5)


def test_export_rejects_unknown_entry(tmp_path):
    cfg = _tiny_cfg()
    _, _, ckpt = _make_ckpt(tmp_path, cfg)
    with pytest.raises(ValueError, match="unknown entry"):
        export_model(ckpt, str(tmp_path / "a"), platforms=("cpu",),
                     entries=["nope"])
