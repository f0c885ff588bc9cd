"""Quantized dynamic padding (--token_buckets/--frame_buckets) +
length-grouped batching (--length_grouped).

The contract under test: slicing all-pad tail columns off a batch is
numerically EXACT (every model reduction is bounded by the dynamic
batch-max length / mask), so bucketing changes compile shapes, never
results. TPU motivation: insCar is ~90% single-frame image posts padded
to max_frames=64 (reference constant VIDEO_MAX_LEN, util/constant.py)
alongside any video in the batch -- bucketed shapes cut the BiGRU scan
and BERT attention work by up to 8x on image-heavy batches.
"""

import os

import jax
import numpy as np
import pytest

import __graft_entry__ as g
from fancyrec_tpu.config import Config
from fancyrec_tpu.data.loader import BatchLoader, bucket_batch


# ---------------------------------------------------------------- unit --

def _fake_batch(b=4, t=16, f=8, d=6, tlen=(3, 5, 2, 4), flen=(1, 2, 1, 1)):
    rng = np.random.RandomState(0)
    tmask = (np.arange(t)[None] < np.array(tlen)[:, None]).astype(np.int32)
    vmask = (np.arange(f)[None] < np.array(flen)[:, None]).astype(np.float32)
    return {
        "tokens": rng.randint(1, 99, (b, t)).astype(np.int32) * tmask,
        "type_ids": np.zeros((b, t), np.int32),
        "tmask": tmask,
        "frames": rng.randn(b, f, d).astype(np.float32)
        * vmask[:, :, None],
        "vmask": vmask,
        "bows": rng.randn(b, 7).astype(np.float32),
    }


def test_bucket_batch_slices_to_covering_bucket():
    batch = _fake_batch()          # max tlen 5, max flen 2
    out = bucket_batch(batch, token_buckets=[4, 8, 16],
                       frame_buckets=[2, 4, 8])
    assert out["tokens"].shape == (4, 8)
    assert out["tmask"].shape == (4, 8)
    assert out["type_ids"].shape == (4, 8)
    assert out["frames"].shape == (4, 2, 6)
    assert out["vmask"].shape == (4, 2)
    # untouched keys pass through by identity
    assert out["bows"] is batch["bows"]
    # sliced content is the prefix
    np.testing.assert_array_equal(out["tokens"], batch["tokens"][:, :8])
    np.testing.assert_array_equal(out["frames"], batch["frames"][:, :2])


def test_bucket_batch_superbatch_axes():
    """Stacked (A, B, ...) super-batches slice the same trailing axes."""
    b1, b2 = _fake_batch(), _fake_batch(tlen=(7, 1, 1, 1), flen=(3, 1, 1, 1))
    sb = {k: np.stack([b1[k], b2[k]]) for k in b1}
    out = bucket_batch(sb, token_buckets=[8, 16], frame_buckets=[4, 8])
    assert out["tokens"].shape == (2, 4, 8)
    assert out["frames"].shape == (2, 4, 4, 6)
    np.testing.assert_array_equal(out["vmask"], sb["vmask"][..., :4])


def test_bucket_batch_noop_cases():
    batch = _fake_batch(tlen=(16, 3, 3, 3), flen=(8, 1, 1, 1))
    # batch max hits the cap -> nothing sliced
    out = bucket_batch(batch, token_buckets=[8, 16], frame_buckets=[4, 8])
    assert out["tokens"].shape == (4, 16)
    assert out["frames"].shape == (4, 8, 6)
    # no buckets configured -> identity
    out = bucket_batch(batch)
    assert out["tokens"] is batch["tokens"]


def test_config_bucket_parsing():
    cfg = Config(text_net="transformers", max_tokens=24, max_frames=8,
                 token_buckets="8,16", frame_buckets="4").finalize()
    assert cfg.token_buckets_list == [8, 16, 24]   # cap auto-appended
    assert cfg.frame_buckets_list == [4, 8]
    # rnn path caps at max_words
    cfg = Config(text_net="bi-gru", max_words=12,
                 token_buckets="4").finalize()
    assert cfg.token_buckets_list == [4, 12]
    with pytest.raises(ValueError):
        Config(token_buckets="0,8").finalize()
    with pytest.raises(ValueError):
        Config(max_tokens=16, token_buckets="32").finalize()
    with pytest.raises(ValueError):
        Config(token_buckets="abc").finalize()
    assert Config().finalize().token_buckets_list == []


# ------------------------------------------------------------- loader --

class _LenDataset:
    """Minimal PostDataset stand-in: length_keys + gather_batch."""

    def __init__(self, keys):
        self._keys = np.asarray(keys, np.int64)

    def __len__(self):
        return len(self._keys)

    def length_keys(self):
        return self._keys

    def gather_batch(self, indices, pad_to=None):
        return {"idxs": np.asarray(list(indices), np.int64)}


def test_loader_grouped_is_a_permutation():
    rng = np.random.RandomState(3)
    ds = _LenDataset(rng.randint(0, 50, 97))
    for grouped in ("sort", "window"):
        loader = BatchLoader(ds, 8, shuffle=(grouped == "window"),
                             final_batch="pad", grouped=grouped)
        seen = np.concatenate([b["idxs"] for b in loader])
        assert sorted(seen.tolist()) == list(range(97))
    # 'sort' emits batches in globally nondecreasing key order
    loader = BatchLoader(ds, 8, final_batch="pad", grouped="sort")
    keys = np.concatenate([ds._keys[b["idxs"]] for b in loader])
    assert (np.diff(keys) >= 0).all()


def test_loader_window_grouping_localizes_lengths():
    """Window mode: each batch's key spread shrinks vs plain shuffle, and
    batch ORDER is re-shuffled (no shortest->longest curriculum)."""
    rng = np.random.RandomState(0)
    ds = _LenDataset(rng.randint(0, 1000, 4096))
    bs = 8

    def spread(grouped):
        loader = BatchLoader(ds, bs, shuffle=True, seed=5, grouped=grouped)
        return [float(np.ptp(ds._keys[b["idxs"]])) for b in loader]

    plain, windowed = spread("off"), spread("window")
    assert np.mean(windowed) < 0.2 * np.mean(plain)
    loader = BatchLoader(ds, bs, shuffle=True, seed=5, grouped="window")
    firsts = [ds._keys[b["idxs"]].max() for b in loader]
    assert (np.diff(firsts) >= 0).mean() < 0.9  # not length-sorted order


# ---------------------------------------------------- model exactness --

@pytest.mark.slow
def test_encode_bucketed_matches_full_pad():
    """Eval forward on the bucket-sliced batch == the full static pad.

    Equal in real arithmetic (pad columns are exact zeros everywhere);
    in f32 XLA re-tiles reductions per shape, so the residual is pure
    summation-reassociation noise (measured max 2e-7)."""
    from fancyrec_tpu.eval.evaluator import make_encode_fn
    from fancyrec_tpu.train.state import init_state

    cfg = g._flagship_cfg(tiny=True)
    model, state = init_state(cfg)
    encode = make_encode_fn(model)
    rng = np.random.RandomState(0)
    batch = {k: np.array(v)
             for k, v in g._example_batch(cfg, cfg.batch_size, rng).items()}
    # force headroom so the buckets actually slice
    batch["tmask"][:, 6:] = 0
    batch["vmask"][:, 3:] = 0
    batch["tokens"] *= batch["tmask"]
    batch["frames"] *= batch["vmask"][:, :, None]

    full = np.asarray(encode(state.params, state.batch_stats, batch))
    sliced = bucket_batch(batch, token_buckets=[8, cfg.max_tokens],
                          frame_buckets=[4, cfg.max_frames])
    assert sliced["tokens"].shape[-1] == 8
    assert sliced["frames"].shape[-2] == 4
    bucketed = np.asarray(encode(state.params, state.batch_stats, sliced))
    np.testing.assert_allclose(full, bucketed, rtol=0, atol=2e-6)


@pytest.mark.slow
def test_train_step_a1_fast_path_matches_manual():
    """A=1 skips the accumulation scan; the update must equal the manual
    grad_fn + optimizer application with the identical rng split."""
    from functools import partial

    import optax

    from fancyrec_tpu.train.state import init_state, make_optimizer
    from fancyrec_tpu.train.step import (
        _micro_loss, make_train_step, stack_microbatches)

    cfg = g._flagship_cfg(tiny=True)
    cfg.accumulation_step = 1
    model, state = init_state(cfg)
    tx = make_optimizer(cfg)
    batch = {k: np.asarray(v)
             for k, v in g._example_batch(cfg, cfg.batch_size).items()}
    sb = stack_microbatches([batch])
    assert next(iter(sb.values())).shape[0] == 1

    # manual reference BEFORE the step call (the step donates state)
    _, sub = jax.random.split(state.rng)
    (loss, _), grads = jax.value_and_grad(
        partial(_micro_loss, model, cfg), has_aux=True)(
        state.params, state.batch_stats, state.queue, sub, batch)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    params_ref = jax.device_get(optax.apply_updates(state.params, updates))
    loss_ref = float(loss)

    step = make_train_step(model, cfg, tx)
    new_state, metrics = step(state, sb)
    assert float(metrics["loss"]) == pytest.approx(loss_ref, rel=1e-6)
    assert float(metrics["last_loss"]) == pytest.approx(loss_ref, rel=1e-6)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(jax.device_get(new_state.params))):
        # the manual path runs eager; jit reassociates the grad
        # reductions, and Adam's 1/(sqrt(v)+eps) amplifies that ulp
        # noise for near-zero grads (measured max 4e-6 on 2/65536 elems)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- e2e ----

@pytest.mark.slow
def test_train_e2e_bucketed(tmp_path):
    """Full trainer CLI with buckets + length-grouped batching learns the
    fixture's brand signal and the tester reproduces it (the tester picks
    the bucket config up from the checkpoint)."""
    from fancyrec_tpu.eval import tester
    from fancyrec_tpu.train import trainer
    from fancyrec_tpu.utils.fixture import make_fixture

    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    best = trainer.main([
        "insCartrain", "insCarval", "insCartest",
        "--rootpath", root, "--postfix", "run_buckets",
        "--brand_num", "3", "--brand_aspect", "16",
        "--video_feature", "resnet152_dim_16",
        "--img_feature", "imgfeat_dim_16",
        "--common_embedding_size", "32", "--visual_rnn_size", "16",
        "--text_rnn_size", "16", "--visual_kernel_num", "8",
        "--text_kernel_num", "8", "--text_mapping_size", "32",
        "--visual_mapping_size", "32", "--word_dim", "16",
        "--batch_size", "4", "--accumulation_step", "2",
        "--learning_rate", "0.001", "--overwrite", "1",
        "--max_frames", "8", "--max_tokens", "24", "--max_words", "16",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
        "--token_buckets", "8,12", "--frame_buckets", "2,4",
        "--length_grouped", "1",
    ])
    assert best > 450, best
    logdir = os.path.join(root, "model", "run_buckets")
    m = tester.main(["insCartest", "--rootpath", root,
                     "--logger_name", logdir, "--batch_size", "4"])
    assert m.auc > 0.8


@pytest.mark.slow   # 40 s: bucketed encode over the full 8-device mesh
def test_encode_bucketed_under_mesh_matches_single_device():
    """Bucketed encode over an 8-device data mesh == single-device: the
    bucket slice happens before shard_batch, so each bucket shape shards
    the batch axis independently."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.eval.evaluator import encode_data
    from fancyrec_tpu.parallel.mesh import build_mesh
    from fancyrec_tpu.train.state import init_state

    cfg = g._flagship_cfg(tiny=True)
    model, state = init_state(cfg)

    class _Loader:
        def __init__(self, batches):
            self.batches = batches
            self.dataset = [None] * sum(b["n_valid"] for b in batches)

        def __iter__(self):
            return iter(self.batches)

    rng = np.random.RandomState(0)
    batches = []
    for i in range(3):
        b = {k: np.array(v)
             for k, v in g._example_batch(cfg, cfg.batch_size, rng).items()}
        b["tmask"][:, 5 + i:] = 0
        b["vmask"][:, 2 + i:] = 0
        b["tokens"] *= b["tmask"]
        b["frames"] *= b["vmask"][:, :, None]
        b["idxs"] = np.arange(i * cfg.batch_size, (i + 1) * cfg.batch_size)
        b["n_valid"] = cfg.batch_size
        batches.append(b)

    kw = dict(token_buckets=[8, cfg.max_tokens],
              frame_buckets=[4, cfg.max_frames])
    _, single = encode_data(model, state.params, state.batch_stats,
                            _Loader(batches), cfg.common_embedding_size, **kw)
    mesh = build_mesh("8,1")
    with jax.set_mesh(mesh):
        _, sharded = encode_data(model, state.params, state.batch_stats,
                                 _Loader(batches), cfg.common_embedding_size,
                                 mesh=mesh, **kw)
    np.testing.assert_allclose(single, sharded, rtol=0, atol=2e-6)


@pytest.mark.slow
def test_bert_remat_is_numerically_transparent():
    """--bert_remat recomputes BERT-layer activations in the backward
    (jax.checkpoint) instead of storing them: ~1/num_layers the
    activation HBM for one extra forward of FLOPs. It must not change
    the training math -- same loss, same updated params."""
    from fancyrec_tpu.train.state import init_state, make_optimizer
    from fancyrec_tpu.train.step import make_train_step, stack_microbatches

    results = {}
    for remat in (False, True):
        cfg = g._flagship_cfg(tiny=True)
        cfg.accumulation_step = 1
        cfg.bert_remat = remat
        model, state = init_state(cfg)
        sb = stack_microbatches([{
            k: np.asarray(v)
            for k, v in g._example_batch(cfg, cfg.batch_size).items()}])
        step = make_train_step(model, cfg, make_optimizer(cfg))
        new_state, metrics = step(state, sb)
        results[remat] = (float(metrics["loss"]),
                          jax.device_get(new_state.params))

    assert results[False][0] == pytest.approx(results[True][0], rel=1e-6)
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_bert_remat_cli_flag_plumbs_through():
    from fancyrec_tpu.config import build_train_parser, config_from_args
    args = build_train_parser().parse_args(
        ["tr", "va", "te", "--bert_remat", "1"])
    assert config_from_args(args).bert_remat
    args = build_train_parser().parse_args(["tr", "va", "te"])
    assert not config_from_args(args).bert_remat
