"""Multi-chip sharding validation on the virtual 8-device CPU mesh."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts finite loss internally


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_subprocess():
    """The driver calls dryrun_multichip under the real 1-chip axon backend;
    it must re-exec itself onto a virtual CPU mesh rather than assert.
    Exercise the subprocess path directly (it is device-count independent)."""
    import __graft_entry__ as g
    g._reexec_on_virtual_cpu_mesh(8)  # raises on subprocess failure


def test_initialize_multihost_single_host_is_noop(monkeypatch):
    """Single-host setups (including a tunneled single chip exporting
    TPU_WORKER_HOSTNAMES=localhost) must not attempt jax.distributed
    .initialize. True multi-host bring-up can't run in this environment;
    bin/pod_instance.sh documents the launch recipe and this guard keeps
    the autodetect from misfiring on single hosts."""
    import fancyrec_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "_initialized", False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert dist.initialize_multihost() is False
    assert calls == []

    # a 2-entry worker list IS a pod: initialize must be attempted
    monkeypatch.setattr(dist, "_initialized", False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    dist.initialize_multihost()
    assert len(calls) == 1


def test_param_shardings_rules():
    from jax.sharding import PartitionSpec as P
    from fancyrec_tpu.parallel.mesh import build_mesh, param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = build_mesh("4,2")
    params = {
        "brand_encoding": {
            "aspects_embeddings": np.zeros((2000, 1024)),
            "brand_embeddings": np.zeros((52, 2000)),
        },
        "text_encoding": {
            "text_mapping": {"fc1": {"kernel": np.zeros((9000, 1024)),
                                     "bias": np.zeros(1024)}},
        },
        "misc": {"w": np.zeros((7,))},   # odd size: must stay replicated
    }
    sh = param_shardings(mesh, params)
    assert sh["brand_encoding"]["aspects_embeddings"].spec == P("model", None)
    assert sh["brand_encoding"]["brand_embeddings"].spec == P(None, "model")
    assert sh["text_encoding"]["text_mapping"]["fc1"]["kernel"].spec == P("model", None)
    assert sh["text_encoding"]["text_mapping"]["fc1"]["bias"].spec == P()
    assert sh["misc"]["w"].spec == P()


@pytest.mark.slow
def test_distributed_eval_matches_single_device():
    """Sharded brands x posts similarity + metrics == single-device result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fancyrec_tpu.eval.metrics import cosine_sim_matrix, ranking_metrics_jax
    from fancyrec_tpu.parallel.mesh import build_mesh

    rng = np.random.RandomState(0)
    brands_emb = rng.randn(8, 32).astype(np.float32)
    posts = rng.randn(400, 32).astype(np.float32)
    labels = rng.randint(0, 8, 400).astype(np.int32)

    single = ranking_metrics_jax(
        np.asarray(cosine_sim_matrix(brands_emb, posts)), labels, 8)

    mesh = build_mesh("8,1")
    with mesh:
        posts_sh = jax.device_put(posts, NamedSharding(mesh, P("data", None)))
        labels_sh = jax.device_put(labels, NamedSharding(mesh, P("data")))
        scores = cosine_sim_matrix(jax.device_put(brands_emb), posts_sh)
        multi = ranking_metrics_jax(scores, labels_sh, 8)

    for a, b in zip(single, multi):
        np.testing.assert_allclose(float(a), float(b), atol=1e-5)


@pytest.mark.slow
def test_trainer_cli_mesh_end_to_end(tmp_path):
    """`fancyrec-train ... --mesh_shape 4,2` must train end-to-end on the
    virtual 8-device mesh from the CLI (the production wiring, not just the
    step library) and produce the same score as an explicit 1-device run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.train import trainer
    from fancyrec_tpu.utils.fixture import make_fixture

    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    common = [
        "insCartrain", "insCarval", "insCartest", "--rootpath", root,
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
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "1",
    ]
    best_multi = trainer.main(common + ["--postfix", "run_mesh42",
                                        "--mesh_shape", "4,2"])
    best_single = trainer.main(common + ["--postfix", "run_mesh11",
                                         "--mesh_shape", "1,1"])
    assert best_multi > 400, best_multi
    assert best_multi == pytest.approx(best_single, rel=1e-3)
    import os
    assert os.path.exists(os.path.join(root, "model", "run_mesh42",
                                       "model_best.pth.tar"))


@pytest.mark.slow
def test_trainer_cli_pipeline_parallel_matches_pp_off(tmp_path):
    """`fancyrec-train ... --pp_stages 2` runs the production trainer with
    the BERT stack GPipe-pipelined over the 'model' axis and reproduces
    the pp-off run's score (--bert_dropout 0 makes the stochastic paths
    fold to the same deterministic program; residual = f32 reassociation)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.train import trainer
    from fancyrec_tpu.utils.fixture import make_fixture

    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    common = [
        "insCartrain", "insCarval", "insCartest", "--rootpath", root,
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
        "--text_net", "transformers", "--fusion_style", "ph",
        "--text_transformers_hidden_size", "48",
        "--bert_num_layers", "4", "--bert_dropout", "0",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "1",
    ]
    # mesh 2,2: microbatch 2 (= batch 4 / 2 stages) divides data axis 2
    best_pp = trainer.main(common + ["--postfix", "run_pp",
                                     "--mesh_shape", "2,2",
                                     "--pp_stages", "2"])
    best_off = trainer.main(common + ["--postfix", "run_ppoff",
                                      "--mesh_shape", "2,2"])
    assert best_pp > 400, best_pp
    assert best_pp == pytest.approx(best_off, rel=1e-3)
    assert os.path.exists(os.path.join(root, "model", "run_pp",
                                       "model_best.pth.tar"))


def test_pp_stages_config_validation():
    """--pp_stages misconfigurations fail at config time with actionable
    messages, not as GSPMD errors from inside the step."""
    from fancyrec_tpu.config import Config

    base = dict(text_net="transformers", bert_num_layers=4, batch_size=8)
    with pytest.raises(ValueError, match="not divisible by --pp_stages"):
        Config(**{**base, "pp_stages": 3}).finalize()
    with pytest.raises(ValueError, match="needs --text_net transformers"):
        Config(**{**base, "text_net": "bi-gru", "pp_stages": 2}).finalize()
    with pytest.raises(ValueError, match="must equal the model mesh axis"):
        Config(**{**base, "pp_stages": 2, "mesh_shape": "2,4"}).finalize()
    with pytest.raises(ValueError, match="pipeline microbatch"):
        Config(**{**base, "pp_stages": 2, "mesh_shape": "8,2",
                  "batch_size": 8}).finalize()
    Config(**{**base, "pp_stages": 2, "mesh_shape": "2,2"}).finalize()


@pytest.mark.slow
def test_sharded_step_matches_unsharded():
    """One full train step: dp+tp+sp sharded over the 8-device mesh must
    produce the same loss and parameters as the single-device run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    import __graft_entry__ as g
    from fancyrec_tpu.parallel.mesh import build_mesh, shard_batch, shard_state
    from fancyrec_tpu.train.state import init_state, make_optimizer
    from fancyrec_tpu.train.step import make_train_step, stack_microbatches

    def run(sharded):
        cfg = g._flagship_cfg(tiny=True)
        cfg.seq_shard = sharded
        rng = np.random.RandomState(0)
        micro = [{k: np.asarray(v) for k, v in
                  g._example_batch(cfg, cfg.batch_size, rng).items()}
                 for _ in range(cfg.accumulation_step)]
        sb = stack_microbatches(micro)
        if sharded:
            mesh = build_mesh("4,2")
            with jax.set_mesh(mesh):
                model, state = init_state(cfg)
                step = make_train_step(model, cfg, make_optimizer(cfg))
                state = shard_state(mesh, state)
                sb = shard_batch(mesh, sb, batch_axis=1)
                state, metrics = step(state, sb)
                return (float(metrics["loss"]), float(metrics["grad_norm"]),
                        jax.device_get(state.params))
        model, state = init_state(cfg)
        step = make_train_step(model, cfg, make_optimizer(cfg))
        state, metrics = step(state, sb)
        return (float(metrics["loss"]), float(metrics["grad_norm"]),
                jax.device_get(state.params))

    loss_s, gn_s, params_s = run(True)
    loss_u, gn_u, params_u = run(False)
    assert loss_s == pytest.approx(loss_u, rel=1e-5)
    assert gn_s == pytest.approx(gn_u, rel=1e-4)
    for a, b in zip(jax.tree.leaves(params_s), jax.tree.leaves(params_u)):
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=5e-5)


def test_shard_batch_warns_once_on_replication():
    """Non-divisible batch axes replicate (correct, slow) with ONE warning."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import warnings
    from fancyrec_tpu.parallel import mesh as pm

    m = pm.build_mesh("8,1")
    pm._warned_replicate.clear()
    batch = {"x": np.zeros((6, 4), np.float32)}
    with pytest.warns(UserWarning, match="does not divide"):
        pm.shard_batch(m, batch)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pm.shard_batch(m, batch)           # same shape: silent
    # scalars and divisible axes never warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pm.shard_batch(m, {"y": np.zeros((8, 2), np.float32),
                           "s": np.float32(1.0)})


def test_require_divisible_batch_guards_default_mesh():
    """The DEFAULT mesh (mesh_shape "", data axis = all devices) bypasses
    config.finalize's explicit-shape check. Single-host trainers shrink
    the data axis to gcd(batch, devices) with a notice (exercised end to
    end by test_serving's batch-4 training run on the 8-device mesh);
    multi-host trainers call this helper, which must hard-error rather
    than silently idle another host's devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh, require_divisible_batch

    m = build_mesh("")      # all 8 devices on 'data' -- the trainer default
    with pytest.raises(ValueError, match="not divisible by the data mesh"):
        require_divisible_batch(m, 12)
    require_divisible_batch(m, 16)          # divisible: fine
    require_divisible_batch(build_mesh("1,8"), 12)   # data axis 1: fine


def test_sharded_metrics_kernel_exact_vs_oracle():
    """ranking_metrics_sharded == numpy oracle on every metric, including
    exact score ties, an empty brand, and -1 pad posts; the (B, N) matrix
    stays post-sharded through the whole kernel (no gather)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.eval.metrics import (
        ranking_metrics_oracle, ranking_metrics_sharded)
    from fancyrec_tpu.parallel.mesh import build_mesh

    for seed, mesh_shape in ((0, "8,1"), (1, "4,2"), (2, "8,1")):
        rng = np.random.RandomState(seed)
        b, n = 8, 400
        scores = np.round(rng.randn(b, n), 2).astype(np.float32)  # many ties
        brands = rng.randint(0, b, n).astype(np.int32)
        brands[brands == 5] = 2                  # brand 5 has no positives
        brands[-16:] = -1                        # pad posts
        oracle = ranking_metrics_oracle(
            scores[:, brands >= 0], brands[brands >= 0], b)
        mesh = build_mesh(mesh_shape)
        got = ranking_metrics_sharded(scores, brands, b, mesh)
        for name, o, g in zip(oracle._fields, oracle, got):
            assert float(o) == pytest.approx(float(g), abs=1e-5), (
                mesh_shape, name, float(o), float(g))


def test_post_ranking_sharded_path_matches_unsharded():
    """test_post_ranking under a >1-data-axis mesh routes through the
    sharded metric kernel and reproduces the single-device result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    from fancyrec_tpu.eval.evaluator import test_post_ranking
    from fancyrec_tpu.parallel.mesh import build_mesh
    from fancyrec_tpu.train.state import init_state

    cfg = g._flagship_cfg(tiny=True)
    model, state = init_state(cfg)
    rng = np.random.RandomState(0)
    n = 101                                      # forces pad posts (101 % 8)
    post_embs = rng.randn(n, cfg.common_embedding_size).astype(np.float32)
    brands = rng.randint(0, cfg.brand_num, n).astype(np.int32)
    single = test_post_ranking(model, state.params, cfg.brand_num,
                               post_embs, brands, mesh=None)
    mesh = build_mesh("8,1")
    multi = test_post_ranking(model, state.params, cfg.brand_num,
                              post_embs, brands, mesh=mesh)
    for name, a, b_ in zip(single._fields, single, multi):
        assert float(a) == pytest.approx(float(b_), abs=1e-4), (name, a, b_)
