"""Training driver CLI (`fancyrec-train`), reference-workflow compatible.

Same positional/flag surface as reference trainer.py:36-131; dataset layout,
checkpoint policy, LR schedule (0.99/epoch, extra x0.5 after 2 stale
epochs), early stop after 10 stale epochs, and validation on the test
loader (reference trainer.py:283-319 -- its quirk of selecting the model on
the test split is preserved; pass --validate_split val to fix it).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict

import jax
import numpy as np

from fancyrec_tpu.config import Config, build_train_parser, config_from_args
from fancyrec_tpu.data.dataset import PostDataset, load_info
from fancyrec_tpu.data.loader import BatchLoader, prefetch_to_device
from fancyrec_tpu.data.tokenizer import WordPieceTokenizer
from fancyrec_tpu.eval.evaluator import encode_data, make_encode_fn, test_post_ranking
from fancyrec_tpu.eval.metrics import composite_score
from fancyrec_tpu.io.bigfile import ImageBigFile
from fancyrec_tpu.io.dictfile import read_dict
from fancyrec_tpu.io.vocab import Bow2Vec, load_vocab
from fancyrec_tpu.losses import init_queue_state
from fancyrec_tpu.parallel.distributed import (
    assert_agreement, initialize_multihost, is_primary, primary_decision)
from fancyrec_tpu.parallel.mesh import build_mesh, shard_batch, shard_state
from fancyrec_tpu.train import checkpoints
from fancyrec_tpu.train.state import (
    current_lr, init_state, make_optimizer, scale_lr)
from fancyrec_tpu.train.step import make_train_step, stack_microbatches

log = logging.getLogger("fancyrec.train")


def check_to_skip(filename: str, overwrite: int) -> bool:
    if os.path.exists(filename):
        print("%s exists." % filename, "overwrite" if overwrite else "skip")
        return not overwrite
    return False


def build_datasets(cfg: Config) -> Dict[str, PostDataset]:
    """Wire the reference on-disk layout (trainer.py:156-242)."""
    colls = {"train": cfg.trainCollection, "val": cfg.valCollection,
             "test": cfg.testCollection}
    root = cfg.rootpath

    video_feats = {k: ImageBigFile(os.path.join(root, c, "FeatureData",
                                                cfg.video_feature))
                   for k, c in colls.items()}
    img_feats = {k: ImageBigFile(os.path.join(root, c, "FeatureData",
                                              cfg.img_feature))
                 for k, c in colls.items()}
    cfg.visual_feat_dim = video_feats["train"].ndims

    bow_vocab = load_vocab(os.path.join(
        root, cfg.trainCollection, "TextData", "vocabulary", "bow",
        cfg.vocab + ".pkl"))
    rnn_vocab = load_vocab(os.path.join(
        root, cfg.trainCollection, "TextData", "vocabulary", "rnn",
        cfg.vocab + ".pkl"))
    cfg.bow_vocab_size = len(bow_vocab)
    cfg.vocab_size = len(rnn_vocab)
    bow2vec = Bow2Vec(bow_vocab)

    tokenizer = None
    if cfg.text_net == "transformers":
        vocab_path = cfg.bert_vocab or os.path.join(root, "bert_vocab.txt")
        if not os.path.exists(vocab_path):
            raise FileNotFoundError(
                "transformers text_net needs a WordPiece vocab: pass "
                "--bert_vocab or place bert_vocab.txt under rootpath "
                "(offline replacement for bert-base-uncased)")
        tokenizer = WordPieceTokenizer(vocab_path)

    img_info, cls_info = load_info(root)
    datasets = {}
    for split, coll in colls.items():
        cap_file = os.path.join(root, coll, "TextData", "%s.caption.txt" % coll)
        video2frames = read_dict(os.path.join(
            root, coll, "FeatureData", cfg.video_feature, "video2frames.txt"))
        datasets[split] = PostDataset(
            cap_file, video_feats[split], img_feats[split], bow2vec,
            text_net=cfg.text_net, rnn_vocab=rnn_vocab, tokenizer=tokenizer,
            video2frames=video2frames, img_info=img_info, cls_info=cls_info,
            max_frames=cfg.max_frames, max_tokens=cfg.max_tokens,
            max_words=cfg.max_words)
    return datasets


def validate(model, state, loader, cfg: Config, encode_fn=None, mesh=None):
    brands, post_embs = encode_data(model, state.params, state.batch_stats,
                                    loader, cfg.common_embedding_size,
                                    encode_fn, mesh=mesh,
                                    token_buckets=cfg.token_buckets_list,
                                    frame_buckets=cfg.frame_buckets_list)
    m = test_post_ranking(model, state.params, cfg.brand_num, post_embs,
                          brands, mesh=mesh)
    print("MedR:", m.medr)
    print("MeanR:", m.meanr)
    print("AUC[0-1]:", m.auc)
    print("NDCG@10[0-1]:", m.ndcg10)
    print("NDCG@50[0-1]:", m.ndcg50)
    print("recall@1:", m.r1)
    print("recall@5:", m.r5)
    print("recall@10:", m.r10)
    return composite_score(m), m


def _superbatches(loader, accumulation_step: int, transfer_dtype: str = "",
                  token_buckets=None, frame_buckets=None):
    """Group loader batches into stacked super-batches of A microbatches.

    The trailing partial group is skipped: the reference only steps the
    optimizer on full accumulation groups (trainer.py:382-386); its
    leftover backward passes never reach a step (documented deviation,
    affects < accum_step batches/epoch).

    transfer_dtype='bfloat16' downcasts the float32 batch arrays (frames
    dominate: 33 MB/super-batch at recipe scale) on the host before the
    device transfer, halving wire traffic on transfer-bound hosts; the
    step upcasts on device. Opt-in (--transfer_dtype): it rounds inputs
    to bf16, a documented deviation from the reference's f32 pipeline.
    """
    cast = None
    if transfer_dtype:
        import ml_dtypes
        cast = np.dtype(getattr(ml_dtypes, transfer_dtype))
    group = []
    for batch in loader:
        group.append(batch)
        if len(group) == accumulation_step:
            sb = stack_microbatches(group)
            if token_buckets or frame_buckets:
                # quantized dynamic padding: the whole super-batch shares
                # one bucket shape (all A microbatches feed one jit call).
                # Process-sharded loaders carry the GLOBAL length maxima
                # so every host slices identical shapes.
                from fancyrec_tpu.data.loader import bucket_batch
                maxima = None
                if "tlen_max" in group[0]:
                    maxima = {k: max(b[k] for b in group)
                              for k in ("tlen_max", "flen_max")}
                sb = bucket_batch(sb, token_buckets, frame_buckets,
                                  maxima=maxima)
            if cast is not None:
                sb = {k: (v.astype(cast) if v.dtype == np.float32 else v)
                      for k, v in sb.items()}
            yield sb
            group = []


def train_epoch(train_step, state, loader, accumulation_step: int,
                epoch: int, num_epochs: int, mesh=None,
                transfer_dtype: str = "", token_buckets=None,
                frame_buckets=None):
    print("Epoch[{0} / {1}] LR: {2}".format(
        epoch, num_epochs, current_lr(state)))
    losses = []
    t0 = time.time()
    n_items = 0
    # background thread assembles + stages the next super-batches on device
    # while the current step runs (host gather <-> TPU compute overlap);
    # with a mesh, the microbatch axis (axis 1; axis 0 is accumulation) is
    # sharded over 'data' so the step runs data-parallel under GSPMD
    process_local = getattr(loader, "process_shard", None) is not None
    put = (lambda b: shard_batch(mesh, b, batch_axis=1,
                                 process_local=process_local)) \
        if mesh is not None else None
    # multi-process: device interaction stays on the main thread (the
    # background-thread device_put deadlocks gloo collectives -- see
    # data/loader.prefetch_to_device and tests/test_multiprocess.py);
    # super-batch assembly still overlaps the step on the thread
    stream = prefetch_to_device(
        _superbatches(loader, accumulation_step, transfer_dtype,
                      token_buckets, frame_buckets),
        size=2, device_put=put,
        stage_on_consumer=jax.process_count() > 1)
    for superbatch in stream:
        state, metrics = train_step(state, superbatch)
        # keep the loss on device: a float() here would block the next
        # dispatch on a device->host round-trip per super-batch
        losses.append(metrics["loss"])
        n_items += superbatch["frames"].shape[0] * superbatch["frames"].shape[1]
    losses = [float(x) for x in losses]
    dt = time.time() - t0
    if losses:
        print("epoch %d: mean loss %.4f  (%d updates, %.1f posts/s)"
              % (epoch, float(np.mean(losses)), len(losses),
                 n_items / max(dt, 1e-9)))
    return state, losses


def _latest_epoch_checkpoint(logdir: str):
    """-> (epoch, path) of the newest epoch checkpoint, or (-1, None)."""
    import re as _re
    best = (-1, None)
    if os.path.isdir(logdir):
        for f in os.listdir(logdir):
            m = _re.match(r"checkpoint_epoch_(\d+)\.pth\.tar$", f)
            if m and int(m.group(1)) > best[0]:
                best = (int(m.group(1)), os.path.join(logdir, f))
    return best


class MetricsLog:
    """Per-epoch metrics to metrics.jsonl (grep-able) AND a real
    TensorBoard scalar event file (the reference configures
    tensorboard_logger into the same logdir, trainer.py:151; ours
    actually writes the scalars, so `tensorboard --logdir` works)."""

    def __init__(self, logdir: str):
        from fancyrec_tpu.utils.tb_events import TBEventWriter
        self.path = os.path.join(logdir, "metrics.jsonl")
        self.tb = TBEventWriter(logdir)

    def write(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        self.tb.add_scalars(record.get("epoch", 0),
                            {k: v for k, v in record.items()
                             if isinstance(v, (int, float))})


def main(argv=None):
    args = build_train_parser().parse_args(argv)
    cfg = config_from_args(args)
    print(json.dumps({k: v for k, v in vars(args).items()}, indent=2, default=str))
    if cfg.compilation_cache_dir:
        from fancyrec_tpu.config import enable_compilation_cache
        enable_compilation_cache(cfg.compilation_cache_dir)

    # Scale-out wiring (TPU-native; the reference's counterpart is its single
    # global `device`, util/constant.py:6, threaded into everything): start
    # jax.distributed when multi-host env vars are present, then build the
    # ('data','model') mesh -- cfg.mesh_shape "" = all devices on 'data', so
    # bin/instance.sh on a v5e-8 trains 8-way data-parallel by default.
    initialize_multihost()
    if cfg.pp_stages > 1 and not cfg.mesh_shape:
        # pipeline stages live on the 'model' axis; with no explicit
        # --mesh_shape, give pp_stages the model axis and the rest of the
        # devices the data axis (config.finalize already validated layer/
        # batch divisibility against pp_stages)
        ndev = len(jax.devices())
        if ndev % cfg.pp_stages:
            raise ValueError(
                "--pp_stages %d does not divide the %d available devices; "
                "pass an explicit --mesh_shape data,%d"
                % (cfg.pp_stages, ndev, cfg.pp_stages))
        cfg.mesh_shape = "%d,%d" % (ndev // cfg.pp_stages, cfg.pp_stages)
        print("pipeline parallelism: --pp_stages %d -> mesh_shape %s"
              % (cfg.pp_stages, cfg.mesh_shape))
        data_axis = ndev // cfg.pp_stages
        if data_axis > 1 and (cfg.batch_size // cfg.pp_stages) % data_axis:
            raise ValueError(
                "pipeline microbatch %d (= batch %d / %d stages) is not "
                "divisible by the derived data mesh axis %d; pass an "
                "explicit --mesh_shape or adjust --batch_size"
                % (cfg.batch_size // cfg.pp_stages, cfg.batch_size,
                   cfg.pp_stages, data_axis))
    mesh = build_mesh(cfg.mesh_shape)
    # batch/data-axis divisibility: an explicit --mesh_shape is rejected
    # in config.finalize; the DEFAULT mesh (data axis = device count,
    # unknown at finalize) is handled here. Single host: shrink the data
    # axis to gcd(batch, devices) -- full efficiency on fewer devices
    # beats silent replication (the user never asked for this mesh).
    # Multi-host: hard error (idling another host's devices behind the
    # user's back is not a call this layer should make).
    if not cfg.mesh_shape:
        ndata = int(mesh.devices.shape[0])
        if ndata > 1 and cfg.batch_size % ndata:
            from fancyrec_tpu.parallel.mesh import require_divisible_batch
            if jax.process_count() > 1:
                require_divisible_batch(mesh, cfg.batch_size)
            import math
            use = math.gcd(cfg.batch_size, ndata)
            print("note: --batch_size %d does not divide the %d-device "
                  "default mesh; training data-parallel over %d device(s) "
                  "(pass --mesh_shape to override)"
                  % (cfg.batch_size, ndata, use))
            mesh = build_mesh("%d,1" % use)
    if mesh.devices.size > 1:
        print("mesh: %s (%d devices, %d processes)"
              % (dict(zip(mesh.axis_names, mesh.devices.shape)),
                 mesh.devices.size, jax.process_count()))
    # ambient mesh: sequence-parallel sharding constraints inside the model
    # resolve against it during tracing (including model.init)
    with jax.set_mesh(mesh):
        return _run(cfg, mesh)


def _run(cfg: Config, mesh):
    cfg.logger_name = os.path.join(cfg.rootpath, "model", cfg.postfix)
    # skip/exit decisions follow the PRIMARY on multi-host (its artifacts
    # may not exist on worker filesystems): every host exits together or
    # continues together instead of the primary exiting into a worker hang
    if cfg.auto_resume:
        # elastic restart: a finished run (val_metric.txt) still skips, but
        # a crashed run resumes from its newest epoch checkpoint instead of
        # refusing because model_best.pth.tar exists
        if primary_decision(check_to_skip(
                os.path.join(cfg.logger_name, "val_metric.txt"),
                cfg.overwrite)):
            sys.exit(0)
        latest_epoch, latest = _latest_epoch_checkpoint(cfg.logger_name)
        # every host must resolve the same checkpoint (shared-FS guard)
        assert_agreement("auto_resume latest epoch", latest_epoch)
        if latest and not cfg.resume:
            cfg.resume = latest
            print("auto_resume: continuing from %s" % latest)
    else:
        if primary_decision(check_to_skip(
                os.path.join(cfg.logger_name, "model_best.pth.tar"),
                cfg.overwrite)):
            sys.exit(0)
        if primary_decision(check_to_skip(
                os.path.join(cfg.logger_name, "val_metric.txt"),
                cfg.overwrite)):
            sys.exit(0)
    os.makedirs(cfg.logger_name, exist_ok=True)
    logging.basicConfig(format="%(asctime)s %(message)s", level=logging.INFO)

    datasets = build_datasets(cfg)
    cfg.finalize()

    # eval loaders length-sort whenever buckets are on (composition-free:
    # encode_data scatters embeddings back by dataset index); the train
    # loader regroups only under the opt-in --length_grouped
    bucketing = bool(cfg.token_buckets_list or cfg.frame_buckets_list)
    eval_grouped = "sort" if bucketing else "off"
    # multi-host: each process gathers only its 1/P slice of every batch
    # (per-host feature IO scales with host count); falls back to
    # every-host-full-batch when the mesh/batch layout is not cleanly
    # process-divisible
    from fancyrec_tpu.parallel.mesh import process_batch_shard
    pshard = process_batch_shard(mesh, cfg.batch_size)
    if pshard is not None:
        print("process-sharded loading: process %d/%d gathers %d of %d "
              "rows per batch" % (pshard[0], pshard[1],
                                  cfg.batch_size // pshard[1],
                                  cfg.batch_size))
    loaders = {
        "train": BatchLoader(
            datasets["train"], cfg.batch_size, shuffle=True,
            seed=cfg.seed, final_batch="drop",
            grouped="window" if cfg.length_grouped else "off",
            process_shard=pshard),
        "val": BatchLoader(datasets["val"], cfg.batch_size,
                           final_batch="pad", grouped=eval_grouped,
                           process_shard=pshard),
        # 'check': the train set re-scored for overfitting detection
        # (reference data_provider.py:365-369)
        "check": BatchLoader(datasets["train"], cfg.batch_size,
                             final_batch="pad", grouped=eval_grouped,
                             process_shard=pshard),
        "test": BatchLoader(datasets["test"], cfg.batch_size,
                            final_batch="pad", grouped=eval_grouped,
                            process_shard=pshard),
    }

    model, state = init_state(cfg)
    if cfg.w2v_feature and cfg.text_net == "bi-gru":
        # word2vec embedding init (reference model.py:252-256 get_we_parameter
        # path): overwrite the embed table with pretrained vectors
        from fancyrec_tpu.io.vocab import load_vocab as _lv
        from fancyrec_tpu.io.word2vec import get_we_parameter
        rnn_vocab = _lv(os.path.join(
            cfg.rootpath, cfg.trainCollection, "TextData", "vocabulary",
            "rnn", cfg.vocab + ".pkl"))
        we = get_we_parameter(rnn_vocab, cfg.w2v_feature, seed=cfg.seed)
        if we.shape == state.params["text_encoding"]["embed"].shape:
            params = dict(state.params)
            te = dict(params["text_encoding"]); te["embed"] = we
            params["text_encoding"] = te
            state = state.replace(params=params)
            print("initialized word embeddings from %s" % cfg.w2v_feature)
        else:
            print("w2v shape %s != embed %s; keeping random init"
                  % (we.shape, state.params["text_encoding"]["embed"].shape))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print("model parameters: %d" % n_params)

    best_rsum, no_impr, lr_counter = 0.0, 0, 0
    best_epoch = None
    eiters = 0
    start_epoch = 0
    mlog = MetricsLog(cfg.logger_name)

    if cfg.resume:
        if os.path.isfile(cfg.resume):
            print("=> loading checkpoint '%s'" % cfg.resume)
            ckpt = checkpoints.load_any(cfg.resume)
            state = state.replace(params=ckpt["model"]["params"],
                                  batch_stats=ckpt["model"]["batch_stats"])
            new_opt, restored = checkpoints.restore_opt_state(
                ckpt, state.opt_state)
            if restored:
                state = state.replace(opt_state=new_opt)
                print("=> optimizer state restored (exact Adam trajectory)")
            eiters = ckpt.get("Eiters", 0)
            if cfg.auto_resume:
                start_epoch = int(ckpt.get("epoch", 0))
                best_rsum = float(ckpt.get("best_rsum", 0.0))
                # decay/stop schedule state (absent from reference
                # checkpoints: defaults keep their semantics)
                no_impr = int(ckpt.get("no_impr", 0))
                lr_counter = int(ckpt.get("lr_counter", 0))
                # re-apply the end-of-epoch LR scalings that ran after
                # the checkpoint was written (exact-trajectory resume)
                state = scale_lr(state,
                                 float(ckpt.get("pending_lr_scale", 1.0)))
            print("=> loaded checkpoint (epoch %s, best_rsum %s)"
                  % (ckpt.get("epoch"), ckpt.get("best_rsum")))
            # the reference validates the resumed model on the VAL loader
            # here even though epoch-loop validation uses validate_split
            # (trainer.py:262-274) -- preserved
            validate(model, state, loaders["val"], cfg, mesh=mesh)
        else:
            print("=> no checkpoint found at '%s'" % cfg.resume)

    # place params/opt-state on the mesh per the tp rules (aspect tables,
    # wide mapping FCs, BERT FFN over 'model'; everything else replicated).
    # Under --pp_stages the BERT stack stays replicated instead: 'model'
    # is the pipeline-stage axis and the stages slice it locally.
    # After the resume block so restored host arrays get placed too.
    state = shard_state(mesh, state, pp=cfg.pp_stages > 1)

    tx = make_optimizer(cfg)
    train_step = make_train_step(model, cfg, tx)
    encode_fn = make_encode_fn(model)
    val_loader = loaders.get(cfg.validate_split, loaders["test"])

    for epoch in range(start_epoch, cfg.num_epochs):
        # the reference constructs a fresh loss module each epoch
        # (trainer.py:342-354), resetting the contrastive queue: preserved
        state = state.replace(
            queue=init_queue_state(cfg.queue_size, cfg.common_embedding_size))
        # profile epoch 1 (epoch 0 includes compilation) into an XProf trace
        if cfg.profile_dir and epoch == min(1, cfg.num_epochs - 1):
            from fancyrec_tpu.utils.profiling import trace
            profile_ctx = trace(cfg.profile_dir)
        else:
            import contextlib
            profile_ctx = contextlib.nullcontext()
        with profile_ctx:
            state, _ = train_epoch(train_step, state, loaders["train"],
                                   cfg.accumulation_step, epoch,
                                   cfg.num_epochs, mesh=mesh,
                                   transfer_dtype=cfg.transfer_dtype,
                                   token_buckets=cfg.token_buckets_list,
                                   frame_buckets=cfg.frame_buckets_list)

        print("=" * 58)
        print("=" * 23 + "Test Phase" + "=" * 25)
        print("=" * 58)
        score, metrics = validate(model, state, val_loader, cfg, encode_fn,
                                  mesh=mesh)
        if is_primary():
            from fancyrec_tpu.utils.profiling import device_memory_stats
            mem = device_memory_stats()
            mlog.write({"epoch": epoch, "score": score, "lr": current_lr(state),
                        "Eiters": int(state.step) + eiters,
                        **{k: float(v) for k, v in metrics._asdict().items()},
                        **({"hbm_bytes_in_use": mem["bytes_in_use"],
                            "hbm_peak_bytes": mem.get("peak_bytes_in_use")}
                           if "bytes_in_use" in mem else {})})
        is_best = score > best_rsum
        print(" * Current perf in Test: {}".format(score))
        print(" * Best perf in Test: {}".format(best_rsum))

        # LR-decay / early-stop counter arithmetic (reference
        # trainer.py:305-319) runs before the checkpoint write so an
        # elastic auto_resume restores the counters instead of silently
        # resetting the decay/stop schedule; the LR scalings themselves
        # apply after the save, exactly where the reference applies them.
        lr_counter += 1
        stop = half = False
        if not is_best:
            no_impr += 1
            if no_impr > 10:
                stop = True
            elif lr_counter > 2:
                half = True
        else:
            no_impr = 0

        if is_primary():
            best_rsum = checkpoints.maybe_save_best(
                cfg.logger_name, cfg, state.params, state.batch_stats,
                epoch, score, best_rsum, int(state.step) + eiters, best_epoch,
                opt_state=state.opt_state,
                extra_meta={
                    "no_impr": no_impr,
                    "lr_counter": 0 if half else lr_counter,
                    # the saved opt_state predates this epoch's LR
                    # scalings; auto_resume applies this factor so the
                    # resumed epoch trains at exactly the LR an
                    # uninterrupted run would have used
                    "pending_lr_scale": cfg.lr_decay_rate * (
                        0.5 if half else 1.0)})
        else:
            # non-primary hosts track the same best without writing
            best_rsum = max(score, best_rsum)
        if is_best:
            best_epoch = epoch

        state = scale_lr(state, cfg.lr_decay_rate)
        if stop:
            print("Early stopping happened.\n")
            break
        if half:
            state = scale_lr(state, 0.5)
            lr_counter = 0

    if is_primary():
        with open(os.path.join(cfg.logger_name, "val_metric.txt"), "w") as f:
            f.write(str(best_rsum))
    print("best performance on Val: {}\n".format(best_rsum))
    return best_rsum


if __name__ == "__main__":
    main()
