"""Evaluation CLI (`fancyrec-test`), reference-workflow compatible.

Mirrors reference tester.py: loads a checkpoint (whose embedded config is
the source of truth for all train-time options, tester.py:63-65), rebuilds
the test loader from it, encodes the split, and prints the ranking metrics.
Accepts both our checkpoints and reference torch checkpoints.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

from fancyrec_tpu.config import Config
from fancyrec_tpu.data.dataset import PostDataset, load_info
from fancyrec_tpu.data.loader import BatchLoader
from fancyrec_tpu.data.tokenizer import WordPieceTokenizer
from fancyrec_tpu.eval.evaluator import encode_data, test_post_ranking
from fancyrec_tpu.io.bigfile import ImageBigFile
from fancyrec_tpu.io.dictfile import read_dict
from fancyrec_tpu.io.vocab import Bow2Vec, load_vocab
from fancyrec_tpu.models import FancyRec
from fancyrec_tpu.train import checkpoints


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    d = Config()
    p.add_argument("testCollection", type=str)
    p.add_argument("--rootpath", type=str, default=d.rootpath)
    p.add_argument("--overwrite", type=int, default=0, choices=[0, 1])
    p.add_argument("--log_step", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--logger_name", default="runs")
    p.add_argument("--checkpoint_name", default="model_best.pth.tar", type=str)
    # default 1, not the reference's legacy 20 (tester.py:37): insCar has
    # one caption per post and every reference recipe overrides to 1
    # (bin/public_cluster.sh:9, test_mac.sh:4); 20 would trip the
    # consistency assert on any real collection
    p.add_argument("--n_caption", type=int, default=1)
    # parsed-but-unused, faithful to the reference (tester.py:39-40 accepts
    # --level_vis/--level_txt but the encoder levels always come from the
    # checkpoint's embedded train-time config)
    p.add_argument("--level_vis", type=str, default="1+2+3")
    p.add_argument("--level_txt", type=str, default="1+2+3")
    p.add_argument("--bert_vocab", type=str, default="")
    # TPU-native extension: "" = all local devices data-parallel; "1" = one
    p.add_argument("--mesh_shape", type=str, default="")
    # persistent XLA compile cache ("" = inherit the checkpoint config's)
    p.add_argument("--compilation_cache_dir", type=str, default="")
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    print(json.dumps(vars(opt), indent=2))

    # pod-capable eval: join the jax.distributed job when the multi-host
    # env vars are present (no-op single host), and make every
    # file-existence exit follow the PRIMARY -- its filesystem is the
    # source of truth, and a lone-process exit would strand the other
    # hosts in their next collective (trainer.py has the same pattern)
    from fancyrec_tpu.parallel.distributed import (
        initialize_multihost, is_primary, primary_decision)
    initialize_multihost()

    resume = os.path.join(opt.logger_name, opt.checkpoint_name)
    if primary_decision(not os.path.exists(resume)):
        logging.info(resume + " not exists.")
        sys.exit(0)

    ckpt = checkpoints.load_any(resume)
    print("=> loaded!")
    cfg: Config = ckpt["config"]
    cfg.rootpath = opt.rootpath
    cache_dir = opt.compilation_cache_dir or getattr(
        cfg, "compilation_cache_dir", "")
    if cache_dir:
        from fancyrec_tpu.config import enable_compilation_cache
        enable_compilation_cache(cache_dir)
    testCollection = opt.testCollection

    # output-dir derivation + overwrite guard (reference tester.py:69-75).
    # The skip marker is the reference's pred_errors_matrix.pth.tar path so
    # mixed-toolchain reruns skip identically; like the reference, the file
    # itself is never written (its tester checks it but produces only
    # stdout), and we emit mean_metrics.json alongside as a real artifact.
    output_dir = resume.replace(cfg.trainCollection, testCollection)
    output_dir = output_dir.replace("/%s/" % cfg.cv_name,
                                    "/results/%s/" % cfg.trainCollection)
    pred_error_matrix_file = os.path.join(output_dir,
                                          "pred_errors_matrix.pth.tar")
    if primary_decision(os.path.exists(pred_error_matrix_file)
                        and not opt.overwrite):
        print("%s exists. skip" % pred_error_matrix_file)
        sys.exit(0)
    result_file = os.path.join(os.path.dirname(output_dir),
                               "mean_metrics.json")

    root = opt.rootpath
    video_feat = ImageBigFile(os.path.join(root, testCollection, "FeatureData",
                                           cfg.video_feature))
    img_feat = ImageBigFile(os.path.join(root, testCollection, "FeatureData",
                                         cfg.img_feature))
    assert cfg.visual_feat_dim == video_feat.ndims
    video2frames = read_dict(os.path.join(
        root, testCollection, "FeatureData", cfg.video_feature,
        "video2frames.txt"))

    bow_vocab = load_vocab(os.path.join(
        root, cfg.trainCollection, "TextData", "vocabulary", "bow",
        cfg.vocab + ".pkl"))
    rnn_vocab = load_vocab(os.path.join(
        root, cfg.trainCollection, "TextData", "vocabulary", "rnn",
        cfg.vocab + ".pkl"))
    cfg.bow_vocab_size = len(bow_vocab)
    cfg.vocab_size = len(rnn_vocab)
    cfg.finalize()

    tokenizer = None
    if cfg.text_net == "transformers":
        vocab_path = (opt.bert_vocab or cfg.bert_vocab
                      or os.path.join(root, "bert_vocab.txt"))
        tokenizer = WordPieceTokenizer(vocab_path)

    img_info, cls_info = load_info(root)
    cap_file = os.path.join(root, testCollection, "TextData",
                            "%s.caption.txt" % testCollection)
    print("=> prepare dataloader..")
    dataset = PostDataset(
        cap_file, video_feat, img_feat, Bow2Vec(bow_vocab),
        text_net=cfg.text_net, rnn_vocab=rnn_vocab, tokenizer=tokenizer,
        video2frames=video2frames, img_info=img_info, cls_info=cls_info,
        max_frames=cfg.max_frames, max_tokens=cfg.max_tokens,
        max_words=cfg.max_words,
        # the reference tester's caption/visual consistency guard
        # (tester.py:97 -> data_provider.py:203-205)
        n_caption=opt.n_caption)
    # train-time bucket config rides the checkpoint: length-sort the eval
    # order so the buckets bite (composition-free -- encode_data scatters
    # embeddings back by dataset index)
    bucketing = bool(cfg.token_buckets_list or cfg.frame_buckets_list)

    model = FancyRec(cfg)
    params = ckpt["model"]["params"]
    batch_stats = ckpt["model"].get("batch_stats", {})

    # eval runs data-parallel over all local devices by default: batches
    # shard over 'data' for encoding, the post axis shards for the ranking
    # kernel (the train-time mesh shape is irrelevant at eval; params are
    # replicated)
    import jax
    from fancyrec_tpu.parallel.mesh import build_mesh, process_batch_shard
    ndev = len(jax.devices())
    if opt.mesh_shape == "" and jax.process_count() == 1 \
            and opt.batch_size % ndev:
        # default mesh, non-dividing batch: encode on gcd(batch, devices)
        # devices at full efficiency instead of replicating every batch
        # (same policy as the trainer's default-mesh handling)
        import math
        use = math.gcd(opt.batch_size, ndev)
        # same one-line notice the trainer prints: a silent shrink reads
        # as an unexplained N-x eval slowdown (e.g. a prime batch size on
        # an 8-device host encoding on 1 device)
        print("note: --batch_size %d does not divide the %d-device "
              "default mesh; encoding data-parallel over %d device(s) "
              "(pass --mesh_shape to override)"
              % (opt.batch_size, ndev, use))
        ndev = use
    mesh = build_mesh(opt.mesh_shape if opt.mesh_shape != ""
                      else "%d,1" % ndev)
    # on a pod each process gathers only its 1/P slice of every batch
    # (per-host feature IO scales with host count; see data/loader.py)
    pshard = process_batch_shard(mesh, opt.batch_size)
    loader = BatchLoader(dataset, opt.batch_size, final_batch="pad",
                         grouped="sort" if bucketing else "off",
                         process_shard=pshard)
    with jax.set_mesh(mesh):
        brands, post_embs = encode_data(model, params, batch_stats, loader,
                                        cfg.common_embedding_size, mesh=mesh,
                                        token_buckets=cfg.token_buckets_list,
                                        frame_buckets=cfg.frame_buckets_list)
        m = test_post_ranking(model, params, cfg.brand_num, post_embs,
                              brands, mesh=mesh)

    print("AUC[0-1]:", m.auc)
    print("NDCG@10[0-1]:", m.ndcg10)
    print("NDCG@50[0-1]:", m.ndcg50)
    print("recall@1:", m.r1)
    print("recall@5:", m.r5)
    print("recall@10:", m.r10)
    print("MedR:", m.medr)
    print("MeanR:", m.meanr)
    if is_primary():
        os.makedirs(os.path.dirname(result_file) or ".", exist_ok=True)
        with open(result_file, "w") as f:
            f.write(json.dumps(
                {k: float(v) for k, v in m._asdict().items()}))
    return m


if __name__ == "__main__":
    main()
