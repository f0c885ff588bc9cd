"""Recipe-scale smoke on the real TPU: the bin/instance.sh configuration
(51 brands, 2048-d features, common dim 1024, transformers+ph+cl,
batch 8 x accum 8) trained end-to-end on a synthetic 51-brand tree.

Validates that the full-production shapes compile and train on hardware and
records epoch wall times.

Usage: python tools/recipe_tpu_run.py [workdir] [fast] [bucketed] [rbg]

`fast` runs the documented throughput mode instead -- batch 64 x accum 1
(the same 64 posts per optimizer update as the parity recipe) in bfloat16
towers with bfloat16 host->device staging. It must reach the same final
quality as the parity config on this synthetic tree (AUC ~1.0), which
promotes the b64/bf16 bench numbers from a measurement to a supported
configuration. Run both modes and compare the printed JSON lines.

`rbg` adds --rng_impl rbg on top of fast: the threefry dropout-mask
generation is ~4.9 ms of the 28.4 ms b64 step (tools/step_decompose.py);
the hardware RBG PRNG generates masks at wire speed. Different mask
stream than the parity default (still a valid Bernoulli sampler), so it
must re-prove final quality here before being a recommended mode.

`bucketed` adds quantized dynamic padding + length-grouped batching on
top of fast (--token_buckets/--frame_buckets/--length_grouped): the
fixture's posts are 1-frame images and 6-frame videos with short
captions, so batches slice from the static (64, 128) pad down to
(1|8, 16|32) -- less transfer over the host->device link AND less BiGRU/
BERT work per step. Same quality bar as fast.

`b256` is the large-batch throughput mode: batch 256 x accum 1 with
bf16 towers/staging, buckets, length grouping, and the rbg PRNG all
composed (6,365 posts/s device-resident on the v5e vs 2,541 at b64 --
bench.py train_bucketed 256). 4x the posts per optimizer update means
4x fewer updates per epoch, so the mode scales the LR 2x (sqrt rule)
and trains a 4x-larger synthetic tree (51 brands x 20 posts) to keep
the update count comparable; quality bar unchanged (tester AUC ~1.0).
"""

import json
import os
import sys
import time


def main():
    argv = [a for a in sys.argv[1:]]
    fast = "fast" in argv
    bucketed = "bucketed" in argv
    rbg = "rbg" in argv
    b256 = "b256" in argv
    if b256:
        bucketed = rbg = True       # the composed large-batch mode
    fast = fast or bucketed or rbg
    argv = [a for a in argv if a not in ("fast", "bucketed", "rbg", "b256")]
    workdir = argv[0] if argv else "/tmp/fancyrec_recipe_run"
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    from fancyrec_tpu.utils.fixture import make_fixture
    from fancyrec_tpu.train import trainer
    from fancyrec_tpu.eval import tester

    # b256 consumes 256 posts per update: give it a 4x tree (20 posts per
    # brand vs 6) so an epoch still holds several optimizer updates
    root = os.path.join(workdir, "root_b256" if b256 else "root")
    if not os.path.exists(os.path.join(root, "cls.txt")):
        per_brand = (8, 12) if b256 else (3, 3)
        make_fixture(root, brand_num=51, videos_per_brand=per_brand[0],
                     imgs_per_brand=per_brand[1],
                     feat_dim=2048, frames_per_video=6, seed=0,
                     video_feature="resnet152_dim_2048",
                     img_feature="imgfeat_dim_2048")
    print("fixture ready at", root, flush=True)

    if b256:
        mode_flags = ["--batch_size", "256", "--accumulation_step", "1",
                      "--dtype", "bfloat16", "--transfer_dtype", "bfloat16"]
    elif fast:
        mode_flags = ["--batch_size", "64", "--accumulation_step", "1",
                      "--dtype", "bfloat16", "--transfer_dtype", "bfloat16"]
    else:
        mode_flags = ["--batch_size", "8", "--accumulation_step", "8"]
    if bucketed:
        mode_flags += ["--token_buckets", "16,32", "--frame_buckets", "1,8",
                       "--length_grouped", "1"]
    if rbg:
        mode_flags += ["--rng_impl", "rbg"]
    # mode label = the flags actually applied. Single-flag modes keep
    # their historical names (logdirs and printed JSON lines from prior
    # rounds stay comparable); only the combined `bucketed rbg` run gets
    # a composed name instead of mislabeling itself as bucketed-only.
    if b256:
        postfix, mode_name = "recipe_tpu_b256", "b256_bf16_bucketed_rbg"
    elif bucketed and rbg:
        postfix, mode_name = "recipe_tpu_bucketed_rbg", "bucketed_b64_bf16_rbg"
    elif bucketed:
        postfix, mode_name = "recipe_tpu_bucketed", "bucketed_b64_bf16"
    elif rbg:
        postfix, mode_name = "recipe_tpu_rbg", "fast_b64_bf16_rbg"
    elif fast:
        postfix, mode_name = "recipe_tpu_fast", "fast_b64_bf16"
    else:
        postfix, mode_name = "recipe_tpu", "parity_b8x8"

    t0 = time.time()
    best = trainer.main([
        "insCartrain", "insCarval", "insCartest",
        "--rootpath", root, "--brand_num", "51", "--brand_aspect", "2000",
        "--video_feature", "resnet152_dim_2048",
        "--img_feature", "imgfeat_dim_2048",
        "--common_embedding_size", "1024",
        "--text_mapping_size", "1024", "--visual_mapping_size", "1024",
        "--text_net", "transformers", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean",
        "--text_norm", "--visual_norm", "--concate", "full",
        "--learning_rate", "0.0002" if b256 else "0.0001",
        "--num_epochs", "2",
        "--overwrite", "1", "--postfix", postfix,
        "--metric", "auc", "--measure", "cosine", "--margin", "0.2",
    ] + mode_flags)
    dt = time.time() - t0
    print(json.dumps({"mode": mode_name,
                      "recipe_train_2epochs_sec": round(dt, 1),
                      "best_composite": best}), flush=True)

    m = tester.main(["insCartest", "--rootpath", root,
                     "--logger_name", os.path.join(root, "model", postfix)])
    print(json.dumps({"mode": mode_name,
                      "tester_auc": m.auc, "tester_r1": m.r1}), flush=True)


if __name__ == "__main__":
    main()
