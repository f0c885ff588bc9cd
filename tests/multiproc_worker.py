"""Subprocess entry for the REAL 2-process jax.distributed test.

Launched twice by tests/test_multiprocess.py (process_id 0 and 1), each
with 2 virtual CPU devices, forming a global 4-device mesh (kept small:
the dev box has ONE physical core for both processes). Runs the
production trainer CLI end-to-end through the un-mocked multi-host path:
`trainer.main` -> `initialize_multihost` (reads JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID, the production autodetect) ->
`jax.distributed.initialize` -> global mesh -> sharded train + eval with
`process_allgather` -> primary-gated artifact writes.

The non-primary process booby-traps every artifact writer: if the trainer
ever calls a checkpoint/metrics write off the primary, this process dies
and the parent test fails. A second trainer.main invocation exercises the
coordinated skip-exit (primary_decision broadcast) for real.
"""

import json
import os
import sys


def main() -> None:
    root, port, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    # the production multi-host autodetect inputs (parallel/distributed.py)
    os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:" + port
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from fancyrec_tpu.parallel import distributed as dist
    from fancyrec_tpu.train import checkpoints, trainer

    if pid != 0:
        def _boom(*a, **k):
            raise AssertionError(
                "non-primary process attempted an artifact write")
        # trap the module AND the trainer's imported alias
        checkpoints.maybe_save_best = _boom
        trainer.checkpoints.maybe_save_best = _boom
        trainer.MetricsLog.write = _boom

    argv = [
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
        "--postfix", "run_2proc", "--mesh_shape", "4,1",
        # auto_resume exercises assert_agreement (latest-epoch allgather
        # compare) on the fresh run, then the skip broadcast on rerun
        "--auto_resume",
        # bucketed dynamic padding under process-sharded loading: every
        # host must slice the GLOBAL bucket shape from its local rows --
        # a per-host shape divergence here compiles different programs
        # and hangs the collectives, which is exactly what this guards
        "--token_buckets", "8,16", "--frame_buckets", "2,4",
    ]
    best = trainer.main(argv)
    assert jax.process_count() == 2, jax.process_count()
    assert dist.is_primary() == (pid == 0)
    # the trainer's loaders ran process-sharded on this topology (each
    # process gathered only its half of every batch): the guard must
    # enable for mesh (4,1) x batch 4 over 2 processes
    from fancyrec_tpu.parallel.mesh import build_mesh, process_batch_shard
    assert process_batch_shard(build_mesh("4,1"), 4) == (pid, 2)

    # second invocation: val_metric.txt now exists -> every process must
    # take the SAME exit via the primary_decision broadcast (the
    # primary-exits-while-workers-hang failure mode this guards against)
    argv_rerun = [a for a in argv]
    argv_rerun[argv_rerun.index("--overwrite") + 1] = "0"
    skipped = False
    try:
        trainer.main(argv_rerun)
    except SystemExit as e:
        assert (e.code or 0) == 0, e.code
        skipped = True
    assert skipped, "rerun with overwrite=0 must skip via primary_decision"

    # the pod-capable tester CLI: multihost-aware skip decisions, a
    # process-sharded test loader, primary-gated mean_metrics.json --
    # every process must produce identical metrics (parent compares)
    from fancyrec_tpu.eval import tester
    logdir = os.path.join(root, "model", "run_2proc")
    m = tester.main(["insCartest", "--rootpath", root,
                     "--logger_name", logdir, "--batch_size", "4",
                     "--mesh_shape", "4,1"])

    print("WORKER_RESULT " + json.dumps(
        {"pid": pid, "best": float(best), "tester_auc": float(m.auc),
         "tester_r1": float(m.r1),
         "process_count": jax.process_count()}), flush=True)


if __name__ == "__main__":
    main()
