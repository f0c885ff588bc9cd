"""REAL multi-process distributed test: 2 x jax.distributed processes.

The only place the multi-host layer (parallel/distributed.py,
eval/evaluator.py process_allgather, primary-gated writes) runs with
process_count > 1 in this environment. Two subprocesses (2 virtual CPU
devices each) form a global 4-device mesh and run the production trainer
CLI end-to-end -- no mocks anywhere in the communication path. See
tests/multiproc_worker.py for what each process asserts internally.

The reference is single-process by design (/root/reference/util/
constant.py:6); this covers the TPU-native pod layer SURVEY.md section 2.8
requires.
"""

import os
import socket
import subprocess
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_trainer(tmp_path):
    from fancyrec_tpu.utils.fixture import make_fixture

    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)

    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(_HERE)] + env.get("PYTHONPATH", "").split(os.pathsep))
    worker = os.path.join(_HERE, "multiproc_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, root, port, str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        partial = [p.communicate()[0] or "" for p in procs]
        pytest.fail("2-process run timed out (collective hang?)\n"
                    + "\n\n".join((o or "")[-4000:] for o in outs + partial))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            "process %d exited %s:\n%s" % (pid, p.returncode, out[-8000:]))

    import json
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT "):
                r = json.loads(line[len("WORKER_RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outs[0][-2000:]
    assert results[0]["process_count"] == 2
    # both processes observed the same best score (identical collectives)
    assert results[0]["best"] == pytest.approx(results[1]["best"], rel=1e-6)
    assert results[0]["best"] > 400, results[0]["best"]
    # the pod-capable tester: identical metrics on every process, learned
    # signal present
    assert results[0]["tester_auc"] == pytest.approx(
        results[1]["tester_auc"], rel=1e-6)
    assert results[0]["tester_auc"] > 0.8, results[0]["tester_auc"]
    # the primary wrote the tester artifact (location mirrors the
    # reference's output-dir derivation from the checkpoint path)
    import glob
    assert glob.glob(os.path.join(root, "model", "**",
                                  "mean_metrics.json"), recursive=True)

    # the primary (and only the primary -- the worker's writers are
    # booby-trapped, so its exit 0 proves it never wrote) left the full
    # artifact set on the shared filesystem
    logdir = os.path.join(root, "model", "run_2proc")
    assert os.path.exists(os.path.join(logdir, "model_best.pth.tar"))
    assert os.path.exists(os.path.join(logdir, "val_metric.txt"))
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
    with open(os.path.join(logdir, "val_metric.txt")) as f:
        assert float(f.read()) == pytest.approx(results[0]["best"], rel=1e-6)

    # same run single-process on the pytest 8-device mesh: the 2-process
    # global mesh must reproduce it (the collectives are the same; only
    # process ownership of the devices changed)
    if len(jax.devices()) >= 4:
        from fancyrec_tpu.train import trainer
        best_single = trainer.main([
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
            "--postfix", "run_1proc", "--mesh_shape", "4,1",
            "--token_buckets", "8,16", "--frame_buckets", "2,4",
        ])
        assert results[0]["best"] == pytest.approx(best_single, rel=1e-3)
