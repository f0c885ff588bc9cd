"""Elastic restart: --auto_resume continues a crashed run from its newest
epoch checkpoint instead of refusing or starting over."""

import json
import os

from fancyrec_tpu.utils.fixture import make_fixture
from fancyrec_tpu.train import trainer
from tests.test_e2e import COMMON_ARGS


def test_auto_resume_continues_from_latest(tmp_path):
    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    args = COMMON_ARGS + [
        "--rootpath", root, "--postfix", "ar_run",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean",
    ]
    trainer.main(args + ["--num_epochs", "1"])
    logdir = os.path.join(root, "model", "ar_run")
    assert os.path.exists(os.path.join(logdir, "checkpoint_epoch_0.pth.tar"))

    # simulate a crash mid-run: completion marker missing
    os.remove(os.path.join(logdir, "val_metric.txt"))

    trainer.main(args + ["--num_epochs", "3", "--auto_resume",
                         "--overwrite", "0"])
    # epochs 1 and 2 ran in the second invocation (0 was resumed past)
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        epochs = [json.loads(line)["epoch"] for line in f]
    assert epochs.count(0) == 1    # only from the first run
    assert 1 in epochs and 2 in epochs
    assert os.path.exists(os.path.join(logdir, "val_metric.txt"))

    # a *finished* run with auto_resume skips cleanly (completion marker)
    import pytest
    with pytest.raises(SystemExit):
        trainer.main(args + ["--num_epochs", "3", "--auto_resume",
                             "--overwrite", "0"])
