"""Elastic restart: --auto_resume continues a crashed run from its newest
epoch checkpoint instead of refusing or starting over."""

import json
import os

import pytest

from fancyrec_tpu.utils.fixture import make_fixture
from fancyrec_tpu.train import trainer
from tests.test_e2e import COMMON_ARGS


@pytest.mark.slow
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


def test_checkpoint_records_running_best_not_epoch_score(tmp_path):
    """A non-best epoch file must store the RUNNING best so an elastic
    restart from it cannot let a worse-than-global-best later epoch
    overwrite model_best (maybe_save_best saves epoch files whenever
    score > best*0.99, i.e. also for non-best epochs)."""
    import numpy as np
    from fancyrec_tpu.config import Config
    from fancyrec_tpu.train import checkpoints

    cfg = Config(brand_num=2, brand_aspect=4, common_embedding_size=8,
                 visual_feat_dim=8, bow_vocab_size=8, vocab_size=16,
                 text_net="bi-gru", visual_rnn_size=4, text_rnn_size=4,
                 visual_kernel_num=2, text_kernel_num=2,
                 text_mapping_size=8, visual_mapping_size=8).finalize()
    params = {"w": np.zeros(3, np.float32)}
    d = str(tmp_path)

    best = checkpoints.maybe_save_best(d, cfg, params, {}, epoch=3,
                                       score=10.0, best_rsum=0.0,
                                       eiters=1, best_epoch=None)
    assert best == 10.0
    # epoch 7 scores 9.95: within the 0.99 band, so the file is written,
    # but it must record best_rsum=10.0 (the running best), not 9.95
    best = checkpoints.maybe_save_best(d, cfg, params, {}, epoch=7,
                                       score=9.95, best_rsum=best,
                                       eiters=2, best_epoch=3,
                                       extra_meta={"no_impr": 4,
                                                   "lr_counter": 1})
    assert best == 10.0
    ck = checkpoints.load_checkpoint(
        os.path.join(d, "checkpoint_epoch_7.pth.tar"))
    assert ck["best_rsum"] == 10.0
    assert ck["no_impr"] == 4 and ck["lr_counter"] == 1


def test_keep_checkpoints_retention(tmp_path):
    """--keep_checkpoints N prunes all but the newest N epoch files;
    model_best.pth.tar survives, and the default (0) keeps everything
    (the reference's behavior)."""
    import numpy as np
    from fancyrec_tpu.config import Config
    from fancyrec_tpu.train import checkpoints

    cfg = Config(brand_num=2, brand_aspect=4, common_embedding_size=8,
                 visual_feat_dim=8, bow_vocab_size=8, vocab_size=16,
                 text_net="bi-gru", visual_rnn_size=4, text_rnn_size=4,
                 visual_kernel_num=2, text_kernel_num=2,
                 text_mapping_size=8, visual_mapping_size=8,
                 keep_checkpoints=2).finalize()
    params = {"w": np.zeros(3, np.float32)}
    d = str(tmp_path)

    best = 0.0
    for epoch, score in enumerate([5.0, 6.0, 7.0, 8.0]):
        best = checkpoints.maybe_save_best(
            d, cfg, params, {}, epoch=epoch, score=score, best_rsum=best,
            eiters=epoch, best_epoch=None if epoch == 0 else epoch - 1)
    files = sorted(f for f in os.listdir(d) if f.startswith("checkpoint_"))
    assert files == ["checkpoint_epoch_2.pth.tar",
                     "checkpoint_epoch_3.pth.tar"]
    assert os.path.exists(os.path.join(d, "model_best.pth.tar"))
    # the best copy survives pruning of its source epoch file
    ck = checkpoints.load_checkpoint(os.path.join(d, "model_best.pth.tar"))
    assert ck["best_rsum"] == 8.0
    # auto_resume's latest-epoch scan still finds the newest file
    from fancyrec_tpu.train.trainer import _latest_epoch_checkpoint
    epoch, path = _latest_epoch_checkpoint(d)
    assert epoch == 3 and path.endswith("checkpoint_epoch_3.pth.tar")

    # keep=0 (default): nothing pruned
    cfg.keep_checkpoints = 0
    best = checkpoints.maybe_save_best(
        d, cfg, params, {}, epoch=9, score=9.0, best_rsum=best,
        eiters=9, best_epoch=3)
    files = [f for f in os.listdir(d) if f.startswith("checkpoint_")]
    assert len(files) == 3
