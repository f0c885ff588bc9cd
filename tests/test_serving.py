"""Serving index: build from a trained checkpoint, query top-k posts."""

import json
import os

import numpy as np

from fancyrec_tpu.serving.index import PostIndex, build_index, main as index_main
from fancyrec_tpu.utils.fixture import make_fixture
from fancyrec_tpu.train import trainer
from tests.test_e2e import COMMON_ARGS


def test_build_and_query_index(tmp_path, capsys):
    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "srv_run",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
    ])
    ckpt = os.path.join(root, "model", "srv_run", "model_best.pth.tar")
    idx_dir = str(tmp_path / "index")
    n = build_index(ckpt, root, "insCartest", idx_dir, batch_size=4)
    assert n == 24

    index = PostIndex(idx_dir)
    assert index.meta["n_posts"] == 24
    vals, names = index.query([0, 1, 2], k=5)
    assert vals.shape == (3, 5)
    assert all(len(row) == 5 for row in names)
    # scores descending
    assert (np.diff(vals, axis=1) <= 1e-6).all()
    # the model trained to near-perfect retrieval: each brand's top hits
    # should mostly belong to that brand
    brands = index.brands
    name2brand = {cid: int(b) for cid, b in zip(index.cap_ids, brands)}
    hits = sum(name2brand[names[b][0]] == b for b in range(3))
    assert hits >= 2

    # CLI query path
    capsys.readouterr()  # flush earlier training output
    index_main(["query", idx_dir, "--brands", "0,2", "--k", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(line) for line in out]
    assert recs[0]["brand"] == 0 and len(recs[0]["results"]) == 3
