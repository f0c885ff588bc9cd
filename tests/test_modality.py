"""Standalone visual-only / text-only encoding surface (the reference's
broken VisDataSet/TxtDataSet4DualEncoding, made real)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fancyrec_tpu.config import Config
from fancyrec_tpu.data.loader import BatchLoader
from fancyrec_tpu.data.modality import TxtDataset, VisDataset, encode_modality
from fancyrec_tpu.eval.evaluator import make_encode_txt_fn, make_encode_vis_fn
from fancyrec_tpu.io.bigfile import ImageBigFile
from fancyrec_tpu.io.dictfile import read_dict
from fancyrec_tpu.io.vocab import Bow2Vec, load_vocab
from fancyrec_tpu.train.state import init_state
from fancyrec_tpu.utils.fixture import make_fixture


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("modality"))
    make_fixture(root, brand_num=3, videos_per_brand=3, imgs_per_brand=3,
                 feat_dim=16, frames_per_video=4, seed=1)
    return root


def _cfg(root):
    bow = load_vocab(os.path.join(root, "insCartrain", "TextData",
                                  "vocabulary", "bow", "word_vocab_5.pkl"))
    rnn = load_vocab(os.path.join(root, "insCartrain", "TextData",
                                  "vocabulary", "rnn", "word_vocab_5.pkl"))
    cfg = Config(brand_num=3, brand_aspect=8, common_embedding_size=16,
                 visual_feat_dim=16, visual_rnn_size=8, text_rnn_size=8,
                 visual_kernel_num=4, text_kernel_num=4,
                 text_mapping_size=16, visual_mapping_size=16,
                 word_dim=8, text_net="bi-gru", fusion_style="ph",
                 bow_vocab_size=len(bow), vocab_size=len(rnn),
                 max_frames=8, max_words=16).finalize()
    return cfg, bow, rnn


@pytest.mark.slow
def test_vis_and_txt_datasets_encode(root):
    cfg, bow, rnn = _cfg(root)
    model, state = init_state(cfg)

    vfeat = ImageBigFile(os.path.join(root, "insCartest", "FeatureData",
                                      "resnet152_dim_16"))
    ifeat = ImageBigFile(os.path.join(root, "insCartest", "FeatureData",
                                      "imgfeat_dim_16"))
    v2f = read_dict(os.path.join(root, "insCartest", "FeatureData",
                                 "resnet152_dim_16", "video2frames.txt"))

    vis = VisDataset(video_feat=vfeat, video2frames=v2f, img_feat=ifeat,
                     max_frames=cfg.max_frames)
    assert len(vis) == len(v2f) + ifeat.nr_of_images

    txt = TxtDataset(os.path.join(root, "insCartest", "TextData",
                                  "insCartest.caption.txt"),
                     Bow2Vec(bow), text_net="bi-gru", rnn_vocab=rnn,
                     max_words=cfg.max_words)
    assert len(txt) == len(txt.names) > 0

    vis_fn = make_encode_vis_fn(model)
    txt_fn = make_encode_txt_fn(model)
    v_embs = encode_modality(model, state.params, state.batch_stats,
                             BatchLoader(vis, 4, final_batch="pad"),
                             cfg.common_embedding_size, vis_fn)
    t_embs = encode_modality(model, state.params, state.batch_stats,
                             BatchLoader(txt, 4, final_batch="pad"),
                             cfg.common_embedding_size, txt_fn)
    assert v_embs.shape == (len(vis), cfg.common_embedding_size)
    assert t_embs.shape == (len(txt), cfg.common_embedding_size)
    assert np.isfinite(v_embs).all() and np.isfinite(t_embs).all()
    # padding must not leave zero rows behind
    assert (np.abs(v_embs).sum(1) > 0).all()
    assert (np.abs(t_embs).sum(1) > 0).all()

    # scatter correctness: re-encode item 2 alone and compare its row
    single = vis.gather_batch([2], pad_to=4)
    one = np.asarray(vis_fn(
        state.params, state.batch_stats,
        {k: v for k, v in single.items() if k not in ("idxs", "n_valid")}))[0]
    np.testing.assert_allclose(v_embs[2], one, atol=1e-5)
