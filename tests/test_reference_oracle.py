"""Parity tests against the ACTUAL reference implementation.

The other golden tests re-implement the reference semantics in torch by
hand; these import the reference itself from /root/reference (importable
offline for everything except the BERT download) and use it as the oracle:

  * loss values AND gradients for TripletLoss / CrossCLR / ContrastiveLoss
    (multi-step queue walk) / LabLoss,
  * the full bi-gru FancyRec forward with weights shared through the
    production checkpoint-ingestion path,
  * a system-level run: the reference trainer.py trains on our synthetic
    fixture, then OUR tester evaluates its checkpoint and must reproduce
    the reference's own printed test metrics.

This eliminates transcription risk in the subtle spots (rank-weight
broadcast, queue pointer walk, conv fringe semantics).
"""

import argparse
import json
import os
import re
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"

B, D = 8, 16  # batch x common-dim for the loss tests


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Import the reference modules (CPU, offline). tensorboard_logger is
    absent from the environment and the module-scope BertTokenizer
    .from_pretrained would hit the network, so both are stubbed before the
    reference imports run; the bi-gru path under test never uses them."""
    tmp = tmp_path_factory.mktemp("refstub")

    tb = types.ModuleType("tensorboard_logger")
    tb.configure = lambda *a, **k: None
    tb.log_value = lambda *a, **k: None
    sys.modules.setdefault("tensorboard_logger", tb)

    from fancyrec_tpu.data.tokenizer import write_minimal_bert_vocab
    vocab_path = str(tmp / "bert_vocab.txt")
    write_minimal_bert_vocab(vocab_path, words=["car", "fast", "road"])
    import transformers
    orig_from_pretrained = transformers.BertTokenizer.from_pretrained
    transformers.BertTokenizer.from_pretrained = classmethod(
        lambda cls, *a, **k: transformers.BertTokenizer(vocab_path))

    # reference util/ndcg.py:37 uses np.asfarray, removed in numpy 2.0;
    # restore it for the duration of the reference imports/runs
    had_asfarray = hasattr(np, "asfarray")
    if not had_asfarray:
        np.asfarray = lambda a, dtype=float: np.asarray(a, dtype=dtype)

    sys.path.insert(0, REF)
    try:
        import loss as ref_loss
        import loss_ctrs as ref_loss_ctrs
        import model as ref_model
        import trainer as ref_trainer
        import util.data_provider as ref_dp
        from preprocess.text2vec import get_text_encoder as ref_get_text_encoder
        yield types.SimpleNamespace(
            loss=ref_loss, loss_ctrs=ref_loss_ctrs, model=ref_model,
            trainer=ref_trainer, dp=ref_dp,
            get_text_encoder=ref_get_text_encoder)
    finally:
        sys.path.remove(REF)
        transformers.BertTokenizer.from_pretrained = orig_from_pretrained
        if not had_asfarray:
            del np.asfarray


def _rand_pair(seed, b=B, d=D):
    rng = np.random.RandomState(seed)
    return (rng.randn(b, d).astype(np.float32),
            rng.randn(b, d).astype(np.float32))


def _torch_value_and_grads(loss_fn, brand, post):
    tb = torch.tensor(brand, requires_grad=True)
    tp = torch.tensor(post, requires_grad=True)
    loss = loss_fn(tb, tp)
    loss.backward()
    return float(loss.detach()), tb.grad.numpy(), tp.grad.numpy()


@pytest.mark.parametrize("cost_style", ["sum", "mean"])
def test_triplet_loss_matches_reference(ref, cost_style):
    from fancyrec_tpu.losses import triplet_loss

    rng = np.random.RandomState(7)
    brand_ids = rng.randint(0, 4, B)  # duplicates: same-brand mask active
    brand, post = _rand_pair(7)
    margin = 0.2

    mod = ref.loss.TripletLoss(margin=margin, measure="cosine",
                               cost_style=cost_style, direction="all")
    want, gb, gp = _torch_value_and_grads(
        lambda tb, tp: mod(torch.tensor(brand_ids), tb, tp), brand, post)

    ours = lambda b_, p_: triplet_loss(jnp.asarray(brand_ids), b_, p_,
                                       margin=margin, cost_style=cost_style)
    got = float(ours(jnp.asarray(brand), jnp.asarray(post)))
    ogb, ogp = jax.grad(ours, argnums=(0, 1))(jnp.asarray(brand),
                                              jnp.asarray(post))
    assert got == pytest.approx(want, rel=1e-5)
    np.testing.assert_allclose(np.asarray(ogb), gb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ogp), gp, atol=1e-5)


@pytest.mark.parametrize("cost_style", ["sum", "mean"])
def test_crossclr_matches_reference(ref, cost_style):
    from fancyrec_tpu.losses import crossclr_loss

    brand, post = _rand_pair(11)
    mod = ref.loss_ctrs.CrossCLR_onlyIntraModality(cost_style=cost_style)
    want, gb, gp = _torch_value_and_grads(mod, brand, post)

    ours = lambda b_, p_: crossclr_loss(b_, p_, cost_style=cost_style)
    got = float(ours(jnp.asarray(brand), jnp.asarray(post)))
    ogb, ogp = jax.grad(ours, argnums=(0, 1))(jnp.asarray(brand),
                                              jnp.asarray(post))
    assert got == pytest.approx(want, rel=1e-4)
    np.testing.assert_allclose(np.asarray(ogb), gb, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ogp), gp, atol=2e-4)


def test_lab_loss_matches_reference(ref):
    from fancyrec_tpu.losses import lab_loss

    brand, _ = _rand_pair(3)
    want = float(ref.loss.LabLoss()(torch.tensor(brand)).detach())
    got = float(lab_loss(jnp.asarray(brand)))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("flags", [{}, {"no_queue": True},
                                   {"no_intra": True}])
def test_contrastive_queue_walk_matches_reference(ref, flags):
    """6 sequential batches through the stateful queue loss (wraps the
    32-slot queue twice): per-step loss values, the final queue contents,
    and one step's gradients must all match the reference module."""
    from fancyrec_tpu.losses import contrastive_loss, init_queue_state

    K = 32
    opt = argparse.Namespace(queue_size=K, common_embedding_size=D,
                             cost_style="mean",
                             no_queue=flags.get("no_queue", False),
                             no_intra=flags.get("no_intra", False))
    mod = ref.loss_ctrs.ContrastiveLoss(opt)

    state = init_queue_state(K, D)
    for step in range(6):
        brand, post = _rand_pair(100 + step)
        want, gb, gp = _torch_value_and_grads(mod, brand, post)

        ours = lambda b_, p_, s_: contrastive_loss(
            b_, p_, s_, cost_style="mean",
            no_queue=opt.no_queue, no_intra=opt.no_intra)[0]
        got = float(ours(jnp.asarray(brand), jnp.asarray(post), state))
        ogb, ogp = jax.grad(ours, argnums=(0, 1))(
            jnp.asarray(brand), jnp.asarray(post), state)
        _, state = contrastive_loss(
            jnp.asarray(brand), jnp.asarray(post), state, cost_style="mean",
            no_queue=opt.no_queue, no_intra=opt.no_intra)

        assert got == pytest.approx(want, rel=1e-4), "step %d" % step
        np.testing.assert_allclose(np.asarray(ogb), gb, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ogp), gp, atol=2e-4)

    if not (opt.no_queue or opt.no_intra):
        np.testing.assert_allclose(np.asarray(state.queue),
                                   mod.queue.numpy(), atol=1e-5)
        assert int(state.ptr) == int(mod.queue_ptr[0])


# ---------------------------------------------------------------------------
# full-model forward parity (bi-gru tower, weights shared through the
# production checkpoint-ingestion path)
# ---------------------------------------------------------------------------

VOCAB, WORD_DIM, RNN, KNUM = 30, 12, 10, 6
FEAT, VRNN = 20, 14
BOW = 25
ASPECTS, BRANDS, COMMON = 9, 4, 16
TSIZES, VSIZES = [2, 3], [2, 3, 4]


def _ref_opt(fusion_style="ph", concate="full", level_vis="1+2+3"):
    conv_t, conv_v = KNUM * len(TSIZES), KNUM * len(VSIZES)
    if concate == "full":
        text_in = BOW + 2 * RNN + conv_t
        vis_in = 2 * FEAT + 2 * VRNN + conv_v
    else:
        # reference TextEncoder 'reduced' is fixed at level 2+3
        # (model.py:289); VisualEncoder 'reduced' switches on level_vis
        # (model.py:187-202)
        text_in = 2 * RNN + conv_t
        vis_in = {"1+2": 2 * VRNN + 2 * FEAT, "1+3": conv_v + 2 * FEAT,
                  "2+3": 2 * VRNN + conv_v, "1": 2 * FEAT,
                  "2": 2 * VRNN, "3": conv_v}[level_vis]
    return argparse.Namespace(
        trainCollection="insCartrain", valCollection="insCarval",
        testCollection="insCartest",
        brand_num=BRANDS, brand_aspect=ASPECTS,
        common_embedding_size=COMMON,
        vocab_size=VOCAB, word_dim=WORD_DIM, we_parameter=None,
        text_rnn_size=RNN, text_kernel_num=KNUM, text_kernel_sizes=TSIZES,
        text_norm=False, text_net="bi-gru",
        text_transformers_hidden_size=768,
        visual_feat_dim=FEAT, visual_rnn_size=VRNN, visual_kernel_num=KNUM,
        visual_kernel_sizes=VSIZES, visual_norm=False,
        text_mapping_size=[text_in, 8], visual_mapping_size=[vis_in, 8],
        bow_vocab_size=BOW, dropout=0.2, concate=concate,
        level_vis=level_vis, level_txt="1+2+3",
        fusion_style=fusion_style, prj_head_output=False,
        single_modal_visual=False, single_modal_text=False,
        loss_fun="cl", cost_style="mean", measure="cosine",
        queue_size=16, no_queue=False, no_intra=False,
        learning_rate=1e-4, margin=0.2, direction="all",
        max_violation=False, metric="auc", batch_size=4,
        accumulation_step=2, workers=0, n_caption=1,
        video_feature="vf", img_feature="if", vocab="word_vocab_5",
        postfix="run", cv_name="FancyRec", num_epochs=1, overwrite=1,
        rootpath="/tmp")


@pytest.mark.parametrize("fusion_style,concate,level_vis", [
    # the full-ablation case is ~12 s (first-compile heavy) -> slow tier;
    # the remaining four keep the bigru oracle in the default loop
    pytest.param("ph", "full", "1+2+3", marks=pytest.mark.slow),
    ("fc", "full", "1+2+3"),
    ("attn", "full", "1+2+3"),      # bilinear cross-modal fusion, no MFC
    ("ph", "reduced", "2+3"),
    ("ph", "reduced", "1"),
])
def test_bigru_model_forward_matches_reference(ref, tmp_path, fusion_style,
                                               concate, level_vis):
    torch.manual_seed(0)
    opt = _ref_opt(fusion_style, concate=concate, level_vis=level_vis)
    ref_net = ref.model.FancyRec(opt).eval()
    # non-trivial BN stats in the projection head
    if fusion_style == "ph":
        with torch.no_grad():
            bn = ref_net.fusion_encoding.projection_head[1]
            bn.running_mean.uniform_(-0.3, 0.3)
            bn.running_var.uniform_(0.5, 1.5)

    # save in the reference checkpoint format, ingest via load_any
    from fancyrec_tpu.train import checkpoints
    ckpt_path = str(tmp_path / "ref.pth.tar")
    torch.save({"epoch": 1, "model": ref_net.state_dict(), "best_rsum": 0.0,
                "opt": opt, "Eiters": 0}, ckpt_path)
    ckpt = checkpoints.load_any(ckpt_path)
    cfg = ckpt["config"]
    cfg.max_frames, cfg.max_words = 7, 9
    cfg.finalize()

    from fancyrec_tpu.models import FancyRec
    from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
    ours = FancyRec(cfg)
    variables = {"params": ckpt["model"]["params"]}
    if ckpt["model"].get("batch_stats"):
        variables["batch_stats"] = ckpt["model"]["batch_stats"]

    # shared inputs; lengths sorted descending (the reference collate sorts
    # by caption length for pack_padded_sequence, data_provider.py:29)
    rng = np.random.RandomState(5)
    bsz = 5
    brand_ids = rng.randint(0, BRANDS, bsz)
    vlen = np.sort(rng.randint(1, 8, bsz))[::-1].copy()
    tlen = np.sort(rng.randint(2, 10, bsz))[::-1].copy()
    frames = rng.randn(bsz, 7, FEAT).astype(np.float32)
    vmask = (np.arange(7)[None] < vlen[:, None]).astype(np.float32)
    frames *= vmask[:, :, None]
    origin = (frames.sum(1) / vlen[:, None]).astype(np.float32)
    bows = rng.rand(bsz, BOW).astype(np.float32)
    tokens = rng.randint(1, VOCAB, (bsz, 9)).astype(np.int64)
    tmask = (np.arange(9)[None] < tlen[:, None])
    tokens = tokens * tmask

    with torch.no_grad():
        want_b, want_p = ref_net(
            torch.tensor(brand_ids),
            (torch.tensor(frames), torch.tensor(origin),
             list(map(int, vlen)), torch.tensor(vmask)),
            (torch.tensor(tokens), torch.tensor(bows),
             list(map(int, tlen)), torch.tensor(tmask.astype(np.float32))))
    # reference brand tower keeps dropout active in eval too? no: .eval()
    # disables nn.Dropout, matching deterministic=True on our side.

    got_b, got_p = ours.apply(
        variables, jnp.asarray(brand_ids),
        VisualBatch(frames=jnp.asarray(frames),
                    mean_origin=jnp.asarray(origin),
                    mask=jnp.asarray(vmask)),
        TextBatch(bows=jnp.asarray(bows),
                  tokens=jnp.asarray(tokens, jnp.int32),
                  type_ids=jnp.zeros((bsz, 9), jnp.int32),
                  mask=jnp.asarray(tmask.astype(np.int32))),
        deterministic=True)

    np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_transformers_model_forward_matches_reference(ref, tmp_path,
                                                      monkeypatch):
    """The recipe-default text tower (3-layer BERT + convs + mapping) from
    the ACTUAL reference model, weights shared through checkpoint
    ingestion. BertModel.from_pretrained is patched to random init (no
    weights offline) -- values flow through the shared state dict, so the
    comparison is exact regardless."""
    import transformers

    monkeypatch.setattr(
        transformers.BertModel, "from_pretrained",
        classmethod(lambda cls, name, config=None, **kw:
                    cls(config if config is not None
                        else transformers.BertConfig())))

    torch.manual_seed(1)
    opt = _ref_opt("ph")
    opt.text_net = "transformers"
    opt.text_transformers_hidden_size = 768
    text_in = BOW + 768 + KNUM * len(TSIZES)
    opt.text_mapping_size = [text_in, 8]
    ref_net = ref.model.FancyRec(opt).eval()
    with torch.no_grad():
        bn = ref_net.fusion_encoding.projection_head[1]
        bn.running_mean.uniform_(-0.3, 0.3)
        bn.running_var.uniform_(0.5, 1.5)

    from fancyrec_tpu.train import checkpoints
    ckpt_path = str(tmp_path / "ref_tf.pth.tar")
    torch.save({"epoch": 1, "model": ref_net.state_dict(), "best_rsum": 0.0,
                "opt": opt, "Eiters": 0}, ckpt_path)
    ckpt = checkpoints.load_any(ckpt_path)
    cfg = ckpt["config"]
    cfg.max_frames, cfg.max_tokens = 7, 9
    cfg.finalize()

    from fancyrec_tpu.models import FancyRec
    from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
    ours = FancyRec(cfg)
    variables = {"params": ckpt["model"]["params"]}
    if ckpt["model"].get("batch_stats"):
        variables["batch_stats"] = ckpt["model"]["batch_stats"]

    rng = np.random.RandomState(9)
    bsz = 5
    brand_ids = rng.randint(0, BRANDS, bsz)
    vlen = np.sort(rng.randint(1, 8, bsz))[::-1].copy()
    tlen = np.sort(rng.randint(2, 10, bsz))[::-1].copy()
    frames = rng.randn(bsz, 7, FEAT).astype(np.float32)
    vmask = (np.arange(7)[None] < vlen[:, None]).astype(np.float32)
    frames *= vmask[:, :, None]
    origin = (frames.sum(1) / vlen[:, None]).astype(np.float32)
    bows = rng.rand(bsz, BOW).astype(np.float32)
    tokens = rng.randint(1, 30522, (bsz, 9)).astype(np.int64)
    tmask = (np.arange(9)[None] < tlen[:, None])
    tokens = tokens * tmask
    type_ids = np.zeros((bsz, 9), np.int64)

    # the reference only ever sees token tensors of the BATCH-max length
    # (HF's padding=True pads to batch max, data_provider.py:44); our static
    # pad runs to max_tokens with the conv region masked to batch max.
    # Feed torch the batch-max-trimmed tensors, exactly like its collate.
    lt = int(tlen.max())
    with torch.no_grad():
        want_b, want_p = ref_net(
            torch.tensor(brand_ids),
            (torch.tensor(frames), torch.tensor(origin),
             list(map(int, vlen)), torch.tensor(vmask)),
            (torch.tensor(bows), torch.tensor(tokens[:, :lt]),
             torch.tensor(type_ids[:, :lt]),
             torch.tensor(tmask[:, :lt].astype(np.int64))))

    got_b, got_p = ours.apply(
        variables, jnp.asarray(brand_ids),
        VisualBatch(frames=jnp.asarray(frames),
                    mean_origin=jnp.asarray(origin),
                    mask=jnp.asarray(vmask)),
        TextBatch(bows=jnp.asarray(bows),
                  tokens=jnp.asarray(tokens, jnp.int32),
                  type_ids=jnp.asarray(type_ids, jnp.int32),
                  mask=jnp.asarray(tmask.astype(np.int32))),
        deterministic=True)

    np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(),
                               atol=3e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# system-level: reference trainer on our fixture; our tester reproduces
# the reference's own test metrics from its checkpoint
# ---------------------------------------------------------------------------

_METRIC_RE = {
    "auc": r"AUC\[0-1\]: ([0-9.eE+-]+)",
    "ndcg10": r"NDCG@10\[0-1\]: ([0-9.eE+-]+)",
    "ndcg50": r"NDCG@50\[0-1\]: ([0-9.eE+-]+)",
    "r1": r"recall@1: ([0-9.eE+-]+)",
    "r5": r"recall@5: ([0-9.eE+-]+)",
    "r10": r"recall@10: ([0-9.eE+-]+)",
    "medr": r"MedR: ([0-9.eE+-]+)",
    "meanr": r"MeanR: ([0-9.eE+-]+)",
}


def test_our_tester_reproduces_reference_trainer_scores(ref, tmp_path,
                                                        capsys, monkeypatch):
    """Train 2 epochs with the REFERENCE trainer.py on the synthetic
    fixture (bi-gru + ph + cl: no BERT weights needed), then evaluate its
    best checkpoint with OUR tester. Our checkpoint ingestion + data
    pipeline + model + metric kernel must reproduce the reference's own
    final printed test metrics."""
    from fancyrec_tpu.eval import tester
    from fancyrec_tpu.utils.fixture import make_fixture

    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0,
                 video_feature="resnet152_dim_16",
                 img_feature="imgfeat_dim_16")

    torch.manual_seed(0)
    argv = [
        "trainer.py", "insCartrain", "insCarval", "insCartest",
        "--rootpath", root, "--postfix", "ref_run", "--overwrite", "1",
        "--brand_num", "3", "--brand_aspect", "16",
        "--video_feature", "resnet152_dim_16",
        "--img_feature", "imgfeat_dim_16",
        "--common_embedding_size", "32", "--visual_rnn_size", "16",
        "--text_rnn_size", "16", "--visual_kernel_num", "8",
        "--text_kernel_num", "8", "--text_mapping_size", "32",
        "--visual_mapping_size", "32", "--word_dim", "16",
        "--batch_size", "4", "--accumulation_step", "2",
        "--learning_rate", "0.001", "--workers", "0",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
        # quirk #3: reference test_post_ranking returns None (crashing the
        # caller) for any metric but 'auc' (evaluator.py:103); the recipe
        # always passes auc
        "--metric", "auc",
    ]
    # upstream bug: reference trainer.py:255 sets opt.we_parameter = None
    # only AFTER FancyRec(opt) (line 244) has already read it, so its own
    # trainer crashes for --text_net bi-gru (the recipe's transformers path
    # never reads the attribute). Minimal shim to run it:
    orig_parse = ref.trainer.parse_args

    def parse_with_we():
        opt = orig_parse()
        opt.we_parameter = None
        return opt

    monkeypatch.setattr(ref.trainer, "parse_args", parse_with_we)
    monkeypatch.setattr(sys, "argv", argv)

    # --- per-stage attribution capture: record the reference's own post
    # embeddings / scores at every validate (the trainer binds
    # test_post_ranking by name, so patch the trainer's binding) ---
    ref_caps = []
    orig_tpr = ref.trainer.test_post_ranking

    def capture_tpr(brand_num, metric, model, post_embs, brands):
        with torch.no_grad():
            brand_ = torch.LongTensor(list(range(brand_num)))
            aspects = model.brand_encoding.eval()(brand_)
            aspects = aspects.permute((1, 0, 2)).mean(0)
            scores = ref.trainer.evaluator.cal_sim(aspects, post_embs)
        ref_caps.append((post_embs.detach().cpu().numpy().copy(),
                         np.asarray(brands).copy(),
                         scores.detach().cpu().numpy().copy()))
        return orig_tpr(brand_num, metric, model, post_embs, brands)

    monkeypatch.setattr(ref.trainer, "test_post_ranking", capture_tpr)

    ref.trainer.main()
    out = capsys.readouterr().out

    # the reference validates after every epoch; model_best.pth.tar holds
    # the BEST epoch, so compare against the metric block with the highest
    # composite score (robust to a non-final best epoch)
    blocks = {}
    for name, pat in _METRIC_RE.items():
        matches = re.findall(pat, out)
        assert matches, "reference output missing %s" % name
        blocks[name] = [float(x) for x in matches]
    n_blocks = len(blocks["auc"])
    assert all(len(v) == n_blocks for v in blocks.values())
    composites = [
        (blocks["auc"][i] + blocks["ndcg10"][i] + blocks["ndcg50"][i]) * 100
        + blocks["r1"][i] + blocks["r5"][i] + blocks["r10"][i]
        for i in range(n_blocks)
    ]
    best_i = max(range(n_blocks), key=lambda i: composites[i])
    want = {name: vals[best_i] for name, vals in blocks.items()}
    assert want["auc"] > 0.8, "reference failed to learn the fixture: %s" % want

    logdir = os.path.join(root, "model", "ref_run")
    assert os.path.exists(os.path.join(logdir, "model_best.pth.tar"))

    # best == last epoch checkpoint? compare against whichever epoch file
    # model_best was copied from by re-validating with OUR tester
    # (capture our encoded embeddings for the attribution below)
    our_caps = {}
    orig_encode = tester.encode_data

    def capture_encode(*a, **k):
        brands_, embs_ = orig_encode(*a, **k)
        our_caps["brands"], our_caps["post_embs"] = brands_, embs_
        return brands_, embs_

    monkeypatch.setattr(tester, "encode_data", capture_encode)
    m = tester.main(["insCartest", "--rootpath", root,
                     "--logger_name", logdir, "--batch_size", "4"])
    got = {k: float(v) for k, v in m._asdict().items()}

    for name in ("auc", "ndcg10", "ndcg50"):
        assert got[name] == pytest.approx(want[name], abs=2e-3), name
    for name in ("r1", "r5", "r10", "medr", "meanr"):
        assert got[name] == pytest.approx(want[name], abs=1e-6), name

    # --- residual attribution (README "Fidelity notes"): which stage owns
    # the 2e-3 AUC/NDCG tolerance? ---
    from fancyrec_tpu.eval.metrics import ranking_metrics_oracle
    ref_embs, ref_brands, ref_scores = ref_caps[best_i]
    # (1) metric stage owns ZERO of it: our kernel on the reference's own
    # score matrix reproduces its printed metrics to float precision
    ours_on_ref = ranking_metrics_oracle(ref_scores, ref_brands, 3)
    for name in ("auc", "ndcg10", "ndcg50", "r1", "r5", "r10",
                 "medr", "meanr"):
        assert float(getattr(ours_on_ref, name)) == pytest.approx(
            want[name], abs=1e-9), ("metric-kernel", name)
    # (2) the residual is entirely cross-framework ENCODER numerics:
    # identical weights, identical posts, f32 forward divergence (packed
    # bi-GRU + conv banks reassociate differently in XLA vs torch). A
    # near-tie score pair that flips under that noise moves per-brand AUC
    # by its quantum 1/(P*N) (~8e-3 on this fixture), which is why the
    # system tolerance is 2e-3 rather than 1e-4 and cannot tighten
    # without bit-identical forwards.
    np.testing.assert_array_equal(np.asarray(our_caps["brands"]), ref_brands)
    emb_delta = float(np.max(np.abs(
        np.asarray(our_caps["post_embs"]) - ref_embs)))
    assert emb_delta < 1e-4, emb_delta
    print("attribution: max |our_emb - ref_emb| = %.2e" % emb_delta)


# ---------------------------------------------------------------------------
# data pipeline: reference Dataset4DualEncoding + collate vs our
# PostDataset.gather_batch on the same fixture
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("text_net", ["bi-gru", "transformers"])
def test_batches_match_reference_collate(ref, tmp_path, text_net):
    """Batch-for-batch parity of the online data pipeline: same caption
    sort, frame padding/mask, uncapped mean-frame vector, BoW vectors,
    token streams, and scatter indices as the reference DataLoader."""
    import argparse as _ap

    from fancyrec_tpu.data.dataset import PostDataset, load_info
    from fancyrec_tpu.data.loader import BatchLoader
    from fancyrec_tpu.data.tokenizer import WordPieceTokenizer
    from fancyrec_tpu.io.bigfile import ImageBigFile
    from fancyrec_tpu.io.dictfile import read_dict
    from fancyrec_tpu.io.vocab import Bow2Vec, load_vocab
    from fancyrec_tpu.utils.fixture import make_fixture

    import torch.utils.data as tdata
    import transformers

    root = str(tmp_path)
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=3)
    coll = "insCartest"
    cap_file = os.path.join(root, coll, "TextData", "%s.caption.txt" % coll)
    vf_dir = os.path.join(root, coll, "FeatureData", "resnet152_dim_16")
    if_dir = os.path.join(root, coll, "FeatureData", "imgfeat_dim_16")
    bow_vocab = load_vocab(os.path.join(root, "insCartrain", "TextData",
                                        "vocabulary", "bow",
                                        "word_vocab_5.pkl"))
    rnn_vocab = load_vocab(os.path.join(root, "insCartrain", "TextData",
                                        "vocabulary", "rnn",
                                        "word_vocab_5.pkl"))

    # --- reference side: its BigFile reader, Bow2Vec, dataset, collate ---
    from util.imgbigfile import ImageBigFile as RefBigFile
    opt = _ap.Namespace(rootpath=root)
    ref_ds = ref.dp.Dataset4DualEncoding(
        opt, cap_file, RefBigFile(vf_dir), RefBigFile(if_dir),
        ref.get_text_encoder("bow")(bow_vocab), rnn_vocab,
        text_net=text_net,
        video2frames=read_dict(os.path.join(vf_dir, "video2frames.txt")))
    collate = (ref.dp.collate_frame_gru_fn if text_net == "bi-gru"
               else ref.dp.collate_frame_transformers_fn)
    if text_net == "transformers":
        # bind the reference's module-global tokenizer to the fixture vocab
        # (module import bound it to the stub vocab)
        ref.dp.tokenizer = transformers.BertTokenizer(
            os.path.join(root, "bert_vocab.txt"))
    loader = tdata.DataLoader(ref_ds, batch_size=6, shuffle=False,
                              collate_fn=collate)

    # --- our side: same artifacts through our stack ---
    img_info, cls_info = load_info(root)
    tok = (WordPieceTokenizer(os.path.join(root, "bert_vocab.txt"))
           if text_net == "transformers" else None)
    ours_ds = PostDataset(
        cap_file, ImageBigFile(vf_dir), ImageBigFile(if_dir),
        Bow2Vec(bow_vocab), text_net=text_net, rnn_vocab=rnn_vocab,
        tokenizer=tok,
        video2frames=read_dict(os.path.join(vf_dir, "video2frames.txt")),
        img_info=img_info, cls_info=cls_info,
        max_frames=8, max_tokens=24, max_words=16)
    ours = BatchLoader(ours_ds, 6, final_batch="pad")

    assert len(ref_ds) == len(ours_ds) and len(ref_ds) % 6 == 0

    for want, got in zip(loader, ours):
        brand_ids, video_data, text_data, idxs, cap_ids, video_ids = want
        frames_w, origin_w, vlens_w, vmask_w = video_data

        np.testing.assert_array_equal(np.asarray(brand_ids),
                                      got["brand_ids"])
        assert list(idxs) == got["idxs"].tolist()
        tmax = frames_w.shape[1]
        np.testing.assert_allclose(got["frames"][:, :tmax],
                                   frames_w.numpy(), atol=1e-6)
        assert got["frames"][:, tmax:].sum() == 0
        np.testing.assert_allclose(got["origin"], origin_w.numpy(),
                                   atol=1e-6)
        np.testing.assert_array_equal(got["vmask"][:, :tmax],
                                      vmask_w.numpy())

        if text_net == "bi-gru":
            tokens_w, bows_w, tlens_w, wmask_w = text_data
            np.testing.assert_allclose(got["bows"], bows_w.numpy(),
                                       atol=1e-6)
            lmax = tokens_w.shape[1]
            np.testing.assert_array_equal(
                got["tokens"][:, :lmax], tokens_w.numpy().astype(np.int32))
            np.testing.assert_array_equal(
                got["tmask"][:, :lmax], wmask_w.numpy().astype(np.int32))
        else:
            bows_w, tokens_w, type_ids_w, masks_w = text_data
            np.testing.assert_allclose(got["bows"], bows_w.numpy(),
                                       atol=1e-6)
            lmax = tokens_w.shape[1]
            np.testing.assert_array_equal(
                got["tokens"][:, :lmax], tokens_w.numpy().astype(np.int32))
            np.testing.assert_array_equal(
                got["tmask"][:, :lmax], masks_w.numpy().astype(np.int32))
            np.testing.assert_array_equal(
                got["type_ids"][:, :lmax],
                type_ids_w.numpy().astype(np.int32))
        assert got["tokens"][:, lmax:].sum() == 0


def test_queue_size_not_divisible_reference_crashes_ours_wraps(ref):
    """Deliberate fix: queue_size % batch != 0 crashes the reference with
    an IndexError on the second step (its positive mask walks mask[i][ptr]
    past the queue edge, loss_ctrs.py:149-159); our modulo pointer wraps
    and keeps training. Documented in README fidelity notes."""
    from fancyrec_tpu.losses import contrastive_loss, init_queue_state

    opt = argparse.Namespace(queue_size=10, common_embedding_size=4,
                             cost_style="mean", no_queue=False,
                             no_intra=False)
    mod = ref.loss_ctrs.ContrastiveLoss(opt)
    rng = np.random.RandomState(0)
    batches = [(rng.randn(4, 4).astype(np.float32),
                rng.randn(4, 4).astype(np.float32)) for _ in range(4)]

    mod(torch.tensor(batches[0][0]), torch.tensor(batches[0][1]))
    with pytest.raises(IndexError):
        mod(torch.tensor(batches[1][0]), torch.tensor(batches[1][1]))

    state = init_queue_state(10, 4)
    for brand, post in batches:
        loss, state = contrastive_loss(jnp.asarray(brand), jnp.asarray(post),
                                       state, cost_style="mean")
        assert np.isfinite(float(loss))
    assert int(state.ptr) == (4 * 4) % 10
