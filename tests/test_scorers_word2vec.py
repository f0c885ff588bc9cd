import numpy as np
import pytest

from fancyrec_tpu.eval.scorers import (
    APScorer, DCGScorer, NDCGScorer, PrecisionScorer, RRScorer,
    batch_ap, batch_precision, batch_rr, getScorer)
from fancyrec_tpu.io.bigfile import BigFileWriter
from fancyrec_tpu.io.vocab import Vocabulary
from fancyrec_tpu.io.word2vec import AveWord2Vec, get_we_parameter


def test_scorer_factory_and_names():
    assert getScorer("AP@10").name() == "AP@10"
    assert getScorer("RR").name() == "RR"
    assert isinstance(getScorer("P@1"), PrecisionScorer)
    assert isinstance(getScorer("NDCG@10"), NDCGScorer)
    assert isinstance(getScorer("DCG@25"), DCGScorer)


def test_ap_scorer_hand_computed():
    # labels [1,1,0,0,0]: AP = (1/1 + 2/2)/2 = 1.0
    assert APScorer(0).score([1, 1, 0, 0, 0]) == pytest.approx(1.0)
    # labels [0,1,0,1]: AP = (1/2 + 2/4)/2 = 0.5
    assert APScorer(0).score([0, 1, 0, 1]) == pytest.approx(0.5)
    assert APScorer(0).score([0, 0]) == 0.0


def test_rr_precision():
    assert RRScorer().score([0, 0, 1]) == pytest.approx(1 / 3)
    assert RRScorer().score([0, 0]) == 0.0
    assert PrecisionScorer(2).score([1, 0, 1]) == pytest.approx(0.5)


def test_ndcg_scorer_first_element_undiscounted():
    # reference discount: first element rel, then rel/log2(i+1) from i=1
    s = NDCGScorer(4)
    val = s.score([2, 1, 2, 0])
    dcg = 2 + 1 / np.log2(2) + 2 / np.log2(3)
    idcg = 2 + 2 / np.log2(2) + 1 / np.log2(3)
    assert val == pytest.approx(dcg / idcg)


def test_batch_versions_match_scalar():
    rng = np.random.RandomState(0)
    labels = (rng.rand(20, 30) > 0.7).astype(int)
    ap = batch_ap(labels)
    rr = batch_rr(labels)
    p5 = batch_precision(labels, 5)
    for q in range(20):
        assert ap[q] == pytest.approx(APScorer(0).score(list(labels[q])))
        assert rr[q] == pytest.approx(RRScorer().score(list(labels[q])))
        assert p5[q] == pytest.approx(PrecisionScorer(5).score(list(labels[q])))


def test_batch_ap_graded_labels_match_scalar():
    """Reference quirk (util/metric.py:32 vs :38): graded labels in (0, 1)
    count in AP's denominator (label > 0) but not as hits (label >= 1).
    batch_ap must deflate exactly like the scalar scorer."""
    rng = np.random.RandomState(1)
    labels = rng.choice([0.0, 0.5, 1.0], size=(10, 20), p=[0.6, 0.2, 0.2])
    ap = batch_ap(labels)
    for q in range(10):
        assert ap[q] == pytest.approx(APScorer(0).score(list(labels[q])))


# ---------------------------------------------------------------------------

@pytest.fixture()
def w2v_store(tmp_path):
    d = str(tmp_path / "w2v")
    words = ["car", "red", "fast"]
    mat = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]], np.float32)
    with BigFileWriter(d, ndims=4, delimiter=" ") as w:
        w.write_batch(words, mat)
    return d, dict(zip(words, mat))


def test_get_we_parameter(w2v_store):
    d, vecs = w2v_store
    vocab = Vocabulary("rnn")
    for t in ("<pad>", "car", "zzz", "red"):
        vocab.add_word(t)
    we = get_we_parameter(vocab, d, seed=0)
    assert we.shape == (4, 4)
    np.testing.assert_allclose(we[1], vecs["car"])
    np.testing.assert_allclose(we[3], vecs["red"])
    assert np.all(np.abs(we[2]) <= 1.0)  # OOV: uniform(-1, 1)


def test_ave_word2vec(w2v_store):
    d, vecs = w2v_store
    enc = AveWord2Vec(d)
    got = enc.mapping("the red car!")
    np.testing.assert_allclose(got, (vecs["red"] + vecs["car"]) / 2)
    assert enc.mapping("unknown words only") is None
    l2 = AveWord2Vec(d, L2_norm=1).mapping("red car")
    assert np.isclose(np.linalg.norm(l2), 1.0)


def test_gen_adj_matches_reference_formula():
    import numpy as np
    from fancyrec_tpu.ops.graph import gen_adj

    rng = np.random.RandomState(0)
    a = (rng.rand(6, 6) > 0.4).astype(np.float32) + np.eye(6, dtype=np.float32)
    d = np.power(a.sum(1), -0.5)
    dm = np.diag(d)
    want = (a @ dm).T @ dm
    np.testing.assert_allclose(np.asarray(gen_adj(a)), want, atol=1e-6)
