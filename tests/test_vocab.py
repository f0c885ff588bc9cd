import numpy as np

from fancyrec_tpu.io.vocab import (
    Bow2Vec, Vocabulary, build_vocab, clean_str, load_vocab, save_vocab)


def test_clean_str():
    assert clean_str("Hello, World! 123") == ["hello", "world", "123"]
    assert clean_str("  a-b_c  ") == ["a", "b", "c"]
    assert clean_str("...") == []


def test_build_vocab_threshold_and_specials():
    caps = ["red car red", "blue car", "red bus"]
    vocab, counter = build_vocab(caps, "rnn", threshold=2)
    assert vocab("<pad>") == 0 and vocab("<start>") == 1
    assert vocab("<end>") == 2 and vocab("<unk>") == 3
    assert counter["red"] == 3
    # 'blue'/'bus' below threshold -> mapped to <unk> in rnn style
    assert vocab("blue") == vocab("<unk>")
    assert vocab("red") == 4  # first surviving word after specials
    assert vocab("car") == 5

    bow, _ = build_vocab(caps, "bow", threshold=2)
    assert len(bow) == 2
    assert bow("red") == 0 and bow("car") == 1


def test_bow2vec_term_frequency():
    vocab, _ = build_vocab(["a a b", "a b c"], "bow", threshold=1)
    b2v = Bow2Vec(vocab)
    vec = b2v.mapping("a a c unknown!")
    assert np.allclose(vec, [2.0, 0.0, 1.0])
    assert b2v.mapping("zzz qqq") is None


def test_bow2vec_norms():
    vocab, _ = build_vocab(["a b"], "bow", threshold=1)
    v1 = Bow2Vec(vocab, L1_norm=1).mapping("a a b")
    assert np.isclose(v1.sum(), 1.0)
    v2 = Bow2Vec(vocab, L2_norm=1).mapping("a a b")
    assert np.isclose(np.linalg.norm(v2), 1.0)


def test_vocab_pickle_roundtrip(tmp_path):
    vocab, _ = build_vocab(["x y z"], "rnn", threshold=1)
    p = str(tmp_path / "v.pkl")
    save_vocab(vocab, p)
    v2 = load_vocab(p)
    assert v2.word2idx == vocab.word2idx
    assert v2.text_style == "rnn"


def test_loads_foreign_module_pickles(tmp_path):
    """Pickles written by the reference (module preprocess.vocab) must load."""
    import pickle, sys, types
    mod = types.ModuleType("preprocess")
    vmod = types.ModuleType("preprocess.vocab")

    class RefVocabulary:  # stand-in for the reference class
        pass

    RefVocabulary.__module__ = "preprocess.vocab"
    RefVocabulary.__qualname__ = "Vocabulary"
    RefVocabulary.__name__ = "Vocabulary"
    vmod.Vocabulary = RefVocabulary
    mod.vocab = vmod
    sys.modules["preprocess"] = mod
    sys.modules["preprocess.vocab"] = vmod
    try:
        rv = RefVocabulary()
        rv.word2idx = {"hi": 0}
        rv.idx2word = {0: "hi"}
        rv.idx = 1
        rv.text_style = "bow"
        p = str(tmp_path / "ref.pkl")
        with open(p, "wb") as f:
            pickle.dump(rv, f)
        loaded = load_vocab(p)
        assert isinstance(loaded, Vocabulary)
        assert loaded("hi") == 0
    finally:
        del sys.modules["preprocess"], sys.modules["preprocess.vocab"]
