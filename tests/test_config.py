import os
import numpy as np
import pytest

from fancyrec_tpu.config import Config, build_train_parser, config_from_args


def test_json_roundtrip_preserves_everything():
    cfg = Config(trainCollection="a", valCollection="b", testCollection="c",
                 brand_num=51, bow_vocab_size=7807, visual_feat_dim=2048,
                 loss_fun="cl", fusion_style="ph", seq_shard=True).finalize()
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_finalize_is_idempotent():
    cfg = Config(bow_vocab_size=100, visual_feat_dim=64).finalize()
    first = (cfg.text_mapping_in, cfg.visual_mapping_in,
             list(cfg.text_kernel_sizes_list))
    cfg.finalize()
    assert (cfg.text_mapping_in, cfg.visual_mapping_in,
            list(cfg.text_kernel_sizes_list)) == first


def test_mapping_arithmetic_matches_reference_recipe():
    """instance.sh recipe widths (reference trainer.py:185-194)."""
    cfg = Config(concate="full", text_net="transformers",
                 bow_vocab_size=7807, text_transformers_hidden_size=768,
                 text_kernel_num=512, text_kernel_sizes="2-3-4",
                 visual_feat_dim=2048, visual_rnn_size=1024,
                 visual_kernel_num=512,
                 visual_kernel_sizes="2-3-4-5").finalize()
    assert cfg.text_mapping_in == 7807 + 768 + 512 * 3
    assert cfg.visual_mapping_in == 2048 * 2 + 1024 * 2 + 512 * 4


def test_reduced_level_widths():
    cfg = Config(concate="reduced", text_net="transformers", level_txt="2+3",
                 level_vis="1+3", bow_vocab_size=100,
                 text_transformers_hidden_size=768, text_kernel_num=512,
                 text_kernel_sizes="2-3-4", visual_feat_dim=2048,
                 visual_kernel_num=512,
                 visual_kernel_sizes="2-3-4-5").finalize()
    assert cfg.text_mapping_in == 768 + 512 * 3
    assert cfg.visual_mapping_in == 2048 * 2 + 512 * 4


def test_cli_parses_reference_recipe_flags():
    argv = ("insCartrain insCarval insCartest --rootpath /x --workers 8 "
            "--brand_num 51 --overwrite 1 --text_norm --visual_norm "
            "--video_feature resnet152_dim_2048 --img_feature imgfeat_dim_2048 "
            "--n_caption 1 --concate full --loss_fun cl --num_epochs 30 "
            "--text_net transformers --batch_size 8 --accumulation_step 8 "
            "--metric auc --learning_rate 0.0001 --common_embedding_size 1024 "
            "--text_mapping_size 1024 --visual_mapping_size 1024 --margin 0.2 "
            "--fusion_style ph --max_violation --postfix final "
            "--measure cosine --cost_style mean --brand_aspect 2000").split()
    cfg = config_from_args(build_train_parser().parse_args(argv))
    assert cfg.brand_num == 51 and cfg.loss_fun == "cl"
    assert cfg.text_norm and cfg.visual_norm and cfg.max_violation
    assert cfg.cost_style == "mean" and cfg.brand_aspect == 2000


def test_tokenizer_fuzz_vs_hf(tmp_path):
    """Random unicode-ish strings: token-for-token HF agreement."""
    from transformers import BertTokenizer
    from fancyrec_tpu.data.tokenizer import (
        WordPieceTokenizer, write_minimal_bert_vocab)

    vocab_path = str(tmp_path / "v.txt")
    words = ["the", "car", "drive", "##s", "##e", "##r", "ab", "##cd",
             "x", "##y", "##z", "1", "##2", ".", "-"]
    write_minimal_bert_vocab(vocab_path, words)
    hf = BertTokenizer(vocab_path, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_path)

    rng = np.random.RandomState(0)
    alphabet = list("abcdxyz12.-é Ü\t!汉")
    for _ in range(200):
        n = rng.randint(0, 30)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert ours.encode(text) == hf.encode(text), repr(text)


def test_mesh_batch_divisibility_rejected():
    """--batch_size must divide the data mesh axis or finalize raises
    (silent replication would run at 1/N throughput)."""
    with pytest.raises(ValueError, match="not divisible by the data mesh"):
        Config(bow_vocab_size=10, visual_feat_dim=8, batch_size=6,
               mesh_shape="8,1").finalize()
    # divisible and single-data-axis shapes pass
    Config(bow_vocab_size=10, visual_feat_dim=8, batch_size=8,
           mesh_shape="8,1").finalize()
    Config(bow_vocab_size=10, visual_feat_dim=8, batch_size=7,
           mesh_shape="1,2").finalize()


def test_compilation_cache_populates(tmp_path):
    """enable_compilation_cache points JAX's persistent cache at the dir;
    a jitted call then writes an executable entry (warm restarts of the
    bucketed trainer skip the per-program compiles)."""
    import jax
    import jax.numpy as jnp

    from fancyrec_tpu.config import enable_compilation_cache

    prev = jax.config.values.get("jax_compilation_cache_dir")
    cache = str(tmp_path / "xla_cache")
    try:
        enable_compilation_cache(cache)
        assert os.path.isdir(cache)
        # fresh shape so the in-memory jit cache can't satisfy it
        jax.jit(lambda x: (x * 3 + 1).sum())(jnp.arange(173.0)).block_until_ready()
        assert os.listdir(cache), "no persistent cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
