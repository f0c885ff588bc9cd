"""End-to-end: fixture -> train CLI -> checkpoints -> tester CLI."""

import os

import pytest

from fancyrec_tpu.utils.fixture import make_fixture
from fancyrec_tpu.train import trainer
from fancyrec_tpu.eval import tester

COMMON_ARGS = [
    "insCartrain", "insCarval", "insCartest",
    "--brand_num", "3", "--brand_aspect", "16",
    "--video_feature", "resnet152_dim_16", "--img_feature", "imgfeat_dim_16",
    "--common_embedding_size", "32", "--visual_rnn_size", "16",
    "--text_rnn_size", "16", "--visual_kernel_num", "8",
    "--text_kernel_num", "8", "--text_mapping_size", "32",
    "--visual_mapping_size", "32", "--word_dim", "16",
    "--batch_size", "4", "--accumulation_step", "2",
    "--learning_rate", "0.001", "--overwrite", "1",
    "--max_frames", "8", "--max_tokens", "24", "--max_words", "16",
]


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    make_fixture(root, brand_num=3, videos_per_brand=4, imgs_per_brand=4,
                 feat_dim=16, frames_per_video=4, seed=0)
    return root


@pytest.mark.slow
def test_train_then_test_bigru_cl(root):
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_bigru",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
    ])
    # the fixture has a strong brand signal: must learn far beyond chance
    assert best > 450, best

    logdir = os.path.join(root, "model", "run_bigru")
    assert os.path.exists(os.path.join(logdir, "model_best.pth.tar"))

    m = tester.main(["insCartest", "--rootpath", root,
                     "--logger_name", logdir, "--batch_size", "4"])
    assert m.auc > 0.8


@pytest.mark.slow
def test_train_bf16_transfer_staging(root):
    """--transfer_dtype bfloat16 ships float batch arrays half-width over
    the host->device link; the step upcasts on device. Training must
    still learn the fixture's brand signal (bf16 input rounding only)."""
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_xferbf16",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
        "--transfer_dtype", "bfloat16",
    ])
    assert best > 450, best


@pytest.mark.slow
def test_train_transformers_cl(root):
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_tf",
        "--text_net", "transformers", "--fusion_style", "fc",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "4",
        "--text_transformers_hidden_size", "48",
    ])
    assert best > 420, best


@pytest.mark.slow
def test_train_mrl_loss_runs(root):
    """mrl converges slower; just require clear above-chance learning."""
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_mrl",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "mrl", "--cost_style", "sum", "--num_epochs", "2",
    ])
    assert best > 300, best


@pytest.mark.slow   # 42 s: full two-CLI train->resume run
def test_resume_from_checkpoint(root):
    logdir = os.path.join(root, "model", "run_bigru")
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_resume",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "1",
        "--resume", os.path.join(logdir, "model_best.pth.tar"),
    ])
    assert best > 450, best


@pytest.mark.slow
def test_train_bfloat16_towers(root):
    """bf16 compute dtype trains and evaluates sanely."""
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_bf16",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
        "--dtype", "bfloat16",
    ])
    assert best > 400, best


@pytest.mark.slow
def test_train_rbg_rng_bf16_bert(root):
    """--rng_impl rbg (hardware-backed dropout PRNG; a different but
    equally distributed stream than threefry) together with the bf16
    BERT compute path must still learn the fixture signal."""
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_rbg",
        "--text_net", "transformers", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "4",
        "--text_transformers_hidden_size", "48",
        "--rng_impl", "rbg", "--dtype", "bfloat16",
    ])
    assert best > 350, best


def test_validate_split_val_fix(root):
    """--validate_split val fixes the reference's model-selection-on-test
    quirk; the run must still train and checkpoint normally."""
    best = trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_valsel",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "1",
        "--validate_split", "val",
    ])
    assert best > 0
    assert os.path.exists(os.path.join(root, "model", "run_valsel",
                                       "model_best.pth.tar"))


@pytest.mark.slow
def test_profile_dir_captures_trace(root, tmp_path):
    """--profile_dir writes an XProf trace of epoch 1."""
    prof = str(tmp_path / "prof")
    trainer.main(COMMON_ARGS + [
        "--rootpath", root, "--postfix", "run_prof",
        "--text_net", "bi-gru", "--fusion_style", "ph",
        "--loss_fun", "cl", "--cost_style", "mean", "--num_epochs", "2",
        "--profile_dir", prof,
    ])
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(prof) for f in fs]
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
               for f in files), files
