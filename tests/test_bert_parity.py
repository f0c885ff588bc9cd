"""BertEncoder vs transformers.BertModel numerics with shared random weights.

Runs fully offline: HF BertModel is constructed from a config (random init),
its state dict is shimmed into our Flax module, outputs compared. This is
the same path a real bert-base-uncased checkpoint would take through
BertEncoder.params_from_torch.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fancyrec_tpu.models.bert import BertConfig, BertEncoder

# the module fixture alone (HF BertModel construction + state-dict shim)
# costs ~60 s on the 1-core box; the whole oracle belongs to the full tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def small_pair():
    from transformers import BertConfig as HFConfig
    from transformers import BertModel

    hf_cfg = HFConfig(
        vocab_size=211, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, type_vocab_size=2,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg)
    hf.eval()

    cfg = BertConfig(
        vocab_size=211, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, type_vocab_size=2)
    ours = BertEncoder(cfg)
    params = BertEncoder.params_from_torch(
        {k: v for k, v in hf.state_dict().items()}, cfg)
    return hf, ours, params


def test_bert_last_hidden_matches(small_pair):
    hf, ours, params = small_pair
    rng = np.random.RandomState(0)
    B, T = 3, 12
    ids = rng.randint(0, 211, (B, T))
    types = np.zeros((B, T), np.int64)
    lengths = [12, 7, 3]
    mask = (np.arange(T)[None] < np.array(lengths)[:, None]).astype(np.int64)

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  token_type_ids=torch.tensor(types),
                  attention_mask=torch.tensor(mask))[0].numpy()

    got = ours.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(types), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_bert_pad_positions_match_too(small_pair):
    """The reference convolves pad-position outputs (model.py:350-357), so
    those must match as well -- full (B, T, H) comparison including pads."""
    hf, ours, params = small_pair
    rng = np.random.RandomState(1)
    B, T = 2, 9
    ids = rng.randint(0, 211, (B, T))
    ids[0, 5:] = 0  # pad token id
    types = np.zeros((B, T), np.int64)
    mask = np.ones((B, T), np.int64)
    mask[0, 5:] = 0

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  token_type_ids=torch.tensor(types),
                  attention_mask=torch.tensor(mask))[0].numpy()
    got = ours.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(types), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)
