"""T5 encoder parity vs HF transformers (reference analog:
multimodal_gen/runtime/models/encoders/t5.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.diffusion.models.t5_encoder import (
    T5Config,
    T5Encoder,
    relative_position_bucket,
)


def _state_to_params(cfg, state_dict):
    def to_np(x):
        return x.detach().to(torch.float32).numpy()

    params = {}
    for path, (tmpl, tf) in T5Encoder.hf_weight_map(cfg).items():
        if "{i}" in tmpl:
            leaves = []
            for i in range(cfg.num_layers):
                w = to_np(state_dict[tmpl.format(i=i)])
                leaves.append(w.T if tf == "t" else w)
            leaf = np.stack(leaves)
        else:
            w = to_np(state_dict[tmpl])
            if tf == "t":
                leaf = w.T
            elif tf == "unsqueeze0":
                leaf = w[None]
            else:
                leaf = w
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


def test_bucket_function_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    pos = np.arange(24)
    rel = pos[None, :] - pos[:, None]
    ours = relative_position_bucket(rel, 32, 128)
    theirs = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("model_type", ["t5", "umt5"])
def test_t5_encoder_parity(model_type):
    if model_type == "umt5":
        from transformers import UMT5Config as HFConfig, UMT5EncoderModel as HFModel
    else:
        from transformers import T5Config as HFConfig, T5EncoderModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    cfg = T5Config.from_hf(hf_cfg.to_dict())
    assert cfg.per_layer_rel_bias == (model_type == "umt5")
    params = _state_to_params(cfg, model.state_dict())

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 96, size=(2, 10))
    ids[0, 7:] = 0  # pad tail
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours, pooled = T5Encoder.apply(params, jnp.asarray(ids, jnp.int32), cfg)
    ours = np.asarray(ours)
    # compare non-pad positions (HF zeroes nothing; pad rows attend nothing
    # meaningful either way)
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(
        np.where(m, ours, 0), np.where(m, ref, 0), atol=2e-4, rtol=2e-3
    )
    assert pooled.shape == (2, 32)
