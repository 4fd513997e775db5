"""Mamba2 model parity vs HF transformers (torch_forward path) + generator
state-cached decode (reference analog: srt/models/mamba2 + hybrid pools)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.mamba import Mamba2Family, MambaGenerator


def _tiny_hf():
    from transformers import Mamba2Config, Mamba2ForCausalLM

    cfg = Mamba2Config(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        state_size=8,
        head_dim=8,
        num_heads=8,  # intermediate = expand*hidden = 64 = 8*8
        n_groups=2,
        expand=2,
        conv_kernel=4,
        chunk_size=8,
        tie_word_embeddings=True,
        time_step_limit=(0.0, 100.0),
    )
    torch.manual_seed(0)
    return cfg, Mamba2ForCausalLM(cfg).eval()


def _params(cfg, sd):
    def to_np(x):
        return x.detach().float().numpy()

    params = {}
    for path, (tmpl, tf) in Mamba2Family.hf_weight_map(cfg).items():
        if "{i}" in tmpl:
            leaves = []
            for i in range(cfg.num_hidden_layers):
                w = to_np(sd[tmpl.format(i=i)])
                if tf == "t":
                    w = w.T
                elif tf == "conv1d":
                    w = w.squeeze(1).T  # [conv_dim,1,K] -> [K, conv_dim]
                leaves.append(w)
            leaf = np.stack(leaves)
        else:
            w = to_np(sd[tmpl])
            leaf = w.T if tf == "t" else w
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


@pytest.fixture(scope="module")
def setup():
    hf_cfg, hf_model = _tiny_hf()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Mamba2ForCausalLM"]}
    )
    params = _params(cfg, hf_model.state_dict())
    return hf_cfg, hf_model, cfg, params


def test_prefill_logits_parity(setup):
    hf_cfg, hf_model, cfg, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 96, size=(2, 16))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    fwd = Mamba2Family.make_forward(cfg, chunk=8)
    L = cfg.num_hidden_layers
    conv = jnp.zeros((L, 2, 3, 64 + 2 * 2 * 8), jnp.float32)
    ssm = jnp.zeros((L, 2, 8, 8, 8), jnp.float32)
    logits, _, _ = fwd(params, jnp.asarray(ids, jnp.int32), conv, ssm)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-2)


def test_decode_state_matches_prefill(setup):
    """Processing [t0..t9] at once == prefill 8 + 2 single-token decode
    steps (state caching correctness)."""
    hf_cfg, hf_model, cfg, params = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 96, size=(1, 10))
    fwd = Mamba2Family.make_forward(cfg, chunk=8)
    L = cfg.num_hidden_layers
    conv0 = jnp.zeros((L, 1, 3, 64 + 32), jnp.float32)
    ssm0 = jnp.zeros((L, 1, 8, 8, 8), jnp.float32)
    # chunk=8 path requires multiples of 8; run token-by-token as reference
    full_logits = None
    conv, ssm = conv0, ssm0
    for i in range(10):
        full_logits, conv, ssm = fwd(
            params, jnp.asarray(ids[:, i : i + 1], jnp.int32), conv, ssm
        )
    ref_last = np.asarray(full_logits[:, -1])
    # chunked head (8) + 2 decode steps
    conv, ssm = conv0, ssm0
    _, conv, ssm = fwd(params, jnp.asarray(ids[:, :8], jnp.int32), conv, ssm)
    _, conv, ssm = fwd(params, jnp.asarray(ids[:, 8:9], jnp.int32), conv, ssm)
    logits, _, _ = fwd(params, jnp.asarray(ids[:, 9:10], jnp.int32), conv, ssm)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), ref_last, atol=2e-4, rtol=2e-3
    )


def test_generator_matches_hf_greedy(setup):
    hf_cfg, hf_model, cfg, params = setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, 96, size=11).tolist()
    with torch.no_grad():
        ref = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
        )[0, len(prompt):].tolist()
    gen = MambaGenerator(cfg, params, chunk=8)
    out = gen.generate(prompt, max_new_tokens=6)
    assert out["output_ids"] == ref
