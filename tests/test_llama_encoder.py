"""Llama-as-text-encoder parity vs HF transformers LlamaModel
(reference analog: multimodal_gen/runtime/models/encoders/llama.py, the
HunyuanVideo conditioning path)."""

import numpy as np
import torch

import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.llama_encoder import (
    LlamaEncoderConfig,
    LlamaTextEncoder,
)


def _tiny():
    from transformers import LlamaConfig, LlamaModel

    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(3)
    model = LlamaModel(hf_cfg).eval()
    cfg = LlamaEncoderConfig.from_hf(hf_cfg.to_dict())
    params = {}
    sd = {f"model.{k}": v for k, v in model.state_dict().items()}
    for path, (tmpl, tf) in LlamaTextEncoder.hf_weight_map().items():
        def fetch(name):
            w = sd[name].detach().float().numpy()
            return w.T if tf == "t" else w

        if "{i}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(i=i)) for i in range(cfg.num_layers)]
            )
        else:
            leaf = fetch(tmpl)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return model, cfg, params


def test_last_hidden_state_parity():
    model, cfg, params = _tiny()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 10))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(
        LlamaTextEncoder.apply(params, jnp.asarray(ids, jnp.int32), cfg)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_skip_layer_hidden_state_parity():
    """hidden_state_skip_layer=k -> HF hidden_states[-(k+1)] (raw layer
    output, no final norm) — HunyuanVideo's conditioning choice."""
    model, cfg, params = _tiny()
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 128, size=(1, 8))
    with torch.no_grad():
        hs = model(
            torch.tensor(ids), output_hidden_states=True
        ).hidden_states
    for skip in (1, 2):
        ref = hs[-(skip + 1)].numpy()
        got = np.asarray(
            LlamaTextEncoder.apply(
                params, jnp.asarray(ids, jnp.int32), cfg, skip_layers=skip
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4, err_msg=f"skip={skip}")


def test_padding_mask():
    """Pad positions must not influence earlier (causal) or later valid
    tokens when masked out."""
    model, cfg, params = _tiny()
    ids_full = np.array([[5, 6, 7, 8, 9, 10]], np.int32)
    ids_padded = np.array([[5, 6, 7, 8, 99, 99]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
    a = np.asarray(
        LlamaTextEncoder.apply(
            params, jnp.asarray(ids_full[:, :4]), cfg
        )
    )
    b = np.asarray(
        LlamaTextEncoder.apply(
            params, jnp.asarray(ids_padded), cfg,
            attn_mask=jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(b[:, :4], a, rtol=1e-5, atol=1e-5)


def test_pipeline_text_encoder_selection():
    """text_encoder_type wires T5 / llama trunks into the full pipeline
    (reference: multimodal_gen encoder registry)."""
    from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
    from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig

    kw = dict(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=1, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8,
                          num_upsamples=3),
    )
    outs = {}
    for te in ("clip", "t5", "llama"):
        g = DiffGenerator.from_config(**kw, text_encoder_type=te)
        out = g.generate("a tiny test", height=32, width=32,
                         num_inference_steps=2, seed=1)
        assert out["images"].shape[-3:] == (32, 32, 3)
        outs[te] = out["images"]
    # different conditioning trunks -> different images (same seed)
    assert not np.array_equal(outs["clip"], outs["t5"])
    assert not np.array_equal(outs["t5"], outs["llama"])
