"""Pipeline checkpoint round-trip: save_pretrained -> from_pretrained must
reproduce configs, weights, and generated images exactly (reference analog:
multimodal_gen/runtime/loader/)."""

import numpy as np

from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig


def test_save_load_roundtrip(tmp_path):
    kw = dict(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=1, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8,
                          num_upsamples=3),
    )
    gen_kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    g = DiffGenerator.from_config(**kw, text_encoder_type="t5")
    ref = g.generate("roundtrip", **gen_kw)
    g.save_pretrained(str(tmp_path / "ckpt"))

    g2 = DiffGenerator.from_pretrained(str(tmp_path / "ckpt"))
    assert g2.pipeline.text_encoder_type == "t5"
    assert g2.pipeline.dit_cfg == g.pipeline.dit_cfg
    assert g2.pipeline.vae_cfg == g.pipeline.vae_cfg
    out = g2.generate("roundtrip", **gen_kw)
    np.testing.assert_array_equal(ref["images"], out["images"])
