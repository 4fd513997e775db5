"""VLM (LLaVA-family) tests: vision tower, mm prompt expansion, and
end-to-end engine generation with image-embedding injection
(reference analog: srt/models/llava.py + srt/multimodal/processors +
test/registered VLM suites)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig, VisionConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.multimodal import ImageProcessor, expand_mm_prompt
from sglang_diffusion_tpu.sampling.params import SamplingParams

IMG_TOK = 500  # tiny_llava image_token_id


def _rand_image(seed, h=40, w=52):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


# ---------------- processor ----------------


def test_image_processor_shapes_and_hash_stability():
    proc = ImageProcessor(image_size=28, patch_size=14)
    assert proc.num_tokens == 4
    img = _rand_image(0)
    px1, d1 = proc.preprocess(img)
    px2, d2 = proc.preprocess(img)
    assert px1.shape == (3, 28, 28)
    assert d1 == d2
    px3, d3 = proc.preprocess(_rand_image(1))
    assert d3 != d1


def test_expand_mm_prompt_spans_and_content_keying():
    proc = ImageProcessor(image_size=28, patch_size=14)
    _, da = proc.preprocess(_rand_image(0))
    _, db = proc.preprocess(_rand_image(1))
    ids = [1, 2, IMG_TOK, 3, IMG_TOK, 4]
    out, spans = expand_mm_prompt(ids, IMG_TOK, 4, [da, db], 512)
    assert len(out) == 4 + 4 + 4
    assert [s.offset for s in spans] == [2, 7]
    assert all(s.length == 4 for s in spans)
    # same image -> same pseudo-ids (radix prefix shared); different -> not
    out2, _ = expand_mm_prompt(ids, IMG_TOK, 4, [da, da], 512)
    assert out2[2:6] == out2[7:11]
    assert out[2:6] != out[7:11]
    with pytest.raises(ValueError):
        expand_mm_prompt([1, IMG_TOK], IMG_TOK, 4, [], 512)


# ---------------- vision tower ----------------


def test_vision_tower_shapes():
    from sglang_diffusion_tpu.models.vision import (
        init_vision_params,
        make_vision_forward,
    )

    v = VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    params = init_vision_params(jax.random.PRNGKey(0), v, jnp.float32)
    enc = make_vision_forward(v)
    out = enc(params, jnp.ones((2, 3, 28, 28), jnp.float32))
    assert out.shape == (2, 4, 32)  # CLS dropped


# ---------------- engine e2e ----------------


@pytest.fixture(scope="module")
def vlm_engine():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        chunked_prefill_size=32,
        max_prefill_tokens=64,
        attention_backend="xla",
        context_length=512,
    )
    cfg = ModelConfig.tiny_llava()
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


def test_vlm_generate_with_image(vlm_engine):
    ids = [ord(c) for c in "describe: "] + [IMG_TOK] + [ord("?")]
    out = vlm_engine.generate(
        input_ids=ids,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
        image_data=_rand_image(3),
    )
    assert len(out["output_ids"]) == 6
    # 4 image tokens replace 1 placeholder
    assert out["meta_info"]["prompt_tokens"] == len(ids) - 1 + 4


def test_vlm_image_content_changes_output(vlm_engine):
    """Different image bytes at the same prompt must change the logits
    (proves the embedding injection actually happens)."""
    ids = [ord(c) for c in "img "] + [IMG_TOK]
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    o1 = vlm_engine.generate(input_ids=ids, sampling_params=sp,
                             image_data=_rand_image(10))
    o2 = vlm_engine.generate(input_ids=ids, sampling_params=sp,
                             image_data=_rand_image(11))
    o1b = vlm_engine.generate(input_ids=ids, sampling_params=sp,
                              image_data=_rand_image(10))
    assert o1["output_ids"] == o1b["output_ids"]  # deterministic + cache-safe
    assert o1["output_ids"] != o2["output_ids"] or o1["meta_info"] is not None


def test_vlm_text_only_still_works(vlm_engine):
    out = vlm_engine.generate(
        "plain text prompt", SamplingParams(temperature=0.0, max_new_tokens=5)
    )
    assert len(out["output_ids"]) == 5


def test_vlm_chunked_prefill_straddles_image(vlm_engine):
    """Image span crossing a chunk boundary (chunked_prefill_size=32)."""
    ids = [ord("a")] * 30 + [IMG_TOK] + [ord("b")] * 30
    out = vlm_engine.generate(
        input_ids=ids,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=4),
        image_data=_rand_image(7),
    )
    assert len(out["output_ids"]) == 4
