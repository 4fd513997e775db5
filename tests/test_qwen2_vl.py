"""Qwen2-VL parity vs HF transformers: vision tower, M-RoPE positions
(get_rope_index), and full-model logits with image injection
(reference analog: srt/models/qwen2_vl.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata, get_attention_backend
from sglang_diffusion_tpu.models.qwen2_vl import (
    Qwen2VLFamily,
    Qwen2VLVisionConfig,
    Qwen2VisionTower,
    compute_mrope_positions,
)
from sglang_diffusion_tpu.multimodal.processor import MMSpan

PAGE = 8
IMG_TOK = 40


def _tiny_hf():
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(
            vocab_size=96,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
        ),
        vision_config=dict(
            embed_dim=16,
            depth=2,
            num_heads=2,
            mlp_ratio=2.0,
            patch_size=14,
            temporal_patch_size=2,
            spatial_merge_size=2,
            in_channels=3,
            hidden_size=32,
        ),
        image_token_id=IMG_TOK,
        vision_start_token_id=90,
        vision_end_token_id=91,
    )
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg).eval()
    return cfg, model


def _to_params(cfg, state_dict):
    from sglang_diffusion_tpu.engine.weight_loader import resolve_hf_name

    def to_np(t):
        return t.detach().to(torch.float32).numpy()

    has = lambda n: n in state_dict  # noqa: E731
    params = {}
    vis_layers = cfg.raw["vision_config"]["depth"]
    for path, (tmpl, tf) in Qwen2VLFamily.hf_weight_map(cfg).items():
        def fetch(name):
            w = to_np(state_dict[resolve_hf_name(name, has)])
            if tf == "t":
                return w.T
            if tf == "conv":
                return w.reshape(w.shape[0], -1).T
            return w

        if "{j}" in tmpl:
            leaf = np.stack([fetch(tmpl.format(j=j)) for j in range(vis_layers)])
        elif "{i}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(i=i)) for i in range(cfg.num_hidden_layers)]
            )
        else:
            leaf = fetch(tmpl)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


@pytest.fixture(scope="module")
def setup():
    hf_cfg, hf_model = _tiny_hf()
    d = hf_cfg.to_dict()
    d["architectures"] = ["Qwen2VLForConditionalGeneration"]
    cfg = ModelConfig.from_hf_config(d)
    params = _to_params(cfg, hf_model.state_dict())
    return hf_cfg, hf_model, cfg, params


def test_vision_tower_parity(setup):
    hf_cfg, hf_model, cfg, params = setup
    v = Qwen2VLFamily._vis_cfg(cfg)
    gh, gw = 4, 4  # 16 patches -> 4 merged tokens
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((gh * gw, v.patch_dim)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, gh, gw]]),
        ).numpy()
    got = np.asarray(
        Qwen2VisionTower.apply(params["vision"], jnp.asarray(patches),
                               (gh, gw), v)
    )
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_mrope_positions_match_hf(setup):
    hf_cfg, hf_model, cfg, params = setup
    gh, gw = 4, 4
    n_img = (gh // 2) * (gw // 2)  # merged tokens
    # real qwen2-vl prompts wrap images in vision_start/end special tokens
    ids = [3, 90] + [IMG_TOK] * n_img + [91, 8, 9]
    spans = [MMSpan(offset=2, length=n_img, image_index=0)]
    pos, delta = compute_mrope_positions(len(ids), spans, [(gh // 2, gw // 2)])
    with torch.no_grad():
        ref_pos, ref_delta = hf_model.model.get_rope_index(
            torch.tensor([ids]),
            image_grid_thw=torch.tensor([[1, gh, gw]]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
        )
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_full_model_logits_parity(setup):
    hf_cfg, hf_model, cfg, params = setup
    v = Qwen2VLFamily._vis_cfg(cfg)
    gh, gw = 4, 4
    n_img = (gh // 2) * (gw // 2)
    ids = [3, 90] + [IMG_TOK] * n_img + [91, 8, 9]
    t = len(ids)
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((gh * gw, v.patch_dim)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, gh, gw]]),
            attention_mask=torch.ones(1, t, dtype=torch.long),
        ).logits[0].numpy()

    # ours
    enc = Qwen2VLFamily.make_encode_images(cfg)
    mm = enc(params, jnp.asarray(patches), (gh, gw))  # [n_img, E]
    spans = [MMSpan(offset=2, length=n_img, image_index=0)]
    pos3, _ = compute_mrope_positions(t, spans, [(gh // 2, gw // 2)])
    fwd = Qwen2VLFamily.make_forward(cfg, get_attention_backend("xla"),
                                     logits_mode="all")
    pages_per_seq = -(-t // PAGE)
    kv = jnp.zeros((cfg.num_hidden_layers, pages_per_seq + 1,
                    PAGE, 2 * cfg.num_key_value_heads, cfg.actual_head_dim),
                   jnp.float32)
    pages = np.arange(1, pages_per_seq + 1, dtype=np.int32)
    page_table = np.zeros((1, pages_per_seq + 1), np.int32)
    page_table[0, :pages_per_seq] = pages
    offs = np.arange(t)
    slots = (pages[offs // PAGE] * PAGE + offs % PAGE)[None].astype(np.int32)
    meta = AttentionMetadata(
        page_table=jnp.asarray(page_table),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_start_pos=jnp.asarray([0], jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1], jnp.int32),
    )
    mm_mask = np.zeros((1, t), bool)
    mm_mask[0, 2 : 2 + n_img] = True
    full_emb = jnp.zeros((1, t, cfg.hidden_size), jnp.float32)
    full_emb = full_emb.at[0, 2 : 2 + n_img].set(mm)
    logits, _ = fwd(
        params, jnp.asarray([ids], jnp.int32), None, kv, meta,
        mm_embeds=full_emb, mm_mask=jnp.asarray(mm_mask),
        positions_3d=jnp.asarray(pos3[:, None, :], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-3,
                               rtol=2e-2)


def test_text_only_path_uses_plain_rope(setup):
    """With equal position streams the mrope model must match the plain
    LlamaFamily text forward (sanity of the decode fast path)."""
    hf_cfg, hf_model, cfg, params = setup
    ids = [3, 5, 7, 9, 11]
    t = len(ids)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, t, dtype=torch.long),
        ).logits[0, -1].numpy()
    fwd = Qwen2VLFamily.make_forward(cfg, get_attention_backend("xla"))
    pages_per_seq = -(-t // PAGE)
    kv = jnp.zeros((cfg.num_hidden_layers, pages_per_seq + 1,
                    PAGE, 2 * cfg.num_key_value_heads, cfg.actual_head_dim),
                   jnp.float32)
    pages = np.arange(1, pages_per_seq + 1, dtype=np.int32)
    page_table = np.zeros((1, pages_per_seq + 1), np.int32)
    page_table[0, :pages_per_seq] = pages
    offs = np.arange(t)
    slots = (pages[offs // PAGE] * PAGE + offs % PAGE)[None].astype(np.int32)
    meta = AttentionMetadata(
        page_table=jnp.asarray(page_table),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_start_pos=jnp.asarray([0], jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1], jnp.int32),
    )
    logits, _ = fwd(
        params, jnp.asarray([ids], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32), kv, meta,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-3,
                               rtol=2e-2)


def test_video_mrope_positions_match_hf(setup):
    hf_cfg, hf_model, cfg, params = setup
    gt, gh, gw = 2, 4, 4  # 2 temporal groups
    n_vid = gt * (gh // 2) * (gw // 2)
    VID_TOK = hf_cfg.video_token_id
    ids = [3, 90] + [VID_TOK] * n_vid + [91, 8]
    spans = [MMSpan(offset=2, length=n_vid, image_index=0)]
    pos, delta = compute_mrope_positions(
        len(ids), spans, [(gt, gh // 2, gw // 2)]
    )
    import torch as _t

    with _t.no_grad():
        ref_pos, ref_delta = hf_model.model.get_rope_index(
            _t.tensor([ids]),
            video_grid_thw=_t.tensor([[gt, gh, gw]]),
            attention_mask=_t.ones(1, len(ids), dtype=_t.long),
        )
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_video_tower_parity(setup):
    """Video pixel groups through the vision tower match HF (temporal rope
    repetition + per-group merger)."""
    hf_cfg, hf_model, cfg, params = setup
    import torch as _t

    v = Qwen2VLFamily._vis_cfg(cfg)
    gt, gh, gw = 2, 4, 4
    rng = np.random.default_rng(3)
    patches = rng.standard_normal(
        (gt * gh * gw, v.patch_dim)
    ).astype(np.float32)
    with _t.no_grad():
        ref = hf_model.model.visual(
            _t.tensor(patches), grid_thw=_t.tensor([[gt, gh, gw]])
        ).numpy()
    got = np.asarray(
        Qwen2VisionTower.apply(params["vision"], jnp.asarray(patches),
                               (gt, gh, gw), v)
    )
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_video_engine_e2e():
    from tests.test_qwen2_vl_e2e import _cfg
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = _cfg()
    cfg.video_token_id = 401
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
    )
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(4, 56, 56, 3), dtype=np.uint8)
    ids = [ord(c) for c in "video "] + [401]
    sp = SamplingParams(temperature=0.0, max_new_tokens=4)
    out = eng.generate(input_ids=ids, sampling_params=sp, video_data=frames)
    # 4 frames -> 2 temporal groups x (4/2)x(4/2) merged = 8 tokens
    assert out["meta_info"]["prompt_tokens"] == len(ids) - 1 + 8
    out2 = eng.generate(input_ids=ids, sampling_params=sp, video_data=frames)
    assert out["output_ids"] == out2["output_ids"]
