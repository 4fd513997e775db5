"""Qwen2.5-VL parity vs HF transformers: windowed vision tower (block-mask
re-design of HF's window packing) and full-model logits with image injection
(reference analog: srt/models/qwen2_5_vl.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import (
    AttentionMetadata,
    get_attention_backend,
)
from sglang_diffusion_tpu.models.qwen2_vl import (
    Qwen25VisionTower,
    Qwen25VLFamily,
    compute_mrope_positions,
    window_ids_for_grid,
)
from sglang_diffusion_tpu.multimodal.processor import MMSpan

PAGE = 8
IMG_TOK = 40


def _tiny_hf():
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
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
            hidden_size=16,
            depth=2,
            num_heads=2,
            intermediate_size=32,
            patch_size=14,
            temporal_patch_size=2,
            spatial_merge_size=2,
            in_channels=3,
            out_hidden_size=32,
            window_size=56,  # 2x2 merge-units per window
            fullatt_block_indexes=[1],
        ),
        image_token_id=IMG_TOK,
        vision_start_token_id=90,
        vision_end_token_id=91,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return cfg, model


def _to_params(cfg, state_dict):
    from sglang_diffusion_tpu.engine.weight_loader import resolve_hf_name

    has = lambda n: n in state_dict  # noqa: E731
    params = {}
    vis_layers = cfg.raw["vision_config"]["depth"]
    for path, (tmpl, tf) in Qwen25VLFamily.hf_weight_map(cfg).items():
        def fetch(name):
            w = state_dict[resolve_hf_name(name, has)]
            w = w.detach().to(torch.float32).numpy()
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
    d["architectures"] = ["Qwen2_5_VLForConditionalGeneration"]
    cfg = ModelConfig.from_hf_config(d)
    params = _to_params(cfg, hf_model.state_dict())
    return hf_cfg, hf_model, cfg, params


def test_window_ids_match_hf_window_index():
    """Our per-token window labels induce the same partition as HF's
    get_window_index permutation: tokens sharing a window in ours must be
    exactly the contiguous cu_window_seqlens chunks in HF order."""
    hf_cfg, hf_model = _tiny_hf()
    gh = gw = 8
    win, cu = hf_model.model.visual.get_window_index(
        torch.tensor([[1, gh, gw]])
    )
    win = win.numpy()  # [n_units] permuted unit ids
    cu = np.unique(np.asarray(cu))
    ours = window_ids_for_grid((gh, gw), 2, 14, 56)  # [T] per token
    unit_ids = ours[::4]  # one label per merge unit (4 tokens each)
    # HF chunk c covers permuted units win[cu[c]/4 : cu[c+1]/4] -> all of
    # them must carry one distinct label in our labeling
    seen = set()
    for c in range(len(cu) - 1):
        chunk = win[cu[c] // 4 : cu[c + 1] // 4]
        labels = {int(unit_ids[u]) for u in chunk}
        assert len(labels) == 1, (c, labels)
        lab = labels.pop()
        assert lab not in seen
        seen.add(lab)


def test_vision_tower_parity_windowed(setup):
    hf_cfg, hf_model, cfg, params = setup
    v = Qwen25VLFamily._vis_cfg(cfg)
    gh = gw = 8  # 64 patches, 16 merge units, 4 windows of 2x2 units
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((gh * gw, v.patch_dim)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, gh, gw]]),
        ).numpy()
    got = np.asarray(
        Qwen25VisionTower.apply(params["vision"], jnp.asarray(patches),
                                (gh, gw), v)
    )
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_full_model_logits_parity(setup):
    hf_cfg, hf_model, cfg, params = setup
    v = Qwen25VLFamily._vis_cfg(cfg)
    gh = gw = 8
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

    enc = Qwen25VLFamily.make_encode_images(cfg)
    mm = enc(params, jnp.asarray(patches), (gh, gw))
    spans = [MMSpan(offset=2, length=n_img, image_index=0)]
    pos3, _ = compute_mrope_positions(t, spans, [(gh // 2, gw // 2)])
    fwd = Qwen25VLFamily.make_forward(cfg, get_attention_backend("xla"),
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


def test_qwen25_engine_e2e():
    """Full serving path: dynamic-resolution processing, windowed-ViT
    encode, mrope prefill, rope_delta decode — deterministic outputs."""
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.from_hf_config({
        "architectures": ["Qwen2_5_VLForConditionalGeneration"],
        "image_token_id": 400,
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
            "hidden_size": 16,
            "depth": 2,
            "num_heads": 2,
            "intermediate_size": 32,
            "patch_size": 14,
            "temporal_patch_size": 2,
            "spatial_merge_size": 2,
            "in_channels": 3,
            "out_hidden_size": 64,
            "window_size": 56,
            "fullatt_block_indexes": [1],
        },
    })
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
    )
    eng = Engine(server_args=args, model_config=cfg,
                 tokenizer=ByteTokenizer())
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(60, 40, 3), dtype=np.uint8)
    ids = [ord(c) for c in "look: "] + [400]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    out = eng.generate(input_ids=ids, sampling_params=sp, image_data=[img])
    assert len(out["output_ids"]) == 6
    out2 = eng.generate(input_ids=ids, sampling_params=sp, image_data=[img])
    assert out["output_ids"] == out2["output_ids"]


def test_video_mrope_temporal_scaling_matches_hf(setup):
    """Qwen2.5-VL video M-RoPE: the temporal stream is scaled by
    second_per_grid_t * tokens_per_second (reference:
    srt/layers/rotary_embedding/mrope_rope_index.py:154). Parity vs HF
    get_rope_index on a (t,h,w) video grid."""
    hf_cfg, hf_model, cfg, params = setup
    vid_tok = 41
    gt, gh, gw = 3, 4, 4
    n_vid = gt * (gh // 2) * (gw // 2)
    ids = [3, 90] + [vid_tok] * n_vid + [91, 8, 9]
    t = len(ids)
    # integer spg: transformers 4.57 truncates second_per_grid_t to int64
    # (as_tensor with range_tensor.dtype) while the reference keeps the
    # float product and floors — they agree only on integral spg
    spg = 2.0  # seconds per temporal grid step
    tps = float(getattr(hf_cfg.vision_config, "tokens_per_second", 4.0))

    hf_model.config.video_token_id = vid_tok
    pos_hf, delta_hf = hf_model.model.get_rope_index(
        input_ids=torch.tensor([ids]),
        image_grid_thw=None,
        video_grid_thw=torch.tensor([[gt, gh, gw]]),
        second_per_grid_ts=torch.tensor([spg]),
        attention_mask=torch.ones(1, t, dtype=torch.long),
    )
    spans = [MMSpan(offset=2, length=n_vid, image_index=0)]
    pos, delta = compute_mrope_positions(
        t, spans, [(gt, gh // 2, gw // 2)],
        second_per_grid_ts=[spg], tokens_per_second=tps,
    )
    np.testing.assert_array_equal(pos, pos_hf[:, 0].numpy())
    assert delta == int(delta_hf[0].item())


def test_video_mrope_fractional_spg_reference_semantics():
    """Fractional second_per_grid_t: reference
    (mrope_rope_index.py:152-155) computes floor(k * spg * tps) in float —
    verify the temporal stream directly."""
    vid_tok_count = 3 * 2 * 2
    spans = [MMSpan(offset=1, length=vid_tok_count, image_index=0)]
    t = 1 + vid_tok_count + 1
    pos, _ = compute_mrope_positions(
        t, spans, [(3, 2, 2)], second_per_grid_ts=[1.5],
        tokens_per_second=4.0,
    )
    # frame k temporal pos = 1 (text offset) + floor(k*1.5*4) = 1, 7, 13
    tpos = pos[0, 1:1 + vid_tok_count].reshape(3, 4)
    np.testing.assert_array_equal(tpos[:, 0], [1, 7, 13])
