"""DeepSeek-VL2 family (models/deepseek_vl2.py).

Reference analog: srt/models/deepseek_vl2.py — SigLIP tower + downsample
MLP projector + 2D tile-tag composition + MLA DeepSeek LM. Verified here:
- the space-to-depth projector matches a torch F.unfold reference
  (channel-major ordering, reference lines 141-149);
- the 2D tile composition places image_newline / view_seperator exactly
  where the reference's einops construction does;
- multimodal injection via embed-table extension equals token splicing;
- the nested language_config HF config hoists into a working ModelConfig.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.models.deepseek_vl2 import (
    apply_projector,
    compose_tiles,
    init_projector_params,
)
from sglang_diffusion_tpu.models.registry import get_model_cls

PAGE = 8


def _hf_dict():
    return {
        "architectures": ["DeepseekVL2ForCausalLM"],
        "model_type": "deepseek_vl_v2",
        "tile_tag": "2D",
        "global_view_pos": "head",
        "image_token_id": 100,
        "language_config": {
            "architectures": ["DeepseekV2ForCausalLM"],
            "vocab_size": 128,
            "hidden_size": 48,
            "intermediate_size": 64,
            "moe_intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 4,
            "q_lora_rank": 24,
            "kv_lora_rank": 16,
            "qk_nope_head_dim": 16,
            "qk_rope_head_dim": 8,
            "v_head_dim": 16,
            "n_routed_experts": 4,
            "num_experts_per_tok": 2,
            "n_group": 2,
            "topk_group": 1,
            "n_shared_experts": 1,
            "first_k_dense_replace": 1,
            "routed_scaling_factor": 1.0,
            "norm_topk_prob": True,
            "rms_norm_eps": 1e-6,
            "rope_theta": 10000.0,
            "max_position_embeddings": 512,
        },
        "vision_config": {
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "image_size": 16,
            "patch_size": 4,
            "hidden_act": "gelu_pytorch_tanh",
        },
        "projector_config": {
            "projector_type": "downsample_mlp_gelu",
            "input_dim": 32,
            "n_embed": 48,
            "depth": 2,
            "mlp_ratio": 1,
            "downsample_ratio": 2,
        },
    }


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.from_hf_config(_hf_dict())


@pytest.fixture(scope="module")
def family(cfg):
    cls = get_model_cls("DeepseekVL2ForCausalLM")
    params = cls.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cls, params


def test_config_hoist(cfg):
    assert cfg.architecture == "DeepseekVL2ForCausalLM"
    assert cfg.hidden_size == 48  # hoisted from language_config
    assert cfg.kv_lora_rank == 16
    assert cfg.vision.hidden_size == 32
    assert cfg.image_token_id == 100


def test_projector_matches_torch_unfold(cfg):
    """Space-to-depth ordering == torch F.unfold(kernel=ds, stride=ds)."""
    rng = np.random.default_rng(0)
    nb, h, w, c, ds = 2, 4, 4, 32, 2
    x = rng.standard_normal((nb, h * w, c)).astype(np.float32)
    params = init_projector_params(jax.random.PRNGKey(1), cfg, jnp.float32)

    ours = np.asarray(apply_projector(params, cfg, jnp.asarray(x)))

    xt = torch.from_numpy(x).view(nb, h, w, c).permute(0, 3, 1, 2)
    patches = F.unfold(xt, kernel_size=ds, stride=ds).permute(0, 2, 1)
    y = patches
    for i in range(2):
        lp = params["layers"][str(i)]
        if i:
            y = F.gelu(y, approximate="none")
        y = y @ torch.from_numpy(np.asarray(lp["w"])) + torch.from_numpy(
            np.asarray(lp["b"]))
    np.testing.assert_allclose(ours, y.numpy(), rtol=2e-5, atol=2e-5)


def test_compose_tiles_layout():
    """Newline column per row, local mosaic ordering, separator position."""
    h = w = 2
    d = 4
    tw, th = 2, 1
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((1 + tw * th, h * w, d)).astype(np.float32)
    nl = np.full((d,), 7.0, np.float32)
    sep = np.full((d,), 9.0, np.float32)

    out = np.asarray(compose_tiles(
        jnp.asarray(emb), jnp.asarray(nl), jnp.asarray(sep), tw, th))
    t_global = h * (w + 1)
    t_local = (th * h) * (tw * w + 1)
    assert out.shape == (t_global + 1 + t_local, d)

    # global view: row r = [g[r,0], g[r,1], newline]
    g = emb[0].reshape(h, w, d)
    for r in range(h):
        row = out[r * (w + 1):(r + 1) * (w + 1)]
        np.testing.assert_array_equal(row[:w], g[r])
        np.testing.assert_array_equal(row[w], nl)

    # separator between the views
    np.testing.assert_array_equal(out[t_global], sep)

    # local mosaic: row r spans tile columns left->right then newline
    loc = emb[1:].reshape(th, tw, h, w, d)
    base = t_global + 1
    for r in range(th * h):
        trow, prow = r // h, r % h
        row = out[base + r * (tw * w + 1): base + (r + 1) * (tw * w + 1)]
        for tc in range(tw):
            np.testing.assert_array_equal(
                row[tc * w:(tc + 1) * w], loc[trow, tc, prow])
        np.testing.assert_array_equal(row[tw * w], nl)


def test_encode_images_shape(cfg, family):
    cls, params = family
    encode = cls.make_encode_images(cfg)
    tw, th = 2, 2
    pix = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1 + tw * th, 3, 16, 16)), jnp.float32)
    out = encode(params, pix, crop=(tw, th))
    # 16/4 patches -> 4x4 tokens -> 2x2 after ds=2 downsample
    h = w = 2
    t_exp = h * (w + 1) + 1 + (th * h) * (tw * w + 1)
    assert out.shape == (t_exp, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def _meta(b, t):
    pps = -(-t // PAGE)
    pt = jnp.asarray(
        np.arange(1, 1 + b * pps).reshape(b, pps), jnp.int32)
    offs = np.arange(t)[None, :]
    slots = (np.take_along_axis(np.asarray(pt), offs // PAGE, axis=1)
             * PAGE + offs % PAGE).astype(np.int32)
    slots = np.broadcast_to(slots, (b, t)).copy()
    return pt, AttentionMetadata(
        page_table=pt,
        kv_lens=jnp.full((b,), t, jnp.int32),
        q_start_pos=jnp.zeros((b,), jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.full((b,), t - 1, jnp.int32),
    )


def test_mm_injection_equals_token_splice(cfg, family):
    """forward(ids, mm_embeds=embed[alt], mask) == forward(spliced ids):
    the embed-table extension is exact, not approximate."""
    cls, params = family
    fwd = jax.jit(cls.make_forward(cfg, None))
    rng = np.random.default_rng(3)
    b, t = 1, 12
    ids = rng.integers(0, 128, size=(b, t)).astype(np.int32)
    alt = rng.integers(0, 128, size=(b, t)).astype(np.int32)
    mask = np.zeros((b, t), bool)
    mask[0, 4:9] = True
    spliced = np.where(mask, alt, ids)

    def kv():
        pps = -(-t // PAGE)
        return jnp.zeros((cfg.num_hidden_layers, b * pps + 1, PAGE,
                          cfg.kv_cache_heads, cfg.kv_cache_head_dim),
                         jnp.float32)

    pos = jnp.tile(jnp.arange(t)[None], (b, 1)).astype(jnp.int32)
    _, meta = _meta(b, t)
    mm = jnp.take(params["language"]["embed"], jnp.asarray(alt), axis=0)
    got, _ = fwd(params, jnp.asarray(ids), pos, kv(), meta,
                 mm_embeds=mm, mm_mask=jnp.asarray(mask))
    want, _ = fwd(params, jnp.asarray(spliced), pos, kv(), meta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # no-mm call goes through the plain LM path
    plain, _ = fwd(params, jnp.asarray(ids), pos, kv(), meta)
    assert np.isfinite(np.asarray(plain)).all()


def test_hf_weight_map_covers_params(cfg, family):
    cls, params = family
    wmap = cls.hf_weight_map(cfg)

    paths = set()

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            paths.add(path)

    walk(params, ())
    mapped = set(wmap.keys())
    missing = {p for p in paths if p not in mapped
               and p[0] != "language"}  # LM covered via its own map
    assert not missing, missing
    # fused-qkv slices resolve to the same timm tensor
    assert wmap[("vision", "layers", "wq")][0] == \
        wmap[("vision", "layers", "wk")][0]
