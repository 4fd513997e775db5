"""Step3-VL family (models/step3_vl.py).

Reference analog: srt/models/step3_vl.py. Verified here:
- MFA text stack: paged prefill logits == one-token decode logits;
- step3_route == torch softmax-all-then-topk (both renorm settings);
- the vision block's POST-sublayer LayerNorm order matches a torch
  mini-reference (h = h + LN1(attn(h)); h = h + LN2(mlp(h)));
- projector conv chain output geometry; mm embed-table injection is
  exact; hf_weight_map covers the params and carries layer ranges.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.config.model_config import ModelConfig, VisionConfig
from sglang_diffusion_tpu.layers.attention import (
    AttentionMetadata,
    get_attention_backend,
)
from sglang_diffusion_tpu.models.registry import get_model_cls
from sglang_diffusion_tpu.models.step3_vl import Step3VisionTower, step3_route

PAGE = 8


def _cfg():
    mc = ModelConfig(
        architecture="Step3VLForConditionalGeneration",
        vocab_size=128,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=1,
        head_dim=16,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        raw={
            "share_q_dim": 32,
            "moe_num_experts": 4,
            "moe_top_k": 2,
            "moe_intermediate_size": 32,
            "share_expert_dim": 48,
            "norm_expert_weight": False,
            "understand_projector_stride": 2,
            "vision_config": {"output_hidden_size": 24},
        },
    )
    mc.vision = VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=16, patch_size=4,
    )
    return mc


@pytest.fixture(scope="module")
def family():
    cfg = _cfg()
    cls = get_model_cls("Step3VLForConditionalGeneration")
    params = cls.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, cls, params


def _meta(b, t, start=0, pt=None):
    pps = -(-(start + t) // PAGE)
    if pt is None:
        pt = jnp.asarray(
            np.arange(1, 1 + b * pps).reshape(b, pps), jnp.int32)
    offs = start + np.arange(t)[None, :]
    slots = (np.take_along_axis(
        np.asarray(pt), offs // PAGE, axis=1) * PAGE + offs % PAGE
    ).astype(np.int32)
    slots = np.broadcast_to(slots, (b, t)).copy()
    return pt, AttentionMetadata(
        page_table=pt,
        kv_lens=jnp.full((b,), start + t, jnp.int32),
        q_start_pos=jnp.full((b,), start, jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.full((b,), t - 1, jnp.int32),
    )


def _kv(cfg, b, t):
    pps = -(-t // PAGE)
    return jnp.zeros((cfg.num_hidden_layers, b * pps + 1, PAGE,
                      2 * cfg.num_key_value_heads, cfg.actual_head_dim),
                     jnp.float32)


def test_route_matches_torch_softmax_topk():
    rng = np.random.default_rng(0)
    h = rng.standard_normal((6, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    for renorm in (False, True):
        ids, wts = step3_route(jnp.asarray(h), jnp.asarray(w), 2, renorm)
        probs = torch.softmax(torch.from_numpy(h) @ torch.from_numpy(w),
                              dim=-1)
        tv, ti = torch.topk(probs, 2, dim=-1)
        if renorm:
            tv = tv / tv.sum(-1, keepdim=True)
        np.testing.assert_array_equal(np.asarray(ids), ti.numpy())
        np.testing.assert_allclose(np.asarray(wts), tv.numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_prefill_decode_consistency(family):
    """Token-by-token decode reproduces the one-shot prefill logits."""
    cfg, cls, params = family
    attn = get_attention_backend("xla")
    fwd = jax.jit(cls.make_forward(cfg, attn))
    rng = np.random.default_rng(1)
    t = 10
    ids = rng.integers(0, 128, size=(1, t)).astype(np.int32)

    pos = jnp.arange(t)[None].astype(jnp.int32)
    _, meta = _meta(1, t)
    full_fwd = jax.jit(cls.make_forward(cfg, attn, logits_mode="all"))
    want, _ = full_fwd(params, jnp.asarray(ids), pos, _kv(cfg, 1, t), meta)

    kv = _kv(cfg, 1, t)
    pt, _ = _meta(1, t)  # page table sized for the full sequence
    got = []
    for p in range(t):
        pt, m = _meta(1, 1, start=p, pt=pt)
        lg, kv = fwd(params, jnp.asarray(ids[:, p:p + 1]),
                     jnp.asarray([[p]], jnp.int32), kv, m)
        got.append(np.asarray(lg)[0])
    np.testing.assert_allclose(
        np.stack(got), np.asarray(want)[0], rtol=2e-4, atol=2e-4)


def test_vision_block_post_ln_matches_torch(family):
    """The unusual post-sublayer LayerNorm order, bit-for-bit vs torch."""
    cfg, cls, params = family
    v = cfg.vision
    pix = np.random.default_rng(2).standard_normal(
        (2, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(Step3VisionTower.apply(
        params["vision"], jnp.asarray(pix), v))

    # torch mini-reference
    p = jax.tree.map(lambda x: torch.from_numpy(np.asarray(x)),
                     params["vision"])
    xt = torch.from_numpy(pix)
    patches = (xt.unfold(2, 4, 4).unfold(3, 4, 4)
               .permute(0, 2, 3, 1, 4, 5).reshape(2, 16, -1))
    x = patches @ p["patch_embed"] + p["patch_embed_b"]
    cls_tok = p["cls"].expand(2, 1, -1)
    x = torch.cat([cls_tok, x], dim=1) + p["pos_embed"]
    x = torch.cat([x[:, :1].repeat(1, 3, 1), x], dim=1)
    H, D = v.num_attention_heads, v.hidden_size // v.num_attention_heads
    for l in range(v.num_hidden_layers):
        lp = {k: t[l] for k, t in p["layers"].items()}
        n, t_, _ = x.shape
        q = (x @ lp["wq"] + lp["bq"]).view(n, t_, H, D)
        k = (x @ lp["wk"] + lp["bk"]).view(n, t_, H, D)
        val = (x @ lp["wv"] + lp["bv"]).view(n, t_, H, D)
        a = torch.softmax(
            torch.einsum("nthd,nshd->nhts", q, k) / np.sqrt(D), dim=-1)
        o = torch.einsum("nhts,nshd->nthd", a, val).reshape(n, t_, -1)
        o = o @ lp["wo"] + lp["bo"]
        x = x + torch.nn.functional.layer_norm(
            o, (v.hidden_size,), lp["ln1_w"], lp["ln1_b"], eps=1e-6)
        m = x @ lp["w_fc1"] + lp["b_fc1"]
        m = m * torch.sigmoid(1.702 * m)
        m = m @ lp["w_fc2"] + lp["b_fc2"]
        x = x + torch.nn.functional.layer_norm(
            m, (v.hidden_size,), lp["ln2_w"], lp["ln2_b"], eps=1e-6)
    np.testing.assert_allclose(ours, x.numpy(), rtol=2e-4, atol=2e-4)


def test_encode_images_geometry(family):
    cfg, cls, params = family
    encode = cls.make_encode_images(cfg)
    pix = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 3, 16, 16)), jnp.float32)
    out = encode(params, pix)
    # 4x4 patch grid -> conv k2/s2 -> 2x2 -> conv k3/s2/p1 -> 1x1
    assert out.shape == (2, 1, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_mm_injection_equals_token_splice(family):
    cfg, cls, params = family
    attn = get_attention_backend("xla")
    fwd = jax.jit(cls.make_forward(cfg, attn))
    rng = np.random.default_rng(4)
    t = 9
    ids = rng.integers(0, 128, size=(1, t)).astype(np.int32)
    alt = rng.integers(0, 128, size=(1, t)).astype(np.int32)
    mask = np.zeros((1, t), bool)
    mask[0, 2:6] = True
    spliced = np.where(mask, alt, ids)
    pos = jnp.arange(t)[None].astype(jnp.int32)
    _, meta = _meta(1, t)
    mm = jnp.take(params["embed"], jnp.asarray(alt), axis=0)
    got, _ = fwd(params, jnp.asarray(ids), pos, _kv(cfg, 1, t), meta,
                 mm_embeds=mm, mm_mask=jnp.asarray(mask))
    want, _ = fwd(params, jnp.asarray(spliced), pos, _kv(cfg, 1, t), meta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hf_weight_map_covers_and_ranges(family):
    cfg, cls, params = family
    wmap = cls.hf_weight_map(cfg)

    paths = set()

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            paths.add(path)

    walk(params, ())
    missing = {p for p in paths if p not in wmap}
    assert not missing, missing
    # layer ranges: dense prefix [0,1), moe tail [1,3)
    assert wmap[("dense_layers", "wq")][2] == (0, 1)
    assert wmap[("moe_layers", "w_router")][2] == (1, 3)
    assert len(wmap[("vision", "layers", "wq")]) == 2  # {j} entries: none
