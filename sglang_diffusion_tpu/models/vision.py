"""CLIP-style vision tower (ViT) for VLM architectures.

TPU-native re-design of the reference's vision encoders
(srt/models/llava.py vision tower + srt/models/clip.py): a pure function
over a params pytree. Patch embedding is expressed as a single dense matmul
over flattened patches (identical numerics to the stride=patch conv in HF
CLIP), which maps straight onto the MXU; attention over the ~600 patch
tokens is plain jnp softmax attention — XLA fuses it well at this size and
it runs once per image, not per decode step.

Weight layout matches HF `CLIPVisionModel` (pre-LN blocks, CLS token,
learned position embeddings, quick_gelu/gelu activations).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import VisionConfig


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=True)


def init_vision_params(rng: jax.Array, v: VisionConfig, dtype=jnp.bfloat16):
    E = v.hidden_size
    F = v.intermediate_size
    L = v.num_hidden_layers
    Pd = 3 * v.patch_size * v.patch_size
    T = v.num_patches + 1  # + CLS
    keys = jax.random.split(rng, 10)

    def init(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "patch_embed": init(keys[0], (Pd, E)),
        "cls_token": init(keys[1], (E,)),
        "pos_embed": init(keys[2], (T, E)),
        "pre_ln": {"w": jnp.ones((E,), dtype), "b": jnp.zeros((E,), dtype)},
        "layers": {
            "ln1_w": jnp.ones((L, E), dtype),
            "ln1_b": jnp.zeros((L, E), dtype),
            "ln2_w": jnp.ones((L, E), dtype),
            "ln2_b": jnp.zeros((L, E), dtype),
            "wq": init(keys[3], (L, E, E)),
            "bq": jnp.zeros((L, E), dtype),
            "wk": init(keys[4], (L, E, E)),
            "bk": jnp.zeros((L, E), dtype),
            "wv": init(keys[5], (L, E, E)),
            "bv": jnp.zeros((L, E), dtype),
            "wo": init(keys[6], (L, E, E)),
            "bo": jnp.zeros((L, E), dtype),
            "w_fc1": init(keys[7], (L, E, F)),
            "b_fc1": jnp.zeros((L, F), dtype),
            "w_fc2": init(keys[8], (L, F, E)),
            "b_fc2": jnp.zeros((L, E), dtype),
        },
    }


def vision_partition_specs(v: VisionConfig) -> Dict[str, Any]:
    """Vision tower runs replicated: it is small (~300M for CLIP-L) and runs
    once per image; sharding it would trade ICI latency for nothing."""
    return jax.tree.map(
        lambda _: P(),
        init_vision_params(jax.random.PRNGKey(0), v),
        is_leaf=lambda x: not isinstance(x, dict),
    )


def patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[N, 3, H, W] -> [N, T, 3*patch*patch] flattened patches, channel-major
    per patch (matches conv weight reshape order in HF CLIP)."""
    n, c, h, w = pixel_values.shape
    gh, gw = h // patch, w // patch
    x = pixel_values.reshape(n, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [N, gh, gw, C, p, p]
    return x.reshape(n, gh * gw, c * patch * patch)


def make_vision_forward(v: VisionConfig):
    """Returns encode(params, pixel_values [N,3,H,W]) -> features [N, T', E']
    where T' = num_patches (CLS dropped when v.drop_cls) and E' = hidden_size.
    Feature selection follows llava: output of layer `feature_layer`."""
    E = v.hidden_size
    H = v.num_attention_heads
    D = E // H
    eps = v.layer_norm_eps
    act = _act(v.hidden_act)
    L = v.num_hidden_layers
    # -2 means: run L-1 blocks, take that output (HF hidden_states[-2])
    n_run = L + 1 + v.feature_layer if v.feature_layer < 0 else v.feature_layer
    scale = 1.0 / np.sqrt(D)

    def ln(x, w, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)

    def block(l, hidden, layers):
        lp = jax.tree.map(lambda x: x[l], layers)
        n, t, _ = hidden.shape
        h = ln(hidden, lp["ln1_w"], lp["ln1_b"])
        q = (h @ lp["wq"] + lp["bq"]).reshape(n, t, H, D)
        k = (h @ lp["wk"] + lp["bk"]).reshape(n, t, H, D)
        val = (h @ lp["wv"] + lp["bv"]).reshape(n, t, H, D)
        logits = jnp.einsum("nthd,nshd->nhts", q, k) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("nhts,nshd->nthd", attn, val).reshape(n, t, E)
        hidden = hidden + (o @ lp["wo"] + lp["bo"])
        h = ln(hidden, lp["ln2_w"], lp["ln2_b"])
        hidden = hidden + (act((h @ lp["w_fc1"] + lp["b_fc1"]).astype(jnp.float32))
                           .astype(hidden.dtype) @ lp["w_fc2"] + lp["b_fc2"])
        return hidden

    def encode(params, pixel_values):
        patches = patchify(pixel_values.astype(params["patch_embed"].dtype),
                           v.patch_size)
        x = patches @ params["patch_embed"]  # [N, T, E]
        n = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"], (n, 1, E))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
        x = ln(x, params["pre_ln"]["w"], params["pre_ln"]["b"])
        x = jax.lax.fori_loop(
            0, n_run, lambda l, h: block(l, h, params["layers"]), x
        )
        if v.drop_cls:
            x = x[:, 1:]
        return x

    return encode


# ---------------- SigLIP tower (Gemma3-MM, PaliGemma) ----------------


def init_siglip_params(rng: jax.Array, v: VisionConfig, dtype=jnp.bfloat16):
    """SiglipVisionModel: patch conv WITH bias, learned pos embed over all
    patches (no CLS), pre-LN blocks, post_layernorm at the end."""
    E, F, L = v.hidden_size, v.intermediate_size, v.num_hidden_layers
    Pd = 3 * v.patch_size * v.patch_size
    keys = jax.random.split(rng, 10)

    def init(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "patch_embed": init(keys[0], (Pd, E)),
        "patch_embed_b": jnp.zeros((E,), dtype),
        "pos_embed": init(keys[2], (v.num_patches, E)),
        "post_ln": {"w": jnp.ones((E,), dtype), "b": jnp.zeros((E,), dtype)},
        "layers": {
            "ln1_w": jnp.ones((L, E), dtype),
            "ln1_b": jnp.zeros((L, E), dtype),
            "ln2_w": jnp.ones((L, E), dtype),
            "ln2_b": jnp.zeros((L, E), dtype),
            "wq": init(keys[3], (L, E, E)),
            "bq": jnp.zeros((L, E), dtype),
            "wk": init(keys[4], (L, E, E)),
            "bk": jnp.zeros((L, E), dtype),
            "wv": init(keys[5], (L, E, E)),
            "bv": jnp.zeros((L, E), dtype),
            "wo": init(keys[6], (L, E, E)),
            "bo": jnp.zeros((L, E), dtype),
            "w_fc1": init(keys[7], (L, E, F)),
            "b_fc1": jnp.zeros((L, F), dtype),
            "w_fc2": init(keys[8], (L, F, E)),
            "b_fc2": jnp.zeros((L, E), dtype),
        },
    }


def make_siglip_forward(v: VisionConfig):
    """encode(params, pixel_values [N,3,H,W]) -> [N, T, E] — the
    post-layernorm last hidden state (what Gemma3 feeds its projector)."""
    E = v.hidden_size
    H = v.num_attention_heads
    D = E // H
    eps = v.layer_norm_eps
    act = _act(v.hidden_act)
    L = v.num_hidden_layers
    scale = 1.0 / np.sqrt(D)

    def ln(x, w, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)

    def block(l, hidden, layers):
        lp = jax.tree.map(lambda x: x[l], layers)
        n, t, _ = hidden.shape
        h = ln(hidden, lp["ln1_w"], lp["ln1_b"])
        q = (h @ lp["wq"] + lp["bq"]).reshape(n, t, H, D)
        k = (h @ lp["wk"] + lp["bk"]).reshape(n, t, H, D)
        val = (h @ lp["wv"] + lp["bv"]).reshape(n, t, H, D)
        logits = jnp.einsum("nthd,nshd->nhts", q, k) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            q.dtype)
        o = jnp.einsum("nhts,nshd->nthd", attn, val).reshape(n, t, E)
        hidden = hidden + (o @ lp["wo"] + lp["bo"])
        h = ln(hidden, lp["ln2_w"], lp["ln2_b"])
        hidden = hidden + (
            act((h @ lp["w_fc1"] + lp["b_fc1"]).astype(jnp.float32))
            .astype(hidden.dtype) @ lp["w_fc2"] + lp["b_fc2"])
        return hidden

    def encode(params, pixel_values):
        patches = patchify(pixel_values.astype(params["patch_embed"].dtype),
                           v.patch_size)
        x = patches @ params["patch_embed"] + params["patch_embed_b"]
        x = x + params["pos_embed"]
        x = jax.lax.fori_loop(
            0, L, lambda l, h: block(l, h, params["layers"]), x
        )
        return ln(x, params["post_ln"]["w"], params["post_ln"]["b"])

    return encode


def siglip_hf_weight_map() -> Dict[Any, Any]:
    pre = "vision_tower.vision_model"
    lyr = pre + ".encoder.layers.{j}"
    return {
        ("vision", "patch_embed"): (
            pre + ".embeddings.patch_embedding.weight", "conv"),
        ("vision", "patch_embed_b"): (
            pre + ".embeddings.patch_embedding.bias", None),
        ("vision", "pos_embed"): (
            pre + ".embeddings.position_embedding.weight", None),
        ("vision", "post_ln", "w"): (pre + ".post_layernorm.weight", None),
        ("vision", "post_ln", "b"): (pre + ".post_layernorm.bias", None),
        ("vision", "layers", "ln1_w"): (lyr + ".layer_norm1.weight", None),
        ("vision", "layers", "ln1_b"): (lyr + ".layer_norm1.bias", None),
        ("vision", "layers", "ln2_w"): (lyr + ".layer_norm2.weight", None),
        ("vision", "layers", "ln2_b"): (lyr + ".layer_norm2.bias", None),
        ("vision", "layers", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
        ("vision", "layers", "bq"): (lyr + ".self_attn.q_proj.bias", None),
        ("vision", "layers", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
        ("vision", "layers", "bk"): (lyr + ".self_attn.k_proj.bias", None),
        ("vision", "layers", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
        ("vision", "layers", "bv"): (lyr + ".self_attn.v_proj.bias", None),
        ("vision", "layers", "wo"): (lyr + ".self_attn.out_proj.weight", "t"),
        ("vision", "layers", "bo"): (lyr + ".self_attn.out_proj.bias", None),
        ("vision", "layers", "w_fc1"): (lyr + ".mlp.fc1.weight", "t"),
        ("vision", "layers", "b_fc1"): (lyr + ".mlp.fc1.bias", None),
        ("vision", "layers", "w_fc2"): (lyr + ".mlp.fc2.weight", "t"),
        ("vision", "layers", "b_fc2"): (lyr + ".mlp.fc2.bias", None),
    }


def vision_hf_weight_map() -> Dict[Any, Any]:
    """HF CLIPVisionModel tensor names ({j} = vision layer index). The patch
    conv weight [E, 3, p, p] is flattened+transposed to our [3*p*p, E] dense
    (transform "conv")."""
    pre = "vision_tower.vision_model"
    lyr = pre + ".encoder.layers.{j}"
    return {
        ("vision", "patch_embed"): (pre + ".embeddings.patch_embedding.weight", "conv"),
        ("vision", "cls_token"): (pre + ".embeddings.class_embedding", None),
        ("vision", "pos_embed"): (pre + ".embeddings.position_embedding.weight", None),
        ("vision", "pre_ln", "w"): (pre + ".pre_layrnorm.weight", None),
        ("vision", "pre_ln", "b"): (pre + ".pre_layrnorm.bias", None),
        ("vision", "layers", "ln1_w"): (lyr + ".layer_norm1.weight", None),
        ("vision", "layers", "ln1_b"): (lyr + ".layer_norm1.bias", None),
        ("vision", "layers", "ln2_w"): (lyr + ".layer_norm2.weight", None),
        ("vision", "layers", "ln2_b"): (lyr + ".layer_norm2.bias", None),
        ("vision", "layers", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
        ("vision", "layers", "bq"): (lyr + ".self_attn.q_proj.bias", None),
        ("vision", "layers", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
        ("vision", "layers", "bk"): (lyr + ".self_attn.k_proj.bias", None),
        ("vision", "layers", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
        ("vision", "layers", "bv"): (lyr + ".self_attn.v_proj.bias", None),
        ("vision", "layers", "wo"): (lyr + ".self_attn.out_proj.weight", "t"),
        ("vision", "layers", "bo"): (lyr + ".self_attn.out_proj.bias", None),
        ("vision", "layers", "w_fc1"): (lyr + ".mlp.fc1.weight", "t"),
        ("vision", "layers", "b_fc1"): (lyr + ".mlp.fc1.bias", None),
        ("vision", "layers", "w_fc2"): (lyr + ".mlp.fc2.weight", "t"),
        ("vision", "layers", "b_fc2"): (lyr + ".mlp.fc2.bias", None),
    }
