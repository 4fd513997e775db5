"""MoE execution paths: grouped-GEMM dispatch and expert-parallel all-to-all
must match the dense all-expert baseline (reference analog:
test/registered/moe + srt/layers/moe/ep_moe kernels tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.layers.moe import (
    make_ep_moe,
    moe_mlp_dense,
    moe_mlp_grouped,
)


def _mk(b=2, t=5, e=32, f=48, x=8, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(b, t, e)), jnp.float32)
    wr = jnp.asarray(rng.normal(size=(e, x)) * 0.5, jnp.float32)
    wg = jnp.asarray(rng.normal(size=(x, e, f)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(x, e, f)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(x, f, e)) * 0.1, jnp.float32)
    return h, wr, wg, wu, wd


@pytest.mark.parametrize("top_k", [1, 2, 3])
def test_grouped_matches_dense(top_k):
    h, wr, wg, wu, wd = _mk()
    ref = np.asarray(moe_mlp_dense(h, wr, wg, wu, wd, top_k))
    got = np.asarray(jax.jit(moe_mlp_grouped, static_argnums=5)(
        h, wr, wg, wu, wd, top_k
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ep_moe_matches_dense():
    """ep=2 x dp=2 on the CPU mesh: token all-to-all dispatch + local
    grouped GEMM must reproduce the dense baseline."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from sglang_diffusion_tpu.parallel.mesh import create_mesh

    ctx = create_mesh(tp_size=2, dp_size=2)
    h, wr, wg, wu, wd = _mk(b=4, t=6)
    top_k = 2
    ref = np.asarray(moe_mlp_dense(h, wr, wg, wu, wd, top_k))

    ep_fn = make_ep_moe(ctx.mesh, top_k=top_k, num_experts=wg.shape[0],
                        ep_axis="tp", batch_axis="dp")
    got = np.asarray(jax.jit(ep_fn)(h, wr, wg, wu, wd))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ep_moe_capacity_drop_is_graceful():
    """With a tiny capacity factor, overflowing replicas are dropped (zero
    contribution) instead of corrupting other tokens."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from sglang_diffusion_tpu.parallel.mesh import create_mesh

    ctx = create_mesh(tp_size=2, dp_size=1)
    h, wr, wg, wu, wd = _mk(b=2, t=16)
    top_k = 2
    ep_tight = make_ep_moe(ctx.mesh, top_k=top_k, num_experts=wg.shape[0],
                           ep_axis="tp", batch_axis="dp",
                           capacity_factor=0.25)
    out = np.asarray(jax.jit(ep_tight)(h, wr, wg, wu, wd))
    assert np.all(np.isfinite(out))
    # ample capacity must match dense exactly
    ep_ok = make_ep_moe(ctx.mesh, top_k=top_k, num_experts=wg.shape[0],
                        ep_axis="tp", batch_axis="dp", capacity_factor=8.0)
    ref = np.asarray(moe_mlp_dense(h, wr, wg, wu, wd, top_k))
    np.testing.assert_allclose(
        np.asarray(jax.jit(ep_ok)(h, wr, wg, wu, wd)), ref,
        rtol=1e-5, atol=1e-5,
    )


def test_mixtral_forward_grouped_matches_dense():
    """Whole-model forward with the grouped path matches the dense path."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.layers.attention import (
        AttentionMetadata,
        get_attention_backend,
    )
    from sglang_diffusion_tpu.models.registry import get_model_cls

    cfg = ModelConfig.tiny_llama(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    cfg = cfg.replace(
        architecture="MixtralForCausalLM", num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=48,
    ) if hasattr(cfg, "replace") else cfg
    if cfg.architecture != "MixtralForCausalLM":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, architecture="MixtralForCausalLM", num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=48,
        )
    model_cls = get_model_cls("MixtralForCausalLM")
    params = model_cls.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    attn = get_attention_backend("xla")

    b, t, page = 2, 4, 8
    kv = jnp.zeros((2, b * 2 + 1, 2 * 2, page, cfg.actual_head_dim), jnp.float32)
    pt = jnp.asarray(np.arange(1, 1 + b * 2).reshape(b, 2), jnp.int32)
    ids = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    pos = jnp.tile(jnp.arange(t)[None], (b, 1)).astype(jnp.int32)
    offs = np.arange(t)[None, :]
    slots = (np.take_along_axis(np.asarray(pt), offs // page, 1) * page
             + offs % page).astype(np.int32)
    meta = AttentionMetadata(
        page_table=pt, kv_lens=jnp.full((b,), t, jnp.int32),
        q_start_pos=jnp.zeros((b,), jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.full((b,), t - 1, jnp.int32),
    )
    lo_d, _ = jax.jit(model_cls.make_forward(cfg, attn, moe_impl="dense"))(
        params, ids, pos, kv, meta)
    lo_g, _ = jax.jit(model_cls.make_forward(cfg, attn, moe_impl="grouped"))(
        params, ids, pos, kv, meta)
    np.testing.assert_allclose(np.asarray(lo_g), np.asarray(lo_d),
                               rtol=1e-4, atol=1e-4)
