"""Pipeline parallelism: pp-sharded forward must match the single-stage
forward bit-near (logits and KV cache), on a real multi-device CPU mesh.

Reference analog: srt/managers/scheduler_pp_mixin.py event_loop_pp — there
PP correctness is covered by multi-GPU CI; here the whole pipeline compiles
into one SPMD step so a direct numerical comparison is possible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import (
    AttentionMetadata,
    get_attention_backend,
)
from sglang_diffusion_tpu.models.registry import get_model_cls
from sglang_diffusion_tpu.parallel.mesh import create_mesh
from sglang_diffusion_tpu.parallel.pipeline import (
    make_pp_forward,
    pp_partition_specs,
)

PAGE = 8


def _setup(num_layers=4, b=4, t=6, hidden=64, heads=4, kv_heads=2, ctx=10):
    cfg = ModelConfig.tiny_llama(
        vocab_size=256,
        hidden_size=hidden,
        intermediate_size=hidden * 2,
        num_hidden_layers=num_layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
    )
    model_cls = get_model_cls(cfg.architecture)
    params = model_cls.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)

    pps = -(-(ctx + t) // PAGE)
    num_pages = b * pps + 1
    kv = jnp.zeros((num_layers, num_pages, PAGE, 2 * kv_heads, cfg.actual_head_dim),
                   jnp.float32)
    page_table = jnp.asarray(
        np.arange(1, 1 + b * pps).reshape(b, pps), jnp.int32
    )
    input_ids = jnp.asarray(rng.integers(0, 256, (b, t)), jnp.int32)
    positions = jnp.tile(ctx + jnp.arange(t)[None], (b, 1)).astype(jnp.int32)
    offs = ctx + np.arange(t)[None, :]
    slots = (
        np.take_along_axis(np.asarray(page_table), offs // PAGE, axis=1) * PAGE
        + offs % PAGE
    ).astype(np.int32)
    meta = AttentionMetadata(
        page_table=page_table,
        kv_lens=jnp.full((b,), ctx + t, jnp.int32),
        q_start_pos=jnp.full((b,), ctx, jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.full((b,), t - 1, jnp.int32),
    )
    return cfg, model_cls, params, input_ids, positions, kv, meta


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (2, 4), (4, 4)])
def test_pp_forward_matches_single_stage(pp, microbatches):
    cfg, model_cls, params, ids, pos, kv, meta = _setup()
    attn = get_attention_backend("xla")
    fwd_ref = model_cls.make_forward(cfg, attn)
    logits_ref, kv_ref = jax.jit(fwd_ref)(params, ids, pos, kv, meta)

    fwd_pp = make_pp_forward(model_cls, cfg, attn, pp_size=pp,
                             num_microbatches=microbatches)
    logits_pp, kv_pp = jax.jit(fwd_pp)(params, ids, pos, kv, meta)

    np.testing.assert_allclose(
        np.asarray(logits_pp), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(kv_pp), np.asarray(kv_ref), rtol=2e-4, atol=2e-4
    )


def test_pp_sharded_on_mesh_matches_local():
    """pp=2 x dp=2 x tp=2 on the 8-device CPU mesh, params/KV stage-sharded."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, model_cls, params, ids, pos, kv, meta = _setup()
    attn = get_attention_backend("xla")
    logits_ref, kv_ref = jax.jit(model_cls.make_forward(cfg, attn))(
        params, ids, pos, kv, meta
    )

    ctx = create_mesh(tp_size=2, dp_size=2, pp_size=2)
    mesh = ctx.mesh
    specs = pp_partition_specs(model_cls.partition_specs(cfg))
    params_s = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: not isinstance(x, dict),
    )
    kv_s = jax.device_put(kv, ctx.kv_sharding)
    batch_sh = NamedSharding(mesh, P("dp"))
    meta_s = AttentionMetadata(
        *(jax.device_put(f, batch_sh) for f in meta)
    )
    ids_s = jax.device_put(ids, batch_sh)
    pos_s = jax.device_put(pos, batch_sh)

    fwd_pp = make_pp_forward(model_cls, cfg, attn, pp_size=2)
    logits_pp, kv_pp = jax.jit(fwd_pp)(params_s, ids_s, pos_s, kv_s, meta_s)
    np.testing.assert_allclose(
        np.asarray(logits_pp), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(kv_pp), np.asarray(kv_ref), rtol=2e-4, atol=2e-4
    )


def test_engine_e2e_with_pp():
    """Full engine with pp=2: generation matches the pp=1 engine exactly
    (greedy), across prefill + decode and mixed batch sizes."""
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.tiny_llama(vocab_size=512, hidden_size=64,
                                 num_hidden_layers=4)

    def run(pp):
        args = ServerArgs(
            model_path="", tokenizer_path="byte", page_size=8,
            max_total_tokens=2048, attention_backend="xla",
            context_length=256, pp_size=pp,
        )
        eng = Engine(server_args=args, model_config=cfg,
                     tokenizer=ByteTokenizer())
        outs = eng.generate(
            ["hello pipeline world", "a", "the quick brown fox jumps"],
            SamplingParams(temperature=0.0, max_new_tokens=8),
        )
        return [o["output_ids"] for o in outs]

    assert run(2) == run(1)
