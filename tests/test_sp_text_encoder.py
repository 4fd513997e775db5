"""SP text encoder (diffusion/pipeline.py text_encode with an sp mesh;
reference analog: multimodal_gen's sequence-parallel text-encoder pass,
SURVEY §2.8 'SP text-encoder'): the token axis shards over "sp", GSPMD
inserts the attention collectives, outputs match the single-device
encoder exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.diffusion.models.t5_encoder import (
    T5Config,
    T5Encoder,
)


@pytest.fixture(scope="module")
def t5():
    cfg = T5Config(
        vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=48,
        num_layers=2, gated_act=True,
    )
    params = T5Encoder.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_sp_sharded_encoder_matches_single_device(t5):
    cfg, params = t5
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sp",))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, size=(2, 64)).astype(np.int32)
    ids[0, 50:] = 0  # padding (pad_id 0)

    ref_emb, ref_pool = jax.jit(
        lambda p, i: T5Encoder.apply(p, i, cfg))(params, jnp.asarray(ids))

    rep = NamedSharding(mesh, P())
    sp_fn = jax.jit(
        lambda p, i: T5Encoder.apply(p, i, cfg),
        in_shardings=(rep, NamedSharding(mesh, P(None, "sp"))),
        out_shardings=rep,
    )
    emb, pool = sp_fn(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool),
                               atol=1e-5)


def test_sp_uneven_token_axis(t5):
    """T not divisible by sp (CLIP's 77-token case): GSPMD pads
    internally; results still exact."""
    cfg, params = t5
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sp",))
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 64, size=(1, 77)).astype(np.int32)
    ref_emb, _ = T5Encoder.apply(params, jnp.asarray(ids), cfg)
    from sglang_diffusion_tpu.diffusion.pipeline import (
        sp_sharded_text_encode,
    )

    sp_fn = sp_sharded_text_encode(
        lambda p, i: T5Encoder.apply(p, i, cfg), mesh)
    emb, _ = sp_fn(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               atol=1e-5)
