"""Layerwise CPU offload for diffusion DiTs.

Reference analog: multimodal_gen/runtime/utils/layerwise_offload.py —
models whose block stack exceeds device memory keep block weights in
HOST memory and stream them to the device layer-group by layer-group
during each denoise step, double-buffered so the next group's H2D copy
overlaps the current group's compute.

TPU-native design: the resident params (embedders, modulators, final
layer) stay on device; the stacked block params live as host numpy
arrays split into groups. One jitted per-group program runs the scan
over a group's blocks; `jax.device_put` is asynchronous, so group g+1's
transfer is issued before group g's compute is awaited (the XLA runtime
overlaps them). Device block buffers are released as soon as the next
group is resident, bounding device memory to ~2 groups of blocks.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OffloadedBlocks:
    """Host-resident stacked block params, streamed per group."""

    def __init__(self, blocks: Dict[str, Any], num_groups: int):
        leaves = jax.tree_util.tree_leaves(blocks)
        n_blocks = leaves[0].shape[0]
        if num_groups < 1 or num_groups > n_blocks:
            raise ValueError(f"num_groups={num_groups} for {n_blocks} blocks")
        if n_blocks % num_groups:
            raise ValueError(
                f"num_groups={num_groups} must divide {n_blocks} blocks")
        self.group_size = n_blocks // num_groups
        self.num_groups = num_groups
        # host copies, pre-split per group (no per-step slicing cost)
        self.host_groups: List[Dict[str, Any]] = []
        for g in range(num_groups):
            lo, hi = g * self.group_size, (g + 1) * self.group_size
            self.host_groups.append(
                jax.tree.map(lambda x: np.asarray(x[lo:hi]), blocks))

    def device_bytes_per_group(self) -> int:
        return sum(x.nbytes for x in
                   jax.tree_util.tree_leaves(self.host_groups[0]))


def run_blocks_offloaded(
    x: jax.Array,
    offl: OffloadedBlocks,
    group_fn,  # jitted fn(x, group_params, *args) -> x
    *args,
) -> jax.Array:
    """Stream the block stack over `x` with double-buffered H2D copies."""
    nxt = jax.device_put(offl.host_groups[0])
    for g in range(offl.num_groups):
        cur = nxt
        if g + 1 < offl.num_groups:
            # issue the next group's transfer BEFORE computing this one
            nxt = jax.device_put(offl.host_groups[g + 1])
        x = group_fn(x, cur, *args)
    return x


def make_offloaded_denoise(pipe, num_groups: int = 4):
    """Wrap a generic-MMDiT pipeline's denoise with layerwise offload.

    Returns run(latents, text_emb, sigmas) -> latents (greedy no-CFG
    path; CFG rides the doubled batch upstream). Block weights move to
    host; pipe.params["dit"]["blocks"] is REPLACED by the host copy to
    free device HBM."""
    from sglang_diffusion_tpu.diffusion.models.dit import (
        MMDiT,
        patchify,
        rms_norm,
        rope_nd,
        timestep_embedding,
        unpatchify,
    )

    cfg = pipe.dit_cfg
    E, D = cfg.hidden_size, cfg.head_dim
    block_body = MMDiT._make_block_body(cfg, __import__(
        "sglang_diffusion_tpu.diffusion.models.dit",
        fromlist=["joint_attention"]).joint_attention)
    dit = pipe.params["dit"]
    offl = OffloadedBlocks(dit["blocks"], num_groups)
    resident = {k: v for k, v in dit.items() if k != "blocks"}
    pipe.params["dit"] = {**resident, "blocks": None}  # free device copy

    @jax.jit
    def group_fn(x, group_params, cond, cos, sin):
        def body(x, bp):
            return block_body(x, bp, cond, cos, sin), None

        x, _ = jax.lax.scan(body, x, group_params)
        return x

    @jax.jit
    def head_fn(params, img_tokens, txt_emb, timesteps):
        cond = jnp.dot(
            jax.nn.silu(jnp.dot(timestep_embedding(timesteps, 256),
                                params["t_mlp1"])), params["t_mlp2"])
        img = jnp.dot(img_tokens, params["img_in"]) + params["img_in_b"]
        txt = jnp.dot(txt_emb, params["txt_in"]) + params["txt_in_b"]
        return jnp.concatenate([txt, img], axis=1), cond

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def tail_fn(params, x, cond, t_txt):
        x_img = x[:, t_txt:]
        mod = jnp.dot(jax.nn.silu(cond), params["final_mod"])
        sh, sc = jnp.split(mod, 2, axis=-1)
        x_img = rms_norm(x_img, jnp.ones((E,), x.dtype), 1e-6)
        x_img = x_img * (1 + sc[:, None]) + sh[:, None]
        return jnp.dot(x_img, params["final_out"])

    def run(latents, text_emb, sigmas):
        p = cfg.patch_size
        tokens, grid_hw = patchify(latents, p)
        t_txt = text_emb.shape[1]
        cos, sin = rope_nd(tuple(grid_hw), t_txt, D, cfg.rope_theta)
        n_steps = sigmas.shape[0] - 1
        for i in range(n_steps):
            t = jnp.full((tokens.shape[0],), float(sigmas[i]) * 1000.0)
            x, cond = head_fn(resident, tokens, text_emb, t)
            x = run_blocks_offloaded(x, offl, group_fn, cond, cos, sin)
            v = tail_fn(resident, x, cond, t_txt)
            tokens = tokens + (float(sigmas[i + 1]) - float(sigmas[i])) * v
        return unpatchify(tokens, grid_hw, p, cfg.in_channels)

    run.offloaded_bytes = offl.device_bytes_per_group() * offl.num_groups
    run.device_bytes_per_group = offl.device_bytes_per_group()
    return run
