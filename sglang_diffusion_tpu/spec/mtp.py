"""MTP / NextN speculative draft module (DeepSeek-V3-style).

Reference analog: srt/models/deepseek_nextn.py + srt/models/mimo_mtp.py —
the multi-token-prediction head trained alongside the target model:

  h = eh_proj(concat(RMSNorm_e(embed(token)), RMSNorm_h(hidden)))
  h -> one decoder layer -> shared lm head

Structurally an EAGLE head with two extra pre-concat RMS norms, so the
drafter machinery (spec/eagle.py: device-side extend + K-step chain,
tree verify) is shared; the fuse step dispatches on the presence of
enorm/hnorm in the draft params. Enabled with
--speculative-algorithm mtp (draft weights via
--speculative-draft-model-path; random init without).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.spec.eagle import EagleDrafter, init_draft_params


def init_mtp_params(rng, cfg, dtype=jnp.bfloat16):
    """Random-init MTP params: EAGLE tree + enorm/hnorm."""
    params = init_draft_params(rng, cfg, dtype)
    E = cfg.hidden_size
    params["enorm"] = jnp.ones((E,), dtype)
    params["hnorm"] = jnp.ones((E,), dtype)
    return params


def load_mtp_params(path: str, cfg, dtype=jnp.bfloat16):
    """Load an MTP/NextN checkpoint.

    Accepts both standalone exports (model.layers.0.*) and in-place NextN
    layers (model.layers.{num_hidden_layers}.*, how DeepSeek-V3 ships its
    MTP layer). Names: enorm/hnorm/eh_proj + the decoder layer +
    shared_head.norm (reference: srt/models/deepseek_nextn.py:60-75)."""
    import os

    from safetensors import safe_open

    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    tensors = {}
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)

    prefixes = [f"model.layers.{i}" for i in (0, cfg.num_hidden_layers)]
    prefixes += ["model.mtp", "mtp"]

    def get(suffix):
        for p in prefixes:
            k = f"{p}.{suffix}"
            if k in tensors:
                return tensors[k]
        return None

    params = init_mtp_params(jax.random.PRNGKey(0), cfg, dtype)
    for ours, hf, tr in [
        ("enorm", "enorm.weight", None),
        ("hnorm", "hnorm.weight", None),
        ("fc", "eh_proj.weight", "t"),
        ("final_norm", "shared_head.norm.weight", None),
    ]:
        t = get(hf)
        if t is None:
            continue
        if tr == "t":
            t = t.T
        params[ours] = jnp.asarray(t, dtype)
    layer_map = {
        "input_norm": ("input_layernorm.weight", None),
        "post_norm": ("post_attention_layernorm.weight", None),
        "wq": ("self_attn.q_proj.weight", "t"),
        "wk": ("self_attn.k_proj.weight", "t"),
        "wv": ("self_attn.v_proj.weight", "t"),
        "wo": ("self_attn.o_proj.weight", "t"),
        "w_gate": ("mlp.gate_proj.weight", "t"),
        "w_up": ("mlp.up_proj.weight", "t"),
        "w_down": ("mlp.down_proj.weight", "t"),
    }
    for ours, (hf, tr) in layer_map.items():
        t = get(hf)
        if t is None:
            continue
        if tr == "t":
            t = t.T
        params["layers"][ours] = jnp.asarray(t, dtype)[None]
    return params


class MTPDrafter(EagleDrafter):
    """EAGLE drafter with the MTP fuse (normed embed + normed hidden)."""

    def __init__(self, runner, k: int = 4,
                 draft_path: Optional[str] = None, topk: int = 1):
        super().__init__(runner, k=k, draft_path=None, topk=topk)
        if draft_path:
            self.draft_params = load_mtp_params(draft_path, self.cfg)
        else:
            self.draft_params = init_mtp_params(
                jax.random.PRNGKey(runner.args.random_seed + 2), self.cfg
            )
