"""dLLM: diffusion-LLM (LLaDA-style) block-wise parallel text decoding.

TPU-native analog of the reference's dLLM support (srt/dllm/{config.py,
algorithm/,mixin/} + the DLLM_EXTEND forward mode,
forward_batch_info.py:100): generation proceeds in fixed-size blocks; each
block starts fully <mask>ed and is iteratively revealed by re-running the
model and committing the most confident predictions (algorithm
"low_confidence") or all predictions above a probability threshold
("joint_threshold"). Attention is block-causal: a token attends the whole
prompt and every position of its own block (bidirectional within the
block), matching LLaDA semi-autoregressive inference.

TPU design: one jitted step per (padded length) bucket — the inner reveal
iteration is a lax.while_loop over a fixed token buffer, so the whole
block decode is a single compiled program; no per-iteration host roundtrip.
The model weights reuse the LlamaFamily param tree (LLaDA checkpoints are
llama-shaped); the forward here is a dense (non-paged) twin with the
block-causal mask, since masked-diffusion blocks re-attend to themselves
every iteration and per-token KV append does not apply within a block.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq
from sglang_diffusion_tpu.quant.quantize import dense_maybe_quantized as _dense
from sglang_diffusion_tpu.utils.common import round_up


def make_dense_forward(cfg: ModelConfig):
    """forward(params, input_ids [B,T], positions [B,T], attn_mask [B,T,T])
    -> logits [B,T,V].  Dense, non-cached, arbitrary attention mask."""
    Hq = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    D = cfg.actual_head_dim
    eps = cfg.rms_norm_eps
    sm_scale = 1.0 / float(np.sqrt(cfg.query_pre_attn_scalar or D))
    inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, cfg.rope_scaling))
    has_bias = cfg.attention_bias
    has_qk_norm = cfg.qk_norm
    act = jax.nn.silu if cfg.hidden_act == "silu" else (
        lambda x: jax.nn.gelu(x, approximate=True)
    )

    def norm(x, w):
        return rms_norm(x, w, eps)

    def layer_body(l, hidden, layers_p, positions, mask):
        lp = jax.tree.map(lambda x: x[l], layers_p)
        b, t, e = hidden.shape
        h = norm(hidden, lp["input_norm"])
        q = _dense(h, lp["wq"], lp.get("bq") if has_bias else None)
        k = _dense(h, lp["wk"], lp.get("bk") if has_bias else None)
        v = _dense(h, lp["wv"], lp.get("bv") if has_bias else None)
        q = q.reshape(b, t, Hq, D)
        k = k.reshape(b, t, Hkv, D)
        v = v.reshape(b, t, Hkv, D)
        if has_qk_norm:
            q = norm(q, lp["q_norm"])
            k = norm(k, lp["k_norm"])
        q, k = apply_rope(q, k, positions, inv_freq)
        g = Hq // Hkv
        qg = q.reshape(b, t, Hkv, g, D).astype(jnp.float32)
        scores = jnp.einsum("bthgd,bshd->bhgts", qg, k.astype(jnp.float32))
        scores = scores * sm_scale
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhgts,bshd->bthgd", probs, v.astype(jnp.float32))
        o = o.reshape(b, t, Hq * D).astype(hidden.dtype)
        hidden = hidden + _dense(o, lp["wo"])
        h = norm(hidden, lp["post_norm"])
        gate = _dense(h, lp["w_gate"])
        up = _dense(h, lp["w_up"])
        return hidden + _dense(act(gate) * up, lp["w_down"])

    def forward(params, input_ids, positions, mask):
        hidden = jnp.take(params["embed"], input_ids, axis=0)

        def body(l, h):
            return layer_body(l, h, params["layers"], positions, mask)

        hidden = jax.lax.fori_loop(0, cfg.num_hidden_layers, body, hidden)
        hidden = norm(hidden, params["final_norm"])
        if cfg.tie_word_embeddings:
            return jnp.dot(hidden, params["embed"].T,
                           preferred_element_type=jnp.float32)
        return _dense(hidden, params["lm_head"]).astype(jnp.float32)

    return forward


class DLLMGenerator:
    """Block-diffusion text generator over llama-shaped weights."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Dict[str, Any],
        mask_token_id: int,
        block_size: int = 32,
        algorithm: str = "low_confidence",
        reveal_per_iter: int = 4,
        threshold: float = 0.9,
    ):
        assert algorithm in ("low_confidence", "joint_threshold")
        self.cfg = cfg
        self.params = params
        self.mask_token_id = mask_token_id
        self.block_size = block_size
        self.algorithm = algorithm
        self.reveal_per_iter = reveal_per_iter
        self.threshold = threshold
        self._fwd = make_dense_forward(cfg)
        self._steps: Dict[int, Any] = {}

    # ------------- compiled block step -------------
    def _block_step(self, total_len: int):
        """Returns jitted fn(params, tokens [1,T], block_start) -> tokens with
        the block [block_start, block_start+block_size) fully revealed."""
        if total_len in self._steps:
            return self._steps[total_len]
        fwd = self._fwd
        bs = self.block_size
        mask_id = self.mask_token_id
        algo = self.algorithm
        k_reveal = self.reveal_per_iter
        thr = self.threshold

        def step(params, tokens, block_start, valid_len):
            t = tokens.shape[1]
            pos = jnp.arange(t)[None, :]
            block_end = block_start + bs
            # block-causal attention: query i attends key j iff
            # j < max(block_start(i), prompt region) boundary rule:
            # attend all positions in blocks <= own block and < valid_len
            qi = jnp.arange(t)[None, :, None]
            kj = jnp.arange(t)[None, None, :]
            # block index: prompt tokens (pos < block_start of first block)
            # count as earlier blocks; simple rule: attend iff
            # kj < block_end(qi's block). For generation we only ever have
            # one active block, so: attend iff kj < block_end.
            attn_mask = (kj < block_end) & (kj < valid_len)

            def cond(state):
                toks, it = state
                blk = jax.lax.dynamic_slice(toks, (0, block_start), (1, bs))
                return jnp.any(blk == mask_id) & (it < bs + 1)

            def body(state):
                toks, it = state
                logits = fwd(params, toks, pos, attn_mask)  # [1,T,V]
                blk_logits = jax.lax.dynamic_slice(
                    logits, (0, block_start, 0), (1, bs, logits.shape[-1])
                )[0]  # [bs, V]
                probs = jax.nn.softmax(blk_logits, axis=-1)
                pred = jnp.argmax(blk_logits, axis=-1).astype(jnp.int32)
                conf = jnp.max(probs, axis=-1)  # [bs]
                blk = jax.lax.dynamic_slice(toks, (0, block_start), (1, bs))[0]
                is_masked = blk == mask_id
                conf_m = jnp.where(is_masked, conf, -1.0)
                if algo == "low_confidence":
                    # reveal the k most confident masked positions
                    kth = jnp.sort(conf_m)[-k_reveal]
                    reveal = is_masked & (conf_m >= jnp.minimum(kth, jnp.max(conf_m)))
                else:
                    reveal = is_masked & (conf_m >= thr)
                    # always reveal at least the single best to guarantee progress
                    best = jnp.argmax(conf_m)
                    reveal = reveal.at[best].set(is_masked[best])
                new_blk = jnp.where(reveal, pred, blk)
                toks = jax.lax.dynamic_update_slice(
                    toks, new_blk[None], (0, block_start)
                )
                return toks, it + 1

            tokens, _ = jax.lax.while_loop(cond, body, (tokens, jnp.int32(0)))
            return tokens

        fn = jax.jit(step)
        self._steps[total_len] = fn
        return fn

    # ------------- host loop -------------
    def generate(self, input_ids, max_new_tokens: int) -> Dict[str, Any]:
        prompt = list(input_ids)
        n_blocks = -(-max_new_tokens // self.block_size)
        gen_len = n_blocks * self.block_size
        total = round_up(len(prompt) + gen_len, 32)
        tokens = np.full((1, total), self.mask_token_id, np.int32)
        tokens[0, : len(prompt)] = prompt
        # everything beyond the generated region is padding (stays masked,
        # never attended thanks to valid_len)
        toks = jnp.asarray(tokens)
        step = self._block_step(total)
        n_fwd = 0
        for b in range(n_blocks):
            block_start = len(prompt) + b * self.block_size
            valid_len = block_start + self.block_size
            toks = step(self.params, toks, jnp.int32(block_start),
                        jnp.int32(valid_len))
            n_fwd += 1
        out = np.asarray(toks)[0, len(prompt) : len(prompt) + max_new_tokens]
        return {
            "output_ids": [int(x) for x in out],
            "meta_info": {
                "num_blocks": n_blocks,
                "algorithm": self.algorithm,
            },
        }
