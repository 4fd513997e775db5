"""ModelRunner: owns params, KV cache, and the compiled forward+sample step.

Reference analog: srt/model_executor/model_runner.py:281 (+ the CUDA-graph
runner cuda_graph_runner.py:434). TPU-native replacement for CUDA graphs:
one jitted step function; bucketed padding of the host batch plan gives a
small closed set of static shapes, and jax caches one executable per shape.
The KV cache is donated through the step so XLA updates it in place.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.layers.attention import AttentionMetadata, get_attention_backend
from sglang_diffusion_tpu.models.registry import get_model_cls
from sglang_diffusion_tpu.parallel.mesh import MeshContext
from sglang_diffusion_tpu.sampling.sampler import SamplingMetadata, sample
from sglang_diffusion_tpu.sched.scheduler import BatchPlan
from sglang_diffusion_tpu.utils.common import cdiv, get_logger, select_bucket

logger = get_logger("model_runner")

# decode/prefill batch-size buckets always include 1 and 2
# (with pipeline parallelism the runner prunes buckets below the microbatch
# count so every padded batch splits evenly into microbatches)
BS_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
LQ_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


# weights that stay sharded at attn_tp degree in attn-TP mode; everything
# else widens "tp" -> ("dp","tp") (reference: attn-tp subgroup weights,
# parallel_state.py:1496 — attention projections live in the sub-TP group)
_ATTN_KEYS = frozenset({
    "wq", "wk", "wv", "wo", "wqkv", "bq", "bk", "bv", "bo", "bqkv",
    "wq_a", "wq_b", "wkv_a", "wkv_b", "q_norm", "k_norm", "q_a_norm",
    "kv_a_norm",
})


def _attn_tp_specs(specs):
    """Widen non-attention "tp" shardings to ("dp","tp")."""
    from jax.sharding import PartitionSpec as _P

    def widen_leaf(p):
        if not isinstance(p, _P):
            return p
        out = []
        for ax in p:
            if ax == "tp":
                out.append(("dp", "tp"))
            elif isinstance(ax, (tuple, list)) and "tp" in ax and "dp" not in ax:
                out.append(tuple(ax) + ("dp",))
            else:
                out.append(ax)
        return _P(*out)

    def walk(node, is_attn=False):
        if isinstance(node, dict):
            return {k: walk(v, is_attn or k in _ATTN_KEYS)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, is_attn) for v in node]
        return node if is_attn else widen_leaf(node)

    return walk(specs)


def _kv_dtype(args: ServerArgs):
    if args.kv_cache_dtype in ("auto", "bfloat16"):
        return jnp.bfloat16
    if args.kv_cache_dtype == "fp8_e4m3":
        return jnp.float8_e4m3fn
    if args.kv_cache_dtype == "fp8_e5m2":
        # e5m2 dequantizes to bf16 with a pure byte shift (it IS bf16's
        # top byte) — the cheapest fp8 KV path on TPU
        return jnp.float8_e5m2
    raise ValueError(args.kv_cache_dtype)


class ModelRunner:
    def _mk_fwd(self, model_config, attn_fn, **kw):
        """make_forward with engine-level MoE impl injection (ep). Installs
        this runner's mesh context first: MoE families read the global mesh
        at build time (moe_impl auto/ep)."""
        from sglang_diffusion_tpu.parallel.mesh import set_mesh_context

        set_mesh_context(self.mesh_ctx)
        if self._moe_impl is not None:
            kw["moe_impl"] = self._moe_impl
        return self.model_cls.make_forward(model_config, attn_fn, **kw)

    def __init__(
        self,
        args: ServerArgs,
        model_config: ModelConfig,
        mesh_ctx: MeshContext,
        params=None,
        dtype=jnp.bfloat16,
    ):
        self.args = args
        self.cfg = model_config
        self.mesh_ctx = mesh_ctx
        self.dtype = dtype
        self.model_cls = get_model_cls(model_config.architecture)

        # expert parallelism: --ep-size N routes MoE layers through the
        # shard_map all-to-all dispatcher (layers/moe.py make_ep_moe;
        # reference srt/layers/moe/ep_moe/). The ep axis reuses tp.
        self._moe_impl = None
        if args.ep_size > 1 and getattr(
            self.model_cls, "supports_moe_impl", False
        ):
            if args.ep_size != mesh_ctx.tp_size:
                raise ValueError(
                    f"ep_size={args.ep_size} must equal tp_size="
                    f"{mesh_ctx.tp_size} (ep reuses the tp mesh axis)"
                )
            self._moe_impl = "ep"

        context_len = args.context_length or model_config.max_position_embeddings
        self.context_len = context_len
        self.max_pages_per_seq = cdiv(context_len, args.page_size)

        # ---- KV pool sizing ----
        max_total_tokens = args.max_total_tokens or self._auto_kv_tokens()
        self.num_pages = max(2, max_total_tokens // args.page_size)
        logger.info(
            "KV pool: %d pages x %d tokens (%.1fk tokens)",
            self.num_pages,
            args.page_size,
            self.num_pages * args.page_size / 1e3,
        )

        # ---- params ----
        prequantized = False
        if params is None:
            key = jax.random.PRNGKey(args.random_seed)
            if args.quantization in ("w4a16", "int8", "w8a8_int8", "fp8",
                                     "awq", "gptq"):
                # Large quantized models: materializing the full bf16 tree
                # before quantizing can exceed HBM (an 8B model is ~16 GB
                # bf16 on a 16 GB chip). When the bf16 estimate crowds the
                # device, initialize leaf-by-leaf, quantizing each matmul
                # weight as it is created (peak = one leaf, not the tree).
                try:
                    params = self._maybe_streaming_quantized_init(
                        key, model_config, dtype)
                    prequantized = params is not None
                except Exception:  # noqa: BLE001 — fall back to dense init
                    params = None
            if params is None:
                # One fused jit for the whole tree: per-leaf random.normal
                # dispatches each cost a compile round trip over the
                # remote-TPU tunnel (~49 s for a 1B model vs ~17 s fused,
                # ~1 s from the persistent cache). Fall back to eager for
                # models whose init is not traceable.
                try:
                    params = jax.jit(
                        lambda k: self.model_cls.init_params(
                            k, model_config, dtype)
                    )(key)
                except Exception:  # noqa: BLE001 — non-jittable init path
                    params = self.model_cls.init_params(
                        key, model_config, dtype)
        self.dp_attention = bool(
            args.enable_dp_attention and mesh_ctx.mesh.size > 1
        )
        self.attn_tp = bool(
            self.dp_attention and args.attn_tp_size > 1
        )
        if self.attn_tp:
            # attn-TP subgroups (reference parallel_state.py:1496):
            # attention stays head-sharded over the mesh "tp" axis
            # (= attn_tp ranks) while every other weight widens its "tp"
            # sharding to ("dp","tp") — full model-parallel degree
            specs = _attn_tp_specs(
                self.model_cls.partition_specs(model_config))
        elif self.dp_attention and hasattr(
            self.model_cls, "partition_specs_dp_attention"
        ):
            specs = self.model_cls.partition_specs_dp_attention(model_config)
        else:
            specs = self.model_cls.partition_specs(model_config)
        if args.quantization in ("int8", "w8a8_int8", "fp8", "w4a16", "awq", "gptq"):
            from sglang_diffusion_tpu.quant.quantize import (
                quant_partition_specs,
                quantize_params,
            )

            if not prequantized:
                params = quantize_params(params, args.quantization)
            specs = quant_partition_specs(specs, args.quantization)
            logger.info("quantized weights: %s", args.quantization)
        self.pp_microbatches = (
            (args.pp_microbatches or mesh_ctx.pp_size)
            if mesh_ctx.pp_size > 1 else 1
        )
        self.bs_buckets = (
            BS_BUCKETS if self.pp_microbatches == 1
            else [b for b in BS_BUCKETS if b % self.pp_microbatches == 0]
        )
        self.lq_buckets = list(LQ_BUCKETS)
        from sglang_diffusion_tpu.utils.environ import envs as _envs

        self.deterministic = bool(
            args.enable_deterministic_inference
            or _envs.SGLD_TPU_DETERMINISTIC.get()
        )
        if self.deterministic:
            # Batch-invariant inference by CONSTRUCTION (reference analog:
            # srt/batch_invariant_ops — fixed reduction orders): pin every
            # step to a single executable by collapsing the batch-size,
            # chunk-length, and page-hint buckets to their maxima. One
            # executable means XLA's tiling/reduction order is identical
            # regardless of batch composition, so each row's logits are
            # bit-stable however the batch is packed. Costs padding FLOPs;
            # it is a mode, like the reference's.
            self.bs_buckets = [select_bucket(
                self.bs_buckets, max(1, args.max_running_requests))]
            self.lq_buckets = [select_bucket(
                LQ_BUCKETS,
                max(16, min(args.chunked_prefill_size
                            if args.chunked_prefill_size > 0 else 16,
                            self.context_len)))]
            logger.info(
                "deterministic batch-invariant mode: bs bucket %d, "
                "lq bucket %d, page hint pinned",
                self.bs_buckets[0], self.lq_buckets[0])
        if mesh_ctx.pp_size > 1:
            from sglang_diffusion_tpu.parallel.pipeline import pp_partition_specs

            if model_config.num_hidden_layers % mesh_ctx.pp_size:
                raise ValueError(
                    f"pp_size={mesh_ctx.pp_size} must divide "
                    f"num_hidden_layers={model_config.num_hidden_layers}"
                )
            specs = pp_partition_specs(specs)
        mesh = mesh_ctx.mesh
        from jax.sharding import NamedSharding

        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            specs,
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )

        # ---- KV cache ----
        # RPA layout (round 4): [L, P, S, 2Hkv, D] — slot-major pages with
        # K/V interleaved on the combined-head axis, matching JAX's TPU
        # ragged-paged-attention kernel
        self.has_linear_state = getattr(
            self.model_cls, "has_linear_state", False)
        n_kv_layers = (
            self.model_cls.kv_layers(model_config)
            if self.has_linear_state else model_config.num_hidden_layers
        )
        kv_shape = (
            n_kv_layers,
            self.num_pages,
            args.page_size,
            model_config.kv_cache_heads,  # 2*Hkv, or 1 latent plane (MLA)
            model_config.kv_cache_head_dim,
        )
        kv_sharding = mesh_ctx.kv_sharding_for(
            model_config.kv_cache_heads, self.num_pages,
            dp_attention=self.dp_attention, attn_tp=self.attn_tp,
        )
        pages_arr = jax.device_put(
            jnp.zeros(kv_shape, _kv_dtype(args)), kv_sharding
        )
        if self.has_linear_state:
            # hybrid families (qwen3-next / mamba mixes): per-request conv
            # + recurrent state pools, slot-indexed by each request's first
            # page id (reference analog: HybridLinear pools,
            # srt/mem_cache/memory_pool.py:1757). The pools ride the same
            # donated carry as the paged cache.
            if args.speculative_algorithm:
                raise ValueError(
                    "speculative decoding is not supported for hybrid "
                    "linear-attention models yet")
            pools = self.model_cls.init_linear_state(
                model_config, self.num_pages, dtype)
            self.kv_cache = {"pages": pages_arr, **pools}
        else:
            self.kv_cache = pages_arr

        # ---- compiled step ----
        from sglang_diffusion_tpu.layers.attention import (
            get_attention_backend,
            make_sharded_attention,
        )

        if self.dp_attention:
            # GSPMD-partitioned attention: the batch-sharding constraint
            # below seeds rows over ALL devices; the shard_map pallas
            # wrapper assumes head-sharded KV and does not apply here
            attn_fn = get_attention_backend("xla")
        else:
            attn_fn = make_sharded_attention(
                args.attention_backend, mesh_ctx.mesh
            )
        from jax.sharding import NamedSharding as _NS
        from jax.sharding import PartitionSpec as _P

        _n_all = mesh_ctx.mesh.size
        _mesh = mesh_ctx.mesh
        _dp_attn = self.dp_attention

        _cp = bool(args.enable_context_parallel and mesh_ctx.mesh.size > 1
                   and not self.dp_attention)

        _attn_tp_mode = self.attn_tp
        _dp_div = mesh_ctx.dp_size if _attn_tp_mode else _n_all

        def seed_dp(*arrays):
            """with_sharding_constraint batch rows over the attention-DP
            ranks: every device in plain dp-attention, the "dp" axis only
            under attn-TP (heads shard over "tp" there); no-op otherwise
            or for indivisible batches."""
            if not _dp_attn or arrays[0].shape[0] % _dp_div:
                return arrays
            batch_axes = "dp" if _attn_tp_mode else ("dp", "tp")
            out = []
            for x in arrays:
                spec = _P(batch_axes, *([None] * (x.ndim - 1)))
                out.append(
                    jax.lax.with_sharding_constraint(x, _NS(_mesh, spec))
                )
            return tuple(out)

        def seed_cp(*arrays):
            """Context parallelism: shard the prefill TOKEN axis over every
            device (reference analog: attn-CP seq-split prefill). Applies
            when the padded chunk length divides the mesh; GSPMD partitions
            the projections/FFN by sequence and inserts the KV gather for
            attention."""
            if (not _cp or arrays[0].ndim < 2
                    or arrays[0].shape[1] % _n_all):
                return arrays
            out = []
            for x in arrays:
                spec = _P(None, ("dp", "tp"), *([None] * (x.ndim - 2)))
                out.append(
                    jax.lax.with_sharding_constraint(x, _NS(_mesh, spec))
                )
            return tuple(out)
        if mesh_ctx.pp_size > 1:
            from sglang_diffusion_tpu.parallel.pipeline import make_pp_forward

            fwd = make_pp_forward(
                self.model_cls, model_config, attn_fn, mesh_ctx.pp_size,
                num_microbatches=args.pp_microbatches or None,
            )
        else:
            fwd = self._mk_fwd(model_config, attn_fn)

        def step(params, kv_cache, token_ids, positions, page_table, kv_lens,
                 q_start, slots, logit_idx, samp_meta, key, all_greedy=False,
                 output_counts=None, vocab_mask=None, rope_delta=None):
            meta = AttentionMetadata(
                page_table=page_table,
                kv_lens=kv_lens,
                q_start_pos=q_start,
                slot_ids=slots,
                logit_idx=logit_idx,
            )
            # rope positions may lag sequence positions (M-RoPE models;
            # models/qwen2_vl.py rope_delta) — the attention mask metadata
            # above always uses sequence positions
            rpos = positions if rope_delta is None else (
                positions + rope_delta[:, None]
            )
            token_ids, rpos = seed_dp(token_ids, rpos)
            token_ids, rpos = seed_cp(token_ids, rpos)
            logits, new_kv = fwd(params, token_ids, rpos, kv_cache, meta)
            next_tok, tok_logprob = sample(
                logits, samp_meta, key, all_greedy, output_counts, vocab_mask,
                nonce=kv_lens,
            )
            return next_tok, tok_logprob, new_kv

        def decode_multi(params, kv_cache, tokens0, positions0, page_table,
                         slots_km, samp_meta, key, all_greedy=False,
                         output_counts=None, vocab_mask=None, rope_delta=None,
                         pages_hint=None):
            # pages_hint is STATIC and otherwise unused here: its value is
            # read at trace time by the pallas backend (layers/attention
            # set_decode_pages_hint) — carrying it as a static arg keys the
            # executable cache so the kernel re-specializes as contexts
            # grow past each power-of-two page bound.
            """K fused decode steps with device-side token feedback
            (lax.scan; the TPU analog of overlap-scheduling + CUDA-graph
            replay — one host dispatch per K tokens).

            tokens0 [B], positions0 [B], slots_km [K, B]."""

            def body(carry, xs):
                tokens, kv_cache = carry
                slots_k, step = xs
                pos = positions0 + step
                meta = AttentionMetadata(
                    page_table=page_table,
                    kv_lens=pos + 1,
                    q_start_pos=pos,
                    slot_ids=slots_k[:, None],
                    logit_idx=jnp.zeros_like(pos),
                )
                rpos = pos if rope_delta is None else pos + rope_delta
                toks_in, rpos = seed_dp(tokens[:, None], rpos[:, None])
                logits, kv_cache = fwd(
                    params, toks_in, rpos, kv_cache, meta
                )
                tok, lp = sample(
                    logits,
                    samp_meta,
                    jax.random.fold_in(key, step),
                    all_greedy,
                    output_counts,
                    vocab_mask,
                    nonce=pos,
                )
                return (tok, kv_cache), (tok, lp)

            k = slots_km.shape[0]
            (_, kv_cache), (toks, lps) = jax.lax.scan(
                body, (tokens0, kv_cache), (slots_km, jnp.arange(k))
            )
            return toks.T, lps.T, kv_cache  # [B, K]

        # speculative verify step: logits at every position, greedy
        # acceptance happens host-side (reference: TARGET_VERIFY mode)
        fwd_all = self._mk_fwd(
            model_config, attn_fn, logits_mode="all"
        ) if hasattr(self.model_cls, "make_forward") else None

        def verify_step(params, kv_cache, token_ids, positions, page_table,
                        kv_lens, q_start, slots):
            meta = AttentionMetadata(
                page_table=page_table,
                kv_lens=kv_lens,
                q_start_pos=q_start,
                slot_ids=slots,
                logit_idx=jnp.zeros_like(kv_lens),
            )
            logits, new_kv = fwd_all(params, token_ids, positions, kv_cache, meta)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
            lps = jax.nn.log_softmax(logits, axis=-1)
            glp = jnp.take_along_axis(lps, greedy[..., None], axis=-1)[..., 0]
            # logprob of each provided token given its prefix (teacher
            # forcing; used by choice scoring / sgl.select)
            shift_lp = jnp.take_along_axis(
                lps[:, :-1], token_ids[:, 1:, None], axis=-1
            )[..., 0]
            return greedy, glp, shift_lp, new_kv

        # EAGLE variants: same steps but also returning the pre-final-norm
        # hidden features the draft head conditions on (reference:
        # DRAFT_EXTEND / TARGET_VERIFY modes, srt/speculative/eagle_worker.py)
        self._step_h = self._verify_h = None
        self.last_hidden = None
        if args.speculative_algorithm == "eagle":
            fwd_lh = self._mk_fwd(
                model_config, attn_fn, logits_mode="last+hidden"
            )
            fwd_ah = self._mk_fwd(
                model_config, attn_fn, logits_mode="all_hidden"
            )

            def step_h(params, kv_cache, token_ids, positions, page_table,
                       kv_lens, q_start, slots, logit_idx, samp_meta, key,
                       all_greedy=False, output_counts=None, vocab_mask=None):
                meta = AttentionMetadata(
                    page_table=page_table, kv_lens=kv_lens,
                    q_start_pos=q_start, slot_ids=slots, logit_idx=logit_idx,
                )
                (logits, hidden), new_kv = fwd_lh(
                    params, token_ids, positions, kv_cache, meta
                )
                next_tok, tok_logprob = sample(
                    logits, samp_meta, key, all_greedy, output_counts,
                    vocab_mask, nonce=kv_lens,
                )
                return next_tok, tok_logprob, hidden, new_kv

            def verify_h_step(params, kv_cache, token_ids, positions,
                              page_table, kv_lens, q_start, slots):
                meta = AttentionMetadata(
                    page_table=page_table, kv_lens=kv_lens,
                    q_start_pos=q_start, slot_ids=slots,
                    logit_idx=jnp.zeros_like(kv_lens),
                )
                (logits, hidden), new_kv = fwd_ah(
                    params, token_ids, positions, kv_cache, meta
                )
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                lps = jax.nn.log_softmax(logits, axis=-1)
                glp = jnp.take_along_axis(lps, greedy[..., None], axis=-1)[..., 0]
                return greedy, glp, hidden, new_kv

            if args.disable_jit:
                self._step_h = step_h
                self._verify_h = verify_h_step
            else:
                self._step_h = jax.jit(
                    step_h, donate_argnums=(1,),
                    static_argnames=("all_greedy",),
                )
                self._verify_h = jax.jit(verify_h_step, donate_argnums=(1,))

        if args.disable_jit:
            self._step = step
            self._decode_multi = decode_multi
            self._verify = verify_step
        else:
            self._step = jax.jit(
                step, donate_argnums=(1,), static_argnames=("all_greedy",)
            )
            self._decode_multi = jax.jit(
                decode_multi, donate_argnums=(1,),
                static_argnames=("all_greedy", "pages_hint"),
            )
            self._verify = jax.jit(verify_step, donate_argnums=(1,))
        self._rng_counter = 0
        self.base_key = jax.random.PRNGKey(args.random_seed)
        self.lora_manager = None  # set by the engine when LoRA is enabled
        self._lora_steps = None
        self._attn_fn = attn_fn
        self._fwd = fwd
        self._mm_step = None
        self._encode_images = None

    def _maybe_streaming_quantized_init(self, key, model_config, dtype):
        """Leaf-streaming random init with on-the-fly quantization, engaged
        only when the dense bf16 tree would crowd HBM (est > 50% of the
        device limit). Matmul leaves are created and quantized one at a
        time so peak memory is one bf16 leaf + the quantized tree —
        this is what lets an 8B-dim model (16 GB bf16) initialize as
        W4A16 (~5 GB) on a 16 GB chip. Returns None when the dense path
        is fine (small models keep exact init semantics)."""
        from sglang_diffusion_tpu.quant.quantize import (
            _QUANT_KEYS,
            _quantize_leaf_fp8,
            _quantize_leaf_int8,
            _quantize_leaf_w4a16,
        )

        shapes = jax.eval_shape(
            lambda k: self.model_cls.init_params(k, model_config, dtype),
            key,
        )
        flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
        est = sum(int(np.prod(sd.shape)) * sd.dtype.itemsize
                  for _, sd in flat)
        try:
            stats = jax.devices()[0].memory_stats()
            limit = (stats or {}).get("bytes_limit", 0)
        except Exception:  # noqa: BLE001 — CPU backend has no stats
            limit = 0
        if not limit and jax.default_backend() == "tpu":
            # the remote-TPU transport reports no memory stats; assume the
            # v5e default so 8B-class models take the streaming path
            limit = 16 * 1024 ** 3
        if not limit or est < 0.5 * limit:
            return None
        logger.info(
            "streaming quantized init: dense est %.1f GB > 50%% of "
            "%.1f GB HBM", est / 1e9, limit / 1e9,
        )
        qfn = {"int8": _quantize_leaf_int8, "w8a8_int8": _quantize_leaf_int8,
               "fp8": _quantize_leaf_fp8, "w4a16": _quantize_leaf_w4a16,
               "awq": _quantize_leaf_w4a16,
               "gptq": _quantize_leaf_w4a16}[self.args.quantization]

        @functools.partial(jax.jit, static_argnames=("shape", "dt", "kind"))
        def gen(k, shape, dt, kind):
            if kind == "ones":  # norm gammas
                return jnp.ones(shape, dt)
            # generate IN the target dtype: an f32 intermediate for a
            # stacked 8B leaf is 7.5 GB of avoidable peak
            return jax.random.normal(k, shape, dt) * jnp.asarray(0.02, dt)

        leaves = []
        for i, (path, sd) in enumerate(flat):
            name = getattr(path[-1], "key", None) or str(path[-1])
            sub = jax.random.fold_in(key, i)
            kind = "ones" if len(sd.shape) <= 1 else "normal"
            leaf = gen(sub, tuple(sd.shape), sd.dtype, kind)
            if name in _QUANT_KEYS and len(sd.shape) >= 2:
                if leaf.ndim >= 3:
                    # stacked [L, K, N] leaves: quantize per layer so the
                    # f32 quantization temps stay ~1/L of the leaf
                    parts = [qfn(leaf[l]) for l in range(leaf.shape[0])]
                    qleaf = {
                        k2: jnp.stack([p[k2] for p in parts])
                        for k2 in parts[0]
                    }
                else:
                    qleaf = qfn(leaf)
                leaf.delete()
                leaf = qleaf
            leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _auto_kv_tokens(self) -> int:
        """Size the KV pool from free device memory (reference analog:
        mem_fraction_static in model_runner.py)."""
        try:
            stats = jax.devices()[0].memory_stats()
            limit = stats.get("bytes_limit", 0)
            used = stats.get("bytes_in_use", 0)
            budget = int((limit * self.args.mem_fraction_static) - used)
        except Exception:
            budget = 0
        token_bytes = (
            self.cfg.num_hidden_layers
            * self.cfg.kv_cache_heads
            * self.cfg.kv_cache_head_dim
            * (1 if self.args.kv_cache_dtype.startswith("fp8") else 2)
        )
        if budget <= 0:
            return 65536  # CPU/test default
        return max(4096, budget // token_bytes)

    # ------------- LoRA step variants -------------
    def _get_lora_steps(self):
        if self._lora_steps is None:
            fwd_l = self._mk_fwd(
                self.cfg, self._attn_fn, use_lora=True
            )

            def step_l(params, kv_cache, token_ids, positions, page_table,
                       kv_lens, q_start, slots, logit_idx, samp_meta, key,
                       lora_tree, lora_ids, all_greedy=False):
                meta = AttentionMetadata(
                    page_table=page_table, kv_lens=kv_lens,
                    q_start_pos=q_start, slot_ids=slots, logit_idx=logit_idx,
                )
                logits, new_kv = fwd_l(
                    params, token_ids, positions, kv_cache, meta,
                    lora_tree, lora_ids,
                )
                tok, lp = sample(logits, samp_meta, key, all_greedy,
                                 nonce=kv_lens)
                return tok, lp, new_kv

            def decode_multi_l(params, kv_cache, tokens0, positions0,
                               page_table, slots_km, samp_meta, key,
                               lora_tree, lora_ids, all_greedy=False):
                def body(carry, xs):
                    tokens, kv_cache = carry
                    slots_k, stp = xs
                    pos = positions0 + stp
                    meta = AttentionMetadata(
                        page_table=page_table, kv_lens=pos + 1,
                        q_start_pos=pos, slot_ids=slots_k[:, None],
                        logit_idx=jnp.zeros_like(pos),
                    )
                    logits, kv_cache = fwd_l(
                        params, tokens[:, None], pos[:, None], kv_cache,
                        meta, lora_tree, lora_ids,
                    )
                    tok, lp = sample(logits, samp_meta,
                                     jax.random.fold_in(key, stp),
                                     all_greedy, nonce=pos)
                    return (tok, kv_cache), (tok, lp)

                k = slots_km.shape[0]
                (_, kv_cache), (toks, lps) = jax.lax.scan(
                    body, (tokens0, kv_cache), (slots_km, jnp.arange(k))
                )
                return toks.T, lps.T, kv_cache

            if self.args.disable_jit:
                self._lora_steps = (step_l, decode_multi_l)
            else:
                self._lora_steps = (
                    jax.jit(step_l, donate_argnums=(1,),
                            static_argnames=("all_greedy",)),
                    jax.jit(decode_multi_l, donate_argnums=(1,),
                            static_argnames=("all_greedy",)),
                )
        return self._lora_steps

    def _run_lora_batch(self, plan, samp, all_greedy, key):
        b = plan.token_ids.shape[0]
        bb = select_bucket(self.bs_buckets, b)
        lora_ids = np.zeros((bb,), np.int32)
        for i, r in enumerate(plan.reqs):
            lora_ids[i] = r.lora_slot
        lora_tree = self.lora_manager.batch_params()
        lids = jnp.asarray(lora_ids)
        page_table = np.zeros((bb, self.max_pages_per_seq), np.int32)
        page_table[:b] = plan.page_table

        def pad1(x, fill=0):
            out = np.full((bb,), fill, x.dtype)
            out[:b] = x
            return out

        def pad2(x, fill=0, w=None):
            w = w or x.shape[1]
            out = np.full((bb, w), fill, x.dtype)
            out[:b, : x.shape[1]] = x
            return out

        step_l, decode_multi_l = self._get_lora_steps()
        if plan.kind == "decode":
            slots_km = np.full((plan.horizon, bb), -1, np.int32)
            slots_km[:, :b] = plan.slots.T
            toks, lps, self.kv_cache = decode_multi_l(
                self.params, self.kv_cache,
                jnp.asarray(pad1(plan.token_ids[:, 0])),
                jnp.asarray(pad1(plan.positions[:, 0])),
                jnp.asarray(page_table), jnp.asarray(slots_km),
                samp, key, lora_tree, lids, all_greedy=all_greedy,
            )
            toks, lps = jax.device_get((toks, lps))
            return toks[:b], lps[:b]
        lq = plan.token_ids.shape[1]
        lb = select_bucket(self.lq_buckets, lq)
        toks, lps, self.kv_cache = step_l(
            self.params, self.kv_cache,
            jnp.asarray(pad2(plan.token_ids, w=lb)),
            jnp.asarray(pad2(plan.positions, w=lb)),
            jnp.asarray(page_table),
            jnp.asarray(pad1(plan.kv_lens)),
            jnp.asarray(pad1(plan.q_start)),
            jnp.asarray(pad2(plan.slots, fill=-1, w=lb)),
            jnp.asarray(pad1(plan.logit_idx)),
            samp, key, lora_tree, lids, all_greedy=all_greedy,
        )
        toks, lps = jax.device_get((toks, lps))
        return toks[:b, None], lps[:b, None]

    # ------------- async decode issue (overlap pipelining) -------------
    def issue_decode(self, plan, samp, key, all_greedy, output_counts,
                     vocab_mask, page_table=None, tokens0_dev=None):
        """Dispatch one fused decode call WITHOUT fetching results. Returns
        device arrays (toks [bb, K], lps [bb, K]). tokens0_dev lets the
        caller feed the previous call's device-resident last tokens (the
        cross-call overlap path — no host roundtrip between windows)."""
        b = plan.token_ids.shape[0]
        bb = select_bucket(self.bs_buckets, b)
        if page_table is None:
            page_table = np.zeros((bb, self.max_pages_per_seq), np.int32)
            page_table[:b] = plan.page_table
        slots_km = np.full((plan.horizon, bb), -1, np.int32)
        slots_km[:, :b] = plan.slots.T

        def pad1(x, fill=0):
            out = np.full((bb,), fill, x.dtype)
            out[:b] = x
            return out

        tokens0 = (
            tokens0_dev
            if tokens0_dev is not None
            else jnp.asarray(pad1(plan.token_ids[:, 0]))
        )
        rope_delta = None
        if any(getattr(r, "rope_delta", 0) for r in plan.reqs):
            rd = np.zeros((bb,), np.int32)
            for i, r in enumerate(plan.reqs):
                rd[i] = r.rope_delta
            rope_delta = jnp.asarray(rd)
        # static page bound for the pallas decode kernel: max context this
        # window can reach, in pages, rounded up to a power of two
        from sglang_diffusion_tpu.layers.attention import (
            set_decode_pages_hint,
        )

        max_ctx = int(plan.kv_lens.max()) + plan.horizon
        hint = self._pages_hint_for(max_ctx)
        set_decode_pages_hint(hint)
        toks, lps, self.kv_cache = self._decode_multi(
            self.params,
            self.kv_cache,
            tokens0,
            jnp.asarray(pad1(plan.positions[:, 0])),
            jnp.asarray(page_table),
            jnp.asarray(slots_km),
            samp,
            key,
            all_greedy=all_greedy,
            output_counts=output_counts,
            vocab_mask=vocab_mask,
            rope_delta=rope_delta,
            pages_hint=hint,
        )
        return toks, lps

    def build_samp(self, plan, samp_meta_np):
        """Padded SamplingMetadata + static flags for a plan (host->device)."""
        b = plan.token_ids.shape[0]
        bb = select_bucket(self.bs_buckets, b)

        def pad1(x, fill=0):
            out = np.full((bb,), fill, x.dtype)
            out[:b] = x
            return out

        has_seeds = bool(np.any(samp_meta_np.get("seeds", np.array([-1])) >= 0))
        samp = SamplingMetadata(
            temperature=jnp.asarray(pad1(samp_meta_np["temperature"])),
            top_p=jnp.asarray(pad1(samp_meta_np["top_p"], fill=1.0)),
            top_k=jnp.asarray(pad1(samp_meta_np["top_k"], fill=-1)),
            min_p=jnp.asarray(pad1(samp_meta_np["min_p"])),
            frequency_penalty=jnp.asarray(pad1(samp_meta_np["frequency_penalty"])),
            presence_penalty=jnp.asarray(pad1(samp_meta_np["presence_penalty"])),
            seeds=(
                jnp.asarray(pad1(samp_meta_np["seeds"], fill=-1))
                if has_seeds
                else None
            ),
        )
        all_greedy = bool(np.all(samp_meta_np["temperature"] == 0.0))
        return samp, all_greedy

    def next_decode_key(self):
        self._rng_counter += 1
        return jax.random.fold_in(self.base_key, self._rng_counter)

    # ------------- speculative tree verify -------------
    def _run_tree_verify(self, vargs, tree_mask, b):
        """Verify with an in-batch ancestor mask (EAGLE topk>1). Uses the
        XLA attention backend (tree masks aren't lowered to the Pallas
        kernel yet) and returns hidden features for the draft head."""
        if not hasattr(self, "_verify_tree"):
            from sglang_diffusion_tpu.layers.attention import (
                get_attention_backend,
            )

            attn = get_attention_backend("xla")
            fwd_ah = self._mk_fwd(
                self.cfg, attn, logits_mode="all_hidden"
            )

            def verify_tree(params, kv_cache, token_ids, positions,
                            page_table, kv_lens, q_start, slots, tm):
                meta = AttentionMetadata(
                    page_table=page_table, kv_lens=kv_lens,
                    q_start_pos=q_start, slot_ids=slots,
                    logit_idx=jnp.zeros_like(kv_lens), tree_mask=tm,
                )
                (logits, hidden), new_kv = fwd_ah(
                    params, token_ids, positions, kv_cache, meta
                )
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                lps = jax.nn.log_softmax(logits, axis=-1)
                glp = jnp.take_along_axis(
                    lps, greedy[..., None], axis=-1
                )[..., 0]
                return greedy, glp, hidden, new_kv

            self._verify_tree = (
                verify_tree if self.args.disable_jit
                else jax.jit(verify_tree, donate_argnums=(1,))
            )
        greedy, glp, hidden, self.kv_cache = self._verify_tree(
            *vargs, tree_mask
        )
        greedy, glp, hidden = jax.device_get((greedy, glp, hidden))
        self.last_hidden = hidden[:b]
        return greedy[:b], glp[:b]

    def copy_kv_slot(self, src_slot: int, dst_slot: int) -> None:
        """Move one token's KV (all layers) between flat cache slots."""
        from sglang_diffusion_tpu.ops.attention_xla import copy_kv_slots

        if not hasattr(self, "_copy_kv"):
            self._copy_kv = (
                copy_kv_slots if self.args.disable_jit
                else jax.jit(copy_kv_slots, donate_argnums=(0,))
            )
        self.kv_cache = self._copy_kv(
            self.kv_cache,
            jnp.asarray([src_slot], jnp.int32),
            jnp.asarray([dst_slot], jnp.int32),
        )

    # ------------- multimodal (VLM) -------------
    def encode_images(self, pixel_values: np.ndarray):
        """Run the vision tower + projector. Returns a DEVICE array
        [N, T_img, E] (kept on device: pulling it through the host would
        cost more than the prefill itself; reference analog: encoder
        embeddings staying on GPU, srt/managers/mm_utils.py)."""
        if self._encode_images is None:
            enc = self.model_cls.make_encode_images(self.cfg)
            self._encode_images = (
                enc if self.args.disable_jit else jax.jit(enc)
            )
        return self._encode_images(
            self.params, jnp.asarray(pixel_values, jnp.float32)
        )

    def encode_images_mrope(self, patches: np.ndarray, grid_hw):
        """Per-image vision encode for dynamic-resolution (mrope) models —
        one executable per patch grid (grids repeat heavily in practice)."""
        if self._encode_images is None:
            enc = self.model_cls.make_encode_images(self.cfg)
            self._encode_images = (
                enc if self.args.disable_jit
                else jax.jit(enc, static_argnums=(2,))
            )
        return self._encode_images(
            self.params, jnp.asarray(patches, jnp.float32), tuple(grid_hw)
        )

    def encode_audio(self, feats: np.ndarray):
        """Audio tower + projector (jitted; [N, mel, frames] -> [N, T, E])."""
        if not hasattr(self, "_encode_audio"):
            enc = self.model_cls.make_encode_audio(self.cfg)
            self._encode_audio = (
                enc if self.args.disable_jit else jax.jit(enc)
            )
        return self._encode_audio(self.params, jnp.asarray(feats, jnp.float32))

    def _get_mm_step(self):
        """Prefill step with image-embedding injection (compiled lazily;
        only batches containing images pay for the extra [B, T, E] input).
        M-RoPE models additionally take the 3D rope positions."""
        if self._mm_step is None:
            fwd = self._fwd
            uses_mrope = getattr(self.model_cls, "uses_mrope", False)

            def mm_step(params, kv_cache, token_ids, positions, page_table,
                        kv_lens, q_start, slots, logit_idx, mm_embeds, mm_mask,
                        samp_meta, key, positions_3d=None, all_greedy=False,
                        output_counts=None, vocab_mask=None):
                meta = AttentionMetadata(
                    page_table=page_table, kv_lens=kv_lens,
                    q_start_pos=q_start, slot_ids=slots, logit_idx=logit_idx,
                )
                kw = dict(mm_embeds=mm_embeds, mm_mask=mm_mask)
                if uses_mrope:
                    kw["positions_3d"] = positions_3d
                logits, new_kv = fwd(
                    params, token_ids, positions, kv_cache, meta, **kw
                )
                tok, lp = sample(logits, samp_meta, key, all_greedy,
                                 output_counts, vocab_mask, nonce=kv_lens)
                return tok, lp, new_kv

            self._mm_step = (
                mm_step if self.args.disable_jit
                else jax.jit(mm_step, donate_argnums=(1,),
                             static_argnames=("all_greedy",))
            )
        return self._mm_step

    def _run_mm_prefill(self, plan, page_table, samp, key, all_greedy,
                        output_counts, vocab_mask):
        b = plan.token_ids.shape[0]
        bb = select_bucket(self.bs_buckets, b)
        lq = plan.token_ids.shape[1]
        lb = select_bucket(self.lq_buckets, lq)
        E = self.cfg.hidden_size
        mm_mask = np.zeros((bb, lb), bool)
        mm_embeds = jnp.zeros((bb, lb, E), self.dtype)
        for i, req in enumerate(plan.reqs):
            start = int(plan.q_start[i])
            take = int(plan.kv_lens[i]) - start
            for span in req.mm_spans:
                o0 = max(span.offset, start)
                o1 = min(span.offset + span.length, start + take)
                if o1 <= o0:
                    continue
                emb = req.mm_embeds[span.image_index][
                    o0 - span.offset : o1 - span.offset
                ]
                mm_embeds = jax.lax.dynamic_update_slice(
                    mm_embeds, emb[None].astype(self.dtype), (i, o0 - start, 0)
                )
                mm_mask[i, o0 - start : o1 - start] = True

        def pad1(x, fill=0):
            out = np.full((bb,), fill, x.dtype)
            out[:b] = x
            return out

        def pad2(x, fill=0):
            out = np.full((bb, lb), fill, x.dtype)
            out[:b, :lq] = x
            return out

        positions_3d = None
        if getattr(self.model_cls, "uses_mrope", False):
            # 3D rope positions: mm rows use their precomputed streams,
            # text rows duplicate the scalar positions across all streams
            p3 = np.zeros((3, bb, lb), np.int32)
            p3[:, :b, :lq] = plan.positions[None]
            for i, req in enumerate(plan.reqs):
                if req.mm_positions is None:
                    continue
                start = int(plan.q_start[i])
                take = int(plan.kv_lens[i]) - start
                n_prompt = req.mm_positions.shape[1]
                hi = min(start + take, n_prompt)
                if hi > start:
                    p3[:, i, : hi - start] = req.mm_positions[:, start:hi]
            positions_3d = jnp.asarray(p3)

        step = self._get_mm_step()
        tok, lp, self.kv_cache = step(
            self.params, self.kv_cache,
            jnp.asarray(pad2(plan.token_ids)),
            jnp.asarray(pad2(plan.positions)),
            jnp.asarray(page_table),
            jnp.asarray(pad1(plan.kv_lens)),
            jnp.asarray(pad1(plan.q_start)),
            jnp.asarray(pad2(plan.slots, fill=-1)),
            jnp.asarray(pad1(plan.logit_idx)),
            mm_embeds,
            jnp.asarray(mm_mask),
            samp, key, positions_3d=positions_3d, all_greedy=all_greedy,
            output_counts=output_counts, vocab_mask=vocab_mask,
        )
        tok, lp = jax.device_get((tok, lp))
        return tok[:b, None], lp[:b, None]

    # ------------- embeddings -------------
    # ---------------- RL memory release / resume ----------------
    def release_memory(self, tags) -> None:
        """Free device memory between RL rollout phases (reference analog:
        srt/entrypoints/engine.py release_memory_occupation + the
        scheduler's GPU_MEMORY_TYPE_{KV_CACHE,WEIGHTS} handling). Weights
        are staged to host RAM; the KV pool is dropped entirely (its
        content is invalidated — callers flush the radix cache first)."""
        if "kv_cache" in tags and self.kv_cache is not None:
            self._kv_spec = (self.kv_cache.shape, self.kv_cache.dtype,
                             self.kv_cache.sharding)
            self.kv_cache.delete()
            self.kv_cache = None
        if "weights" in tags and getattr(self, "_released_params", None) is None \
                and self.params is not None:
            leaves, treedef = jax.tree_util.tree_flatten(self.params)
            saved = [(np.asarray(l), l.sharding) for l in leaves]
            for l in leaves:
                l.delete()
            self._released_params = (treedef, saved)
            self.params = None

    def resume_memory(self, tags) -> None:
        if "weights" in tags and getattr(self, "_released_params", None):
            treedef, saved = self._released_params
            leaves = [jax.device_put(a, s) for a, s in saved]
            self.params = jax.tree_util.tree_unflatten(treedef, leaves)
            self._released_params = None
        if "kv_cache" in tags and self.kv_cache is None:
            shape, dtype, sharding = self._kv_spec
            self.kv_cache = jax.device_put(
                jnp.zeros(shape, dtype), sharding)

    def run_embedding(self, ids, pages) -> np.ndarray:
        """Hidden-state embedding for one sequence over caller-provided
        scratch pages (no scheduler involvement)."""
        if not hasattr(self, "_embed_step"):
            from sglang_diffusion_tpu.layers.attention import make_sharded_attention

            attn_fn = make_sharded_attention(
                self.args.attention_backend, self.mesh_ctx.mesh
            )
            fwd_h = self._mk_fwd(
                self.cfg, attn_fn, logits_mode="hidden"
            )

            def embed_step(params, kv_cache, token_ids, positions, page_table,
                           kv_lens, q_start, slots, logit_idx):
                meta = AttentionMetadata(
                    page_table=page_table,
                    kv_lens=kv_lens,
                    q_start_pos=q_start,
                    slot_ids=slots,
                    logit_idx=logit_idx,
                )
                h, new_kv = fwd_h(params, token_ids, positions, kv_cache, meta)
                return h, new_kv

            self._embed_step = (
                embed_step
                if self.args.disable_jit
                else jax.jit(embed_step, donate_argnums=(1,))
            )
        n = len(ids)
        from sglang_diffusion_tpu.utils.common import round_up

        t = round_up(n, 16)
        token_ids = np.zeros((1, t), np.int32)
        token_ids[0, :n] = ids
        positions = np.zeros((1, t), np.int32)
        positions[0, :n] = np.arange(n)
        slots = np.full((1, t), -1, np.int32)
        page_table = np.zeros((1, self.max_pages_per_seq), np.int32)
        kv_lens = np.array([n], np.int32)
        q_start = np.array([0], np.int32)
        logit_idx = np.array([n - 1], np.int32)
        pv = np.asarray(pages, np.int32)
        page_table[0, : len(pv)] = pv
        offs = np.arange(n)
        slots[0, :n] = pv[offs // self.args.page_size] * self.args.page_size + (
            offs % self.args.page_size
        )
        h, self.kv_cache = self._embed_step(
            self.params,
            self.kv_cache,
            jnp.asarray(token_ids),
            jnp.asarray(positions),
            jnp.asarray(page_table),
            jnp.asarray(kv_lens),
            jnp.asarray(q_start),
            jnp.asarray(slots),
            jnp.asarray(logit_idx),
        )
        return np.asarray(h)[0]

    # ------------- weight updates -------------
    def replace_params(self, params) -> None:
        """Swap in a full new param tree (sharded like the old one)."""
        from jax.sharding import NamedSharding

        specs = self.model_cls.partition_specs(self.cfg)
        if self.args.quantization in ("int8", "w8a8_int8", "fp8", "w4a16", "awq", "gptq"):
            from sglang_diffusion_tpu.quant.quantize import (
                quant_partition_specs,
                quantize_params,
            )

            params = quantize_params(params, self.args.quantization)
            specs = quant_partition_specs(specs, self.args.quantization)
        mesh = self.mesh_ctx.mesh
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            specs,
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )

    def update_param_leaves(self, named_arrays) -> None:
        """Update individual leaves by "a/b/c" path, preserving sharding."""
        for path, value in named_arrays.items():
            keys = path.split("/")
            node = self.params
            for k in keys[:-1]:
                node = node[k]
            old = node[keys[-1]]
            if hasattr(old, "sharding"):
                value = jax.device_put(
                    jnp.asarray(value, old.dtype), old.sharding
                )
            node[keys[-1]] = value

    # ------------- step execution -------------
    def _pages_hint_for(self, max_ctx: int) -> int:
        """Static page bound for the pallas decode kernel: the power-of-two
        cover of the batch's max page count. Power-of-two ALWAYS (round 5;
        exact small hints multiplied the executable lattice and made decode
        compiles land inside serving) — the kernel skips DMAs for pages
        beyond each sequence's kv_len, so a loose hint costs VMEM scratch
        but no HBM bandwidth."""
        if getattr(self, "deterministic", False):
            return self.max_pages_per_seq
        need = max(1, cdiv(max_ctx, self.args.page_size))
        hint = 1
        while hint < need:
            hint *= 2
        return min(hint, self.max_pages_per_seq)

    # ------------- executable warmup (CUDA-graph capture analog) -------------
    def warmup_decode_executables(
        self, max_bs: int, max_ctx: int, horizons=None,
        include_stochastic: bool = False, progress_cb=None,
    ) -> int:
        """Precompile the fused-decode executable lattice so no decode
        compile ever lands inside serving (reference analog: capturing
        CUDA graphs for every batch size at startup,
        cuda_graph_runner.py:673 — same upfront-cost philosophy). Dummy
        batches write KV into reserved page 0. Returns #executables
        visited (compiled or already cached)."""
        from sglang_diffusion_tpu.sched.scheduler import BatchPlan

        if self.args.disable_jit:
            return 0
        h_top = max(1, self.args.decode_horizon)
        h_top = 1 << (h_top.bit_length() - 1)
        horizons = sorted(set(horizons or {1, h_top}))
        bs_cap = select_bucket(self.bs_buckets, max_bs)
        bs_list = [b for b in self.bs_buckets if b <= bs_cap]
        # hint ladder: every value _pages_hint_for can produce up to the
        # serving context — powers of two AND the max_pages_per_seq clamp
        # (round 5 fix: `while h <= max_hint` skipped the clamped top
        # hint, so steady-state decode compiled INSIDE serving)
        hints, h = [], 1
        max_hint = self._pages_hint_for(max_ctx)
        while True:
            hints.append(min(h, self.max_pages_per_seq))
            if hints[-1] >= max_hint:
                break
            h *= 2
        hints = sorted(set(hints))

        class _Dummy:
            rope_delta = 0
            lora_slot = 0

        n = 0
        for bs in bs_list:
            for hz in horizons:
                for hint in hints:
                    # positions such that kv_lens.max()+hz lands in `hint`
                    # pages (step_key parity with real dispatches)
                    pos = max(0, hint * self.args.page_size - hz - 1)
                    plan = BatchPlan(
                        kind="decode",
                        reqs=[_Dummy()] * bs,
                        token_ids=np.zeros((bs, 1), np.int32),
                        positions=np.full((bs, 1), pos, np.int32),
                        page_table=np.zeros(
                            (bs, self.max_pages_per_seq), np.int32),
                        kv_lens=np.full((bs,), pos + 1, np.int32),
                        q_start=np.full((bs,), pos, np.int32),
                        # all dummy rows write page 0's first slots
                        slots=np.tile(np.arange(hz, dtype=np.int32),
                                      (bs, 1)),
                        logit_idx=np.zeros((bs,), np.int32),
                        sample_mask=np.ones((bs,), bool),
                        horizon=hz,
                    )
                    variants = [True] + ([False] if include_stochastic else [])
                    for greedy in variants:
                        samp_np = {
                            "temperature": np.full(
                                (bs,), 0.0 if greedy else 0.7, np.float32),
                            "top_p": np.ones((bs,), np.float32),
                            "top_k": np.full((bs,), -1, np.int32),
                            "min_p": np.zeros((bs,), np.float32),
                            "frequency_penalty": np.zeros((bs,), np.float32),
                            "presence_penalty": np.zeros((bs,), np.float32),
                            "seeds": np.full((bs,), -1, np.int32),
                        }
                        samp, all_greedy = self.build_samp(plan, samp_np)
                        toks, _ = self.issue_decode(
                            plan, samp, self.next_decode_key(), all_greedy,
                            None, None,
                        )
                        # chain one window from device-resident tokens so
                        # the pipelined path's tokens0_dev flavor (if its
                        # aval keys a distinct executable) is warmed too
                        self.issue_decode(
                            plan, samp, self.next_decode_key(), all_greedy,
                            None, None, tokens0_dev=toks[:, -1],
                        )
                        n += 1
                        if progress_cb is not None:
                            progress_cb(n)
        return n

    def warmup_prefill_executables(
        self, bs_list, max_tokens: int, progress_cb=None
    ) -> int:
        """Precompile prefill executables for the given batch sizes up to
        the chunk-size token bucket."""
        from sglang_diffusion_tpu.sched.scheduler import BatchPlan

        if self.args.disable_jit:
            return 0
        lq_list = [t for t in self.lq_buckets
                   if t <= select_bucket(self.lq_buckets, max_tokens)]
        n = 0
        for bs in sorted({select_bucket(self.bs_buckets, b)
                          for b in bs_list}):
            for lq in lq_list:
                plan = BatchPlan(
                    kind="prefill",
                    reqs=[],
                    token_ids=np.zeros((bs, lq), np.int32),
                    positions=np.tile(np.arange(lq, dtype=np.int32), (bs, 1)),
                    page_table=np.zeros(
                        (bs, self.max_pages_per_seq), np.int32),
                    kv_lens=np.full((bs,), lq, np.int32),
                    q_start=np.zeros((bs,), np.int32),
                    slots=np.tile(
                        np.arange(lq, dtype=np.int32) % self.args.page_size,
                        (bs, 1)),
                    logit_idx=np.full((bs,), lq - 1, np.int32),
                    sample_mask=np.ones((bs,), bool),
                )
                samp_np = {
                    "temperature": np.zeros((bs,), np.float32),
                    "top_p": np.ones((bs,), np.float32),
                    "top_k": np.full((bs,), -1, np.int32),
                    "min_p": np.zeros((bs,), np.float32),
                    "frequency_penalty": np.zeros((bs,), np.float32),
                    "presence_penalty": np.zeros((bs,), np.float32),
                    "seeds": np.full((bs,), -1, np.int32),
                }
                self.run_batch(plan, samp_np)
                n += 1
                if progress_cb is not None:
                    progress_cb(n)
        return n

    def step_key(self, plan: BatchPlan) -> tuple:
        """Identity of the compiled executable a plan will dispatch to
        (kind + padded bucket shapes). The engine uses this to tell a
        first-compile step from a genuinely stuck one (the watchdog must
        not fire on known-first-compile steps)."""
        b = plan.token_ids.shape[0]
        bb = select_bucket(self.bs_buckets, b)
        if plan.kind == "decode":
            max_ctx = int(plan.kv_lens.max()) + plan.horizon
            return ("decode", bb, plan.horizon,
                    self._pages_hint_for(max_ctx))
        return (plan.kind, bb,
                select_bucket(self.lq_buckets, plan.token_ids.shape[1]))

    def run_batch(
        self, plan: BatchPlan, samp_meta_np: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Pad the plan to bucketed shapes, run the compiled step, and return
        (next_tokens [B, K], logprobs [B, K]) for the real (unpadded)
        requests. K = plan.horizon for decode, 1 for prefill."""
        b = plan.token_ids.shape[0]
        bb = select_bucket(self.bs_buckets, b)

        def pad1(x, fill=0):
            out = np.full((bb,), fill, x.dtype)
            out[:b] = x
            return out

        has_seeds = bool(np.any(samp_meta_np.get("seeds", np.array([-1])) >= 0))
        samp = SamplingMetadata(
            temperature=jnp.asarray(pad1(samp_meta_np["temperature"])),
            top_p=jnp.asarray(pad1(samp_meta_np["top_p"], fill=1.0)),
            top_k=jnp.asarray(pad1(samp_meta_np["top_k"], fill=-1)),
            min_p=jnp.asarray(pad1(samp_meta_np["min_p"])),
            frequency_penalty=jnp.asarray(pad1(samp_meta_np["frequency_penalty"])),
            presence_penalty=jnp.asarray(pad1(samp_meta_np["presence_penalty"])),
            seeds=(
                jnp.asarray(pad1(samp_meta_np["seeds"], fill=-1))
                if has_seeds
                else None
            ),
        )
        self._rng_counter += 1
        key = jax.random.fold_in(self.base_key, self._rng_counter)
        all_greedy = bool(np.all(samp_meta_np["temperature"] == 0.0))

        if self.lora_manager is not None and any(
            r.lora_slot for r in plan.reqs
        ):
            samp_l, _ = self.build_samp(plan, samp_meta_np)
            return self._run_lora_batch(plan, samp_l, all_greedy, key)

        has_pen = bool(
            np.any(samp_meta_np["frequency_penalty"] != 0.0)
            or np.any(samp_meta_np["presence_penalty"] != 0.0)
        )
        output_counts = None
        if has_pen:
            counts = np.zeros((bb, self.cfg.vocab_size), np.int32)
            for i, r in enumerate(plan.reqs):
                for t in r.output_ids:
                    counts[i, t] += 1
            output_counts = jnp.asarray(counts)

        vocab_mask = None
        if any(getattr(r, "grammar", None) is not None for r in plan.reqs):
            vm = np.ones((bb, self.cfg.vocab_size), bool)
            for i, r in enumerate(plan.reqs):
                if r.grammar is not None:
                    m = r.grammar.allowed_mask()
                    vm[i, : len(m)] = m
                    vm[i, len(m):] = False
            vocab_mask = jnp.asarray(vm)

        page_table = np.zeros((bb, self.max_pages_per_seq), np.int32)
        page_table[:b] = plan.page_table

        if plan.kind == "verify":
            t = plan.token_ids.shape[1]

            def pad2t(x, fill=0):
                out = np.full((bb, t), fill, x.dtype)
                out[:b] = x
                return out

            vargs = (
                self.params,
                self.kv_cache,
                jnp.asarray(pad2t(plan.token_ids)),
                jnp.asarray(pad2t(plan.positions)),
                jnp.asarray(page_table),
                jnp.asarray(pad1(plan.kv_lens)),
                jnp.asarray(pad1(plan.q_start)),
                jnp.asarray(pad2t(plan.slots, fill=-1)),
            )
            if plan.tree_mask is not None:
                tm = np.zeros((bb, t, t), bool)
                tm[:b] = plan.tree_mask
                return self._run_tree_verify(vargs, jnp.asarray(tm), b)
            if self._verify_h is not None:
                greedy, glp, hidden, self.kv_cache = self._verify_h(*vargs)
                greedy, glp, hidden = jax.device_get((greedy, glp, hidden))
                self.last_hidden = hidden[:b]
            else:
                greedy, glp, _shift_lp, self.kv_cache = self._verify(*vargs)
                greedy, glp = jax.device_get((greedy, glp))
            return greedy[:b], glp[:b]

        if plan.kind == "decode":
            next_tok, logprob = self.issue_decode(
                plan, samp, key, all_greedy, output_counts, vocab_mask,
                page_table,
            )
            next_tok, logprob = jax.device_get((next_tok, logprob))
            return next_tok[:b], logprob[:b]

        if any(r.mm_spans for r in plan.reqs):
            return self._run_mm_prefill(
                plan, page_table, samp, key, all_greedy, output_counts,
                vocab_mask,
            )

        lq = plan.token_ids.shape[1]
        lb = select_bucket(self.lq_buckets, lq)

        def pad2(x, fill=0):
            out = np.full((bb, lb), fill, x.dtype)
            out[:b, :lq] = x
            return out

        sargs = (
            self.params,
            self.kv_cache,
            jnp.asarray(pad2(plan.token_ids)),
            jnp.asarray(pad2(plan.positions)),
            jnp.asarray(page_table),
            jnp.asarray(pad1(plan.kv_lens)),
            jnp.asarray(pad1(plan.q_start)),
            jnp.asarray(pad2(plan.slots, fill=-1)),
            jnp.asarray(pad1(plan.logit_idx)),
            samp,
            key,
        )
        if self._step_h is not None:
            next_tok, logprob, hidden, self.kv_cache = self._step_h(
                *sargs, all_greedy=all_greedy, output_counts=output_counts,
                vocab_mask=vocab_mask,
            )
            next_tok, logprob, hidden = jax.device_get(
                (next_tok, logprob, hidden)
            )
            self.last_hidden = hidden[:b, :lq]
            return next_tok[:b, None], logprob[:b, None]
        next_tok, logprob, self.kv_cache = self._step(
            *sargs,
            all_greedy=all_greedy,
            output_counts=output_counts,
            vocab_mask=vocab_mask,
        )
        next_tok, logprob = jax.device_get((next_tok, logprob))
        return next_tok[:b, None], logprob[:b, None]
