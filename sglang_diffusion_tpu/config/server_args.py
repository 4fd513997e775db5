"""Server configuration.

TPU-native analog of the reference's ServerArgs dataclass
(reference: srt/server_args.py — a ~6k-line, 300+ flag dataclass; we keep the
same flag *names* where behavior matches so users can migrate, but only carry
flags that are meaningful on TPU).

Flags are auto-exposed on argparse via `ServerArgs.add_cli_args` /
`ServerArgs.from_cli_args`, mirroring the reference's pattern.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ServerArgs:
    # ---- model ----
    model_path: str = ""
    tokenizer_path: Optional[str] = None  # defaults to model_path
    # >1 = TokenizerPool replicas (reference analog: --tokenizer-worker-
    # num / multi_tokenizer_mixin.py worker processes)
    tokenizer_worker_num: int = 1
    trust_remote_code: bool = False
    context_length: Optional[int] = None  # override model's max context
    dtype: str = "bfloat16"  # model compute dtype
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | fp8_e4m3 | fp8_e5m2
    quantization: Optional[str] = None  # None | fp8 | int8 | awq | gptq
    random_seed: int = 0

    # ---- parallelism (mesh axes) ----
    tp_size: int = 1  # tensor parallel (mesh axis "tp")
    dp_size: int = 1  # data parallel (mesh axis "dp")
    pp_size: int = 1  # pipeline parallel (mesh axis "pp"; GPipe in-step)
    pp_microbatches: int = 0  # microbatches per batch (0 -> pp_size)
    ep_size: int = 1  # expert parallel for MoE (reuses "tp" axis slice)
    # DeepSeek-style DP attention (reference: --enable-dp-attention,
    # srt/layers/dp_attention.py): attention runs batch-sharded over ALL
    # devices with replicated attention weights (no KV duplication across
    # TP ranks — the point for MLA's single latent plane), while MoE/dense
    # FFNs stay tensor/expert-sharded; GSPMD inserts the gather/scatter
    # the reference hand-codes in layers/communicator.py
    enable_dp_attention: bool = False
    # attention-TP subgroup under attn-DP (reference: parallel_state.py:1496
    # attn-tp groups): with enable_dp_attention, shard attention over
    # attn_tp_size-way head parallelism while the batch shards over the
    # remaining tp/attn_tp_size * dp ranks; FFN/MoE stay sharded over the
    # FULL model-parallel degree. Needed when attn-DP meets models whose
    # KV heads exceed 1 per device. 1 = plain attn-DP (replicated attn).
    attn_tp_size: int = 1
    # context parallelism for long prefill (reference: attn-CP groups,
    # parallel_state.py:1503 + NSA seq-split prefill): the prefill chunk's
    # token axis is sharded over every device; GSPMD partitions the QKV/FFN
    # matmuls by sequence and gathers KV for attention
    enable_context_parallel: bool = False
    # diffusion-only sequence parallel degrees (Ulysses x ring), see
    # reference multimodal_gen/runtime/server_args.py:219-231
    ulysses_degree: int = 1
    ring_degree: int = 1
    enable_cfg_parallel: bool = False

    # ---- memory / KV cache ----
    page_size: int = 64  # tokens per KV page (TPU-friendly: multiple of 8)
    mem_fraction_static: float = 0.85  # fraction of HBM for weights+KV
    max_total_tokens: Optional[int] = None  # KV pool size override (tokens)
    max_running_requests: int = 256
    max_prefill_tokens: int = 8192  # per-batch prefill token budget
    chunked_prefill_size: int = 4096  # -1 disables chunking
    disable_radix_cache: bool = False
    # hierarchical KV cache: evicted radix pages spill to host RAM and are
    # restored on prefix hits (reference: HiCache, managers/cache_controller)
    enable_hierarchical_cache: bool = False
    hicache_host_size_mb: int = 4096
    # tier-3 KV storage (reference: --hicache-storage-backend, kv/storage.py)
    # EVS video token pruning rate in [0, 1) (reference srt/multimodal/evs;
    # 0 = off). Drops temporally-redundant merged video tokens post-encode.
    video_pruning_rate: float = 0.0
    hicache_storage_backend: Optional[str] = None  # None | "file"
    hicache_storage_path: str = "/tmp/sgld_kv_storage"
    hicache_storage_size_mb: int = 16384

    # ---- scheduling ----
    schedule_policy: str = "lpm"  # lpm | fcfs | lof | random
    schedule_conservativeness: float = 1.0
    stream_interval: int = 1
    enable_overlap_schedule: bool = True
    # max decode steps fused into one compiled call (device-side token
    # feedback via lax.scan — the TPU analog of the reference's overlap
    # FutureMap + CUDA-graph replay; amortizes host->device dispatch)
    # dLLM (LLaDA-style masked-diffusion) decoding (reference: srt/dllm/)
    dllm_block_size: int = 32
    dllm_algorithm: str = "low_confidence"  # low_confidence | joint_threshold
    decode_horizon: int = 16
    # pipeline consecutive fused decode calls: issue call N+1 from call N's
    # device-resident last tokens before fetching N's results (hides the
    # host roundtrip; the full cross-call analog of the reference's
    # overlap scheduler). Default ON since round 5 — output-identical
    # (tests/test_decode_pipelining.py) and the serving loop streams
    # per-window via the engine stream_hook.
    enable_decode_pipelining: bool = True
    # decode batch-size buckets for the compiled decode step (analog of CUDA
    # graph batch sizes, reference srt/model_executor/cuda_graph_runner.py:434)
    decode_bs_buckets: List[int] = field(default_factory=lambda: [8, 16, 32, 64, 128, 256])
    # prefill token-count buckets for the compiled prefill step
    prefill_token_buckets: List[int] = field(
        default_factory=lambda: [512, 1024, 2048, 4096, 8192]
    )

    # ---- kernels ----
    attention_backend: str = "auto"  # auto | pallas | xla
    disable_jit: bool = False

    # ---- server ----
    host: str = "127.0.0.1"
    port: int = 30000
    served_model_name: Optional[str] = None
    api_key: Optional[str] = None

    # ---- observability / robustness ----
    log_level: str = "info"
    enable_metrics: bool = False
    # model-family tool-call format (reference: --tool-call-parser)
    tool_call_parser: Optional[str] = None
    # thinking-model reasoning separation (reference: --reasoning-parser,
    # srt/parser/reasoning_parser.py): deepseek-r1/qwen3/kimi/glm45/...
    reasoning_parser: Optional[str] = None
    # Hunyuan3D image-to-mesh serving: register /v1/meshes routes backed
    # by a Hunyuan3DPipeline (reference: mesh_api.py mounted when the
    # hunyuan3d pipeline is loaded). "default" = true hunyuan3d-2.0 dims
    # with random weights; a path = diffusers-style checkpoint directory.
    mesh_model: Optional[str] = None
    # OTel request tracing (reference: --enable-trace, srt/observability/)
    enable_trace: bool = False
    trace_exporter: str = "memory"  # memory | console | otlp
    otlp_traces_endpoint: Optional[str] = None
    show_time_cost: bool = False
    # dump each step's tokens/logprobs to npz for the cross-run comparator
    # (reference: srt/debug_utils/dumper.py + comparator/)
    debug_dump_dir: Optional[str] = None
    # batch-invariant deterministic inference (reference:
    # srt/batch_invariant_ops): pin decode/prefill to ONE executable
    # (bs/chunk/page-hint buckets collapsed to maxima) so per-row results
    # are bit-stable regardless of batch composition. Costs padding FLOPs.
    enable_deterministic_inference: bool = False
    # abort requests stuck too long (0 = disabled; reference:
    # scheduler._abort_on_waiting_timeout / _abort_on_running_timeout)
    waiting_timeout_s: float = 0.0
    running_timeout_s: float = 0.0
    watchdog_timeout_s: float = 300.0  # log if one step exceeds this

    # ---- sampling defaults ----
    max_new_tokens_default: int = 128

    # ---- speculative decoding ----
    # None | ngram | eagle | mtp (DeepSeek-V3 NextN head) | draft_model
    speculative_algorithm: Optional[str] = None
    speculative_num_draft_tokens: int = 4
    # EAGLE draft head checkpoint (safetensors dir); random-init if unset
    speculative_draft_model_path: Optional[str] = None
    # EAGLE tree drafting: keep the top-K first-step candidates as sibling
    # branches in the verify tree (1 = chain drafting)
    speculative_eagle_topk: int = 1
    # fused multi-round spec decode (spec/fused_eagle.py): draft+verify+
    # accept R rounds per device dispatch, pipelined across calls
    # (reference analog: overlap-capable eagle_worker_v2.py). 0 = auto
    # (decode_horizon // (k+1)). Requires enable_decode_pipelining.
    speculative_fused_rounds: int = 0

    # ---- LoRA ----
    lora_paths: List[str] = field(default_factory=list)
    max_loras_per_batch: int = 4

    # ---- disaggregation ----
    disaggregation_mode: str = "null"  # null | prefill | decode

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.page_size % 8 != 0:
            raise ValueError(f"page_size must be a multiple of 8 (got {self.page_size})")
        if self.chunked_prefill_size > 0 and self.chunked_prefill_size % self.page_size != 0:
            # round up to page multiple so chunk boundaries align with pages
            self.chunked_prefill_size = (
                (self.chunked_prefill_size + self.page_size - 1) // self.page_size
            ) * self.page_size
        if self.schedule_policy not in ("lpm", "fcfs", "lof", "random"):
            raise ValueError(f"unknown schedule_policy {self.schedule_policy}")
        if self.kv_cache_dtype not in ("auto", "bfloat16", "fp8_e4m3", "fp8_e5m2"):
            raise ValueError(f"unknown kv_cache_dtype {self.kv_cache_dtype}")
        self.decode_bs_buckets = sorted(set(self.decode_bs_buckets))
        self.prefill_token_buckets = sorted(set(self.prefill_token_buckets))

    # -- CLI integration ------------------------------------------------
    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser) -> None:
        parser.add_argument(
            "--config", default=None,
            help="YAML/JSON config file of flag values (CLI overrides)",
        )
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            default = f.default if f.default is not dataclasses.MISSING else None
            if f.default_factory is not dataclasses.MISSING:  # type: ignore
                default = f.default_factory()  # type: ignore
            if f.type in ("bool", bool):
                parser.add_argument(name, action="store_true", default=default)
            elif f.type in ("List[str]", List[str]):
                parser.add_argument(name, nargs="*", default=default)
            elif f.type in ("List[int]", List[int]):
                parser.add_argument(name, nargs="*", type=int, default=default)
            else:
                typ = {"int": int, "float": float, "str": str,
                       "Optional[int]": int, "Optional[str]": str,
                       "Optional[float]": float}.get(str(f.type), str)
                parser.add_argument(name, type=typ, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in vars(args).items() if k in names}
        cfg_path = getattr(args, "config", None)
        if cfg_path:
            file_kw = cls.load_config_file(cfg_path)
            # CLI flags that differ from the dataclass default override the
            # file (reference: server_args_config_parser.py precedence)
            defaults = {}
            for f in dataclasses.fields(cls):
                if f.default is not dataclasses.MISSING:
                    defaults[f.name] = f.default
                elif f.default_factory is not dataclasses.MISSING:  # type: ignore
                    defaults[f.name] = f.default_factory()  # type: ignore
            for k, v in file_kw.items():
                if k in names and kw.get(k) == defaults.get(k):
                    kw[k] = v
        return cls(**kw)

    @staticmethod
    def load_config_file(path: str) -> dict:
        """YAML or JSON config file with flag names as keys (dashes or
        underscores; reference: srt/server_args_config_parser.py)."""
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")):
            import yaml

            data = yaml.safe_load(text) or {}
        else:
            data = json.loads(text or "{}")
        return {k.replace("-", "_"): v for k, v in data.items()}

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def get_num_devices() -> int:
    import jax

    return jax.device_count()
