"""sglang_diffusion_tpu: a TPU-native LLM + diffusion serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the SGLang
serving stack (reference: /root/reference, surveyed in SURVEY.md):

- continuous-batching scheduler with RadixAttention prefix caching over a
  paged KV cache (reference: srt/managers/scheduler.py, srt/mem_cache/)
- persistent compiled decode step with bucketed static shapes instead of
  CUDA graphs (reference: srt/model_executor/cuda_graph_runner.py)
- Pallas ragged paged attention + flash prefill kernels (reference:
  sgl-kernel/csrc/attention/, flashinfer integration)
- SPMD parallelism (tp/dp/ep/sp) over a jax.sharding.Mesh instead of
  NCCL process groups (reference: srt/distributed/parallel_state.py)
- OpenAI-compatible HTTP API (reference: srt/entrypoints/http_server.py)
- diffusion (DiT) pipeline riding the same kernel stack (reference:
  python/sglang/multimodal_gen/)

Single-controller design: one Python process per host drives jit-compiled
SPMD steps; there are no per-device scheduler processes and no ZMQ IPC on
the hot path.
"""

__version__ = "0.1.0"
