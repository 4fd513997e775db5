"""Diffusion (image/video) generation runtime.

TPU-native re-design of SGLang-Diffusion (reference:
python/sglang/multimodal_gen/ — DiffGenerator SDK, composed pipelines with
staged execution, DiT model zoo, flow-match schedulers, USP sequence
parallelism, CFG parallelism, OpenAI Images API).

Single-controller: the pipeline is a list of stages operating on a Batch;
the denoising loop is a jit-compiled lax.scan over steps (no per-step host
dispatch), sharded over the ("dp","tp") mesh; sequence parallelism for long
latent sequences shards the token axis and uses all-to-alls inside
attention (Ulysses) — see diffusion/usp.py.
"""
