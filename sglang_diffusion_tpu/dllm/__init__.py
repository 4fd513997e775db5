from sglang_diffusion_tpu.dllm.generator import DLLMGenerator  # noqa: F401
