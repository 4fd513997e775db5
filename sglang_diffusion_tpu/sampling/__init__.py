from sglang_diffusion_tpu.sampling.params import SamplingParams

__all__ = ["SamplingParams"]
