from sglang_diffusion_tpu.engine.engine import Engine

__all__ = ["Engine"]
