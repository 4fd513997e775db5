from sglang_diffusion_tpu.lang.api import ProgramState, function, gen, select

__all__ = ["function", "gen", "select", "ProgramState"]
