from sglang_diffusion_tpu.utils.common import cdiv, get_logger, round_up

__all__ = ["cdiv", "round_up", "get_logger"]
