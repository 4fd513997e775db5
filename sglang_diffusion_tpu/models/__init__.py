from sglang_diffusion_tpu.models.registry import get_model_cls, register_model

__all__ = ["get_model_cls", "register_model"]
