from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.config.model_config import ModelConfig

__all__ = ["ServerArgs", "ModelConfig"]
