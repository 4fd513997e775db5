from sglang_diffusion_tpu.lora.manager import LoRAManager

__all__ = ["LoRAManager"]
