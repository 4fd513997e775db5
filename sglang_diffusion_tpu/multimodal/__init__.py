from sglang_diffusion_tpu.multimodal.processor import (  # noqa: F401
    ImageProcessor,
    expand_mm_prompt,
)
