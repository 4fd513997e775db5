from sglang_diffusion_tpu.function_call.parser import (
    FunctionCallParser,
    tools_system_prompt,
)

__all__ = ["FunctionCallParser", "tools_system_prompt"]
