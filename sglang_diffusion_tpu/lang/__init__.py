from sglang_diffusion_tpu.lang.api import ProgramState, function, gen, select
from sglang_diffusion_tpu.lang.backend import (  # noqa: F401
    RuntimeEndpoint,
    set_default_backend,
)

__all__ = ["function", "gen", "select", "ProgramState"]
