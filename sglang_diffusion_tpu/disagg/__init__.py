from sglang_diffusion_tpu.disagg.transfer import (
    FakeTransferBackend,
    disaggregated_generate,
)

__all__ = ["FakeTransferBackend", "disaggregated_generate"]
