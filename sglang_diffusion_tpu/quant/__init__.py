from sglang_diffusion_tpu.quant.quantize import (
    dense_maybe_quantized,
    quantize_params,
    quant_partition_specs,
)

__all__ = ["quantize_params", "dense_maybe_quantized", "quant_partition_specs"]
