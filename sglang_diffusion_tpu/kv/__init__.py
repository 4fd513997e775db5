from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache

__all__ = ["PageAllocator", "RadixCache"]
