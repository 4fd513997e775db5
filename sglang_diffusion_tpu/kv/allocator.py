"""Host-side KV page allocator.

TPU-native analog of the reference's paged token allocator
(srt/mem_cache/allocator.py:356 PagedTokenToKVPoolAllocator). The device
side is just a big preallocated kv_cache array; pages are logical indices
into it, managed entirely on host (free list). Page 0 is reserved as the
"null" page so padded page-table entries can point somewhere harmless.
"""

from __future__ import annotations

from typing import List


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int):
        assert num_pages > 1
        self.num_pages = num_pages
        self.page_size = page_size
        # page 0 reserved for padding
        self._free: List[int] = list(range(num_pages - 1, 0, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def free_tokens(self) -> int:
        return len(self._free) * self.page_size

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(f"out of KV pages: want {n}, have {len(self._free)}")
        out = self._free[-n:][::-1]
        del self._free[len(self._free) - n :]
        return out

    def try_alloc(self, n: int):
        if n > len(self._free):
            return None
        return self.alloc(n)

    def free(self, pages: List[int]) -> None:
        for p in pages:
            assert 0 < p < self.num_pages, f"bad page {p}"
        self._free.extend(reversed(pages))

    def available_for_tokens(self, tokens: int) -> bool:
        return self.free_tokens >= tokens
