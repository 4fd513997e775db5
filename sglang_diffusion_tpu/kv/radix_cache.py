"""RadixAttention prefix cache: a page-aligned radix tree over token ids.

Fresh TPU-build implementation of the behavior of the reference's RadixCache
(srt/mem_cache/radix_cache.py:117,285,371,443,578):

- match_prefix: longest page-aligned prefix match, splitting nodes on partial
  edge matches; returns the cached page list and the terminal node.
- insert: dedups an already-present prefix (returns its token length so the
  caller can free the duplicate pages) and stores the new suffix.
- lock_ref: nodes on the path of an in-flight request are locked against
  eviction (inc_lock_ref/dec_lock_ref).
- evict: LRU eviction of unlocked leaves, returning pages to the allocator.

The tree is host-side pure Python (the reference also keeps it host-side;
its C++ variant cpp_radix_tree/ is a later-round port here). Pages are
logical indices into the device KV array, so nothing here touches JAX.
"""

from __future__ import annotations

import heapq
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Tuple


class TreeNode:
    __slots__ = (
        "parent",
        "children",
        "tokens",
        "pages",
        "lock_ref",
        "last_access",
        "host_data",
        "_id",
    )
    _counter = 0

    def __init__(self, parent: Optional["TreeNode"]):
        self.parent = parent
        self.children: Dict[Tuple[int, ...], TreeNode] = {}
        self.tokens: List[int] = []
        self.pages: List[int] = []
        self.lock_ref = 0
        self.last_access = time.monotonic()
        # hierarchical cache: KV content held in host RAM when the node's
        # device pages were reclaimed (None = device-resident)
        self.host_data = None
        TreeNode._counter += 1
        self._id = TreeNode._counter

    @property
    def on_host(self) -> bool:
        return self.host_data is not None

    def __lt__(self, other):  # for heapq
        return self.last_access < other.last_access


class RadixCache:
    def __init__(self, page_size: int, free_pages_fn: Callable[[List[int]], None]):
        self.page_size = page_size
        self.free_pages_fn = free_pages_fn
        self.root = TreeNode(None)
        self.root.lock_ref = 1  # never evict root
        self._evictable_tokens = 0
        self._protected_tokens = 0
        # hierarchical (host) tier — disabled until enable_hicache()
        self._offload_fn = None
        self._restore_fn = None
        self._bytes_per_page = 0
        self._host_limit_bytes = 0
        self.host_bytes = 0
        self.host_tokens = 0
        self.hicache_hits = 0
        # storage tier (kv/storage.py) — disabled until enable_storage()
        self._storage = None
        self._blob_to_bytes = None
        self._bytes_to_blob = None
        self.storage_hits = 0

    def enable_hicache(
        self,
        offload_fn: Callable[[List[int]], object],
        restore_fn: Callable[[object], Optional[List[int]]],
        bytes_per_page: int,
        host_limit_bytes: int,
    ) -> None:
        """Turn on the host tier (reference analog: HiCacheController,
        srt/managers/cache_controller.py:247 — write-through on eviction,
        restore on prefix hit)."""
        self._offload_fn = offload_fn
        self._restore_fn = restore_fn
        self._bytes_per_page = bytes_per_page
        self._host_limit_bytes = host_limit_bytes

    def enable_storage(self, storage, blob_to_bytes, bytes_to_blob) -> None:
        """Turn on the storage tier (reference analog: HiCache storage
        backends, mem_cache/hicache_storage.py): pages that fall out of the
        host tier are written through to content-addressed storage and can
        be re-fetched on a later prefix miss — including across restarts."""
        self._storage = storage
        self._blob_to_bytes = blob_to_bytes
        self._bytes_to_blob = bytes_to_blob

    def _node_prefix(self, node: TreeNode) -> List[int]:
        """Token prefix from root through `node` (exclusive of children)."""
        parts = []
        while node is not None and node is not self.root:
            parts.append(node.tokens)
            node = node.parent
        out: List[int] = []
        for p in reversed(parts):
            out.extend(p)
        return out

    def _spill_to_storage(self, prefix: List[int], tokens: List[int],
                          host_blobs) -> None:
        """Write per-page blobs keyed by the chained prefix hash."""
        if self._storage is None or host_blobs is None:
            return
        from sglang_diffusion_tpu.kv.storage import prefix_page_key

        for j, blob in enumerate(host_blobs):
            upto = prefix + tokens[: (j + 1) * self.page_size]
            self._storage.set(prefix_page_key(upto), self._blob_to_bytes(blob))

    def _fetch_from_storage(self, node: TreeNode, tokens: List[int],
                            pos: int) -> Optional[TreeNode]:
        """On a device+host miss, probe storage for consecutive pages of
        tokens[pos:]; on hits, restore them to device and graft a new node."""
        if self._storage is None:
            return None
        from sglang_diffusion_tpu.kv.storage import prefix_page_key

        prefix = self._node_prefix(node)
        blobs = []
        n = 0
        while pos + (n + 1) * self.page_size <= len(tokens):
            upto = (
                prefix + tokens[pos : pos + (n + 1) * self.page_size]
            )
            data = self._storage.get(prefix_page_key(upto))
            if data is None:
                break
            blobs.append(self._bytes_to_blob(data))
            n += 1
        if not blobs:
            return None
        new_pages = self._restore_fn(blobs) if self._restore_fn else None
        if new_pages is None:
            return None
        child = TreeNode(node)
        child.tokens = list(tokens[pos : pos + n * self.page_size])
        child.pages = list(new_pages)
        node.children[self._edge_key(child.tokens)] = child
        self._evictable_tokens += len(child.tokens)
        self.storage_hits += len(child.tokens)
        return child

    # ------------- helpers -------------
    def _edge_key(self, tokens: List[int]) -> Tuple[int, ...]:
        return tuple(tokens[: self.page_size])

    def _page_count(self, ntokens: int) -> int:
        return ntokens // self.page_size

    @property
    def evictable_tokens(self) -> int:
        return self._evictable_tokens

    @property
    def protected_tokens(self) -> int:
        return self._protected_tokens

    def total_cached_tokens(self) -> int:
        return self._evictable_tokens + self._protected_tokens

    # ------------- core ops -------------
    def match_prefix(self, tokens: List[int]) -> Tuple[List[int], TreeNode]:
        """Longest page-aligned cached prefix. Returns (pages, node)."""
        aligned = len(tokens) // self.page_size * self.page_size
        tokens = list(tokens[:aligned])
        node = self.root
        pages: List[int] = []
        pos = 0
        while pos < len(tokens):
            key = self._edge_key(tokens[pos:])
            child = node.children.get(key)
            if child is None:
                child = self._fetch_from_storage(node, tokens, pos)
                if child is None:
                    break
                child.last_access = time.monotonic()
                pages.extend(child.pages)
                pos += len(child.tokens)
                node = child
                break  # storage probe already consumed the longest run
            # count matching pages along this edge
            n_match = 0
            et = child.tokens
            while (
                (n_match + 1) * self.page_size <= len(et)
                and pos + (n_match + 1) * self.page_size <= len(tokens)
                and et[n_match * self.page_size : (n_match + 1) * self.page_size]
                == tokens[pos + n_match * self.page_size : pos + (n_match + 1) * self.page_size]
            ):
                n_match += 1
            if n_match == 0:
                break
            if n_match * self.page_size < len(et):
                child = self._split_node(node, child, n_match)
            if child.on_host:
                if not self._restore_to_device(child):
                    break  # host tier hit but no device pages available
            child.last_access = time.monotonic()
            pages.extend(child.pages)
            pos += len(child.tokens)
            node = child
        return pages, node

    def _restore_to_device(self, node: TreeNode) -> bool:
        if self._restore_fn is None:
            return False
        new_pages = self._restore_fn(node.host_data)
        if new_pages is None:
            return False
        node.pages = list(new_pages)
        node.host_data = None
        n = len(node.tokens)
        self.host_tokens -= n
        self.host_bytes -= len(node.pages) * self._bytes_per_page
        self._evictable_tokens += n if node.lock_ref == 0 else 0
        if node.lock_ref > 0:
            self._protected_tokens += n
        self.hicache_hits += n
        return True

    def _split_node(self, parent: TreeNode, child: TreeNode, n_pages: int) -> TreeNode:
        """Split `child` after n_pages; returns the new upper node."""
        cut = n_pages * self.page_size
        upper = TreeNode(parent)
        upper.tokens = child.tokens[:cut]
        upper.pages = child.pages[:n_pages]
        upper.lock_ref = child.lock_ref
        upper.last_access = child.last_access
        if child.on_host:  # host blobs are per-page lists; split them too
            upper.host_data = child.host_data[:n_pages]
            child.host_data = child.host_data[n_pages:]
        parent.children[self._edge_key(upper.tokens)] = upper
        child.tokens = child.tokens[cut:]
        child.pages = child.pages[n_pages:]
        child.parent = upper
        upper.children[self._edge_key(child.tokens)] = child
        return upper

    def insert(self, tokens: List[int], pages: List[int]) -> int:
        """Insert a finished sequence. Returns the number of tokens whose
        pages were already cached (duplicates the caller should free)."""
        aligned = len(tokens) // self.page_size * self.page_size
        tokens = list(tokens[:aligned])
        assert len(pages) >= self._page_count(aligned), "not enough pages for tokens"
        pages = list(pages[: self._page_count(aligned)])
        node = self.root
        pos = 0
        while pos < len(tokens):
            key = self._edge_key(tokens[pos:])
            child = node.children.get(key)
            if child is None:
                new = TreeNode(node)
                new.tokens = tokens[pos:]
                new.pages = pages[self._page_count(pos) :]
                node.children[key] = new
                self._evictable_tokens += len(new.tokens)
                return pos
            n_match = 0
            et = child.tokens
            while (
                (n_match + 1) * self.page_size <= len(et)
                and pos + (n_match + 1) * self.page_size <= len(tokens)
                and et[n_match * self.page_size : (n_match + 1) * self.page_size]
                == tokens[pos + n_match * self.page_size : pos + (n_match + 1) * self.page_size]
            ):
                n_match += 1
            if n_match * self.page_size < len(et):
                if n_match == 0:
                    # key collision but first page differs fully — can't happen
                    # since key == first page tokens; treat as no child
                    new = TreeNode(node)
                    new.tokens = tokens[pos:]
                    new.pages = pages[self._page_count(pos) :]
                    node.children[self._edge_key(tokens[pos:])] = new
                    self._evictable_tokens += len(new.tokens)
                    return pos
                child = self._split_node(node, child, n_match)
            child.last_access = time.monotonic()
            pos += len(child.tokens)
            node = child
        return pos

    # ------------- locking -------------
    def inc_lock_ref(self, node: TreeNode) -> None:
        while node is not None and node is not self.root:
            if node.lock_ref == 0 and not node.on_host:
                self._evictable_tokens -= len(node.tokens)
                self._protected_tokens += len(node.tokens)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode) -> None:
        while node is not None and node is not self.root:
            node.lock_ref -= 1
            assert node.lock_ref >= 0
            if node.lock_ref == 0 and not node.on_host:
                self._protected_tokens -= len(node.tokens)
                self._evictable_tokens += len(node.tokens)
            node = node.parent

    # ------------- eviction -------------
    def _device_leafish(self, n: TreeNode) -> bool:
        """Deepest device-resident unlocked nodes: all children (if any)
        live on the host tier."""
        return (
            n is not self.root
            and n.lock_ref == 0
            and not n.on_host
            and all(c.on_host for c in n.children.values())
        )

    def evict(self, num_pages: int) -> int:
        """Reclaim up to num_pages device pages from LRU leaves. With the
        host tier enabled, content is offloaded to host RAM (and still
        serves prefix hits); otherwise it is dropped. Returns pages freed."""
        leaves = [n for n in self._iter_nodes() if self._device_leafish(n)]
        heapq.heapify(leaves)
        evicted = 0
        while leaves and evicted < num_pages:
            leaf = heapq.heappop(leaves)
            n_pages = len(leaf.pages)
            offloaded = False
            if (
                self._offload_fn is not None
                and self.host_bytes + n_pages * self._bytes_per_page
                <= self._host_limit_bytes
            ):
                leaf.host_data = self._offload_fn(leaf.pages)
                offloaded = leaf.host_data is not None
            elif self._storage is not None and self._offload_fn is not None:
                # host tier full: write through to the storage tier instead
                blobs = self._offload_fn(leaf.pages)
                self._spill_to_storage(
                    self._node_prefix(leaf.parent), leaf.tokens, blobs
                )
            self.free_pages_fn(leaf.pages)
            evicted += n_pages
            self._evictable_tokens -= len(leaf.tokens)
            if offloaded:
                leaf.pages = []
                self.host_bytes += n_pages * self._bytes_per_page
                self.host_tokens += len(leaf.tokens)
            else:
                # drop the node (and with it any host-resident children)
                self._drop_subtree_host(leaf)
                parent = leaf.parent
                del parent.children[self._edge_key(leaf.tokens)]
            parent = leaf.parent
            if self._device_leafish(parent):
                heapq.heappush(leaves, parent)
        return evicted

    def _drop_subtree_host(self, node: TreeNode) -> None:
        stack = list(node.children.values())
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if n.on_host:
                # demote to the storage tier rather than losing the KV
                self._spill_to_storage(
                    self._node_prefix(n.parent), n.tokens, n.host_data
                )
                self.host_bytes -= (
                    len(n.host_data) * self._bytes_per_page if n.host_data else 0
                )
                self.host_tokens -= len(n.tokens)

    def _iter_nodes(self):
        stack = [self.root]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(n.children.values())

    # ------------- debug -------------
    def pretty(self) -> str:
        lines = []

        def rec(node, depth):
            for child in node.children.values():
                lines.append(
                    "  " * depth
                    + f"[{len(child.tokens)} tok, {len(child.pages)} pg, lock={child.lock_ref}]"
                )
                rec(child, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)
