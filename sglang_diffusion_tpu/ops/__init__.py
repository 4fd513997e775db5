"""Compute ops: Pallas TPU kernels + XLA reference implementations.

Layout conventions (shared by all backends):

  KV cache (per model, all layers stacked):
      kv_cache: [num_layers, num_pages, 2 * num_kv_heads, page_size, head_dim]
  K lives at even indices of the combined-head axis, V at odd indices
  (the "combined kv heads" idea from the Ragged Paged Attention TPU kernel
  line of work). The head axis precedes the in-page token axis so that one
  head's (K,V) page slice [2, page_size, head_dim] is a single contiguous
  DMA from HBM into VMEM — the unit the Pallas kernel streams.

  All ops address the FULL stacked cache with a scalar layer index
  (write scatters carry the layer offset; gathers fuse it). This lets the
  model's layer loop keep the cache as an in-place-updated loop carry —
  never materializing a per-layer copy (a 16-layer 1B model pays ~4 GB/step
  of pure copy traffic otherwise).

  Page table: [batch, pages_per_seq] int32 page ids.
  Token slot: page_id * page_size + offset_in_page.
"""
