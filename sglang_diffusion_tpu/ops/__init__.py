"""Compute ops: Pallas TPU kernels + XLA reference implementations.

Layout conventions (shared by all backends):

  KV cache (per model, all layers stacked):
      kv_cache: [num_layers, num_pages, page_size, 2 * num_kv_heads, head_dim]
  K lives at even indices of the combined-head axis, V at odd indices
  (the "combined kv heads" layout from the Ragged Paged Attention TPU kernel
  line of work — keeps K and V of one head in one contiguous page tile).

  Page table: [batch, pages_per_seq] int32 page ids.
  Token slot: page_id * page_size + offset_in_page.
"""
