"""Sliding Tile Attention (STA) for video diffusion.

TPU-native analog of the reference's sliding-tile attention backend
(multimodal_gen/runtime/layers/attention/backends/ STA, per
docs/diffusion/performance/attention_backends.md): video tokens attend
only key tiles within a 3D window of their own tile, plus the text tokens;
text tokens keep dense attention. Unlike a masked-dense implementation,
the compute here is actually sparse: tokens are reshaped into tiles, each
query tile gathers its neighbor tiles (static indices — XLA lowers to a
cheap gather) and runs dense attention over that small context, so FLOPs
scale with window volume instead of sequence length squared. The per-tile
attention is a batched dense matmul that maps straight onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _neighbor_table(nt: Tuple[int, int, int], radius: Tuple[int, int, int]):
    """For each tile, the indices of its (2r+1)^3 window neighbors (clamped
    to the grid; clamping produces duplicates which are masked out).
    Returns (idx [NT, K], valid [NT, K])."""
    ntf, nth, ntw = nt
    rf, rh, rw = radius
    offs = [
        (df, dh, dw)
        for df in range(-rf, rf + 1)
        for dh in range(-rh, rh + 1)
        for dw in range(-rw, rw + 1)
    ]
    coords = np.stack(np.meshgrid(
        np.arange(ntf), np.arange(nth), np.arange(ntw), indexing="ij"
    ), axis=-1).reshape(-1, 3)  # [NT, 3]
    idx = np.zeros((len(coords), len(offs)), np.int32)
    valid = np.zeros((len(coords), len(offs)), bool)
    for j, (df, dh, dw) in enumerate(offs):
        f = coords[:, 0] + df
        h = coords[:, 1] + dh
        w = coords[:, 2] + dw
        ok = (
            (f >= 0) & (f < ntf) & (h >= 0) & (h < nth)
            & (w >= 0) & (w < ntw)
        )
        fc = np.clip(f, 0, ntf - 1)
        hc = np.clip(h, 0, nth - 1)
        wc = np.clip(w, 0, ntw - 1)
        idx[:, j] = (fc * nth + hc) * ntw + wc
        valid[:, j] = ok
    return idx, valid


def _tileize(x: jax.Array, grid, tile):
    """[B, T_vid, H, D] -> [B, NT, ts, H, D] with T_vid in (f, h, w) order."""
    b, _, h, d = x.shape
    f, gh, gw = grid
    tf, th, tw = tile
    x = x.reshape(b, f // tf, tf, gh // th, th, gw // tw, tw, h, d)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7, 8)
    nt = (f // tf) * (gh // th) * (gw // tw)
    return x.reshape(b, nt, tf * th * tw, h, d)


def _untileize(x: jax.Array, grid, tile):
    b, nt, ts, h, d = x.shape
    f, gh, gw = grid
    tf, th, tw = tile
    x = x.reshape(b, f // tf, gh // th, gw // tw, tf, th, tw, h, d)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7, 8)
    return x.reshape(b, f * gh * gw, h, d)


def make_sta_attention(grid: Tuple[int, int, int],
                       tile: Tuple[int, int, int],
                       window: Tuple[int, int, int],
                       text_len: int):
    """Build attn(q, k, v, sm_scale) over the joint [text; video] stream.
    grid: video token grid (frames, h, w); tile: tile shape (must divide
    grid); window: neighbor radius in TILES per axis; text_len: leading
    text tokens (dense)."""
    f, gh, gw = grid
    tf, th, tw = tile
    assert f % tf == 0 and gh % th == 0 and gw % tw == 0, (grid, tile)
    nt3 = (f // tf, gh // th, gw // tw)
    nbr_idx_np, nbr_valid_np = _neighbor_table(nt3, window)

    def attn(q, k, v, sm_scale):
        b, t, h, d = q.shape
        t_vid = f * gh * gw
        assert t == text_len + t_vid, (t, text_len, t_vid)
        nbr_idx = jnp.asarray(nbr_idx_np)
        nbr_valid = jnp.asarray(nbr_valid_np)
        qt, qv = q[:, :text_len], q[:, text_len:]
        kt, kv_ = k[:, :text_len], k[:, text_len:]
        vt, vv = v[:, :text_len], v[:, text_len:]

        # ---- text queries: dense over everything ----
        st = jnp.einsum("bthd,bshd->bhts", qt.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
        pt = jax.nn.softmax(st, axis=-1)
        ot = jnp.einsum("bhts,bshd->bthd", pt, v.astype(jnp.float32))

        # ---- video queries: tile-sparse ----
        qtl = _tileize(qv, grid, tile).astype(jnp.float32)  # [B,NT,ts,H,D]
        ktl = _tileize(kv_, grid, tile).astype(jnp.float32)
        vtl = _tileize(vv, grid, tile).astype(jnp.float32)
        # gather neighbor tiles: [B, NT, K, ts, H, D]
        kn = jnp.take(ktl, nbr_idx, axis=1)
        vn = jnp.take(vtl, nbr_idx, axis=1)
        nt, kk, ts = kn.shape[1], kn.shape[2], kn.shape[3]
        kn = kn.reshape(b, nt, kk * ts, h, d)
        vn = vn.reshape(b, nt, kk * ts, h, d)
        s = jnp.einsum("bnthd,bnshd->bnhts", qtl, kn) * sm_scale
        vmask = jnp.repeat(nbr_valid, ts, axis=1)  # [NT, K*ts]
        s = jnp.where(vmask[None, :, None, None, :], s, NEG_INF)
        # text context for every video query
        s_txt = jnp.einsum(
            "bnthd,bshd->bnhts", qtl, kt.astype(jnp.float32)
        ) * sm_scale
        s_all = jnp.concatenate([s_txt, s], axis=-1)
        p = jax.nn.softmax(s_all, axis=-1)
        p_txt, p_vid = p[..., :text_len], p[..., text_len:]
        o = jnp.einsum("bnhts,bshd->bnthd", p_txt, vt.astype(jnp.float32))
        o = o + jnp.einsum("bnhts,bnshd->bnthd", p_vid, vn)
        ov = _untileize(o, grid, tile)  # o: [B, NT, ts, H, D]
        out = jnp.concatenate([ot, ov], axis=1)
        return out.astype(q.dtype)

    return attn


def make_vsa_attention(grid: Tuple[int, int, int],
                       tile: Tuple[int, int, int],
                       sparsity: float,
                       text_len: int):
    """Video Sparse Attention (reference analog:
    multimodal_gen/runtime/layers/attention/backends/video_sparse_attn.py,
    the FastVideo VSA kernel): tokens tile into (tf,th,tw) blocks; a coarse
    mean-pooled block-level attention scores every (query-tile, key-tile)
    pair; each query tile keeps only its top-k key tiles
    (k = ceil((1-sparsity) * num_tiles), per HEAD) and runs dense attention
    over those tokens plus the text prefix. sparsity=0 selects every tile
    and reproduces dense attention exactly.

    TPU design: the selection is a device-side top_k + gather with STATIC
    shapes (k fixed at trace time), so the whole thing jits into one
    executable — no variable-length block lists, no host sync. FLOPs scale
    with (1 - sparsity) * T^2.
    """
    import math

    f, gh, gw = grid
    tf, th, tw = tile
    assert f % tf == 0 and gh % th == 0 and gw % tw == 0, (grid, tile)
    nt = (f // tf) * (gh // th) * (gw // tw)
    topk = max(1, min(nt, math.ceil((1.0 - sparsity) * nt)))

    def attn(q, k, v, sm_scale):
        b, t, h, d = q.shape
        t_vid = f * gh * gw
        assert t == text_len + t_vid, (t, text_len, t_vid)
        qt, qv = q[:, :text_len], q[:, text_len:]
        kt = k[:, :text_len]
        vt = v[:, :text_len]
        kv_ = k[:, text_len:]
        vv = v[:, text_len:]

        # ---- text queries: dense over everything ----
        st = jnp.einsum("bthd,bshd->bhts", qt.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
        pt = jax.nn.softmax(st, axis=-1)
        ot = jnp.einsum("bhts,bshd->bthd", pt, v.astype(jnp.float32))

        # ---- coarse block scores (mean-pooled tiles) ----
        qtl = _tileize(qv, grid, tile).astype(jnp.float32)  # [B,NT,ts,H,D]
        ktl = _tileize(kv_, grid, tile).astype(jnp.float32)
        vtl = _tileize(vv, grid, tile).astype(jnp.float32)
        ts = qtl.shape[2]
        q_mean = qtl.mean(axis=2)  # [B, NT, H, D]
        k_mean = ktl.mean(axis=2)
        blk = jnp.einsum("bnhd,bmhd->bhnm", q_mean, k_mean)  # [B,H,NQ,NK]
        _, sel = jax.lax.top_k(blk, topk)  # [B, H, NQ, K] per-head tiles

        # ---- gather selected key/value tiles ----
        ktl_h = ktl.transpose(0, 3, 1, 2, 4)  # [B, H, NT, ts, D]
        vtl_h = vtl.transpose(0, 3, 1, 2, 4)
        kb = jnp.broadcast_to(
            ktl_h[:, :, None], (b, h, nt, nt, ts, d)
        )
        vb = jnp.broadcast_to(
            vtl_h[:, :, None], (b, h, nt, nt, ts, d)
        )
        idx = sel[..., None, None]  # [B, H, NQ, K, 1, 1]
        kn = jnp.take_along_axis(
            kb, jnp.broadcast_to(idx, (b, h, nt, topk, ts, d)), axis=3
        ).reshape(b, h, nt, topk * ts, d)
        vn = jnp.take_along_axis(
            vb, jnp.broadcast_to(idx, (b, h, nt, topk, ts, d)), axis=3
        ).reshape(b, h, nt, topk * ts, d)

        # ---- fine attention over [text; selected tiles] ----
        qtl_h = qtl.transpose(0, 3, 1, 2, 4)  # [B, H, NQ, ts, D]
        s = jnp.einsum("bhntd,bhnsd->bhnts", qtl_h, kn) * sm_scale
        s_txt = jnp.einsum(
            "bhntd,bshd->bhnts", qtl_h,
            kt.astype(jnp.float32).transpose(0, 1, 2, 3),
        ) * sm_scale
        s_all = jnp.concatenate([s_txt, s], axis=-1)
        p = jax.nn.softmax(s_all, axis=-1)
        p_txt, p_vid = p[..., :text_len], p[..., text_len:]
        o = jnp.einsum("bhnts,bshd->bhntd", p_txt, vt.astype(jnp.float32))
        o = o + jnp.einsum("bhnts,bhnsd->bhntd", p_vid, vn)
        ov = _untileize(o.transpose(0, 2, 3, 1, 4), grid, tile)
        out = jnp.concatenate([ot, ov], axis=1)
        return out.astype(q.dtype)

    return attn
