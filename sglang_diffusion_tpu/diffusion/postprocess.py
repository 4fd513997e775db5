"""Video postprocess: RIFE frame interpolation + MP4 export.

Reference analog: multimodal_gen/runtime/postprocess/rife_interpolator.py
(vendored torch RIFE 4.22.lite) — re-implemented here as a functional JAX
network (NCHW convs via lax.conv_general_dilated, bilinear warping as a
clamped gather, PixelShuffle as reshape/transpose) so interpolation runs
on the TPU next to the diffusion pipeline instead of on a CUDA side
model.

Architecture (RIFE 4.22.lite IFNet):
- Head: 3->16 stride-2 conv, two 16->16 convs, 16->4 transpose conv back
  to full res (leaky-relu 0.2 between).
- 4 IFBlocks at scales [8, 4, 2, 1]; each: bilinear downscale, conv0
  (two stride-2 convs), 8 ResConv residual blocks (conv*beta + x),
  lastconv (ConvTranspose2d to 4*13ch + PixelShuffle(2)) -> bilinear
  upscale; outputs flow(4) / mask(1) / feat(8); flow accumulates across
  scales and warps both frames + features for the next block.
- final frame: sigmoid(mask)-blended warp of the two inputs.

Weights load from the public RIFE "flownet" state dict
(params_from_flownet_state_dict); random-init works for tests.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

SCALES = (8, 4, 2, 1)
_BLOCK_C = (192, 128, 64, 32)
_BLOCK_IN = (7 + 8, 8 + 4 + 8 + 8, 8 + 4 + 8 + 8, 8 + 4 + 8 + 8)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def conv2d(x, w, b, stride=1, padding=1, dilation=1):
    """NCHW conv; w [O, I, kh, kw]."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def conv_transpose2d(x, w, b, stride=2, padding=1):
    """NCHW ConvTranspose2d torch semantics; w [I, O, kh, kw].
    Implemented as an input-dilated conv with the spatially-flipped,
    IO-swapped kernel (exact torch equivalence: out = (in-1)*s - 2p + k)."""
    k = w.shape[2]
    w_t = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # [O, I, kh, kw]
    out = jax.lax.conv_general_dilated(
        x, w_t, (1, 1), [(k - 1 - padding, k - 1 - padding)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def resize_bilinear(x, h, w):
    """align_corners=False bilinear (torch F.interpolate default ==
    jax.image half-pixel centers; antialias OFF to match torch's
    point-sampled downscale)."""
    return jax.image.resize(x, (x.shape[0], x.shape[1], h, w), "bilinear",
                            antialias=False)


def pixel_shuffle(x, r):
    b, c, h, w = x.shape
    x = x.reshape(b, c // (r * r), r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, c // (r * r), h * r, w * r)


def warp(img, flow):
    """grid_sample(bilinear, border, align_corners=True) with the RIFE
    base grid: sample img at (x + flow_x, y + flow_y), clamped."""
    b, c, h, w = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    px = gx[None] + flow[:, 0]
    py = gy[None] + flow[:, 1]
    px = jnp.clip(px, 0.0, w - 1.0)
    py = jnp.clip(py, 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = px - x0
    wy = py - y0

    def gather(yy, xx):
        idx = (yy * w + xx).astype(jnp.int32)  # [B, H, W]
        flat = img.reshape(b, c, h * w)
        return jnp.take_along_axis(
            flat, idx.reshape(b, 1, h * w), axis=2
        ).reshape(b, c, h, w)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


# ---------------- parameter init / ingest ----------------

def _conv_p(rng, o, i, k=3):
    w = jax.random.normal(rng, (o, i, k, k), jnp.float32)
    return {"w": w * (1.0 / np.sqrt(i * k * k)), "b": jnp.zeros((o,))}


def init_params(rng) -> Dict:
    ks = iter(jax.random.split(rng, 64))
    p = {"encode": {
        "cnn0": _conv_p(next(ks), 16, 3),
        "cnn1": _conv_p(next(ks), 16, 16),
        "cnn2": _conv_p(next(ks), 16, 16),
        "cnn3": {"w": jax.random.normal(next(ks), (16, 4, 4, 4)) * 0.05,
                 "b": jnp.zeros((4,))},
    }}
    for bi, (cin, c) in enumerate(zip(_BLOCK_IN, _BLOCK_C)):
        blk = {
            "conv0_0": _conv_p(next(ks), c // 2, cin),
            "conv0_1": _conv_p(next(ks), c, c // 2),
            "res": [
                {**_conv_p(next(ks), c, c), "beta": jnp.ones((c,))}
                for _ in range(8)
            ],
            "last": {"w": jax.random.normal(next(ks), (c, 52, 4, 4)) * 0.02,
                     "b": jnp.zeros((52,))},
        }
        p[f"block{bi}"] = blk
    return p


def params_from_flownet_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Ingest the public RIFE flownet checkpoint ('module.' prefix
    stripped; keys like block0.conv0.0.0.weight)."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}

    def cp(pre):
        return {"w": jnp.asarray(sd[pre + ".weight"]),
                "b": jnp.asarray(sd[pre + ".bias"])}

    p = {"encode": {
        "cnn0": cp("encode.cnn0"),
        "cnn1": cp("encode.cnn1"),
        "cnn2": cp("encode.cnn2"),
        "cnn3": cp("encode.cnn3"),
    }}
    for bi in range(4):
        b = f"block{bi}"
        blk = {
            "conv0_0": cp(f"{b}.conv0.0.0"),
            "conv0_1": cp(f"{b}.conv0.1.0"),
            "res": [
                {**cp(f"{b}.convblock.{ri}.conv"),
                 "beta": jnp.asarray(
                     sd[f"{b}.convblock.{ri}.beta"]).reshape(-1)}
                for ri in range(8)
            ],
            "last": cp(f"{b}.lastconv.0"),
        }
        p[b] = blk
    return p


# ---------------- forward ----------------

def _head(p, x):
    x = _lrelu(conv2d(x, p["cnn0"]["w"], p["cnn0"]["b"], stride=2))
    x = _lrelu(conv2d(x, p["cnn1"]["w"], p["cnn1"]["b"]))
    x = _lrelu(conv2d(x, p["cnn2"]["w"], p["cnn2"]["b"]))
    return conv_transpose2d(x, p["cnn3"]["w"], p["cnn3"]["b"])


def _ifblock(p, x, flow, scale):
    h, w = x.shape[2], x.shape[3]
    hs, ws = h // scale, w // scale
    x = resize_bilinear(x, hs, ws)
    if flow is not None:
        flow = resize_bilinear(flow, hs, ws) / scale
        x = jnp.concatenate([x, flow], axis=1)
    f = _lrelu(conv2d(x, p["conv0_0"]["w"], p["conv0_0"]["b"], stride=2))
    f = _lrelu(conv2d(f, p["conv0_1"]["w"], p["conv0_1"]["b"], stride=2))
    for rp in p["res"]:
        f = _lrelu(conv2d(f, rp["w"], rp["b"])
                   * rp["beta"][None, :, None, None] + f)
    tmp = conv_transpose2d(f, p["last"]["w"], p["last"]["b"])
    tmp = pixel_shuffle(tmp, 2)
    tmp = resize_bilinear(tmp, h, w)
    return tmp[:, :4] * scale, tmp[:, 4:5], tmp[:, 5:]


def ifnet_forward(params, img0, img1, timestep: float = 0.5):
    """img0/img1 [B, 3, H, W] in [0,1]; H, W divisible by 32.
    Returns the interpolated frame [B, 3, H, W]."""
    ts = jnp.full_like(img0[:, :1], timestep)
    f0 = _head(params["encode"], img0)
    f1 = _head(params["encode"], img1)
    flow = mask = feat = None
    warped0, warped1 = img0, img1
    for i, scale in enumerate(SCALES):
        bp = params[f"block{i}"]
        if flow is None:
            flow, mask, feat = _ifblock(
                bp, jnp.concatenate([img0, img1, f0, f1, ts], 1), None,
                scale)
        else:
            wf0 = warp(f0, flow[:, :2])
            wf1 = warp(f1, flow[:, 2:4])
            fd, mask, feat = _ifblock(
                bp,
                jnp.concatenate(
                    [warped0, warped1, wf0, wf1, ts, mask, feat], 1),
                flow, scale)
            flow = flow + fd
        warped0 = warp(img0, flow[:, :2])
        warped1 = warp(img1, flow[:, 2:4])
    m = jax.nn.sigmoid(mask)
    return warped0 * m + warped1 * (1 - m)


class FrameInterpolator:
    """2^n-x frame-rate upsampling by recursive midpoint interpolation
    (reference analog: FrameInterpolator.interpolate)."""

    def __init__(self, params=None, rng=None):
        self.params = params if params is not None else init_params(
            rng if rng is not None else jax.random.PRNGKey(0))
        self._fwd = jax.jit(ifnet_forward)

    @staticmethod
    def _pad32(x):
        h, w = x.shape[2], x.shape[3]
        ph = (-h) % 32
        pw = (-w) % 32
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)), "edge")
        return x, h, w

    def midpoint(self, frame0: np.ndarray, frame1: np.ndarray) -> np.ndarray:
        """frames [H, W, 3] uint8 or f32 [0,1] -> midpoint frame."""
        def prep(f):
            f = np.asarray(f)
            if f.dtype == np.uint8:
                f = f.astype(np.float32) / 255.0
            return jnp.asarray(f.transpose(2, 0, 1)[None])

        x0, h, w = self._pad32(prep(frame0))
        x1, _, _ = self._pad32(prep(frame1))
        out = self._fwd(self.params, x0, x1)
        out = np.asarray(out)[0, :, :h, :w].transpose(1, 2, 0)
        return np.clip(out, 0.0, 1.0)

    def interpolate(self, frames: List[np.ndarray],
                    exp: int = 1) -> List[np.ndarray]:
        """Insert 2^exp - 1 frames between each pair."""
        for _ in range(exp):
            out = []
            for a, b in zip(frames[:-1], frames[1:]):
                out.append(a)
                mid = self.midpoint(a, b)
                if np.asarray(a).dtype == np.uint8:
                    mid = (mid * 255.0 + 0.5).astype(np.uint8)
                out.append(mid)
            out.append(frames[-1])
            frames = out
        return frames


def interpolate_video_frames(frames: List[np.ndarray], exp: int = 1,
                             params=None) -> List[np.ndarray]:
    return FrameInterpolator(params).interpolate(frames, exp)


# ---------------- video export ----------------

def save_video(frames: List[np.ndarray], path: str, fps: float = 16.0
               ) -> str:
    """Write frames ([H, W, 3] uint8 RGB) to disk. .mp4 via OpenCV's
    mp4v writer when available; falls back to an MJPEG .avi via PIL.
    Reference analog: the mp4 save in multimodal_gen's output stage."""
    frames = [np.ascontiguousarray(np.asarray(f, np.uint8)) for f in frames]
    h, w = frames[0].shape[:2]
    try:
        import cv2

        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if writer.isOpened():
            for f in frames:
                writer.write(f[:, :, ::-1])  # RGB -> BGR
            writer.release()
            return path
    except ImportError:
        pass
    # MJPEG-in-AVI fallback: JPEG frames in a minimal AVI container
    import io
    import struct

    from PIL import Image

    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=92)
        d = buf.getvalue()
        if len(d) % 2:
            d += b"\0"
        jpegs.append(d)

    def chunk(tag, data):
        return tag + struct.pack("<I", len(data)) + data

    def lst(tag, data):
        return chunk(b"LIST", tag + data)

    n = len(jpegs)
    avih = struct.pack("<14I", int(1e6 / fps), 0, 0, 0x10, n, 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<10I", 0, 0, 0, 1,
                                            int(fps), 0, n, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_items = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_items)
    idx = b""
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(j))
        off += 8 + len(j)
    riff = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    avi_path = path if path.endswith(".avi") else path + ".avi"
    with open(avi_path, "wb") as fh:
        fh.write(chunk(b"RIFF", riff))
    return avi_path
