"""Multimodal input processing (images).

TPU-native analog of the reference's multimodal processors
(srt/multimodal/processors/, srt/managers/mm_utils.py): decode + resize +
normalize images into pixel tensors, and expand the prompt's image
placeholder token into one slot per image patch token.

Prefix-cache correctness: the expanded placeholder ids are derived from a
content hash of the image bytes (the reference hashes mm items into
input_ids for radix keying, mm_utils.py), so two prompts with different
images never share a radix prefix, while the same image reuses its KV.
The pseudo-ids are only radix keys — the embedding lookup at those
positions is overridden by the projected vision features.
"""

from __future__ import annotations

import base64
import hashlib
import io
from dataclasses import dataclass
from typing import Any, List, Sequence, Tuple

import numpy as np

# CLIP normalization constants (HF CLIPImageProcessor defaults)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass
class MMSpan:
    """One image's slice of the expanded token sequence."""

    offset: int  # start index in input_ids
    length: int  # number of image tokens
    image_index: int  # index into the request's image list


class ImageProcessor:
    """Decode arbitrary image input and produce normalized pixel tensors."""

    def __init__(self, image_size: int, patch_size: int,
                 mean: np.ndarray = CLIP_MEAN, std: np.ndarray = CLIP_STD):
        self.image_size = image_size
        self.patch_size = patch_size
        self.mean = mean
        self.std = std

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    # ------------- decode -------------
    def load(self, image_data: Any) -> Tuple[np.ndarray, bytes]:
        """Returns (rgb float32 [H,W,3] in [0,1], content-hash bytes)."""
        if isinstance(image_data, np.ndarray):
            arr = image_data
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            if arr.shape[-1] == 4:
                arr = arr[..., :3]
            digest = hashlib.sha256(np.ascontiguousarray(arr)).digest()
            return arr.astype(np.float32), digest
        if isinstance(image_data, str):
            if image_data.startswith("data:"):
                image_data = image_data.split(",", 1)[1]
            try:
                raw = base64.b64decode(image_data, validate=True)
            except Exception:
                with open(image_data, "rb") as f:
                    raw = f.read()
        elif isinstance(image_data, (bytes, bytearray)):
            raw = bytes(image_data)
        else:
            raise TypeError(f"unsupported image_data type {type(image_data)}")
        from PIL import Image

        img = Image.open(io.BytesIO(raw)).convert("RGB")
        arr = np.asarray(img, np.float32) / 255.0
        return arr, hashlib.sha256(raw).digest()

    # ------------- resize + normalize -------------
    def _resize_bilinear(self, img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        h, w, _ = img.shape
        if (h, w) == (out_h, out_w):
            return img
        # align_corners=False convention (matches PIL/torch bilinear closely
        # enough for accuracy-neutral preprocessing)
        ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0, 1)[:, None, None]
        wx = np.clip(xs - x0, 0, 1)[None, :, None]
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
        bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
        return top * (1 - wy) + bot * wy

    def preprocess(self, image_data: Any) -> Tuple[np.ndarray, bytes]:
        """-> (pixel_values [3, S, S] float32 normalized, content hash)."""
        arr, digest = self.load(image_data)
        arr = self._resize_bilinear(arr, self.image_size, self.image_size)
        arr = (arr - self.mean) / self.std
        return arr.transpose(2, 0, 1), digest

    def preprocess_batch(self, images: Sequence[Any]) -> Tuple[np.ndarray, List[bytes]]:
        outs, digests = [], []
        for im in images:
            px, d = self.preprocess(im)
            outs.append(px)
            digests.append(d)
        return np.stack(outs), digests


def expand_mm_prompt(
    input_ids: List[int],
    image_token_id: int,
    num_tokens_per_image,  # int, or per-image List[int] (dynamic-res models)
    digests: List[bytes],
    vocab_size: int,
) -> Tuple[List[int], List[MMSpan]]:
    """Replace each placeholder token with that image's token count of
    pseudo-ids derived from its content hash. Returns (ids, spans)."""
    counts = (
        num_tokens_per_image
        if isinstance(num_tokens_per_image, (list, tuple))
        else [num_tokens_per_image] * len(digests)
    )
    out: List[int] = []
    spans: List[MMSpan] = []
    img_idx = 0
    for tok in input_ids:
        if tok == image_token_id:
            if img_idx >= len(digests):
                raise ValueError(
                    f"prompt has more image tokens than images ({len(digests)})"
                )
            n = counts[img_idx]
            seed = int.from_bytes(digests[img_idx][:8], "little")
            rng = np.random.default_rng(seed)
            pseudo = rng.integers(0, vocab_size, size=n)
            spans.append(MMSpan(len(out), n, img_idx))
            out.extend(int(t) for t in pseudo)
            img_idx += 1
        else:
            out.append(tok)
    if img_idx < len(digests):
        raise ValueError(
            f"{len(digests)} images provided but only {img_idx} "
            f"placeholder tokens in prompt"
        )
    return out, spans


class Qwen2VLImageProcessor(ImageProcessor):
    """Dynamic-resolution processor for Qwen2-VL-family models (reference:
    srt/multimodal/processors/qwen_vl.py + HF Qwen2VLImageProcessor):
    smart-resize to multiples of patch*merge within a pixel budget, then
    serialize patches in spatial-merge order with (channel, temporal,
    ph, pw) per-patch layout — exactly the order the vision tower's rotary
    and PatchMerger expect."""

    def __init__(self, patch_size: int = 14, merge_size: int = 2,
                 temporal_patch_size: int = 2,
                 min_pixels: int = 56 * 56, max_pixels: int = 1024 * 1024,
                 mean: np.ndarray = CLIP_MEAN, std: np.ndarray = CLIP_STD):
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal = temporal_patch_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.mean = mean
        self.std = std

    def smart_resize(self, h: int, w: int) -> Tuple[int, int]:
        unit = self.patch_size * self.merge_size
        import math

        hr = max(unit, round(h / unit) * unit)
        wr = max(unit, round(w / unit) * unit)
        if hr * wr > self.max_pixels:
            beta = math.sqrt(h * w / self.max_pixels)
            hr = max(unit, (int(h / beta) // unit) * unit)
            wr = max(unit, (int(w / beta) // unit) * unit)
        elif hr * wr < self.min_pixels:
            beta = math.sqrt(self.min_pixels / (h * w))
            hr = -(-int(h * beta) // unit) * unit
            wr = -(-int(w * beta) // unit) * unit
        return hr, wr

    def preprocess(self, image_data: Any):
        """-> (patches [gh*gw, C*temporal*p*p] float32 in merge order,
        (gh, gw) patch grid, content hash)."""
        arr, digest = self.load(image_data)
        h, w, _ = arr.shape
        hr, wr = self.smart_resize(h, w)
        arr = self._resize_bilinear(arr, hr, wr)
        arr = (arr - self.mean) / self.std
        p, m, tp = self.patch_size, self.merge_size, self.temporal
        gh, gw = hr // p, wr // p
        x = arr.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
        x = np.repeat(x, tp, axis=1)  # static image -> repeated frames
        patches = self._serialize(x[None], gh, gw)  # grid_t = 1
        return patches, (gh, gw), digest

    def _serialize(self, x: np.ndarray, gh: int, gw: int) -> np.ndarray:
        """x [gt, C, tp, H, W] -> merge-order patches
        [gt*gh*gw, C*tp*p*p] (HF Qwen2VLImageProcessor layout)."""
        p, m = self.patch_size, self.merge_size
        gt, c, tp = x.shape[0], x.shape[1], x.shape[2]
        x = x.reshape(gt, c, tp, gh // m, m, p, gw // m, m, p)
        # -> [gt, gh/m, gw/m, m, m, C, tp, p, p]
        x = x.transpose(0, 3, 6, 4, 7, 1, 2, 5, 8)
        return x.reshape(gt * gh * gw, c * tp * p * p).astype(np.float32)

    def preprocess_video(self, frames) -> Tuple[np.ndarray, Tuple[int, int, int], bytes]:
        """frames: [T, H, W, 3] uint8/float or list of frames ->
        (patches [gt*gh*gw, C*tp*p*p], (gt, gh, gw) patch grid, hash).
        Frames pair into temporal groups of temporal_patch_size (the last
        frame repeats when T is odd, matching the HF video processor)."""
        import hashlib

        frames = np.asarray(frames)
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        digest = hashlib.sha256(np.ascontiguousarray(frames)).digest()
        t = frames.shape[0]
        tp = self.temporal
        if t % tp:
            frames = np.concatenate(
                [frames, frames[-1:].repeat(tp - t % tp, axis=0)], axis=0
            )
            t = frames.shape[0]
        h, w = frames.shape[1], frames.shape[2]
        hr, wr = self.smart_resize(h, w)
        proc = np.stack([
            (self._resize_bilinear(f, hr, wr) - self.mean) / self.std
            for f in frames
        ])  # [T, Hr, Wr, C]
        p = self.patch_size
        gh, gw = hr // p, wr // p
        gt = t // tp
        x = proc.transpose(0, 3, 1, 2).reshape(gt, tp, 3, hr, wr)
        x = x.transpose(0, 2, 1, 3, 4)  # [gt, C, tp, H, W]
        return self._serialize(x, gh, gw), (gt, gh, gw), digest


class Gemma3PanScanProcessor(ImageProcessor):
    """Gemma3 pan-and-scan preprocessing (reference:
    srt/multimodal/processors/gemma3.py + HF Gemma3ImageProcessor
    .pan_and_scan): elongated images additionally yield up to
    max_num_crops axis-aligned crops; the model sees the resized full
    image followed by each crop, every one a full mm_tokens block."""

    def __init__(self, image_size: int = 896, patch_size: int = 14,
                 min_crop_size: int = 256, max_num_crops: int = 4,
                 min_ratio_to_activate: float = 1.2):
        super().__init__(image_size, patch_size)
        self.min_crop_size = min_crop_size
        self.max_num_crops = max_num_crops
        self.min_ratio = min_ratio_to_activate

    def _crops(self, arr: np.ndarray) -> List[np.ndarray]:
        h, w = arr.shape[:2]
        if w >= h:
            if w / h < self.min_ratio:
                return []
            n_w = int(np.floor(w / h + 0.5))
            n_w = min(int(np.floor(w / self.min_crop_size)), n_w)
            n_w = min(self.max_num_crops, max(2, n_w))
            n_h = 1
        else:
            if h / w < self.min_ratio:
                return []
            n_h = int(np.floor(h / w + 0.5))
            n_h = min(int(np.floor(h / self.min_crop_size)), n_h)
            n_h = min(self.max_num_crops, max(2, n_h))
            n_w = 1
        cw = int(np.ceil(w / n_w))
        ch = int(np.ceil(h / n_h))
        if min(cw, ch) < self.min_crop_size:
            return []
        return [
            arr[y: y + ch, x: x + cw]
            for y in range(0, n_h * ch, ch)
            for x in range(0, n_w * cw, cw)
        ]

    def preprocess_tiled(self, image_data: Any):
        """-> (pixel stack [1+k, 3, S, S], digest, 1+k)."""
        arr, digest = self.load(image_data)
        views = [arr] + self._crops(arr)
        out = []
        for v in views:
            r = self._resize_bilinear(v, self.image_size, self.image_size)
            out.append(((r - self.mean) / self.std).transpose(2, 0, 1))
        return np.stack(out), digest, len(views)


class InternVLTileProcessor(ImageProcessor):
    """InternVL dynamic tiling (reference:
    srt/multimodal/processors/internvl.py:143 dynamic_preprocess): pick
    the (i, j) tile grid whose aspect ratio best matches the image,
    resize to i*S x j*S, split into i*j tiles, append a thumbnail when
    more than one tile."""

    MEAN = np.array([0.485, 0.456, 0.406], np.float32)  # ImageNet
    STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, image_size: int = 448, patch_size: int = 14,
                 max_num: int = 12, use_thumbnail: bool = True,
                 downsample_ratio: float = 0.5):
        super().__init__(image_size, patch_size,
                         mean=self.MEAN, std=self.STD)
        self.max_num = max_num
        self.use_thumbnail = use_thumbnail
        self.downsample_ratio = downsample_ratio

    @property
    def tokens_per_tile(self) -> int:
        side = self.image_size // self.patch_size
        return int((side * self.downsample_ratio) ** 2)

    def _best_grid(self, h: int, w: int) -> Tuple[int, int]:
        ar = w / h
        ratios = sorted(
            {(i, j) for n in range(1, self.max_num + 1)
             for i in range(1, n + 1) for j in range(1, n + 1)
             if i * j <= self.max_num},
            key=lambda x: x[0] * x[1])
        best, best_diff = (1, 1), float("inf")
        for i, j in ratios:
            diff = abs(ar - i / j)
            if diff < best_diff or (
                    diff == best_diff and i * j > best[0] * best[1]):
                best, best_diff = (i, j), diff
        return best

    def preprocess_tiled(self, image_data: Any):
        """-> (pixel stack [tiles(+thumb), 3, S, S], digest, n_views)."""
        arr, digest = self.load(image_data)
        h, w = arr.shape[:2]
        gi, gj = self._best_grid(h, w)
        s = self.image_size
        resized = self._resize_bilinear(arr, gj * s, gi * s)
        tiles = [
            resized[y: y + s, x: x + s]
            for k in range(gi * gj)
            for y, x in [((k // gi) * s, (k % gi) * s)]
        ]
        if self.use_thumbnail and len(tiles) > 1:
            tiles.append(self._resize_bilinear(arr, s, s))
        out = [((t - self.mean) / self.std).transpose(2, 0, 1)
               for t in tiles]
        return np.stack(out), digest, len(out)
