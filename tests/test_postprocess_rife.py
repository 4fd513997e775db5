"""RIFE frame interpolation + video export (diffusion/postprocess.py;
reference analog: multimodal_gen/runtime/postprocess/rife_interpolator.py).

Ground truth is a builder-authored torch re-implementation of the RIFE
4.22.lite IFNet (diffusers/RIFE not fetchable in this env); weights are
shared through params_from_flownet_state_dict so the conv stacks,
PixelShuffle, bilinear resizes, and the border-clamped warp are all
cross-checked against torch's grid_sample/interpolate semantics.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.postprocess import (
    FrameInterpolator,
    ifnet_forward,
    init_params,
    params_from_flownet_state_dict,
    pixel_shuffle,
    save_video,
    warp,
)


# ---------- builder-authored torch RIFE 4.22.lite ----------

def t_conv(i, o):
    return nn.Sequential(nn.Conv2d(i, o, 3, 2, 1), nn.LeakyReLU(0.2))


class TRes(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1)
        self.beta = nn.Parameter(torch.ones(1, c, 1, 1))

    def forward(self, x):
        return F.leaky_relu(self.conv(x) * self.beta + x, 0.2)


class TBlock(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.conv0 = nn.Sequential(t_conv(cin, c // 2), t_conv(c // 2, c))
        self.convblock = nn.Sequential(*[TRes(c) for _ in range(8)])
        self.lastconv = nn.Sequential(
            nn.ConvTranspose2d(c, 52, 4, 2, 1), nn.PixelShuffle(2))

    def forward(self, x, flow, scale):
        x = F.interpolate(x, scale_factor=1.0 / scale, mode="bilinear")
        if flow is not None:
            flow = F.interpolate(flow, scale_factor=1.0 / scale,
                                 mode="bilinear") / scale
            x = torch.cat([x, flow], 1)
        f = self.convblock(self.conv0(x))
        tmp = F.interpolate(self.lastconv(f), scale_factor=scale,
                            mode="bilinear")
        return tmp[:, :4] * scale, tmp[:, 4:5], tmp[:, 5:]


class THead(nn.Module):
    def __init__(self):
        super().__init__()
        self.cnn0 = nn.Conv2d(3, 16, 3, 2, 1)
        self.cnn1 = nn.Conv2d(16, 16, 3, 1, 1)
        self.cnn2 = nn.Conv2d(16, 16, 3, 1, 1)
        self.cnn3 = nn.ConvTranspose2d(16, 4, 4, 2, 1)

    def forward(self, x):
        x = F.leaky_relu(self.cnn0(x), 0.2)
        x = F.leaky_relu(self.cnn1(x), 0.2)
        x = F.leaky_relu(self.cnn2(x), 0.2)
        return self.cnn3(x)


def t_warp(img, flow):
    b, _, h, w = img.shape
    gx = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(b, 1, h, w)
    gy = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(b, 1, h, w)
    grid = torch.cat([gx, gy], 1)
    fl = torch.cat([flow[:, :1] / ((w - 1) / 2.0),
                    flow[:, 1:2] / ((h - 1) / 2.0)], 1)
    return F.grid_sample(img, (grid + fl).permute(0, 2, 3, 1),
                         mode="bilinear", padding_mode="border",
                         align_corners=True)


class TIFNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.block0 = TBlock(15, 192)
        self.block1 = TBlock(28, 128)
        self.block2 = TBlock(28, 64)
        self.block3 = TBlock(28, 32)
        self.encode = THead()

    def forward(self, img0, img1, timestep=0.5):
        ts = torch.full_like(img0[:, :1], timestep)
        f0, f1 = self.encode(img0), self.encode(img1)
        flow = mask = feat = None
        w0, w1 = img0, img1
        for i, scale in enumerate((8, 4, 2, 1)):
            blk = getattr(self, f"block{i}")
            if flow is None:
                flow, mask, feat = blk(
                    torch.cat([img0, img1, f0, f1, ts], 1), None, scale)
            else:
                wf0 = t_warp(f0, flow[:, :2])
                wf1 = t_warp(f1, flow[:, 2:4])
                fd, mask, feat = blk(
                    torch.cat([w0, w1, wf0, wf1, ts, mask, feat], 1),
                    flow, scale)
                flow = flow + fd
            w0 = t_warp(img0, flow[:, :2])
            w1 = t_warp(img1, flow[:, 2:4])
        m = torch.sigmoid(mask)
        return w0 * m + w1 * (1 - m)


def test_warp_matches_grid_sample():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 16, 24)).astype(np.float32)
    flow = (rng.standard_normal((2, 2, 16, 24)) * 3).astype(np.float32)
    ours = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    ref = t_warp(torch.tensor(img), torch.tensor(flow)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 3, 5)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = F.pixel_shuffle(torch.tensor(x), 2).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_ifnet_parity_vs_torch():
    torch.manual_seed(0)
    tm = TIFNet().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = params_from_flownet_state_dict(sd)
    rng = np.random.default_rng(2)
    img0 = rng.random((1, 3, 64, 96)).astype(np.float32)
    img1 = rng.random((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img0), torch.tensor(img1)).numpy()
    out = np.asarray(ifnet_forward(params, jnp.asarray(img0),
                                   jnp.asarray(img1)))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-2)


def test_interpolate_doubles_frame_count():
    interp = FrameInterpolator(init_params(jax.random.PRNGKey(0)))
    frames = [np.full((40, 48, 3), v, np.uint8) for v in (10, 90, 200)]
    out = interp.interpolate(frames, exp=1)
    assert len(out) == 5
    assert all(f.shape == (40, 48, 3) and f.dtype == np.uint8 for f in out)
    out2 = interp.interpolate(frames, exp=2)
    assert len(out2) == 9


def test_save_video_roundtrip(tmp_path):
    frames = [np.full((32, 32, 3), v, np.uint8) for v in (0, 128, 255)]
    path = save_video(frames, str(tmp_path / "clip.mp4"), fps=8)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 100
    import cv2

    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (32, 32, 3)
        n += 1
    cap.release()
    assert n == 3
