"""Composed diffusion pipeline: staged execution.

Reference analog: multimodal_gen/runtime/pipelines_core/
(ComposedPipelineBase.forward:596 runs stages in order; stage classes under
stages/ — InputValidation -> TextEncoding -> TimestepPreparation ->
LatentPreparation -> Denoising -> Decoding). The TPU redesign keeps the
stage structure (it is the extension surface for model families) but the
Denoising stage compiles the entire step loop into one lax.scan with CFG
batch doubling — no per-step host dispatch (the reference loops in Python,
stages/denoising.py:966).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.diffusion.models.dit import (
    DiTConfig,
    MMDiT,
    patchify,
    patchify_video,
    unpatchify,
    unpatchify_video,
)
from sglang_diffusion_tpu.diffusion.models.text_encoder import (
    TextEncoder,
    TextEncoderConfig,
)
from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig, VAEDecoder
from sglang_diffusion_tpu.diffusion.scheduling import (
    FlowMatchEulerScheduler,
    get_scheduler,
)
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("diffusion")


def _select_dit_attention(cfg: DiTConfig, sp_mesh=None, backend: str = "auto"):
    """Backend selection (reference analog: layers/attention/selector.py):
    Ulysses sequence-parallel attention when an "sp" mesh is given, "sage"
    INT8 attention on request, Pallas flash attention on TPU when head_dim
    is lane-aligned, einsum otherwise."""
    import jax as _jax

    if sp_mesh is not None and sp_mesh.shape.get("sp", 1) > 1:
        from sglang_diffusion_tpu.diffusion.usp import ulysses_attention

        return lambda q, k, v, s: ulysses_attention(q, k, v, s, sp_mesh)
    if backend == "sage":
        from sglang_diffusion_tpu.diffusion.sage_attention import (
            sage_attention,
        )

        return sage_attention
    if _jax.default_backend() == "tpu" and cfg.head_dim % 128 == 0:
        from sglang_diffusion_tpu.ops.flash_pallas import flash_attention

        return lambda q, k, v, s: flash_attention(q, k, v, s, causal=False)
    from sglang_diffusion_tpu.diffusion.models.dit import joint_attention as _ja

    return _ja


@dataclass
class GenerationParams:
    """Reference analog: configs/sample/sampling_params.py:83."""

    prompt: Any = ""  # str | List[str]
    negative_prompt: str = ""
    height: int = 256
    width: int = 256
    num_inference_steps: int = 20
    guidance_scale: float = 1.0  # 1.0 = no CFG
    seed: int = 0
    num_images: int = 1
    num_frames: int = 0  # 0 = image; >0 = video (frames at 8x temporal)
    # image-to-image: start from an encoded input image instead of pure
    # noise; strength in (0, 1] controls how much of the schedule runs
    # (reference analog: qwen-image-edit / images/edits pipelines)
    image: Any = None  # np.ndarray [H, W, 3] uint8
    strength: float = 0.6
    # scheduler: "euler" (flow-match Euler) or "unipc" (order-2 UniPC,
    # the reference's Wan default)
    sampler: str = "euler"
    # DMD distilled denoising (reference: pipelines_core/stages/
    # denoising_dmd.py + TurboWan configs): a FIXED short timestep list
    # (e.g. [988, 932, 852, 608]) replaces the sigma schedule; each step
    # predicts the clean video and re-noises to the next level. No CFG.
    dmd_steps: Any = None  # list[int] | None

    def __post_init__(self):
        if self.height % 16 or self.width % 16:
            raise ValueError("height/width must be multiples of 16")
        if self.num_inference_steps < 1:
            raise ValueError("num_inference_steps must be >= 1")


@dataclass
class DiffusionBatch:
    """Mutable state threaded through the stages."""

    params: GenerationParams
    prompts: List[str] = field(default_factory=list)
    prompt_ids: Optional[np.ndarray] = None
    neg_ids: Optional[np.ndarray] = None
    text_emb: Optional[jax.Array] = None
    neg_emb: Optional[jax.Array] = None
    sigmas: Optional[np.ndarray] = None
    latents: Optional[jax.Array] = None
    grid_hw: Optional[Tuple[int, int]] = None
    images: Optional[np.ndarray] = None
    stage_timings: Dict[str, float] = field(default_factory=dict)


class Stage:
    name = "stage"

    def __call__(self, batch: DiffusionBatch, pipe: "DiffusionPipeline") -> None:
        raise NotImplementedError


class InputValidationStage(Stage):
    name = "input_validation"

    def __call__(self, batch, pipe):
        p = batch.params
        prompts = p.prompt if isinstance(p.prompt, list) else [p.prompt]
        prompts = [pr for pr in prompts for _ in range(p.num_images)]
        batch.prompts = prompts
        if p.height * p.width > 4096 * 4096:
            raise ValueError("resolution too large")


class TextEncodingStage(Stage):
    name = "text_encoding"

    def __call__(self, batch, pipe):
        max_len = pipe.te_max_len
        ids = np.zeros((len(batch.prompts), max_len), np.int32)
        for i, pr in enumerate(batch.prompts):
            toks = pipe.tokenize(pr)[:max_len]
            ids[i, : len(toks)] = toks
        batch.prompt_ids = ids
        emb, _ = pipe.text_encode(jnp.asarray(ids))
        batch.text_emb = emb
        if batch.params.guidance_scale > 1.0:
            nids = np.zeros_like(ids)
            ntoks = pipe.tokenize(batch.params.negative_prompt)[:max_len]
            nids[:, : len(ntoks)] = ntoks
            batch.neg_ids = nids
            nemb, _ = pipe.text_encode(jnp.asarray(nids))
            batch.neg_emb = nemb


class TimestepPreparationStage(Stage):
    name = "timestep_preparation"

    def __call__(self, batch, pipe):
        p = batch.params
        seq_len = (p.height // 8 // pipe.dit_cfg.patch_size) * (
            p.width // 8 // pipe.dit_cfg.patch_size
        ) * max(1, p.num_frames)
        if p.sampler != "euler":
            pipe.scheduler = get_scheduler(
                p.sampler, use_dynamic_shifting=True
            )
        batch.sigmas = pipe.scheduler.set_timesteps(
            p.num_inference_steps, seq_len=seq_len
        )


class LatentPreparationStage(Stage):
    name = "latent_preparation"

    def __call__(self, batch, pipe):
        p = batch.params
        b = len(batch.prompts)
        lat_h, lat_w = p.height // 8, p.width // 8
        key = jax.random.PRNGKey(p.seed)
        wan_cfg = getattr(pipe, "wan_vae_cfg", None)
        if p.num_frames > 0:
            f_lat = p.num_frames
            ch = pipe.vae_cfg.latent_channels
            if wan_cfg is not None:
                # real AutoencoderKLWan: num_frames are PIXEL frames; the
                # 3D causal VAE compresses 1+4k pixel frames -> 1+k latents
                f_lat = 1 + (p.num_frames - 1) // wan_cfg.temporal_compression
                ch = wan_cfg.z_dim
            shape = (b, f_lat, lat_h, lat_w, ch)
        else:
            shape = (b, lat_h, lat_w, pipe.vae_cfg.latent_channels)
        noise = jax.random.normal(key, shape, jnp.float32)
        if p.image is not None:
            img = jnp.asarray(p.image, jnp.float32) / 127.5 - 1.0
            if img.ndim == 3:
                img = img[None]
            img = jnp.broadcast_to(img, (b,) + img.shape[1:])
            z = pipe.vae_encode(img)
            if p.num_frames > 0:
                # image-to-video (reference analog: Wan-I2V pipelines):
                # every frame starts from the conditioning image's latent
                # noised to the start sigma with per-frame independent
                # noise. The schedule is strength-trimmed like i2i — at the
                # full schedule's sigma=1 a flow-match init latent carries
                # no signal (latents = pure noise).
                z = jnp.broadcast_to(z[:, None], shape)
                start = int(round((1.0 - p.strength) * p.num_inference_steps))
                start = min(start, p.num_inference_steps - 1)
                batch.sigmas = batch.sigmas[start:]
                sigma0 = float(batch.sigmas[0])
                batch.latents = FlowMatchEulerScheduler.scale_noise(
                    z, sigma0, noise
                )
                return
            # i2i: encode the input image and noise it to the start sigma
            start = int(round((1.0 - p.strength) * p.num_inference_steps))
            start = min(start, p.num_inference_steps - 1)
            batch.sigmas = batch.sigmas[start:]
            sigma0 = float(batch.sigmas[0])
            batch.latents = FlowMatchEulerScheduler.scale_noise(z, sigma0, noise)
        else:
            batch.latents = noise


class DenoisingStage(Stage):
    name = "denoising"

    def __call__(self, batch, pipe):
        p = batch.params
        dmd = p.dmd_steps or getattr(pipe, "dmd_steps", None)
        if dmd:
            batch.latents = pipe.run_denoise_dmd(
                batch.latents, batch.text_emb, tuple(int(t) for t in dmd),
                seed=p.seed,
            )
            return
        latents = pipe.run_denoise(
            batch.latents,
            batch.text_emb,
            batch.neg_emb,
            jnp.asarray(batch.sigmas),
            p.guidance_scale,
            sampler=p.sampler,
        )
        batch.latents = latents


class DecodingStage(Stage):
    name = "decoding"

    def __call__(self, batch, pipe):
        z = batch.latents
        if z.ndim == 5 and getattr(pipe, "wan_vae_cfg", None) is not None:
            # Wan 3D causal VAE consumes the whole latent video at once
            imgs = np.asarray(pipe.vae_decode(z))
        elif z.ndim == 5:  # video: decode frames through the 2D VAE
            b, f = z.shape[0], z.shape[1]
            imgs = pipe.vae_decode(z.reshape((b * f,) + z.shape[2:]))
            imgs = np.asarray(imgs).reshape((b, f) + imgs.shape[1:])
        else:
            imgs = np.asarray(pipe.vae_decode(z))
        batch.images = ((imgs + 1.0) * 127.5).clip(0, 255).astype(np.uint8)


class DiffusionPipeline:
    """Round-1 generic text-to-image pipeline (model families subclass and
    swap components, mirroring pipelines/wan_pipeline.py etc.)."""

    def __init__(
        self,
        dit_cfg: DiTConfig = None,
        vae_cfg: VAEConfig = None,
        te_cfg: TextEncoderConfig = None,
        params: Optional[Dict[str, Any]] = None,
        tokenizer=None,
        rng_seed: int = 0,
        dtype=jnp.float32,
        sp_mesh=None,  # Mesh with an "sp" axis -> Ulysses sequence parallel
        cfg_mesh=None,  # Mesh with a "cfg" axis (size 2) -> CFG parallel
        teacache=None,  # TeaCacheConfig
        cache_dit=None,  # CacheDiTConfig (DBCache/TaylorSeer block caching)
        sta=None,  # {"tile": (tf,th,tw), "window": (rf,rh,rw)} sliding tile
        # attention for video denoising (diffusion/sparse_attention.py)
        vsa=None,  # {"tile": (tf,th,tw), "sparsity": s} video sparse
        # attention: per-head top-k key tiles (video_sparse_attn analog)
        attention_backend: str = "auto",  # auto | sage (INT8 attention)
        text_encoder_type: str = "clip",  # clip | t5 | llama (encoders/)
    ):
        self.sp_mesh = sp_mesh
        self.cfg_mesh = cfg_mesh
        self.teacache = teacache
        self.cache_dit = cache_dit
        self.sta = sta
        self.vsa = vsa
        if sta is not None and vsa is not None:
            raise ValueError("sta and vsa are mutually exclusive")
        self.attention_backend = attention_backend
        if (teacache is not None and teacache.enabled
                and cache_dit is not None and cache_dit.enabled):
            raise ValueError("teacache and cache_dit are mutually exclusive")
        self.last_teacache_skipped = 0
        self.dit_cfg = dit_cfg or DiTConfig()
        self.vae_cfg = vae_cfg or VAEConfig(latent_channels=self.dit_cfg.in_channels)
        # text encoder family (reference multimodal_gen encoders/): the
        # conditioning trunk is selectable — CLIP-lite (default), T5/UMT5
        # (Wan/Flux style), or a causal Llama trunk (HunyuanVideo style)
        self.text_encoder_type = text_encoder_type
        if text_encoder_type == "t5":
            from sglang_diffusion_tpu.diffusion.models.t5_encoder import T5Config

            self.te_cfg = te_cfg or T5Config(
                vocab_size=512, d_model=self.dit_cfg.text_dim,
                d_kv=self.dit_cfg.text_dim // 4, d_ff=2 * self.dit_cfg.text_dim,
                num_layers=2, num_heads=4,
            )
        elif text_encoder_type == "llama":
            from sglang_diffusion_tpu.diffusion.models.llama_encoder import (
                LlamaEncoderConfig,
            )

            self.te_cfg = te_cfg or LlamaEncoderConfig(
                vocab_size=512, hidden_size=self.dit_cfg.text_dim,
                intermediate_size=2 * self.dit_cfg.text_dim,
                num_layers=2, num_heads=4, num_kv_heads=4,
            )
        else:
            self.te_cfg = te_cfg or TextEncoderConfig(
                hidden_size=self.dit_cfg.text_dim
            )
        self.te_max_len = getattr(self.te_cfg, "max_len", 77)
        self.scheduler = FlowMatchEulerScheduler(use_dynamic_shifting=True)
        self.tokenizer = tokenizer
        key = jax.random.PRNGKey(rng_seed)
        k1, k2, k3 = jax.random.split(key, 3)
        if params is None:
            params = {
                "dit": self._init_dit_params(k1, dtype),
                "vae": VAEDecoder.init_params(k2, self.vae_cfg, dtype),
                "text_encoder": self._te_cls().init_params(
                    k3, self.te_cfg, dtype
                ),
            }
        self.params = params
        self.dit_forward = self._make_dit_forward(
            _select_dit_attention(self.dit_cfg, sp_mesh, attention_backend)
        )
        self.stages: List[Stage] = [
            InputValidationStage(),
            TextEncodingStage(),
            TimestepPreparationStage(),
            LatentPreparationStage(),
            DenoisingStage(),
            DecodingStage(),
        ]
        self._denoise_jit = None
        self._decode_jit = None
        self._encode_jit = None
        self._lora = None

    @property
    def lora(self):
        """Runtime LoRA merge/unmerge controller (diffusion/lora.py)."""
        if self._lora is None:
            from sglang_diffusion_tpu.diffusion.lora import LoRAController

            self._lora = LoRAController(self)
        return self._lora

    # ------------- component calls -------------
    def _te_cls(self):
        if self.text_encoder_type == "t5":
            from sglang_diffusion_tpu.diffusion.models.t5_encoder import T5Encoder

            return T5Encoder
        if self.text_encoder_type == "llama":
            from sglang_diffusion_tpu.diffusion.models.llama_encoder import (
                LlamaTextEncoder,
            )

            return LlamaTextEncoder
        return TextEncoder

    def tokenize(self, text: str) -> List[int]:
        if self.tokenizer is not None:
            return self.tokenizer.encode(text)
        return [b % self.te_cfg.vocab_size for b in text.encode("utf-8")]

    def text_encode(self, ids: jax.Array):
        """[B, T] -> (embeddings [B, T, E], pooled-or-None): all encoder
        families are normalized to this return shape."""
        if self._encode_jit is None:
            cls = self._te_cls()

            def enc(p, i):
                out = cls.apply(p, i, self.te_cfg)
                return out if isinstance(out, tuple) else (out, None)

            if (self.sp_mesh is not None
                    and self.sp_mesh.shape.get("sp", 1) > 1):
                # SP text encoder (reference analog: multimodal_gen's
                # sequence-parallel encoder pass): shard the TOKEN axis
                # over "sp" and let GSPMD insert the attention
                # collectives — encoder FLOPs/activations split across
                # the sp group, output gathered back replicated.
                self._encode_jit = sp_sharded_text_encode(enc, self.sp_mesh)
            else:
                self._encode_jit = jax.jit(enc)
        return self._encode_jit(self.params["text_encoder"], ids)

    def vae_decode(self, latents: jax.Array):
        if self._decode_jit is None:
            wan_cfg = getattr(self, "wan_vae_cfg", None)
            kl_cfg = getattr(self, "vae_kl_cfg", None)
            if wan_cfg is not None:
                # real AutoencoderKLWan (3D causal) ingested from a
                # diffusers dir: latents [B, T_lat, h, w, C] -> pixel
                # video; 4D image latents ride as 1-frame videos
                # (Qwen-Image uses the same architecture)
                from sglang_diffusion_tpu.diffusion.models import wan_vae

                def _wan_dec(p, z):
                    if z.ndim == 4:
                        return wan_vae.decode_mode(p, wan_cfg, z[:, None])[:, 0]
                    return wan_vae.decode_mode(p, wan_cfg, z)

                self._decode_jit = jax.jit(_wan_dec)
            elif kl_cfg is not None:
                # real diffusers AutoencoderKL checkpoint ingested by the
                # directory loader (diffusers_loader.py)
                from sglang_diffusion_tpu.diffusion.models.autoencoder_kl import (
                    AutoencoderKLDecoder,
                )

                self._decode_jit = jax.jit(
                    lambda p, z: AutoencoderKLDecoder.apply(p, z, kl_cfg)
                )
            else:
                self._decode_jit = jax.jit(
                    lambda p, z: VAEDecoder.apply(p, z, self.vae_cfg)
                )
        return self._decode_jit(self.params["vae"], latents)

    def vae_encode(self, images: jax.Array):
        from sglang_diffusion_tpu.diffusion.models.vae import VAEEncoder

        if "vae_encoder" not in self.params:
            self.params["vae_encoder"] = VAEEncoder.init_params(
                jax.random.PRNGKey(7), self.vae_cfg
            )
        if not hasattr(self, "_encode_img_jit") or self._encode_img_jit is None:
            self._encode_img_jit = jax.jit(
                lambda p, x: VAEEncoder.apply(p, x, self.vae_cfg)
            )
        return self._encode_img_jit(self.params["vae_encoder"], images)

    def _stream_len(self, t_txt: int, t_img: int) -> int:
        """Length of the block hidden stream (MMDiT: joint [txt; img];
        cross-attention families like Wan: img only)."""
        return t_txt + t_img

    def _init_dit_params(self, key, dtype):
        return MMDiT.init_params(key, self.dit_cfg, dtype)

    # ---- model-family hooks (overridden by family pipelines, e.g.
    # WanVideoPipeline — reference analog: per-family pipeline compositions
    # under multimodal_gen/runtime/pipelines/) ----
    def _make_dit_forward(self, attn_fn):
        return MMDiT.make_forward(self.dit_cfg, attn_fn=attn_fn)

    def _make_forward_parts(self, attn_fn, front_blocks: int):
        return MMDiT.make_forward_parts(self.dit_cfg, attn_fn=attn_fn,
                                        front_blocks=front_blocks)

    def _cond_signal(self, dit_params, t):
        """Timestep-conditioning proxy for TeaCache (the same signal that
        modulates the blocks; the text part is step-invariant)."""
        from sglang_diffusion_tpu.diffusion.models.dit import (
            timestep_embedding,
        )

        e = timestep_embedding(t[:1], 256)
        h = jnp.dot(jax.nn.silu(jnp.dot(e, dit_params["t_mlp1"])),
                    dit_params["t_mlp2"])
        return h[0].astype(jnp.float32)

    def _cond_dim(self, dit_params) -> int:
        return dit_params["t_mlp2"].shape[-1]

    def run_denoise_dmd(self, latents, text_emb, steps, seed: int = 0,
                        shift: float = 8.0):
        """DMD / distilled few-step denoising (reference:
        stages/denoising_dmd.py:58 + models/utils.py:95): at each fixed
        timestep t_i the model's velocity converts to a clean-video
        prediction x0 = x_t - sigma_i * v, which is re-noised with FRESH
        noise to the next level x = (1-sigma_{i+1}) x0 + sigma_{i+1} eps.
        No CFG (the distilled model bakes guidance in); sigma(t) uses the
        shift-8 flow-match map sigma = shift*s / (1 + (shift-1)*s)."""
        p = self.dit_cfg.patch_size
        steps = tuple(int(t) for t in steps)

        def loop(dit_params, latents, text_emb, key):
            video = latents.ndim == 5
            if video:
                tokens, grid_hw = patchify_video(latents, p)
            else:
                tokens, grid_hw = patchify(latents, p)
            ts = jnp.asarray(steps, jnp.float32)
            s_frac = ts / 1000.0
            sig = shift * s_frac / (1.0 + (shift - 1.0) * s_frac)

            def body(carry, i):
                x, key = carry
                t = jnp.full((x.shape[0],), ts[i])
                v = self.dit_forward(dit_params, x, text_emb, t, grid_hw)
                x0 = x - sig[i] * v.astype(x.dtype)
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, x.shape, jnp.float32).astype(
                    x.dtype)
                is_last = i == len(steps) - 1
                sig_next = jnp.where(is_last, 0.0, sig[jnp.minimum(
                    i + 1, len(steps) - 1)])
                x = (1.0 - sig_next) * x0 + sig_next * noise
                return (x, key), None

            (tokens, _), _ = jax.lax.scan(
                body, (tokens, key), jnp.arange(len(steps)))
            if video:
                return unpatchify_video(tokens, grid_hw, p,
                                        self.dit_cfg.in_channels)
            return unpatchify(tokens, grid_hw, p, self.dit_cfg.in_channels)

        if not hasattr(self, "_dmd_jits"):
            self._dmd_jits = {}
        if steps not in self._dmd_jits:
            self._dmd_jits[steps] = jax.jit(loop)
        key = jax.random.PRNGKey(seed + 1)
        return self._dmd_jits[steps](
            self.params["dit"], latents, text_emb, key)

    def run_denoise(self, latents, text_emb, neg_emb, sigmas, guidance_scale,
                    sampler: str = "euler"):
        """Whole denoise loop in one jit: lax.scan over steps, CFG inside.
        With TeaCache enabled, steps whose conditioning barely changed reuse
        the previous velocity via a scalar lax.cond (the DiT branch does not
        execute on skipped steps)."""
        p = self.dit_cfg.patch_size
        use_cfg = bool(guidance_scale > 1.0)
        tc = self.teacache
        use_tc = bool(tc is not None and tc.enabled)
        cd = self.cache_dit
        use_cd = bool(cd is not None and cd.enabled)
        if use_cd:
            dit_parts = self._make_forward_parts(
                _select_dit_attention(self.dit_cfg, self.sp_mesh,
                                      self.attention_backend),
                front_blocks=cd.front_blocks,
            )
        sched = get_scheduler(sampler, use_dynamic_shifting=True)

        def loop(dit_params, latents, text_emb, neg_emb, sigmas, gs):
            video = latents.ndim == 5
            if video:
                tokens, grid_hw = patchify_video(latents, p)
            else:
                tokens, grid_hw = patchify(latents, p)
            dit_forward = self.dit_forward
            if self.vsa is not None and video:
                # top-k block-sparse attention for this token grid
                tile = tuple(self.vsa["tile"])
                if all(g % tt == 0 for g, tt in zip(grid_hw, tile)):
                    from sglang_diffusion_tpu.diffusion.sparse_attention import (
                        make_vsa_attention,
                    )

                    vsa_attn = make_vsa_attention(
                        grid_hw, tile, float(self.vsa.get("sparsity", 0.9)),
                        text_len=text_emb.shape[1],
                    )
                    dit_forward = self._make_dit_forward(vsa_attn)
                else:
                    logger.warning(
                        "VSA tile %s does not divide grid %s; dense attention",
                        tile, grid_hw,
                    )
            if self.sta is not None and video:
                # sliding-tile attention for this generation's token grid
                # (trace-time rebuild: one executable per grid shape anyway)
                tile = tuple(self.sta["tile"])
                win = tuple(self.sta["window"])
                if all(g % tt == 0 for g, tt in zip(grid_hw, tile)):
                    from sglang_diffusion_tpu.diffusion.sparse_attention import (
                        make_sta_attention,
                    )

                    sta_attn = make_sta_attention(
                        grid_hw, tile, win, text_len=text_emb.shape[1]
                    )
                    dit_forward = self._make_dit_forward(sta_attn)
                else:
                    logger.warning(
                        "STA tile %s does not divide grid %s; dense attention",
                        tile, grid_hw,
                    )

            def cond_signal(t):
                return self._cond_signal(dit_params, t)

            def predict(x, t):
                if use_cfg:
                    x2 = jnp.concatenate([x, x], axis=0)
                    emb2 = jnp.concatenate([text_emb, neg_emb], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    if self.cfg_mesh is not None:
                        # CFG parallel: cond/uncond halves on disjoint
                        # devices (reference: multimodal_gen parallel_state
                        # CFG groups, :1005-1017) — the doubled batch is
                        # sharded over the "cfg" mesh axis; XLA places the
                        # two DiT branch evaluations on separate devices
                        from jax.sharding import NamedSharding

                        sh = NamedSharding(self.cfg_mesh, P("cfg"))
                        x2 = jax.lax.with_sharding_constraint(x2, sh)
                        emb2 = jax.lax.with_sharding_constraint(emb2, sh)
                    v2 = dit_forward(dit_params, x2, emb2, t2, grid_hw)
                    v_cond, v_uncond = jnp.split(v2, 2, axis=0)
                    return v_uncond + gs * (v_cond - v_uncond)
                return dit_forward(dit_params, x, text_emb, t, grid_hw)

            sched_step = sched.make_step(sigmas)

            def dit_inputs(x, t):
                """CFG batch doubling (+ optional cfg-mesh sharding)."""
                if not use_cfg:
                    return x, text_emb, t
                x2 = jnp.concatenate([x, x], axis=0)
                emb2 = jnp.concatenate([text_emb, neg_emb], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                if self.cfg_mesh is not None:
                    from jax.sharding import NamedSharding

                    sh = NamedSharding(self.cfg_mesh, P("cfg"))
                    x2 = jax.lax.with_sharding_constraint(x2, sh)
                    emb2 = jax.lax.with_sharding_constraint(emb2, sh)
                return x2, emb2, t2

            def cfg_combine(v2):
                if not use_cfg:
                    return v2
                v_cond, v_uncond = jnp.split(v2, 2, axis=0)
                return v_uncond + gs * (v_cond - v_uncond)

            if use_cd:
                # DBCache/TaylorSeer: front blocks always run; tail skipped
                # when the front output barely moved (cache.py CacheDiTConfig)
                front_fn, tail_fn, head_fn = dit_parts

                def step_cd(carry, i):
                    x, prev_front, res, res_prev, n_comp, skipped, sstate = carry
                    sigma = sigmas[i]
                    t = jnp.full((x.shape[0],), sigma * 1000.0)
                    x2, emb2, t2 = dit_inputs(x, t)
                    xf, ctx = front_fn(dit_params, x2, emb2, t2, grid_hw)
                    rel = jnp.sum(jnp.abs(xf - prev_front)) / jnp.maximum(
                        jnp.sum(jnp.abs(prev_front)), 1e-6
                    )
                    skip = (
                        (rel < cd.threshold)
                        & (i >= cd.warmup_steps)
                        & (n_comp >= 2)
                    )

                    def do_skip(op):
                        xf_, res_, res_prev_ = op
                        res_hat = (
                            res_ + (res_ - res_prev_)
                            if cd.taylorseer else res_
                        )
                        v = head_fn(dit_params, xf_ + res_hat, ctx)
                        return v, res_, res_prev_, n_comp

                    def do_full(op):
                        xf_, res_, res_prev_ = op
                        xfull = tail_fn(dit_params, xf_, ctx)
                        v = head_fn(dit_params, xfull, ctx)
                        return v, xfull - xf_, res_, n_comp + 1

                    v2, res, res_prev, n_comp = jax.lax.cond(
                        skip, do_skip, do_full, (xf, res, res_prev)
                    )
                    v = cfg_combine(v2)
                    skipped = skipped + skip.astype(jnp.int32)
                    x, sstate = sched_step(i, x, v, sstate)
                    return (x, xf, res, res_prev, n_comp, skipped, sstate), None

                b2 = tokens.shape[0] * (2 if use_cfg else 1)
                t_total = self._stream_len(text_emb.shape[1],
                                           tokens.shape[1])
                e_hid = self._cond_dim(dit_params)
                zeros_h = jnp.zeros((b2, t_total, e_hid), tokens.dtype)
                init_cd = (
                    tokens, zeros_h, zeros_h, zeros_h,
                    jnp.int32(0), jnp.int32(0), sched.init_state(tokens),
                )
                (tokens, _, _, _, _, skipped, _), _ = jax.lax.scan(
                    step_cd, init_cd, jnp.arange(sigmas.shape[0] - 1)
                )
                if video:
                    out = unpatchify_video(tokens, grid_hw, p,
                                           self.dit_cfg.in_channels)
                else:
                    out = unpatchify(tokens, grid_hw, p,
                                     self.dit_cfg.in_channels)
                return out, skipped

            def step(carry, i):
                x, prev_v, prev_sig, accum, skipped, sstate = carry
                sigma = sigmas[i]
                t = jnp.full((x.shape[0],), sigma * 1000.0)
                if use_tc:
                    sig = cond_signal(t)
                    rel = jnp.sum(jnp.abs(sig - prev_sig)) / jnp.maximum(
                        jnp.sum(jnp.abs(prev_sig)), 1e-6
                    )
                    accum_new = accum + rel
                    skip = (accum_new < tc.threshold) & (i > 0)
                    v = jax.lax.cond(skip, lambda: prev_v, lambda: predict(x, t))
                    accum = jnp.where(skip, accum_new, 0.0)
                    skipped = skipped + skip.astype(jnp.int32)
                    prev_sig = sig
                else:
                    v = predict(x, t)
                x, sstate = sched_step(i, x, v, sstate)
                return (x, v, prev_sig, accum, skipped, sstate), None

            e_dim = self._cond_dim(dit_params)
            init = (
                tokens,
                jnp.zeros_like(tokens),
                jnp.zeros((e_dim,), jnp.float32),
                jnp.float32(0.0),
                jnp.int32(0),
                sched.init_state(tokens),
            )
            (tokens, _, _, _, skipped, _), _ = jax.lax.scan(
                step, init, jnp.arange(sigmas.shape[0] - 1)
            )
            if video:
                out = unpatchify_video(tokens, grid_hw, p, self.dit_cfg.in_channels)
            else:
                out = unpatchify(tokens, grid_hw, p, self.dit_cfg.in_channels)
            return out, skipped

        if self._denoise_jit is None:
            self._denoise_jit = {}
        jit_key = (use_cfg, sampler, use_tc, use_cd)
        if jit_key not in self._denoise_jit:
            self._denoise_jit[jit_key] = jax.jit(loop)
        gs = jnp.float32(guidance_scale)
        neg = neg_emb if neg_emb is not None else text_emb
        out, skipped = self._denoise_jit[jit_key](
            self.params["dit"], latents, text_emb, neg, sigmas, gs
        )
        self.last_teacache_skipped = int(skipped)
        return out

    # ------------- entry -------------
    def forward(self, gen_params: GenerationParams) -> DiffusionBatch:
        batch = DiffusionBatch(params=gen_params)
        for stage in self.stages:
            t0 = time.perf_counter()
            stage(batch, self)
            batch.stage_timings[stage.name] = time.perf_counter() - t0
        return batch


def sp_sharded_text_encode(enc_fn, mesh):
    """Wrap a (params, ids) -> (emb, pooled) encoder so its token axis
    shards over the mesh's "sp" axis (SP text encoder, SURVEY §2.8).
    Non-divisible lengths (CLIP's 77) are pad-id padded to a multiple of
    sp and the embedding sliced back; pooled outputs are unaffected
    (mask-based pooling ignores pads; CLIP's argmax-eot pick is
    unchanged by id-0 pads)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sp = mesh.shape["sp"]
    rep = NamedSharding(mesh, P())
    jfn = jax.jit(enc_fn, in_shardings=(rep, NamedSharding(mesh, P(None, "sp"))),
                  out_shardings=rep)

    def call(params, ids):
        t = ids.shape[1]
        pad = (-t) % sp
        if pad:
            ids = jnp.pad(ids, ((0, 0), (0, pad)))
        emb, pooled = jfn(params, ids)
        if pad:
            emb = emb[:, :t]
        return emb, pooled

    return call
