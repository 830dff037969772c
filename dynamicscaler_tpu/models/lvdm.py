"""LatentVideoDiffusion: the frozen model bundle (UNet + VAE + text/image
encoders + projector) with pure apply functions.

Functional counterpart of the reference's ``LatentDiffusion`` /
``LatentVisualDiffusion`` Lightning modules (lvdm/models/ddpm3d.py:327-693):
no module state, no device juggling — params are pytrees, every method is a
pure function of (params, inputs) and jit-compiles. Video VAE encode/decode
("2DAE", ddpm3d.py:485-490,556-562) batches frames instead of looping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamicscaler_tpu.config import ModelConfig
from dynamicscaler_tpu.models.unet3d import UNet3D
from dynamicscaler_tpu.models.vae import AutoencoderKL
from dynamicscaler_tpu.models.clip import (
    CLIPTextEncoder,
    CLIPVisionEncoder,
    clip_preprocess,
)
from dynamicscaler_tpu.models.resampler import Resampler


@dataclasses.dataclass(eq=False)  # id-hash: used as a static jit argument
class LatentVideoDiffusion:
    """Frozen model bundle. ``params`` keys: unet, vae, clip_text and (i2v)
    clip_vision, resampler."""

    config: ModelConfig
    params: Dict[str, Any]
    tokenizer: Any = None  # callable: texts -> [B, 77] int tokens

    def __post_init__(self):
        dt = self.config.jnp_dtype
        self.unet = UNet3D(self.config.unet, dtype=dt)
        self.vae = AutoencoderKL(self.config.vae, dtype=dt)
        self.text_encoder = CLIPTextEncoder(self.config.clip_text, dtype=dt)
        self.image_encoder = (
            CLIPVisionEncoder(self.config.clip_vision, dtype=dt)
            if self.config.clip_vision
            else None
        )
        self.resampler = (
            Resampler(self.config.resampler, dtype=dt) if self.config.resampler else None
        )
        # jitted encoder/decoder entry points: un-jitted flax apply of the
        # big towers costs ~3s of Python dispatch per call (measured) —
        # retraces per input shape, cached thereafter. All ride the
        # persistent trace cache (utils/progcache.py): warm processes load
        # serialized StableHLO instead of re-tracing the towers.
        from dynamicscaler_tpu.utils.progcache import cached_jit, obj_fingerprint

        _fp = obj_fingerprint(self.config)
        self._jit_text = cached_jit(
            lambda p, toks: self.text_encoder.apply(p["clip_text"], toks),
            name="clip_text", fingerprint=_fp,
        )
        if self.image_encoder is not None:
            def _img_one(p, imgs):
                return self.resampler.apply(
                    p["resampler"],
                    self.image_encoder.apply(
                        p["clip_vision"],
                        clip_preprocess(imgs, self.config.clip_vision.image_size),
                    ),
                )

            self._jit_img = cached_jit(_img_one, name="clip_img", fingerprint=_fp)
            self._jit_img_chunked = cached_jit(
                lambda p, imgs, mb: jax.lax.map(
                    lambda ch: _img_one(p, ch),
                    imgs.reshape((-1, mb) + imgs.shape[1:]),
                ).reshape((imgs.shape[0],) + (
                    self.config.resampler.num_queries, self.config.resampler.output_dim,
                )),
                name="clip_img_chunked", fingerprint=_fp,
                static_argnums=(2,),
            )
        self._jit_vae_encode = cached_jit(
            lambda p, x: self.vae.apply(p["vae"], x, None, method=AutoencoderKL.encode),
            name="vae_encode", fingerprint=_fp,
        )
        self._jit_vae_encode_sampled = cached_jit(
            lambda p, x, key: self.vae.apply(p["vae"], x, key, method=AutoencoderKL.encode),
            name="vae_encode_sampled", fingerprint=_fp,
        )
        self._jit_vae_decode = cached_jit(
            lambda p, z: self.vae.apply(p["vae"], z, method=AutoencoderKL.decode),
            name="vae_decode", fingerprint=_fp,
        )

    # -- constructors -------------------------------------------------------

    @classmethod
    def init_random(cls, config: ModelConfig, key: jax.Array, tokenizer=None) -> "LatentVideoDiffusion":
        """Random weights (development / testing without a checkpoint)."""
        dt = config.jnp_dtype
        ks = jax.random.split(key, 5)
        params: Dict[str, Any] = {}
        unet = UNet3D(config.unet, dtype=dt)
        F = min(config.unet.temporal_length, 2)
        ctx_len = config.unet.text_context_len + (
            config.resampler.num_queries if config.resampler else 0
        )
        params["unet"] = unet.init(
            ks[0],
            jnp.zeros((1, F, 8, 8, config.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, ctx_len, config.unet.context_dim)),
            16,
        )
        vae = AutoencoderKL(config.vae, dtype=dt)
        params["vae"] = vae.init(ks[1], jnp.zeros((1, 32, 32, 3)))
        text = CLIPTextEncoder(config.clip_text, dtype=dt)
        params["clip_text"] = text.init(
            ks[2], jnp.zeros((1, config.clip_text.context_length), jnp.int32)
        )
        if config.clip_vision:
            vis = CLIPVisionEncoder(config.clip_vision, dtype=dt)
            params["clip_vision"] = vis.init(
                ks[3],
                jnp.zeros((1, config.clip_vision.image_size, config.clip_vision.image_size, 3)),
            )
        if config.resampler:
            res = Resampler(config.resampler, dtype=dt)
            params["resampler"] = res.init(
                ks[4], jnp.zeros((1, config.clip_vision.output_tokens, config.resampler.embedding_dim))
            )
        return cls(config=config, params=params, tokenizer=tokenizer)

    @classmethod
    def init_constant(
        cls, config: ModelConfig, value: float = 0.01, tokenizer=None
    ) -> "LatentVideoDiffusion":
        """Full-size model with constant-filled weights, built via eval_shape
        (no giant host RNG). Compute-identical to real weights — the
        asset-free path for full-scale perf measurement (bench.py uses the
        same convention)."""
        shapes = jax.eval_shape(
            lambda: cls.init_random(config, jax.random.PRNGKey(0)).params
        )
        # store params in the compute dtype (a 1.44B-param fp32 tree is
        # 5.8 GB of HBM that the bf16 modules would down-cast per use anyway;
        # same convention as bench.py). Build the whole tree in ONE jitted
        # program: per-leaf jnp.full would be ~1700 individual device ops —
        # 75s of remote round trips through the axon tunnel (measured,
        # results/tpu_checklist_20260819_151137).
        dt = config.jnp_dtype
        params = jax.jit(
            lambda: jax.tree.map(lambda s: jnp.full(s.shape, value, dt), shapes)
        )()
        return cls(config=config, params=params, tokenizer=tokenizer)

    # -- pure apply methods --------------------------------------------------

    def apply_unet_microbatched(self, x, t_scalar, context, fps=16, params=None,
                                microbatch: int = 0):
        """CFG-packed window batch through the UNet in ``microbatch`` chunks
        via ``lax.map`` (UNet batch 8 saturates the chip; batch 16 fails
        remote compile — BENCH_NOTES.md). ``microbatch`` 0 or >= batch runs
        one call. ``t_scalar`` is a traced scalar timestep."""
        n = x.shape[0]
        if not microbatch or n <= microbatch:
            return self.apply_unet(
                x, jnp.full((n,), t_scalar), context, fps, params=params
            )
        mb = microbatch
        pad = (-n) % mb
        if pad:
            x = jnp.concatenate([x, x[:pad]], 0)
            context = jnp.concatenate([context, context[:pad]], 0)
        xs = x.reshape(-1, mb, *x.shape[1:])
        cs = context.reshape(-1, mb, *context.shape[1:])
        eps = jax.lax.map(
            lambda ab: self.apply_unet(
                ab[0], jnp.full((mb,), t_scalar), ab[1], fps, params=params
            ),
            (xs, cs),
        )
        return eps.reshape(-1, *eps.shape[2:])[:n]

    def apply_unet(self, x, t, context, fps=16, params=None, no_temporal_attn=False,
                   traj=None):
        """eps prediction. x: [B, F, H, W, C]; context: [B, L, D].
        ``no_temporal_attn`` skips temporal transformers (the legacy
        sampler's temporal-guidance probe, samplers/ddim.py:228-231).
        ``traj``: optional ops.freetraj.FreeTraj trajectory control."""
        p = params if params is not None else self.params
        return self.unet.apply(p["unet"], x, t, context, fps, no_temporal_attn, traj)

    def encode_text_tokens(self, tokens, params=None):
        p = params if params is not None else self.params
        return self._jit_text(p, jnp.asarray(tokens))

    def encode_text(self, texts, params=None):
        """Tokenize + encode (host tokenizer; reference
        get_learned_conditioning, ddpm3d.py:445)."""
        assert self.tokenizer is not None, "no tokenizer configured"
        return self.encode_text_tokens(self.tokenizer(texts), params=params)

    def encode_image_cond(self, images, params=None, microbatch: int = 32):
        """[-1,1] NHWC image(s) -> [B, num_queries, 1024] projector tokens
        (ddpm3d.py:689-693: embedder -> image_proj_model).

        Large batches (the all-phases conditioning banks can reach 256
        crops) run as ONE program with an in-program ``lax.map`` over
        ``microbatch``-sized chunks: bounded activation memory, still a
        single remote program load."""
        p = params if params is not None else self.params
        assert self.image_encoder is not None, "t2v config has no image encoder"
        B = images.shape[0]
        if B <= microbatch or B % microbatch:
            return self._jit_img(p, images)
        return self._jit_img_chunked(p, images, microbatch)

    def encode_video(self, video, key: Optional[jax.Array] = None, params=None):
        """[B, F, H, W, 3] in [-1,1] -> scaled latents [B, F, h, w, zc].
        Frames batched through the 2D VAE (one program, not a frame loop)."""
        p = params if params is not None else self.params
        B, F, H, W, C = video.shape
        flat = video.reshape(B * F, H, W, C)
        if key is None:
            z = self._jit_vae_encode(p, flat)
        else:
            z = self._jit_vae_encode_sampled(p, flat, key)
        return z.reshape(B, F, z.shape[1], z.shape[2], z.shape[3])

    def decode_video(self, latents, params=None):
        """[B, F, h, w, zc] scaled latents -> [B, F, 8h, 8w, 3]."""
        p = params if params is not None else self.params
        B, F, h, w, zc = latents.shape
        flat = latents.reshape(B * F, h, w, zc)
        x = self._jit_vae_decode(p, flat)
        return x.reshape(B, F, x.shape[1], x.shape[2], x.shape[3])

    def decode_video_chunked(self, latents, frame_chunk: int = 1, params=None):
        """Memory-bounded decode: process `frame_chunk` frames per device
        step (large panorama decodes exceed HBM if fully batched)."""
        B, F, h, w, zc = latents.shape
        outs = []
        for f0 in range(0, F, frame_chunk):
            outs.append(self.decode_video(latents[:, f0 : f0 + frame_chunk], params=params))
        return jnp.concatenate(outs, axis=1)


def tiny_test_config(img_attention: bool = True) -> ModelConfig:
    """Miniature ModelConfig for fast CPU tests (same topology, tiny dims)."""
    from dynamicscaler_tpu.config import (
        CLIPTextConfig,
        CLIPVisionConfig,
        ModelConfig,
        ResamplerConfig,
        UNetConfig,
        VAEConfig,
    )

    return ModelConfig(
        unet=UNetConfig(
            model_channels=32,
            num_head_channels=16,
            context_dim=32,
            channel_mult=(1, 2),
            num_res_blocks=1,
            attention_resolutions=(1, 2),
            temporal_length=4,
            use_image_attention=img_attention,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        clip_text=CLIPTextConfig(vocab_size=512, width=32, layers=2, heads=2),
        clip_vision=CLIPVisionConfig(image_size=32, patch_size=16, width=32, layers=2, heads=2, output_tokens=5)
        if img_attention
        else None,
        resampler=ResamplerConfig(
            dim=32, depth=1, dim_head=8, heads=2, num_queries=4, embedding_dim=32, output_dim=32
        )
        if img_attention
        else None,
        dtype="float32",
    )
