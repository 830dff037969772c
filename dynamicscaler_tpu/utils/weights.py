"""torch -> JAX weight conversion for VideoCrafter checkpoints + OpenCLIP.

The reference loads a single Lightning/DeepSpeed ``state_dict`` containing
the UNet (``model.diffusion_model.*``), VAE (``first_stage_model.*``), text
tower (``cond_stage_model.model.*``) and, for i2v, vision tower
(``embedder.model.visual.*``) and projector (``image_proj_model.*``)
(scripts/evaluation/funcs.py:88-104, lvdm/models/ddpm3d.py:182-198).

This module walks the same structures deterministically (the UNet via
:func:`dynamicscaler_tpu.models.unet3d.unet_layout`, which replicates the
reference construction order) and emits the flax param trees. torch is only
required at conversion time; the result is saved as an orbax/npz tree.

Layout transforms:
  Linear  [out, in]            -> kernel [in, out]
  Conv2d  [out, in, kh, kw]    -> kernel [kh, kw, in, out]
  Conv3d  [out, in, kt, kh, kw]-> kernel [kt, kh, kw, in, out]
  Conv1d k=1 (as Dense)        -> kernel [in, out]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from dynamicscaler_tpu.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    ModelConfig,
    ResamplerConfig,
    UNetConfig,
    VAEConfig,
)
from dynamicscaler_tpu.models.unet3d import unet_layout


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, dtype=np.float32)


def lin(sd, p):
    return {"kernel": _np(sd[p + ".weight"]).T, "bias": _np(sd[p + ".bias"])}


def lin_nb(sd, p):
    return {"kernel": _np(sd[p + ".weight"]).T}


def conv2d(sd, p):
    return {
        "kernel": _np(sd[p + ".weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[p + ".bias"]),
    }


def conv2d_nb(sd, p):
    return {"kernel": _np(sd[p + ".weight"]).transpose(2, 3, 1, 0)}


def conv3d(sd, p):
    return {
        "kernel": _np(sd[p + ".weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _np(sd[p + ".bias"]),
    }


def conv1d_as_dense(sd, p):
    return {"kernel": _np(sd[p + ".weight"])[:, :, 0].T, "bias": _np(sd[p + ".bias"])}


def norm(sd, p):
    return {"scale": _np(sd[p + ".weight"]), "bias": _np(sd[p + ".bias"])}


def gn32(sd, p):
    """GroupNorm under the GroupNorm32 wrapper (nested GroupNorm_0)."""
    return {"GroupNorm_0": norm(sd, p)}


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _convert_attention(sd, p, has_img_kv: bool, relative_position: bool = False):
    out = {
        "to_q": lin_nb(sd, p + ".to_q"),
        "to_k": lin_nb(sd, p + ".to_k"),
        "to_v": lin_nb(sd, p + ".to_v"),
        "to_out": lin(sd, p + ".to_out.0"),
    }
    if has_img_kv and p + ".to_k_ip.weight" in sd:
        out["to_k_ip"] = lin_nb(sd, p + ".to_k_ip")
        out["to_v_ip"] = lin_nb(sd, p + ".to_v_ip")
    if relative_position and p + ".relative_position_k.embeddings_table" in sd:
        out["rel_pos_k"] = _np(sd[p + ".relative_position_k.embeddings_table"])
        out["rel_pos_v"] = _np(sd[p + ".relative_position_v.embeddings_table"])
    return out


def _convert_transformer_block(sd, p, img_kv: bool, relative_position: bool = False):
    return {
        "attn1": _convert_attention(sd, p + ".attn1", False, relative_position),
        "attn2": _convert_attention(sd, p + ".attn2", img_kv, relative_position),
        "norm1": norm(sd, p + ".norm1"),
        "norm2": norm(sd, p + ".norm2"),
        "norm3": norm(sd, p + ".norm3"),
        "ff": {
            "geglu": {"proj": lin(sd, p + ".ff.net.0.proj")},
            "out": lin(sd, p + ".ff.net.2"),
        },
    }


def _convert_spatial(sd, p, cfg: UNetConfig):
    out = {
        "norm": gn32(sd, p + ".norm"),
        "proj_in": lin(sd, p + ".proj_in"),
        "proj_out": lin(sd, p + ".proj_out"),
    }
    for d in range(cfg.transformer_depth):
        out[f"block{d}"] = _convert_transformer_block(
            sd, f"{p}.transformer_blocks.{d}", cfg.use_image_attention
        )
    return out


def _convert_temporal(sd, p, cfg: UNetConfig, use_linear: bool):
    proj = lin if use_linear else conv1d_as_dense
    out = {
        "norm": gn32(sd, p + ".norm"),
        "proj_in": proj(sd, p + ".proj_in"),
        "proj_out": proj(sd, p + ".proj_out"),
    }
    for d in range(cfg.transformer_depth):
        out[f"block{d}"] = _convert_transformer_block(
            sd, f"{p}.transformer_blocks.{d}", False, cfg.use_relative_position
        )
    return out


def _convert_res(sd, p, cfg: UNetConfig):
    out = {
        "in_norm": gn32(sd, p + ".in_layers.0"),
        "in_conv": conv2d(sd, p + ".in_layers.2"),
        "emb_proj": lin(sd, p + ".emb_layers.1"),
        "out_norm": gn32(sd, p + ".out_layers.0"),
        "out_conv": conv2d(sd, p + ".out_layers.3"),
    }
    if p + ".skip_connection.weight" in sd:
        out["skip_conv"] = conv2d(sd, p + ".skip_connection")
    if cfg.temporal_conv and p + ".temopral_conv.conv1.0.weight" in sd:
        tc = {}
        # torch Sequential indices: conv1 -> (0 GN, 2 Conv); conv2..4 -> (0 GN, 3 Conv)
        for i, conv_idx in zip(range(1, 5), (2, 3, 3, 3)):
            tc[f"norm{i}"] = gn32(sd, f"{p}.temopral_conv.conv{i}.0")
            tc[f"conv{i}"] = conv3d(sd, f"{p}.temopral_conv.conv{i}.{conv_idx}")
        out["temporal_conv"] = tc
    return out


def convert_unet(sd: Dict[str, Any], cfg: UNetConfig) -> Dict[str, Any]:
    """``model.diffusion_model.*``-stripped state_dict -> UNet3D params."""
    in_specs, out_specs, mid_specs, _ = unet_layout(cfg)
    p: Dict[str, Any] = {}
    p["time_embed"] = {"fc1": lin(sd, "time_embed.0"), "fc2": lin(sd, "time_embed.2")}
    if cfg.fps_cond:
        p["fps_embed"] = {
            "fc1": lin(sd, "fps_embedding.0"),
            "fc2": lin(sd, "fps_embedding.2"),
        }
    if cfg.addition_attention:
        p["init_attn"] = _convert_temporal(sd, "init_attn.0", cfg, use_linear=False)

    for specs in list(in_specs) + list(out_specs) + [mid_specs]:
        for s in specs:
            tp = s.torch_path
            if s.kind == "conv_in":
                p[s.name] = conv2d(sd, tp)
            elif s.kind == "res":
                p[s.name] = _convert_res(sd, tp, cfg)
            elif s.kind == "spatial":
                p[s.name] = _convert_spatial(sd, tp, cfg)
            elif s.kind == "temporal":
                p[s.name] = _convert_temporal(sd, tp, cfg, use_linear=cfg.use_linear)
            elif s.kind == "down":
                p[s.name] = {"conv": conv2d(sd, tp + ".op")}
            elif s.kind == "up":
                p[s.name] = {"conv": conv2d(sd, tp + ".conv")}
    p["out_norm"] = gn32(sd, "out.0")
    p["out_conv"] = conv2d(sd, "out.2")
    return {"params": p}


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _convert_resnet(sd, p):
    out = {
        "norm1": norm(sd, p + ".norm1"),
        "conv1": conv2d(sd, p + ".conv1"),
        "norm2": norm(sd, p + ".norm2"),
        "conv2": conv2d(sd, p + ".conv2"),
    }
    if p + ".nin_shortcut.weight" in sd:
        out["nin_shortcut"] = conv2d(sd, p + ".nin_shortcut")
    return out


def _convert_vae_attn(sd, p):
    return {
        "norm": norm(sd, p + ".norm"),
        "q": conv2d(sd, p + ".q"),
        "k": conv2d(sd, p + ".k"),
        "v": conv2d(sd, p + ".v"),
        "proj_out": conv2d(sd, p + ".proj_out"),
    }


def _convert_encoder(sd, cfg: VAEConfig, pre: str = "encoder") -> Dict[str, Any]:
    enc: Dict[str, Any] = {"conv_in": conv2d(sd, f"{pre}.conv_in")}
    for i in range(len(cfg.ch_mult)):
        for b in range(cfg.num_res_blocks):
            enc[f"down{i}_block{b}"] = _convert_resnet(sd, f"{pre}.down.{i}.block.{b}")
        if i != len(cfg.ch_mult) - 1:
            enc[f"down{i}_downsample"] = {
                "conv": conv2d(sd, f"{pre}.down.{i}.downsample.conv")
            }
    enc["mid_block_1"] = _convert_resnet(sd, f"{pre}.mid.block_1")
    enc["mid_attn_1"] = _convert_vae_attn(sd, f"{pre}.mid.attn_1")
    enc["mid_block_2"] = _convert_resnet(sd, f"{pre}.mid.block_2")
    enc["norm_out"] = norm(sd, f"{pre}.norm_out")
    enc["conv_out"] = conv2d(sd, f"{pre}.conv_out")
    return enc


def _convert_decoder(sd, cfg: VAEConfig, pre: str = "decoder") -> Dict[str, Any]:
    dec: Dict[str, Any] = {"conv_in": conv2d(sd, f"{pre}.conv_in")}
    dec["mid_block_1"] = _convert_resnet(sd, f"{pre}.mid.block_1")
    dec["mid_attn_1"] = _convert_vae_attn(sd, f"{pre}.mid.attn_1")
    dec["mid_block_2"] = _convert_resnet(sd, f"{pre}.mid.block_2")
    for i in range(len(cfg.ch_mult)):
        for b in range(cfg.num_res_blocks + 1):
            dec[f"up{i}_block{b}"] = _convert_resnet(sd, f"{pre}.up.{i}.block.{b}")
        if i != 0:
            dec[f"up{i}_upsample"] = {"conv": conv2d(sd, f"{pre}.up.{i}.upsample.conv")}
    dec["norm_out"] = norm(sd, f"{pre}.norm_out")
    dec["conv_out"] = conv2d(sd, f"{pre}.conv_out")
    return dec


def convert_vae(sd: Dict[str, Any], cfg: VAEConfig) -> Dict[str, Any]:
    """``first_stage_model.*``-stripped state_dict -> AutoencoderKL params."""
    return {
        "params": {
            "encoder": _convert_encoder(sd, cfg),
            "decoder": _convert_decoder(sd, cfg),
            "quant_conv": conv2d(sd, "quant_conv"),
            "post_quant_conv": conv2d(sd, "post_quant_conv"),
        }
    }


# ---------------------------------------------------------------------------
# Auxiliary ae_modules classes (models/vae_aux.py — dead code upstream)
# ---------------------------------------------------------------------------


def _convert_resnet_t(sd, p, temb: bool):
    """ResnetBlock with the temb projection (ae_modules.py:167-169). When
    ``temb`` is False the torch ``temb_proj`` weights (created whenever
    temb_channels>0, even if forward never uses them) are DROPPED — the
    Flax module only materializes the param when a temb is passed."""
    out = _convert_resnet(sd, p)
    if temb and p + ".temb_proj.weight" in sd:
        out["temb_proj"] = lin(sd, p + ".temb_proj")
    return out


def _convert_lin_attn(sd, p):
    return {"to_qkv": conv2d_nb(sd, p + ".to_qkv"), "to_out": conv2d(sd, p + ".to_out")}


def convert_aux_model(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """ae_modules.py:212-361 ``Model`` -> models/vae_aux.Model params.
    ``cfg`` is an AuxModelConfig."""
    p: Dict[str, Any] = {}
    if cfg.use_timestep:
        p["temb_dense0"] = lin(sd, "temb.dense.0")
        p["temb_dense1"] = lin(sd, "temb.dense.1")
    p["conv_in"] = conv2d(sd, "conv_in")
    attn_conv = _convert_lin_attn if cfg.attn_type == "linear" else _convert_vae_attn
    n = len(cfg.ch_mult)
    curr_res = cfg.resolution
    for i in range(n):
        for b in range(cfg.num_res_blocks):
            p[f"down{i}_block{b}"] = _convert_resnet_t(sd, f"down.{i}.block.{b}", cfg.use_timestep)
            if curr_res in cfg.attn_resolutions:
                p[f"down{i}_attn{b}"] = attn_conv(sd, f"down.{i}.attn.{b}")
        if i != n - 1:
            p[f"down{i}_downsample"] = {"conv": conv2d(sd, f"down.{i}.downsample.conv")}
            curr_res //= 2
    p["mid_block_1"] = _convert_resnet_t(sd, "mid.block_1", cfg.use_timestep)
    p["mid_attn_1"] = attn_conv(sd, "mid.attn_1")
    p["mid_block_2"] = _convert_resnet_t(sd, "mid.block_2", cfg.use_timestep)
    for i in reversed(range(n)):
        for b in range(cfg.num_res_blocks + 1):
            p[f"up{i}_block{b}"] = _convert_resnet_t(sd, f"up.{i}.block.{b}", cfg.use_timestep)
            if curr_res in cfg.attn_resolutions:
                p[f"up{i}_attn{b}"] = attn_conv(sd, f"up.{i}.attn.{b}")
        if i != 0:
            p[f"up{i}_upsample"] = {"conv": conv2d(sd, f"up.{i}.upsample.conv")}
            curr_res *= 2
    p["norm_out"] = norm(sd, "norm_out")
    p["conv_out"] = conv2d(sd, "conv_out")
    return {"params": p}


def convert_simple_decoder(sd: Dict[str, Any]) -> Dict[str, Any]:
    """ae_modules.py:581-614 ``SimpleDecoder`` (torch names model.0-5)."""
    return {"params": {
        "conv0": conv2d(sd, "model.0"),
        "res1": _convert_resnet(sd, "model.1"),
        "res2": _convert_resnet(sd, "model.2"),
        "res3": _convert_resnet(sd, "model.3"),
        "conv4": conv2d(sd, "model.4"),
        "upsample": {"conv": conv2d(sd, "model.5.conv")},
        "norm_out": norm(sd, "norm_out"),
        "conv_out": conv2d(sd, "conv_out"),
    }}


def convert_upsample_decoder(sd: Dict[str, Any], ch_mult, num_res_blocks: int) -> Dict[str, Any]:
    """ae_modules.py:617-662 ``UpsampleDecoder``."""
    p: Dict[str, Any] = {}
    for i in range(len(ch_mult)):
        for b in range(num_res_blocks + 1):
            p[f"res{i}_{b}"] = _convert_resnet(sd, f"res_blocks.{i}.{b}")
        if i != len(ch_mult) - 1:
            p[f"upsample{i}"] = {"conv": conv2d(sd, f"upsample_blocks.{i}.conv")}
    p["norm_out"] = norm(sd, "norm_out")
    p["conv_out"] = conv2d(sd, "conv_out")
    return {"params": p}


def convert_latent_rescaler(sd: Dict[str, Any], depth: int = 2, pre: str = "") -> Dict[str, Any]:
    """ae_modules.py:665-699 ``LatentRescaler`` (``pre`` for the nested
    rescaler inside the Merged*/Upsampler compositions)."""
    dot = pre + "." if pre else ""
    p: Dict[str, Any] = {
        "conv_in": conv2d(sd, dot + "conv_in"),
        "attn": _convert_vae_attn(sd, dot + "attn"),
        "conv_out": conv2d(sd, dot + "conv_out"),
    }
    for i in range(depth):
        p[f"res1_{i}"] = _convert_resnet(sd, f"{dot}res_block1.{i}")
        p[f"res2_{i}"] = _convert_resnet(sd, f"{dot}res_block2.{i}")
    return {"params": p}


def convert_merged_rescale_encoder(sd: Dict[str, Any], cfg: VAEConfig, depth: int = 1) -> Dict[str, Any]:
    """ae_modules.py:702-718 — reference names encoder.* / rescaler.*."""
    return {"params": {
        "encoder": _convert_encoder(sd, cfg),
        "rescaler": convert_latent_rescaler(sd, depth, pre="rescaler")["params"],
    }}


def convert_merged_rescale_decoder(sd: Dict[str, Any], cfg: VAEConfig, depth: int = 1) -> Dict[str, Any]:
    """ae_modules.py:721-735 — reference names rescaler.* / decoder.*."""
    return {"params": {
        "rescaler": convert_latent_rescaler(sd, depth, pre="rescaler")["params"],
        "decoder": _convert_decoder(sd, cfg),
    }}


def convert_upsampler(sd: Dict[str, Any], cfg: VAEConfig) -> Dict[str, Any]:
    """ae_modules.py:738-754 — rescaler depth is fixed at 2 upstream."""
    return {"params": {
        "rescaler": convert_latent_rescaler(sd, 2, pre="rescaler")["params"],
        "decoder": _convert_decoder(sd, cfg),
    }}


def convert_first_stage_post(sd: Dict[str, Any], ch_mult) -> Dict[str, Any]:
    """ae_modules.py:780-845 ``FirstStagePostProcessor`` (the frozen
    pretrained_model.* keys are the caller's AutoencoderKL — skipped; its
    resblocks carry unused temb_proj weights, dropped per _convert_resnet_t)."""
    p: Dict[str, Any] = {
        "proj_norm": norm(sd, "proj_norm"),
        "proj": conv2d(sd, "proj"),
    }
    for i in range(len(ch_mult)):
        p[f"block{i}"] = _convert_resnet_t(sd, f"model.{i}", temb=False)
    return {"params": p}


# ---------------------------------------------------------------------------
# CLIP towers
# ---------------------------------------------------------------------------


def _convert_clip_block(sd, p):
    return {
        "ln_1": norm(sd, p + ".ln_1"),
        "ln_2": norm(sd, p + ".ln_2"),
        "attn": {
            "in_proj": {
                "kernel": _np(sd[p + ".attn.in_proj_weight"]).T,
                "bias": _np(sd[p + ".attn.in_proj_bias"]),
            },
            "out_proj": lin(sd, p + ".attn.out_proj"),
        },
        "mlp_fc": lin(sd, p + ".mlp.c_fc"),
        "mlp_proj": lin(sd, p + ".mlp.c_proj"),
    }


def convert_clip_text(sd: Dict[str, Any], cfg: CLIPTextConfig) -> Dict[str, Any]:
    """``cond_stage_model.model.*``-stripped OpenCLIP text tower."""
    p: Dict[str, Any] = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": norm(sd, "ln_final"),
    }
    n_blocks = cfg.layers - (1 if cfg.penultimate else 0)
    for i in range(n_blocks):
        p[f"resblock{i}"] = _convert_clip_block(sd, f"transformer.resblocks.{i}")
    return {"params": p}


def convert_clip_vision(sd: Dict[str, Any], cfg: CLIPVisionConfig) -> Dict[str, Any]:
    """``embedder.model.visual.*``-stripped OpenCLIP vision tower."""
    p: Dict[str, Any] = {
        "patch_embed": {"kernel": _np(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["class_embedding"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_pre": norm(sd, "ln_pre"),
    }
    for i in range(cfg.layers):
        p[f"resblock{i}"] = _convert_clip_block(sd, f"transformer.resblocks.{i}")
    return {"params": p}


def convert_clip_vision_pooled(sd: Dict[str, Any], cfg: CLIPVisionConfig) -> Dict[str, Any]:
    """``visual.*``-stripped pooled CLIP vision tower (OpenAI clip
    ``encode_image`` / open_clip ``model.visual`` — both use this naming:
    conv1/class_embedding/positional_embedding/ln_pre/transformer.resblocks/
    ln_post/proj). Feeds models/clip.CLIPVisionPooled
    (condition.py:136-171, :238-295)."""
    return {"params": {
        "tower": convert_clip_vision(sd, cfg)["params"],
        "ln_post": norm(sd, "ln_post"),
        "proj": _np(sd["proj"]),
    }}


def convert_resampler(sd: Dict[str, Any], cfg: ResamplerConfig) -> Dict[str, Any]:
    """``image_proj_model.*``-stripped Resampler (ip_resampler.py:93-135)."""
    p: Dict[str, Any] = {
        "latents": _np(sd["latents"]),
        "proj_in": lin(sd, "proj_in"),
        "proj_out": lin(sd, "proj_out"),
        "norm_out": norm(sd, "norm_out"),
    }
    for d in range(cfg.depth):
        p[f"attn{d}"] = {
            "norm1": norm(sd, f"layers.{d}.0.norm1"),
            "norm2": norm(sd, f"layers.{d}.0.norm2"),
            "to_q": lin_nb(sd, f"layers.{d}.0.to_q"),
            "to_kv": lin_nb(sd, f"layers.{d}.0.to_kv"),
            "to_out": lin_nb(sd, f"layers.{d}.0.to_out"),
        }
        p[f"ff{d}"] = {
            "norm": norm(sd, f"layers.{d}.1.0"),
            "fc1": lin_nb(sd, f"layers.{d}.1.1"),
            "fc2": lin_nb(sd, f"layers.{d}.1.3"),
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# Whole-checkpoint entry point
# ---------------------------------------------------------------------------


class EmaFallbackDict(dict):
    """UNet state-dict view with EMA-shadow fallback (lvdm/ema.py:5-23).

    LitEma registers shadow buffers named after the wrapped model's param
    names with dots stripped (``model_ema.diffusion_modelinput_blocks00weight``).
    A checkpoint carrying only EMA weights (or missing some primaries) would
    otherwise silently convert an incomplete tree; this view resolves any
    missing ``input_blocks.0.0.weight``-style key via its stripped shadow
    name. With ``prefer_ema`` the shadow wins even when the primary exists
    (the reference's ``ema_scope`` inference behavior, ddpm3d.py:167-180).
    """

    def __init__(self, primary: Dict[str, Any], shadow: Dict[str, Any],
                 prefix: str = "diffusion_model.", prefer_ema: bool = False):
        super().__init__(primary)
        self._shadow = shadow
        self._prefix = prefix
        self._prefer = prefer_ema

    def _sname(self, key: str) -> str:
        return (self._prefix + key).replace(".", "")

    def __getitem__(self, key):
        s = self._sname(key)
        if (self._prefer or not super().__contains__(key)) and s in self._shadow:
            return self._shadow[s]
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key) or self._sname(key) in self._shadow

    def get(self, key, default=None):
        # keep .get() consistent with the shadow-resolving __getitem__
        try:
            return self[key]
        except KeyError:
            return default

    # NOTE: iteration/len/items cover only the primary dict — stripped
    # shadow names can't be un-stripped without a template. The converters
    # access by explicit key (sd[k] / k in sd / sd.get), which all resolve.


def extract_ema_shadow(raw: Dict[str, Any]) -> Dict[str, Any]:
    """``model_ema.*`` shadow buffers (minus LitEma's decay/num_updates)."""
    return {
        k[len("model_ema."):]: v
        for k, v in raw.items()
        if k.startswith("model_ema.")
        and k not in ("model_ema.decay", "model_ema.num_updates")
    }


def split_state_dict(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split a full VideoCrafter checkpoint into per-component sub-dicts
    (prefix-stripped)."""
    prefixes = {
        "unet": "model.diffusion_model.",
        "vae": "first_stage_model.",
        "clip_text": "cond_stage_model.model.",
        "clip_vision": "embedder.model.visual.",
        "resampler": "image_proj_model.",
    }
    out: Dict[str, Dict[str, Any]] = {k: {} for k in prefixes}
    for key, val in sd.items():
        for comp, pref in prefixes.items():
            if key.startswith(pref):
                out[comp][key[len(pref):]] = val
                break
    return out


def load_videocrafter_checkpoint(
    path: str,
    config: ModelConfig,
    prefer_ema: bool = False,
    param_dtype: str = "compute",
) -> Dict[str, Any]:
    """Load + convert a torch VideoCrafter ckpt into the LatentVideoDiffusion
    params dict. Handles Lightning 'state_dict' nesting, DeepSpeed 'module.'
    prefixes (funcs.py:88-104), and EMA-shadow fallback/preference
    (lvdm/ema.py:5-76; only the UNet is EMA'd — VAE/CLIP are frozen).

    ``param_dtype``: "compute" (default) stores the tree in the model's
    compute dtype — a 1.44B-param fp32 tree costs 5.8 GB of HBM that bf16
    modules would down-cast per use anyway; "float32" keeps full precision
    (norm scales/biases then enter their fp32 math unrounded)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in raw:
        raw = raw["state_dict"]
    elif "module" in raw:  # deepspeed
        raw = {k[len("module."):]: v for k, v in raw["module"].items()}
    parts = split_state_dict(raw)
    shadow = extract_ema_shadow(raw)
    unet_sd = (
        EmaFallbackDict(parts["unet"], shadow, prefer_ema=prefer_ema)
        if shadow
        else parts["unet"]
    )

    params: Dict[str, Any] = {
        "unet": convert_unet(unet_sd, config.unet),
        "vae": convert_vae(parts["vae"], config.vae),
        "clip_text": convert_clip_text(parts["clip_text"], config.clip_text),
    }
    if config.clip_vision and parts["clip_vision"]:
        params["clip_vision"] = convert_clip_vision(parts["clip_vision"], config.clip_vision)
    if config.resampler and parts["resampler"]:
        params["resampler"] = convert_resampler(parts["resampler"], config.resampler)
    if param_dtype != "float32":
        import jax
        import jax.numpy as jnp
        import numpy as np

        dt = config.jnp_dtype if param_dtype == "compute" else jnp.dtype(param_dtype)
        if dt != jnp.float32:
            # leaves are host numpy here — cast on host (checking dtype via
            # jnp would round-trip 5.8 GB of fp32 through the device first)
            params = jax.tree.map(
                lambda a: jnp.asarray(
                    a.astype(dt) if np.issubdtype(np.asarray(a).dtype, np.floating) else a
                ),
                params,
            )
    return params


# ---------------------------------------------------------------------------
# Alternate encoders (models/encoders_alt.py) — the reference's unused
# FrozenCLIPEmbedder / FrozenT5Embedder towers (condition.py:89,57)
# ---------------------------------------------------------------------------


def convert_hf_clip_text(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """transformers ``CLIPTextModel`` state dict -> HFCLIPTextEncoder tree.

    HF naming: text_model.embeddings.{token,position}_embedding,
    text_model.encoder.layers.{i}.{self_attn.{q,k,v,out}_proj,
    layer_norm1/2, mlp.fc1/fc2}, text_model.final_layer_norm."""
    r = "text_model."
    p: Dict[str, Any] = {
        "token_embedding": _np(sd[r + "embeddings.token_embedding.weight"]),
        "positional_embedding": _np(sd[r + "embeddings.position_embedding.weight"]),
        "ln_final": norm(sd, r + "final_layer_norm"),
    }
    for i in range(cfg.layers):
        b = f"{r}encoder.layers.{i}."
        p[f"block{i}"] = {
            "ln_1": norm(sd, b + "layer_norm1"),
            "ln_2": norm(sd, b + "layer_norm2"),
            "q": lin(sd, b + "self_attn.q_proj"),
            "k": lin(sd, b + "self_attn.k_proj"),
            "v": lin(sd, b + "self_attn.v_proj"),
            "out": lin(sd, b + "self_attn.out_proj"),
            "mlp_fc": lin(sd, b + "mlp.fc1"),
            "mlp_proj": lin(sd, b + "mlp.fc2"),
        }
    return {"params": p}


def convert_t5_encoder(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """transformers ``T5EncoderModel`` state dict -> T5TextEncoder tree.

    The relative-position bias table lives in block 0's attention
    (encoder.block.0.layer.0.SelfAttention.relative_attention_bias) and is
    shared by all layers — it becomes the encoder-level table here."""
    emb_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    p: Dict[str, Any] = {
        "token_embedding": _np(sd[emb_key]),
        "relative_attention_bias": _np(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "ln_final": {"weight": _np(sd["encoder.final_layer_norm.weight"])},
    }
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}.layer."
        p[f"block{i}"] = {
            "ln_attn": {"weight": _np(sd[b + "0.layer_norm.weight"])},
            "q": lin_nb(sd, b + "0.SelfAttention.q"),
            "k": lin_nb(sd, b + "0.SelfAttention.k"),
            "v": lin_nb(sd, b + "0.SelfAttention.v"),
            "o": lin_nb(sd, b + "0.SelfAttention.o"),
            "ln_ff": {"weight": _np(sd[b + "1.layer_norm.weight"])},
            "wi_0": lin_nb(sd, b + "1.DenseReluDense.wi_0"),
            "wi_1": lin_nb(sd, b + "1.DenseReluDense.wi_1"),
            "wo": lin_nb(sd, b + "1.DenseReluDense.wo"),
        }
    return {"params": p}
