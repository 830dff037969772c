"""DynamicScaler-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
seamless, loopable panoramic video generation with frozen video diffusion
models.

Re-designed from scratch for TPU hardware with the capabilities of the
DynamicScaler reference (sh-Lin/DynamicScaler): shift-window multi-window
denoising over ring (wrap-around) panoramic latents, spherical/equirect
panorama denoising via perspective view projection, long-horizon frame
windows with docking, tiled VAE encode / ring-aware decode, and multi-stage
upscaling — all expressed as batched, jit-compiled XLA programs over a
device mesh instead of sequential Python window loops.

Canonical latent layout is **[B, F, H, W, C]** (channels last — maps to TPU
lanes; frame/space axes lead for windowing). The reference's torch layout
[B, C, F, H, W] is converted at the IO boundary only.
"""

__version__ = "0.1.0"
