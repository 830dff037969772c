from dynamicscaler_tpu.models.unet3d import UNet3D
from dynamicscaler_tpu.models.vae import Encoder, Decoder, AutoencoderKL
from dynamicscaler_tpu.models.resampler import Resampler, ImageProjModel
from dynamicscaler_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder

__all__ = [
    "UNet3D",
    "Encoder",
    "Decoder",
    "AutoencoderKL",
    "Resampler",
    "ImageProjModel",
    "CLIPTextEncoder",
    "CLIPVisionEncoder",
]
