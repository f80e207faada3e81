from .attention import AttnMode
from .unet import UNetConfig, UNet2DCondition, SD15_UNET, SD21_UNET
from .vae import VAEConfig, AutoencoderKL, SD_VAE
from .clip import (CLIPTextConfig, CLIPTextModel, CLIPVisionConfig,
                   CLIPVisionModel, SD15_TEXT, IPADAPTER_VISION)
from .controlnet import ControlNet, apply_multi_controlnet
from . import schedulers

__all__ = [
    "AttnMode", "UNetConfig", "UNet2DCondition", "SD15_UNET", "SD21_UNET",
    "VAEConfig", "AutoencoderKL", "SD_VAE",
    "CLIPTextConfig", "CLIPTextModel", "CLIPVisionConfig", "CLIPVisionModel",
    "SD15_TEXT", "IPADAPTER_VISION",
    "ControlNet", "apply_multi_controlnet", "schedulers",
]
