from . import (fields, losses, nerf_fit, mesh_fit, volume_renderer,
               triplane, ssdnerf, gaussian_diffusion, ddpm_unet, grm,
               image_enhancer, inception, volume_unet)
from . import mesh, diffusion, segmentors

__all__ = [
    "fields", "losses", "nerf_fit", "mesh_fit", "volume_renderer",
    "triplane", "ssdnerf", "gaussian_diffusion", "ddpm_unet", "grm",
    "image_enhancer", "inception", "volume_unet", "mesh", "diffusion",
    "segmentors",
]
