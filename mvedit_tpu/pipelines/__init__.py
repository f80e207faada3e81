from .denoise import (DenoiseModels, make_noise_pred_1pass,
                      make_noise_pred_2pass)
from .mvedit_3d import MVEdit3DConfig, MVEdit3DPipeline
from .texture import TextureConfig, TexturePipeline, make_texture_fit
from .zero123plus import Zero123PlusConfig, Zero123PlusPipeline
from .zero123 import (Zero123Config, Zero123Pipeline, CLIPCameraProjection,
                      camera_embedding)

__all__ = [
    "DenoiseModels", "make_noise_pred_1pass", "make_noise_pred_2pass",
    "MVEdit3DConfig", "MVEdit3DPipeline",
    "TextureConfig", "TexturePipeline", "make_texture_fit",
    "Zero123PlusConfig", "Zero123PlusPipeline",
    "Zero123Config", "Zero123Pipeline", "CLIPCameraProjection",
    "camera_embedding",
]
