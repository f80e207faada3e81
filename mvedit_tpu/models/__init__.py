from . import fields, losses, nerf_fit, volume_renderer

__all__ = ["fields", "losses", "nerf_fit", "volume_renderer"]
