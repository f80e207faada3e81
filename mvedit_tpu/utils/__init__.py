from . import camera, geometry

__all__ = ["camera", "geometry"]
