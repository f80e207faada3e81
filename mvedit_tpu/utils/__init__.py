from . import camera, geometry, profiling

__all__ = ["camera", "geometry", "profiling"]
