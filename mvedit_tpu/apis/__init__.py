from . import cameras, parameters
from .runner import Adapter3DRunner
from .server import ApiServer

__all__ = ["cameras", "parameters", "Adapter3DRunner", "ApiServer"]
