from .container import Mesh
from .dmtet import TetGrid, build_grid_tets, marching_tets
from .rasterize import (RasterConfig, project_mesh, rasterize, interpolate,
                        render_mesh_attrs)
from .renderer import (vertex_normals, render_views, bake_texture,
                       camera_weights_uv)
from .texture import build_mipmaps, sample_texture, bake_multiview
from .tsdf import tsdf_integrate, tsdf_to_mesh, tsdf_rgbd_to_mesh

__all__ = [
    "Mesh", "TetGrid", "build_grid_tets", "marching_tets",
    "RasterConfig", "project_mesh", "rasterize", "interpolate",
    "render_mesh_attrs", "vertex_normals", "render_views", "bake_texture",
    "camera_weights_uv", "build_mipmaps", "sample_texture", "bake_multiview",
    "tsdf_integrate", "tsdf_to_mesh", "tsdf_rgbd_to_mesh",
]
