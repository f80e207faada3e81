from .activation import trunc_exp
from .sh import sh_encode
from .tonemapping import Tonemapping
from .grid_sample import grid_sample_2d, grid_sample_3d
from .hash_grid import HashGridConfig, hash_grid_init, hash_grid_encode
from .morton import morton3d, morton3d_invert, packbits
from .image import (gaussian_blur, highpass, erode, resize_bilinear,
                    edge_dilation, fill_holes)
from .dense_grid import DenseGridConfig, dense_grid_init, dense_grid_encode
from .rotation import (matrix_to_quaternion, quaternion_to_matrix,
                       axis_angle_to_matrix, get_camera_dists, prune_cameras)
from .volume_interp import (SparseVolume, sparse_volume,
                            spvolume_linear_interp, build_neighbor,
                            neighbor_spvolume_linear_interp,
                            dense_from_sparse, sparse_from_dense)

__all__ = [
    "trunc_exp", "sh_encode", "Tonemapping",
    "grid_sample_2d", "grid_sample_3d",
    "HashGridConfig", "hash_grid_init", "hash_grid_encode",
    "morton3d", "morton3d_invert", "packbits",
    "gaussian_blur", "highpass", "erode", "resize_bilinear", "edge_dilation",
    "fill_holes",
    "DenseGridConfig", "dense_grid_init", "dense_grid_encode",
    "matrix_to_quaternion", "quaternion_to_matrix", "axis_angle_to_matrix",
    "get_camera_dists", "prune_cameras",
    "SparseVolume", "sparse_volume", "spvolume_linear_interp",
    "build_neighbor", "neighbor_spvolume_linear_interp",
    "dense_from_sparse", "sparse_from_dense",
]
