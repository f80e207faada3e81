"""mvedit_tpu: TPU-native (JAX/XLA/Pallas) 3D-Adapter / MVEdit framework.

A ground-up rebuild of the capabilities of Lakonik/MVEdit ("3D-Adapter"):
optimization-based 3D generation/editing interleaving multi-view diffusion
denoising with differentiable 3D reconstruction (hash-grid NeRF -> DMTet mesh),
designed for TPU from the start (static shapes, pjit/shard_map over a device
mesh, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"
