"""Morton (Z-order) encode/decode and occupancy-bitfield packing in pure jnp.

The reference implements these as CUDA kernels (`lib/ops/raymarching/src/
raymarching.cu:214-302`: kernel_morton3D/_invert/_packbits) because its density
grid is Morton-laid-out for warp locality. On TPU the density grid is a plain
(G, G, G) array and Morton order is unnecessary for the renderer — these ops
are kept for interop (loading reference density grids) and for the packed
bitfield used to cheaply ship occupancy into Pallas kernels.
"""
import jax.numpy as jnp

__all__ = ["morton3d", "morton3d_invert", "packbits"]


def _expand_bits(v):
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """coords: (..., 3) int in [0, 1024) -> (...) uint32 Morton codes."""
    c = coords.astype(jnp.uint32)
    return (_expand_bits(c[..., 0]) | (_expand_bits(c[..., 1]) << 1)
            | (_expand_bits(c[..., 2]) << 2))


def _compact_bits(v):
    v &= jnp.uint32(0x49249249)
    v = (v ^ (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v ^ (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v ^ (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v ^ (v >> 16)) & jnp.uint32(0x0000FFFF)
    return v


def morton3d_invert(codes):
    """(...,) uint32 Morton codes -> (..., 3) int32 coords."""
    codes = codes.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(codes), _compact_bits(codes >> 1),
         _compact_bits(codes >> 2)], axis=-1).astype(jnp.int32)


def packbits(grid, thresh):
    """Flat density grid (N,) -> (N // 8,) uint8 bitfield; bit i of byte b is
    set when grid[8 * b + i] > thresh (ref kernel_packbits semantics)."""
    bits = (grid.reshape(-1, 8) > thresh).astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(bits << shifts, axis=-1).astype(jnp.uint8)
