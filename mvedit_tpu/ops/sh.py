"""Closed-form real spherical-harmonics direction encoding.

TPU-native replacement for the reference's shencoder CUDA extension
(`lib/ops/shencoder/src/shencoder.cu`, wrapper `sphere_harmonics.py:62-87`):
the polynomial basis is evaluated directly in jnp, so it vectorizes on the VPU
and `jax.grad` provides the analytic input gradients the CUDA kernel hand-codes.

Inputs are unit (or [-1, 1]) directions; output dim = degree**2. Degrees 1-4
cover every use in the framework (default 4 -> 16 features).
"""
import jax.numpy as jnp

__all__ = ["sh_encode"]

# Real SH constants (same normalization as instant-ngp / torch-ngp).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def sh_encode(dirs, degree=4, size=1.0):
    """Encode directions with real spherical harmonics.

    Args:
        dirs: (..., 3) directions in [-size, size].
        degree: 1..4; output has degree**2 channels.
    Returns:
        (..., degree**2) float32 features.
    """
    if not (1 <= degree <= 4):
        raise ValueError(f"sh_encode supports degree in [1, 4], got {degree}")
    d = dirs / size
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)
