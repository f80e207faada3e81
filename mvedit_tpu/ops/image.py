"""Image-space ops used across the pipelines (pure jnp).

- `gaussian_blur` / `highpass`: the Gaussian high-pass applied to normal maps
  before LPIPS (ref `lib/pipelines/utils.py:187-189`).
- `erode`: morphological erosion via -maxpool(-x) as the TRACER segmentor does
  (ref `lib/models/segmentors/tracer_b7.py:45-55`).
- `resize_bilinear`: antialiased resize wrapper (jax.image).
- `edge_dilation`: iterative nearest-valid-pixel fill used to pad texture
  atlases so mipmaps do not bleed (ref `lib/ops/edge_dilation.py:5`).
- `fill_holes`: grayscale morphological reconstruction by erosion (ref
  `lib/core/utils/geometry_utils.py:171-181`).
"""
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["gaussian_kernel1d", "gaussian_blur", "highpass", "erode",
           "resize_bilinear", "edge_dilation", "fill_holes"]


def gaussian_kernel1d(sigma, radius=None):
    if radius is None:
        radius = int(3.0 * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, sigma):
    """img: (..., H, W). Separable blur with reflect padding."""
    k = gaussian_kernel1d(sigma)
    r = (k.shape[0] - 1) // 2
    batch = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape(-1, 1, h, w)
    pad = [(0, 0), (0, 0), (r, r), (r, r)]
    x = jnp.pad(x, pad, mode="reflect")
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn)
    return x.reshape(*batch, h, w)


def highpass(img, sigma=3.0):
    """img - blur(img) + 0.5, clipped to [0,1] (ref pipelines/utils.py:187)."""
    return jnp.clip(img - gaussian_blur(img, sigma) + 0.5, 0.0, 1.0)


def erode(mask, kernel_size=3):
    """mask: (..., H, W) in [0,1]; erosion = -maxpool(-x)."""
    pad = kernel_size // 2
    batch = mask.shape[:-2]
    h, w = mask.shape[-2:]
    x = mask.reshape(-1, h, w)
    out = -jax.lax.reduce_window(
        -x, -jnp.inf, jax.lax.max, (1, kernel_size, kernel_size), (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)])
    return out.reshape(*batch, h, w)


def resize_bilinear(img, shape, antialias=True):
    """img: (..., H, W, C) -> (..., *shape, C)."""
    out_shape = (*img.shape[:-3], *shape, img.shape[-1])
    return jax.image.resize(img, out_shape, "bilinear", antialias=antialias)


@partial(jax.jit, static_argnames=("n_iters",))
def edge_dilation(img, mask, n_iters=16):
    """Fill pixels where mask==0 from valid 3x3 neighbors, iteratively.

    img: (H, W, C); mask: (H, W) in {0, 1}. Each iteration, invalid pixels take
    the mask-weighted average of their valid neighbors; repeating propagates
    colors outward from the valid region (same effect as the reference's
    nearest-valid-pixel dilation, `lib/ops/edge_dilation.py`).
    """
    k = jnp.ones((1, 1, 3, 3), jnp.float32)

    def conv(x):  # x: (C, H, W)
        x = x[:, None]
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
        y = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
        return y[:, 0]

    def body(_, state):
        im, m = state
        msum = conv(m[None])[0]
        csum = conv(jnp.moveaxis(im * m[..., None], -1, 0))
        filled = jnp.moveaxis(csum, 0, -1) / jnp.clip(msum[..., None], 1e-8, None)
        new_m = jnp.clip(msum, 0.0, 1.0)
        im = jnp.where(m[..., None] > 0, im, filled)
        m = jnp.maximum(m, (msum > 0).astype(m.dtype))
        del new_m
        return im, m

    img = img.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    img, mask = jax.lax.fori_loop(0, n_iters, body, (img, mask))
    return img


def fill_holes(image, max_iters=None):
    """Fill dark holes of a grayscale image in place, leaving the border.

    Morphological reconstruction by erosion with seed = image.max()
    everywhere except the 1-pixel border (skimage
    ``morphology.reconstruction(seed, image, method='erosion')`` as the
    reference uses it, `lib/core/utils/geometry_utils.py:171-181`): the
    result is the smallest image >= `image` whose local minima all touch
    the border. Implemented as a fixed-point of erode-then-clamp —
    ``f <- max(min-pool3x3(f), image)`` — run inside one
    `lax.while_loop` until convergence (bounded by `max_iters`, default
    H+W which is the longest possible geodesic propagation path).

    Args:
        image: (H, W) grayscale.

    Returns:
        (H, W) reconstructed image, dtype float32.
    """
    img = jnp.asarray(image, jnp.float32)
    H, W = img.shape
    if max_iters is None:
        max_iters = H + W
    top = jnp.max(img)
    border = jnp.zeros((H, W), bool).at[0, :].set(True).at[-1, :].set(
        True).at[:, 0].set(True).at[:, -1].set(True)
    seed = jnp.where(border, img, top)

    def erode3(x):
        return -jax.lax.reduce_window(-x, -jnp.inf, jax.lax.max,
                                      (3, 3), (1, 1), "SAME")

    def cond(state):
        f, prev, i = state
        return (i < max_iters) & jnp.any(f != prev)

    def body(state):
        f, _, i = state
        return jnp.maximum(erode3(f), img), f, i + 1

    f0 = jnp.maximum(erode3(seed), img)
    out, _, _ = jax.lax.while_loop(cond, body, (f0, seed, 0))
    return out
