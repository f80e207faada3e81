"""Image pre/post-processing shared by the endpoints.

Rebuilds `lib/pipelines/utils.py`:
- `pad_rgba_image` (:29): center the foreground with a padding ratio;
- `do_segmentation` (:73-153): TRACER mask + optional box-prompted SAM
  refinement (SAM optional here; hook via `refine_fn`);
- `zero123plus_postprocess` (:315-347): background removal on the 6-view
  grid. The reference runs pymatting's closed-form matting; here a
  guided-filter alpha refinement (same role, local linear model) keeps it
  dependency-free and fast; normal outputs get the normal-norm alpha rule.
"""
import numpy as np

__all__ = ["pad_rgba_image", "guided_filter", "refine_alpha",
           "zero123plus_postprocess", "do_segmentation"]


def pad_rgba_image(rgba, ratio=0.75):
    """Crop to the alpha bbox and re-pad so the object fills `ratio` of a
    square canvas (pipelines/utils.py:29)."""
    rgba = np.asarray(rgba)
    alpha = rgba[..., 3] if rgba.shape[-1] == 4 else np.ones(rgba.shape[:2])
    ys, xs = np.nonzero(alpha > 0.5 * alpha.max())
    if len(ys) == 0:
        return rgba
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    crop = rgba[y0:y1, x0:x1]
    h, w = crop.shape[:2]
    size = int(round(max(h, w) / ratio))
    out = np.zeros((size, size, rgba.shape[-1]), rgba.dtype)
    oy = (size - h) // 2
    ox = (size - w) // 2
    out[oy:oy + h, ox:ox + w] = crop
    return out


def _box_filter(x, r):
    """Fast box filter via cumsum, edge-padded. x: (H, W) or (H, W, C)."""
    def f1(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (r + 1, r)
        c = np.cumsum(np.pad(a, pad, mode="edge"), axis=axis)
        hi = np.take(c, np.arange(2 * r + 1, c.shape[axis]), axis=axis)
        lo = np.take(c, np.arange(0, c.shape[axis] - 2 * r - 1), axis=axis)
        return (hi - lo) / (2 * r + 1)
    return f1(f1(np.asarray(x, np.float64), 0), 1)


def guided_filter(guide, src, radius=8, eps=1e-4):
    """He et al. guided filter: edge-aware smoothing of `src` guided by the
    image (local linear model — the same family as closed-form matting)."""
    g = np.asarray(guide, np.float64)
    if g.ndim == 3:
        g = g.mean(-1)
    p = np.asarray(src, np.float64)
    mean_g = _box_filter(g, radius)
    mean_p = _box_filter(p, radius)
    corr_gp = _box_filter(g * p, radius)
    corr_gg = _box_filter(g * g, radius)
    var_g = corr_gg - mean_g ** 2
    cov_gp = corr_gp - mean_g * mean_p
    a = cov_gp / (var_g + eps)
    b = mean_p - a * mean_g
    return _box_filter(a, radius) * g + _box_filter(b, radius)


def refine_alpha(image, alpha, radius=8, eps=1e-4):
    """Edge-aware alpha refinement (pymatting replacement in role)."""
    out = guided_filter(image, np.asarray(alpha, np.float64), radius, eps)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def zero123plus_postprocess(grid_rgb, coarse_mask=None, is_normal=False,
                            normal_bg=(0.5, 0.5, 1.0)):
    """6-view grid background removal (pipelines/utils.py:315-347).

    grid_rgb: (H, W, 3) in [0,1]. For normal maps, alpha comes from the
    deviation of |n| from the background normal (:345 normal-norm rule).
    Returns (H, W, 4) RGBA.
    """
    grid_rgb = np.asarray(grid_rgb, np.float32)
    if is_normal:
        dev = np.linalg.norm(grid_rgb - np.asarray(normal_bg), axis=-1)
        alpha = np.clip(dev * 4.0, 0.0, 1.0)
    else:
        if coarse_mask is None:
            # background estimate: grid corners are background (gray-ish)
            bg = np.median(
                np.concatenate([grid_rgb[:4].reshape(-1, 3),
                                grid_rgb[-4:].reshape(-1, 3)]), axis=0)
            dev = np.linalg.norm(grid_rgb - bg, axis=-1)
            coarse_mask = np.clip(dev * 6.0 - 0.1, 0.0, 1.0)
        alpha = refine_alpha(grid_rgb, coarse_mask)
    return np.concatenate([grid_rgb, alpha[..., None]], axis=-1)


def do_segmentation(images, segment_fn, refine_fn=None, bg_color=None,
                    color_threshold=0.25, erosion=0):
    """Foreground masking flow (`lib/pipelines/utils.py:73-153`
    do_segmentation): TRACER-style masks -> optional background-color
    override -> optional box-prompted refinement (the reference's SAM
    predictor; any `refine_fn(image_uint8 (H,W,3), bbox (4,)) -> (H,W)
    float mask` plugs in) -> erosion.

    images: (N, H, W, 3) float [0,1]. Returns masks (N, H, W, 1) float.
    """
    import jax.numpy as jnp
    images = np.asarray(images, np.float32)
    masks = np.asarray(segment_fn(jnp.asarray(images)))
    if masks.ndim == 3:
        masks = masks[..., None]
    if bg_color is not None:
        bg = np.asarray(bg_color, np.float32)
        non_fg = np.all((images >= bg - color_threshold)
                        & (images <= bg + color_threshold), axis=-1)
        masks[~non_fg] = 1.0
    if refine_fn is not None:
        out = []
        for img, m in zip(images, masks):
            mb = m[..., 0] > 0.5
            xs = np.flatnonzero(mb.any(axis=0))
            ys = np.flatnonzero(mb.any(axis=1))
            if len(xs) == 0 or len(ys) == 0:
                out.append(m)          # empty mask: nothing to prompt
                continue
            bbox = np.array([xs[0], ys[0], xs[-1] + 1, ys[-1] + 1])
            refined = np.asarray(
                refine_fn((img * 255).astype(np.uint8), bbox), np.float32)
            if erosion > 0:
                k = erosion
                pad = np.pad(refined > 0.5, k, mode="edge")
                er = np.ones_like(refined, bool)
                for dy in range(-k, k + 1):
                    for dx in range(-k, k + 1):
                        er &= pad[k + dy: k + dy + refined.shape[0],
                                  k + dx: k + dx + refined.shape[1]]
                refined = er.astype(np.float32)
            out.append(refined[..., None])
        masks = np.stack(out)
        if bg_color is not None:
            masks[~non_fg] = 1.0
    return masks
