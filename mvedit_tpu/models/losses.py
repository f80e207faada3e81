"""Loss library (pure jnp), matching reference semantics.

Rebuilds `lib/models/losses/`:
- `l1_loss`/`mse_loss` with elementwise weights (pixelwise_loss.py:24,40);
- `tv_loss` power-1.5 total variation with optional target + weight
  (tv_loss.py; used for normal regularization at mvedit_3d_pipeline.py:461);
- `entropy_loss` over compositing bin weights + background residual
  (mvedit_3d_pipeline.py:597-605);
- `lpips` perceptual distance: VGG16 feature stack + linear calibration
  heads (lpips_loss.py wraps the lpips package; here the net is hand-rolled
  jnp with a params pytree so HF/torch weights can be converted in).
"""
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["l1_loss", "mse_loss", "tv_loss", "entropy_loss",
           "lpips_init", "lpips_apply", "lpips_params_from_torch"]


def _weighted_mean(err, weight):
    if weight is None:
        return jnp.mean(err)
    weight = jnp.broadcast_to(weight, err.shape)
    return jnp.mean(err * weight)


def l1_loss(pred, target, weight=None):
    return _weighted_mean(jnp.abs(pred - target), weight)


def mse_loss(pred, target, weight=None):
    return _weighted_mean((pred - target) ** 2, weight)


def tv_loss(x, target=None, weight=None, power=1.5):
    """Total variation of x (N, C, H, W); if `target` is given, penalize the
    TV of the difference (the reference's 'guided' TV for normal maps).
    `weight` is an elementwise map broadcast over the finite differences."""
    d = x if target is None else x - target
    dh = d[..., 1:, :] - d[..., :-1, :]
    dw = d[..., :, 1:] - d[..., :, :-1]
    if weight is not None:
        wh = jnp.minimum(weight[..., 1:, :], weight[..., :-1, :])
        ww = jnp.minimum(weight[..., :, 1:], weight[..., :, :-1])
    else:
        wh = ww = None
    lh = _weighted_mean(jnp.abs(dh) ** power, wh)
    lw = _weighted_mean(jnp.abs(dw) ** power, ww)
    return 0.5 * (lh + lw)


def entropy_loss(weights, bin_widths, alphas, bg_width=0.125, num_pixels=None):
    """Opacity entropy regularizer (mvedit_3d_pipeline.py:597-605).

    weights: (R, S) compositing weights; bin_widths: (R, S) dt along ray;
    alphas: (R,) accumulated opacity. Encourages weights to concentrate.
    """
    w = weights.astype(jnp.float32)
    bg = (1.0 - alphas.reshape(-1)).astype(jnp.float32)
    n = num_pixels if num_pixels is not None else w.shape[0]
    ent = jnp.sum(w * (jnp.log(jnp.clip(w, 1e-6, None))
                       - jnp.log(jnp.clip(bin_widths, 1e-6, None)))) \
        + jnp.sum(bg * (jnp.log(jnp.clip(bg, 1e-6, None)) - jnp.log(bg_width)))
    return -ent / n


# ---------------------------------------------------------------------------
# LPIPS (VGG16 backbone + linear heads), ports lpips package weights.
# ---------------------------------------------------------------------------

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
# feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAP_LAYERS = (1, 3, 6, 9, 12)  # indices into the conv list
_TAP_CHANNELS = (64, 128, 256, 512, 512)
import numpy as _np
_SHIFT = _np.array([-0.030, -0.088, -0.188], _np.float32)
_SCALE = _np.array([0.458, 0.448, 0.450], _np.float32)


def lpips_init(key, dtype=jnp.float32):
    """Random-init LPIPS params (same pytree layout as converted weights):
    {'convs': [{'w': (kh,kw,cin,cout), 'b': (cout,)}...], 'lins': [(c,) ...]}
    """
    convs = []
    c_in = 3
    keys = jax.random.split(key, 32)
    ki = 0
    for v in _VGG16_CFG:
        if v == "M":
            continue
        fan = 3 * 3 * c_in
        w = jax.random.normal(keys[ki], (3, 3, c_in, v), dtype) / jnp.sqrt(fan)
        convs.append({"w": w, "b": jnp.zeros((v,), dtype)})
        c_in = v
        ki += 1
    lins = [jnp.ones((c,), dtype) / c for c in _TAP_CHANNELS]
    return {"convs": convs, "lins": lins}


def _vgg_features(params, x):
    """x: (N, H, W, 3) normalized. Returns list of tap activations (NHWC).

    Computes in the params' dtype: the runner stores inference params in
    bf16 and lax.conv requires matching operand dtypes."""
    feats = []
    conv_i = 0
    h = x.astype(params["convs"][0]["w"].dtype)
    for v in _VGG16_CFG:
        if v == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        w = params["convs"][conv_i]["w"]
        b = params["convs"][conv_i]["b"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h = jax.nn.relu(h)
        if conv_i in _TAP_LAYERS:
            feats.append(h)
        conv_i += 1
    return feats


@jax.jit
def lpips_apply(params, pred, target, weight=None):
    """Perceptual distance. pred/target: (N, H, W, 3) in [0, 1].

    Returns scalar mean over batch (weighted if `weight` (N,) given)."""
    def norm_input(im):
        return (im * 2.0 - 1.0 - _SHIFT) / _SCALE

    fp = _vgg_features(params, norm_input(pred))
    ft = _vgg_features(params, norm_input(target))
    dists = []
    for a, b, lin in zip(fp, ft, params["lins"]):
        a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10, None)
        b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10, None)
        d = jnp.sum(((a - b) ** 2) * jnp.clip(lin, 0.0, None), axis=-1)
        dists.append(jnp.mean(d, axis=(1, 2)))  # (N,)
    per_im = sum(dists)
    if weight is not None:
        return jnp.mean(per_im * weight)
    return jnp.mean(per_im)


def lpips_params_from_torch(vgg_state, lin_state):
    """Convert torchvision VGG16 `features` state_dict + lpips lin weights.

    vgg conv weights are (cout, cin, kh, kw) -> (kh, kw, cin, cout);
    lpips lin layers are 1x1 convs (c, 1, 1) weight -> (c,)."""
    import numpy as np
    convs = []
    i = 0
    while f"{i}.weight" in vgg_state or f"features.{i}.weight" in vgg_state:
        pre = f"features.{i}" if f"features.{i}.weight" in vgg_state else str(i)
        w = np.asarray(vgg_state[f"{pre}.weight"])
        if w.ndim == 4:
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                          "b": jnp.asarray(np.asarray(vgg_state[f"{pre}.bias"]))})
        i += 1
        while (f"{i}.weight" not in vgg_state
               and f"features.{i}.weight" not in vgg_state and i < 40):
            i += 1
    lins = [jnp.asarray(np.asarray(v).reshape(-1)) for v in lin_state]
    return {"convs": convs[:13], "lins": lins}
