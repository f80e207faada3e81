import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvedit_tpu.models.mesh.gaussians import GSRasterConfig, render_gaussians

CFG = GSRasterConfig(height=64, width=64, tile=16, k_per_tile=64,
                     tile_chunk=16)


def _cam():
    pose_w2c = jnp.asarray(np.concatenate(
        [np.eye(3), np.zeros((3, 1))], axis=1), jnp.float32)
    intr = jnp.asarray([64.0, 64.0, 32.0, 32.0])
    return pose_w2c, intr


def test_single_gaussian_renders_centered_blob():
    pose, intr = _cam()
    means = jnp.asarray([[0.0, 0.0, 2.0]])
    scales = jnp.asarray([[0.1, 0.1, 0.1]])
    quats = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    colors = jnp.asarray([[1.0, 0.0, 0.0]])
    opac = jnp.asarray([0.9])
    out = render_gaussians(means, scales, quats, colors, opac, pose, intr,
                           CFG, bg_color=0.0)
    rgb = np.asarray(out["rgb"])
    alpha = np.asarray(out["alpha"])
    assert alpha[32, 32] > 0.5
    assert alpha[2, 2] < 0.01
    assert rgb[32, 32, 0] > rgb[32, 32, 1]
    # depth at center ~2
    assert abs(out["depth"][32, 32] / max(alpha[32, 32], 1e-6) - 2.0) < 0.1


def test_gaussian_occlusion_front_to_back():
    pose, intr = _cam()
    means = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]])
    scales = jnp.full((2, 3), 0.15)
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
    colors = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    opac = jnp.asarray([0.99, 0.99])
    out = render_gaussians(means, scales, quats, colors, opac, pose, intr,
                           CFG, bg_color=0.0)
    rgb = np.asarray(out["rgb"])
    # near red gaussian dominates the center
    assert rgb[32, 32, 0] > rgb[32, 32, 1] * 2


def test_gaussian_grads_flow():
    pose, intr = _cam()

    def loss(means):
        out = render_gaussians(
            means, jnp.full((1, 3), 0.1),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.asarray([[0.5, 0.5, 0.5]]),
            jnp.asarray([0.9]), pose, intr, CFG)
        return jnp.sum(out["alpha"] * jnp.arange(64)[None, :])

    g = jax.grad(loss)(jnp.asarray([[0.0, 0.0, 2.0]]))
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[0, 0])) > 1e-3  # moving in x shifts the blob


@pytest.mark.slow  # integration tier: gaussian rasterizer covered by the other test_gaussians tests; GRM itself is a reference skeleton
def test_grm_skeleton_shapes():
    from mvedit_tpu.models.grm import (GRMConfig, GRMEncoder,
                                       GaussianUpsampler,
                                       pixels_to_gaussians)
    cfg = GRMConfig(dim=32, depth=1, heads=4, patch_size=8)
    enc = GRMEncoder(cfg)
    imgs = jnp.zeros((2, 32, 32, 3))
    plucker = jnp.zeros((2, 32, 32, 6))
    params = enc.init(jax.random.PRNGKey(0), imgs, plucker)
    feat = enc.apply(params, imgs, plucker)
    assert feat.shape == (2, 4, 4, 32)
    up = GaussianUpsampler(factor=8)
    uparams = up.init(jax.random.PRNGKey(1), feat)
    pm = up.apply(uparams, feat)
    assert pm.shape == (2, 32, 32, 14)
    poses = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
    intr = jnp.tile(jnp.asarray([32.0, 32, 16, 16])[None], (2, 1))
    g = pixels_to_gaussians(pm, poses, intr)
    assert g["means"].shape == (2 * 32 * 32, 3)
    assert g["quats"].shape[-1] == 4
