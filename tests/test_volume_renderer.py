import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvedit_tpu.models.volume_renderer import (
    RenderConfig, OccupancyGrid, ray_aabb, sample_rays, composite,
    render_rays, update_density_grid)
from mvedit_tpu.models.fields import (INGPConfig, ingp_init,
                                      ingp_point_decode)
from mvedit_tpu.ops.hash_grid import HashGridConfig
from mvedit_tpu.models import nerf_fit as NF
from mvedit_tpu.utils import camera


def _sphere_decode(xyz, radius=0.5, sigma_in=30.0):
    """Analytic solid sphere: high density inside, color from position."""
    d = jnp.linalg.norm(xyz, axis=-1)
    sigma = jnp.where(d < radius, sigma_in, 0.0)
    rgb = jnp.clip(xyz * 0.5 + 0.5, 0.0, 1.0)
    return sigma, rgb


def test_ray_aabb():
    o = jnp.array([[0.0, 0.0, -3.0], [0.0, 5.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far = ray_aabb(o, d, 1.0)
    assert float(near[0]) == pytest.approx(2.0)
    assert float(far[0]) == pytest.approx(4.0)
    assert float(far[1]) < float(near[1])  # miss


def test_composite_opaque_surface():
    cfg = RenderConfig(num_samples=64, stratified=False)
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = render_rays(_sphere_decode, o, d, cfg)
    # ray hits sphere front face at z=-0.5 -> t=2.5
    assert float(out["alpha"][0]) > 0.95
    assert float(out["depth"][0]) == pytest.approx(2.5, abs=0.1)
    assert float(out["inv_depth"][0]) == pytest.approx(1 / 2.5, abs=0.02)
    # hit color ~ position color of front surface (0,0,-0.5) -> (.5,.5,.25)
    np.testing.assert_allclose(out["rgb"][0], [0.5, 0.5, 0.25], atol=0.1)


def test_composite_miss_gives_bg():
    cfg = RenderConfig(num_samples=32, stratified=False)
    o = jnp.array([[0.0, 5.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = render_rays(_sphere_decode, o, d, cfg, bg_color=1.0)
    assert float(out["alpha"][0]) == pytest.approx(0.0, abs=1e-5)
    np.testing.assert_allclose(out["rgb"][0], [1, 1, 1], atol=1e-5)


def test_occupancy_grid_update_and_masking():
    cfg = RenderConfig(num_samples=32, grid_size=32, stratified=False)
    grid = OccupancyGrid.create(cfg.grid_size)
    grid = update_density_grid(lambda x: _sphere_decode(x)[0], grid, cfg)
    occ_frac = float(jnp.mean(grid.occ.astype(jnp.float32)))
    # sphere of r=.5 in [-1,1]^3 occupies ~6.5% of the volume
    assert 0.02 < occ_frac < 0.25
    # render with the grid still sees the sphere
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = render_rays(_sphere_decode, o, d, cfg, grid=grid)
    assert float(out["alpha"][0]) > 0.9


def test_render_rays_grad_flows():
    cfg = RenderConfig(num_samples=32, stratified=False)
    icfg = INGPConfig(hash=HashGridConfig(n_levels=4, base_resolution=4,
                                          max_resolution=32))
    params = ingp_init(jax.random.PRNGKey(0), icfg)
    o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (8, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))

    def loss(p):
        out = render_rays(lambda x: ingp_point_decode(p, x, icfg), o, d, cfg)
        return jnp.sum(out["rgb"])

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["table"]).sum()) > 0
    assert all(float(jnp.abs(l["w"]).sum()) > 0 for l in g["mlp"])


@pytest.mark.slow
def test_nerf_fit_overfits_sphere():
    """End-to-end inner loop: fit iNGP to analytic sphere renders."""
    render_size = 32
    rcfg = RenderConfig(num_samples=48, grid_size=16, stratified=True)
    icfg = INGPConfig(hash=HashGridConfig(n_levels=6, base_resolution=4,
                                          max_resolution=48,
                                          log2_hashmap_size=15))
    # targets: 6 analytic views
    poses = camera.random_surround_views(
        2.5, 6, use_linspace=True, rng=np.random.default_rng(0))[:, :3]
    intr = np.tile(camera.intrinsics_from_fov(50.0, render_size, render_size),
                   (6, 1))
    imgs, masks = [], []
    for i in range(6):
        out = NF.render_image(
            lambda _, x: _sphere_decode(x), None, jnp.asarray(poses[i]),
            jnp.asarray(intr[i]), render_size, render_size, rcfg,
            chunk=render_size * render_size)
        imgs.append(out["rgb"])
        masks.append(out["alpha"][..., None])
    targets = {
        "images": jnp.stack(imgs), "masks": jnp.stack(masks),
        "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
        "cam_weights": jnp.ones((6,)),
        "cam_lights": jnp.asarray(
            camera.light_sampling(poses, rng=np.random.default_rng(1))[0]),
    }
    fcfg = NF.NerfFitConfig(
        render=rcfg, patch_size=16, patch_bs=2, lr=0.02, n_steps=128,
        shaded=False, normal_reg_weight=0.1, entropy_weight=0.0)
    params = ingp_init(jax.random.PRNGKey(1), icfg)
    fit, optimizer = NF.make_nerf_fit(
        lambda p, x: ingp_point_decode(p, x, icfg), fcfg, render_size)
    opt_state = optimizer.init(params)
    grid = OccupancyGrid.create(rcfg.grid_size)
    params, opt_state, grid, m = fit(
        params, opt_state, grid, targets, jax.random.PRNGKey(2))
    losses = np.asarray(m["loss"])
    assert np.isfinite(losses).all()
    # loss must drop substantially
    assert losses[-16:].mean() < losses[:16].mean() * 0.5
    # novel view PSNR vs analytic render
    test_out = NF.render_image(
        lambda p, x: ingp_point_decode(p, x, icfg), params,
        jnp.asarray(poses[0]), jnp.asarray(intr[0]), render_size, render_size,
        rcfg, grid=grid, chunk=render_size * render_size)
    mse = float(jnp.mean((test_out["rgb"] - targets["images"][0]) ** 2))
    psnr = -10 * np.log10(mse)
    assert psnr > 18.0, f"psnr={psnr}"


def test_dense_grid_field_matches_contract():
    from mvedit_tpu.ops.dense_grid import (DenseGridConfig, dense_grid_init,
                                           dense_grid_encode)
    cfg = DenseGridConfig(resolutions=(4, 8), n_features=4)
    tabs = dense_grid_init(jax.random.PRNGKey(0), cfg, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = dense_grid_encode(tabs, x, cfg)
    assert out.shape == (64, cfg.out_dim)
    # continuity + gradient flow
    out2 = dense_grid_encode(tabs, x + 1e-5, cfg)
    assert float(jnp.max(jnp.abs(out - out2))) < 1e-2
    g = jax.grad(lambda t: dense_grid_encode(t, x, cfg).sum())(tabs)
    assert float(jnp.abs(g["level_0"]).sum()) > 0


def test_dense_grid_fold_levels_agree():
    """fold 2/4/8 (wide-row corner packing) must be numerically identical
    to the reference fold=1 eight-corner gather, values AND grads,
    including clamped boundary points."""
    from mvedit_tpu.ops.dense_grid import (DenseGridConfig, dense_grid_init,
                                           dense_grid_encode)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    x = jnp.concatenate(
        [x, jnp.array([[0., 0., 0.], [1., 1., 1.], [1., 0., .5]])])
    cfg1 = DenseGridConfig(resolutions=(4, 9), n_features=4, fold=1,
                           gather_dtype="float32")
    tabs = dense_grid_init(jax.random.PRNGKey(0), cfg1, scale=1.0)
    ref = dense_grid_encode(tabs, x, cfg1)
    gref = jax.grad(lambda t, p: jnp.sum(
        jnp.sin(dense_grid_encode(t, p, cfg1))), argnums=(0, 1))(tabs, x)
    for fold in (2, 4, 8):
        cfg = DenseGridConfig(resolutions=(4, 9), n_features=4, fold=fold,
                              gather_dtype="float32")
        out = dense_grid_encode(tabs, x, cfg)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
        g = jax.grad(lambda t, p: jnp.sum(
            jnp.sin(dense_grid_encode(t, p, cfg))), argnums=(0, 1))(tabs, x)
        for a, b in zip(jax.tree_util.tree_leaves(gref),
                        jax.tree_util.tree_leaves(g)):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_ingp_dense_backend_decodes():
    icfg = INGPConfig(backend="dense")
    from mvedit_tpu.ops.dense_grid import DenseGridConfig
    icfg = INGPConfig(
        backend="dense",
        dense=DenseGridConfig(resolutions=(4, 16), n_features=4))
    params = ingp_init(jax.random.PRNGKey(0), icfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.9,
                             maxval=0.9)
    sigma, rgb = ingp_point_decode(params, xyz, icfg)
    assert sigma.shape == (32,)
    assert rgb.shape == (32, 3)
    assert np.isfinite(np.asarray(sigma)).all()


def test_nerf_fit_shaded_path_finite():
    """Tonemapped lambertian shading + normal targets + entropy/depth terms
    compile and stay finite (the full MVEdit loss surface)."""
    render_size = 16
    rcfg = RenderConfig(num_samples=16, grid_size=8, stratified=True)
    icfg = INGPConfig(hash=HashGridConfig(n_levels=2, base_resolution=4,
                                          max_resolution=8,
                                          log2_hashmap_size=10))
    N = 2
    poses = camera.random_surround_views(
        2.5, N, use_linspace=True, rng=np.random.default_rng(0))[:, :3]
    intr = np.tile(camera.intrinsics_from_fov(50.0, render_size,
                                              render_size), (N, 1))
    targets = {
        "images": jnp.full((N, render_size, render_size, 3), 0.5),
        "masks": jnp.ones((N, render_size, render_size, 1)),
        "normals": jnp.full((N, render_size, render_size, 3), 0.5),
        "depths": jnp.full((N, render_size, render_size), 0.4),
        "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
        "cam_weights": jnp.ones((N,)),
        "cam_lights": jnp.asarray(camera.light_sampling(
            poses, rng=np.random.default_rng(1))[0]),
    }
    fcfg = NF.NerfFitConfig(
        render=rcfg, patch_size=8, patch_bs=2, n_steps=4, shaded=True,
        entropy_weight=1.0, depth_weight=0.5)
    params = ingp_init(jax.random.PRNGKey(1), icfg)
    fit, optimizer = NF.make_nerf_fit(
        lambda p, x: ingp_point_decode(p, x, icfg), fcfg, render_size)
    opt_state = optimizer.init(params)
    grid = OccupancyGrid.create(rcfg.grid_size)
    params, opt_state, grid, m = fit(
        params, opt_state, grid, targets, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(m["loss"])).all()
