"""SSDNeRF training stack tests: train step, cache, trainer, datasets."""
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvedit_tpu.models.triplane import (TriPlaneConfig, triplane_init,
                                        triplane_point_decode)
from mvedit_tpu.models.ssdnerf import (SSDNeRFConfig, SceneCodeCache,
                                       make_train_step, tanh_code,
                                       tanh_code_inverse)
from mvedit_tpu.models.volume_renderer import RenderConfig
from mvedit_tpu.models.diffusion import schedulers as S
from mvedit_tpu.models import gaussian_diffusion as GD

TINY_TP = TriPlaneConfig(n_channels=4, base_layers=(12, 16),
                         density_layers=(16, 1), color_layers=(16, 3),
                         dir_layers=(16, 16))
TINY_CFG = SSDNeRFConfig(
    code_shape=(3, 4, 8, 8), latent_shape=(3, 4, 8, 8),
    triplane=TINY_TP,
    render=RenderConfig(num_samples=16, bound=0.5, stratified=False),
    n_rays=64)


def _toy_denoiser_params(key):
    # linear "denoiser": out = x * w (per-channel), enough to train
    return {"w": jax.random.normal(key, (1,)) * 0.01}


def _toy_denoise_apply(params, x, t, cond):
    del t, cond
    return x * params["w"]


def test_tanh_code_roundtrip():
    x = jnp.linspace(-1.5, 1.5, 10)
    np.testing.assert_allclose(tanh_code_inverse(tanh_code(x)), x, atol=1e-4)


def test_triplane_point_decode_shapes_grad():
    params = triplane_init(jax.random.PRNGKey(0), TINY_TP)
    code = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 8, 8))
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (50, 3), minval=-0.4,
                             maxval=0.4)
    dirs = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    sigma, rgb = triplane_point_decode(params, code, xyz, dirs, TINY_TP)
    assert sigma.shape == (50,)
    assert rgb.shape == (50, 3)
    g = jax.grad(lambda c: triplane_point_decode(
        params, c, xyz, dirs, TINY_TP)[0].sum())(code)
    assert float(jnp.abs(g).sum()) > 0


def test_ssdnerf_train_step_losses_decrease():
    sch = S.sd_schedule(prediction_type="v_prediction")
    step = make_train_step(_toy_denoise_apply, TINY_TP, TINY_CFG, sch)
    key = jax.random.PRNGKey(0)
    B = 2
    state = {
        "denoiser": _toy_denoiser_params(key),
        "decoder": triplane_init(jax.random.PRNGKey(1), TINY_TP),
        "codes": jax.random.normal(jax.random.PRNGKey(2),
                                   (B, *TINY_CFG.code_shape)) * 0.1,
        "code_m": jnp.zeros((B, *TINY_CFG.code_shape)),
        "code_v": jnp.zeros((B, *TINY_CFG.code_shape)),
        "code_steps": jnp.zeros((B,), jnp.int32),
    }
    import optax
    state["denoiser_opt"] = optax.adamw(1e-3).init(state["denoiser"])
    state["decoder_opt"] = optax.adam(1e-3).init(state["decoder"])

    batch = {
        "rays_o": jnp.tile(jnp.asarray([[0.0, 0, -2]]), (B, 64, 1)),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0, 1]]), (B, 64, 1)),
        "rgb": jnp.ones((B, 64, 3)) * 0.5,
        "cond": None,
    }
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        losses.append(float(metrics["loss_render"]))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]


def test_scene_code_cache_roundtrip(tmp_path):
    cache = SceneCodeCache(5, (3, 4, 8, 8))
    ids = np.array([1, 3])
    codes, m, v, steps = cache.gather(ids)
    cache.scatter(ids, codes + 1.0, m, v, steps + 2)
    assert cache.codes[1].mean() == pytest.approx(1.0, abs=1e-3)
    assert cache.steps[3] == 2
    p = str(tmp_path / "cache.npz")
    cache.save(p)
    c2 = SceneCodeCache.load(p)
    np.testing.assert_allclose(c2.codes, cache.codes)


def test_file_scene_code_cache(tmp_path):
    """Filesystem cache backend (ref new_cfgs/*_filesystem.py): disk
    round-trip via async writers, zeros for untouched scenes, reload."""
    from mvedit_tpu.models.ssdnerf import FileSceneCodeCache

    d = str(tmp_path / "code")
    cache = FileSceneCodeCache(5, (3, 4, 8, 8), d, num_file_writers=2)
    ids = np.array([1, 3])
    codes, m, v, steps = cache.gather(ids)
    assert float(jnp.abs(codes).max()) == 0.0
    cache.scatter(ids, codes + 1.0, m + 0.5, v, steps + 2)
    # immediate re-read must await the in-flight write (no torn state)
    codes2, m2, _, steps2 = cache.gather(ids)
    np.testing.assert_allclose(np.asarray(codes2), 1.0)
    np.testing.assert_allclose(np.asarray(m2), 0.5)
    assert int(steps2[1]) == 2
    assert cache.get_code(3).mean() == pytest.approx(1.0, abs=1e-3)
    # untouched scene stays zero; only touched scenes hit disk
    z, *_ = cache.gather(np.array([0]))
    assert float(jnp.abs(z).max()) == 0.0
    cache.save()
    c2 = FileSceneCodeCache.load(d)
    assert c2.num_scenes == 5 and int(c2.steps[3]) == 2
    np.testing.assert_allclose(np.asarray(c2.get_code(1)), 1.0)


def test_tiled_latent_denoiser_layout():
    """Tiled layout (ref new_cfgs/ssdnerf_cars_recons1v_tiled.py): the
    denoiser must be equivariant to which plane holds the signal ONLY up
    to conv locality — concretely, output shape matches and plane k of the
    output depends on plane k of the input (tiled spatially, not mixed as
    channels)."""
    import importlib.util, os as _os
    spec = importlib.util.spec_from_file_location(
        "_ssdnerf_paper_base",
        _os.path.join(_os.path.dirname(__file__), "..", "configs",
                      "_ssdnerf_paper_base.py"))
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    cfg = SSDNeRFConfig(latent_shape=(3, 4, 8, 8))
    _, apply_fn, params = base.build_denoiser_for(
        cfg, jax.random.PRNGKey(0), ch=16, layout="tiled")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 8, 8))
    out = apply_fn(params, x, jnp.zeros((2,), jnp.int32))
    assert out.shape == x.shape
    # locality: perturbing plane 0 far from the seam changes plane 0
    # strongly but plane 2's far edge only weakly (GroupNorm is spatially
    # global so the cross-plane leak is nonzero, but conv locality keeps
    # it orders of magnitude below the perturbed plane's response)
    x2 = x.at[:, 0, :, :, 0].add(10.0)
    d = jnp.abs(apply_fn(params, x2, jnp.zeros((2,), jnp.int32)) - out)
    near = float(d[:, 0].max())
    far = float(d[:, 2, :, :, -1].max())
    assert near > 1e-3
    assert far < 0.1 * near


def test_sample_from_noise_runs():
    sch = S.sd_schedule(prediction_type="v_prediction")
    params = {"w": jnp.asarray([0.5])}
    out = GD.sample_from_noise(
        sch, lambda x, t, c: _toy_denoise_apply(params, x, t, c),
        (2, 3, 4, 8, 8), jax.random.PRNGKey(0), num_steps=4)
    assert out.shape == (2, 3, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_with_hooks(tmp_path):
    from mvedit_tpu.runner.trainer import (Trainer, EmaHook, LogHook,
                                           ModelUpdaterHook)

    def train_step(state, batch, key):
        state = {"denoiser": state["denoiser"] - 0.1,
                 "decoder": state["decoder"]}
        return state, {"loss": jnp.abs(state["denoiser"]).sum()}

    def data_gen():
        while True:
            yield {}

    calls = []
    hooks = [EmaHook(keys=("denoiser",), momentum=0.5, rampup=0),
             LogHook(str(tmp_path), interval=2),
             ModelUpdaterHook({3: lambda tr: calls.append(tr.step)})]
    tr = Trainer(train_step, {"denoiser": jnp.ones(2),
                              "decoder": jnp.zeros(1)},
                 data_gen(), hooks)
    tr.run(5)
    assert tr.step == 5
    assert calls == [3]
    assert os.path.exists(str(tmp_path / "metrics.jsonl"))
    assert hooks[0].ema is not None


def test_parallel_zip_reader(tmp_path):
    from mvedit_tpu.datasets import ParallelZipFile
    p = str(tmp_path / "a.zip")
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("x/hello.txt", b"hello world" * 100)
        z.writestr("x/raw.bin", b"\x00\x01\x02\x03")
    with zipfile.ZipFile(p, "a", zipfile.ZIP_STORED) as z:
        z.writestr("stored.txt", b"stored-data")
    zf = ParallelZipFile(p)
    assert set(zf.namelist()) == {"x/hello.txt", "x/raw.bin", "stored.txt"}
    assert zf.read("x/hello.txt") == b"hello world" * 100
    assert zf.read("stored.txt") == b"stored-data"
    zf.close()


def test_ray_batch_iterator(tmp_path):
    from mvedit_tpu.datasets import ray_batch_iterator

    class FakeDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            n, h, w = 2, 8, 8
            return {"images": np.random.default_rng(i).random(
                        (n, h, w, 3)).astype(np.float32),
                    "poses": np.tile(np.eye(3, 4, dtype=np.float32),
                                     (n, 1, 1)),
                    "intrinsics": np.tile(
                        np.array([8.0, 8, 4, 4], np.float32), (n, 1)),
                    "scene_id": i}

    it = ray_batch_iterator(FakeDS(), batch_size=2, n_rays=16, seed=0)
    b = next(it)
    assert b["rays_o"].shape == (2, 16, 3)
    assert b["rgb"].shape == (2, 16, 3)
    # skip_iter resume reproduces the stream
    it2 = ray_batch_iterator(FakeDS(), batch_size=2, n_rays=16, seed=0,
                             skip_iter=1)
    b1 = next(it)   # stream batch #1 (b consumed #0)
    b2 = next(it2)  # skip_iter=1 -> also batch #1
    np.testing.assert_allclose(b1["rgb"], b2["rgb"])


def test_ddpm_unet_triplane_shapes():
    import jax
    import jax.numpy as jnp
    from mvedit_tpu.models.ddpm_unet import DDPMUNet, DDPMUNetConfig
    cfg = DDPMUNetConfig(in_channels=12, out_channels=12, base_channels=32,
                         channel_mults=(1, 2), attn_levels=(1,), num_heads=2)
    net = DDPMUNet(cfg)
    x = jnp.zeros((2, 3, 4, 8, 8))
    t = jnp.zeros((2,), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, t)
    out = net.apply(params, x, t)
    assert out.shape == x.shape


def test_val_guide_and_val_optim():
    """Guided sampling + post-sampling code refinement
    (DiffusionNeRF.val_guide/val_optim, diffusion_nerf.py:240-411)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvedit_tpu.models.ssdnerf import (SSDNeRFConfig, make_val_guide,
                                           make_val_optim, tanh_code)
    from mvedit_tpu.models.triplane import TriPlaneConfig, triplane_init
    from mvedit_tpu.models.volume_renderer import RenderConfig
    from mvedit_tpu.models.diffusion import schedulers as S

    tcfg = TriPlaneConfig(n_channels=4, base_layers=(12, 16),
                          density_layers=(16, 1), color_layers=(16, 3),
                          dir_layers=(8, 16), bound=0.5)
    cfg = SSDNeRFConfig(code_shape=(3, 4, 8, 8), latent_shape=(3, 4, 8, 8),
                        triplane=tcfg,
                        render=RenderConfig(num_samples=8, bound=0.5,
                                            grid_size=8),
                        n_rays=32, code_lr=0.04)
    schedule = S.sd_schedule(prediction_type="v_prediction")

    def denoise_apply(params, x, t, cond=None):
        return x * 0.1   # trivial denoiser stub

    key = jax.random.PRNGKey(0)
    decoder = triplane_init(key, tcfg)
    B, R = 2, 32
    cond_batch = {
        "rays_o": jnp.tile(jnp.asarray([0.0, 0.0, -1.5]), (B, R, 1)),
        "rays_d": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, R, 1)),
        "rgb": jnp.ones((B, R, 3)) * 0.5,
    }
    vg = make_val_guide(denoise_apply, tcfg, cfg, schedule)
    code = vg(None, decoder, cond_batch, key, num_steps=3)
    assert code.shape == (B, 3, 4, 8, 8)
    assert np.isfinite(np.asarray(code)).all()

    vo = make_val_optim(denoise_apply, tcfg, cfg, schedule, n_steps=4)
    code2, losses = vo(None, code, decoder, cond_batch,
                       jax.random.PRNGKey(1))
    assert code2.shape == code.shape
    assert np.isfinite(np.asarray(losses)).all()


def test_langevin_corrector_sampling():
    """Langevin predictor-corrector steps (p_sample_langevin,
    gaussian_diffusion.py:263-283): in-range steps perturb the
    trajectory; out-of-range langevin is a no-op."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvedit_tpu.models import gaussian_diffusion as GD
    from mvedit_tpu.models.diffusion import schedulers as S

    schedule = S.sd_schedule(prediction_type="v_prediction")
    denoise = lambda x, t, c: x * 0.05  # noqa: E731
    shape = (2, 4, 8, 8)
    key = jax.random.PRNGKey(0)
    base = GD.sample_from_noise(schedule, denoise, shape, key,
                                num_steps=4)
    lang = GD.sample_from_noise(schedule, denoise, shape, key,
                                num_steps=4, langevin_steps=2,
                                langevin_delta=0.1)
    off = GD.sample_from_noise(schedule, denoise, shape, key,
                               num_steps=4, langevin_steps=2,
                               langevin_t_range=(0, 1))
    assert np.isfinite(np.asarray(lang)).all()
    assert not np.allclose(np.asarray(base), np.asarray(lang))
    np.testing.assert_allclose(np.asarray(base), np.asarray(off))


def test_lpips_bf16_params():
    """lpips works with bf16 inference params + fp32 inputs (the runner
    stores all inference params bf16; caught by the full-scale run)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvedit_tpu.models.losses import lpips_init, lpips_apply
    p = lpips_init(jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, p)
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    d = lpips_apply(p, a, b)
    assert np.isfinite(float(d))
    g = jax.grad(lambda x: lpips_apply(p, x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
