"""End-to-end pipeline smoke tests with tiny random-weight models.

These exercise the FULL denoise <-> reconstruct control flow (the product
core) on CPU: model quality is meaningless with random weights, but shapes,
dtypes, scheduler math, and the jitted phase plumbing are fully real.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvedit_tpu.models.diffusion import (
    UNetConfig, UNet2DCondition, VAEConfig, AutoencoderKL, ControlNet,
    schedulers as S, AttnMode)
from mvedit_tpu.models.fields import INGPConfig
from mvedit_tpu.ops.hash_grid import HashGridConfig
from mvedit_tpu.models.mesh import Mesh, build_grid_tets, marching_tets

TINY_UNET = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                       attn_down=(True, False), cross_attention_dim=32,
                       num_heads=4, dtype=jnp.float32)
TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                     dtype=jnp.float32)
TINY_INGP = INGPConfig(hash=HashGridConfig(
    n_levels=4, base_resolution=4, max_resolution=32, log2_hashmap_size=12))


def _make_models(key, n_cn=2, hint_strides=3):
    unet = UNet2DCondition(TINY_UNET)
    vae = AutoencoderKL(TINY_VAE)
    cns = tuple(ControlNet(TINY_UNET, hint_strides=hint_strides)
                for _ in range(n_cn))
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, 32))
    hint = jnp.zeros((1, 8 * 2 ** hint_strides, 8 * 2 ** hint_strides, 3))
    keys = jax.random.split(key, 3 + n_cn)
    m = types.SimpleNamespace()
    m.unet = unet
    m.unet_params = unet.init(keys[0], x, t, ctx)["params"]
    m.vae = vae
    m.vae_params = vae.init(keys[1], jnp.zeros((1, 64, 64, 3)))["params"]
    m.controlnets = cns
    m.cn_params = [cn.init(k, x, t, ctx, hint)["params"]
                   for cn, k in zip(cns, keys[2:])]
    m.schedule = S.sd_schedule()
    m.segment_fn = None
    return m


def _sphere_mesh():
    grid = build_grid_tets(12, crop_sphere=False)
    sdf = 0.55 - np.linalg.norm(grid.verts, axis=-1)
    out = marching_tets(grid, jnp.asarray(sdf))
    fmask = np.asarray(out["face_mask"])
    faces = np.asarray(out["faces"])[fmask]
    verts = np.asarray(out["verts"])
    used = np.unique(faces)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    mesh = Mesh(v=verts[used].astype(np.float32),
                f=remap[faces].astype(np.int32))
    mesh.auto_normal()
    mesh.auto_uv()
    return mesh


@pytest.mark.slow
def test_texture_pipeline_end_to_end(tmp_path):
    from mvedit_tpu.pipelines import TextureConfig, TexturePipeline
    from mvedit_tpu.apis.cameras import surround_rig

    key = jax.random.PRNGKey(0)
    # tiny VAE downscales /2: hints at render size need 1 stride to match
    m = _make_models(key, hint_strides=1)
    N = 2
    size = 64
    cfg = TextureConfig(num_views=N, render_size=size, diffusion_steps=2,
                        denoising_strength=1.0, n_inverse_steps=4,
                        ingp=TINY_INGP)
    mesh = _sphere_mesh()
    poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size,
                               rng=np.random.default_rng(0))
    pipe = TexturePipeline(m, cfg)
    embeds = jnp.zeros((N, 8, 32))
    out = pipe(mesh, jnp.asarray(poses), jnp.asarray(intr), embeds, embeds,
               jax.random.PRNGKey(1))
    assert out["mesh"].albedo is not None
    assert np.isfinite(out["mesh"].albedo).all()
    assert out["renders"].shape == (N, size, size, 3)
    # GLB export works
    out["mesh"].write(str(tmp_path / "out.glb"), flip_yz=True)
    m2 = Mesh.load(str(tmp_path / "out.glb"))
    assert m2.albedo is not None


@pytest.mark.slow
def test_zero123plus_pipeline_tiny():
    from mvedit_tpu.pipelines import Zero123PlusConfig, Zero123PlusPipeline
    from mvedit_tpu.models.diffusion import (CLIPVisionConfig,
                                             CLIPVisionModel)

    key = jax.random.PRNGKey(0)
    m = _make_models(key, n_cn=0)
    vis_cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                               intermediate_size=64, num_layers=2,
                               num_heads=4, projection_dim=32)
    m.vision = CLIPVisionModel(vis_cfg)
    m.vision_params = m.vision.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    m.ramping = np.linspace(0, 1, 8).astype(np.float32)
    m.text_uncond = jnp.zeros((1, 8, 32))
    m.cond_pixels_clip = jnp.zeros((1, 32, 32, 3))
    # v-prediction schedule like zero123++
    m.schedule = S.sd_schedule(prediction_type="v_prediction")

    cfg = Zero123PlusConfig(num_steps=2, grid_hw=(48, 32))
    pipe = Zero123PlusPipeline(m, cfg)
    out = pipe(jnp.zeros((1, 48, 32, 3)), jax.random.PRNGKey(2))
    assert out.shape == (1, 48, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_1pass_2pass_consistency():
    """p1+p2 with zero tile/depth scales must equal the plain UNet path."""
    from mvedit_tpu.pipelines import (DenoiseModels, make_noise_pred_1pass,
                                      make_noise_pred_2pass)
    key = jax.random.PRNGKey(0)
    m = _make_models(key)
    dm = DenoiseModels(unet=m.unet, controlnets=m.controlnets, num_views=2)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    t = jnp.full((4,), 500, jnp.int32)
    embeds = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 32))
    hints = jnp.zeros((4, 64, 64, 3))

    one = make_noise_pred_1pass(dm)
    eps1 = one({"params": m.unet_params} if False else m.unet_params,
               m.cn_params, lat, t, embeds, [hints, hints], [0.0, 0.0], 3.0)
    p1, p2 = make_noise_pred_2pass(dm)
    eps_p1, enc, res = p1(m.unet_params, m.cn_params, lat, t, embeds,
                          hints, 0.0, 3.0)
    np.testing.assert_allclose(np.asarray(eps1), np.asarray(eps_p1),
                               atol=2e-4)
    eps_p2 = p2(m.unet_params, m.cn_params, lat, enc, res, t, embeds,
                hints, hints, 0.0, 0.0, 3.0)
    np.testing.assert_allclose(np.asarray(eps_p1), np.asarray(eps_p2),
                               atol=2e-4)


@pytest.mark.slow  # integration tier: denoise routing covered by test_reference_pair_denoise/test_denoise_1pass_2pass_consistency; full instruct path by test_run_retex_instruct_front_view
def test_instruct_extra_controlnet_is_applied():
    """Instruct mode's third (ip2p) ControlNet must change the noise
    prediction in both 1-pass and 2-pass p1 (ref adapter3d_mixin.py:172-186
    applies nets[controlnet_skip:]; round-1 bug: it was silently skipped)."""
    from mvedit_tpu.pipelines import (DenoiseModels, make_noise_pred_1pass,
                                      make_noise_pred_2pass)
    key = jax.random.PRNGKey(0)
    m = _make_models(key, n_cn=3)
    # ControlNet output convs are zero-initialized (diffusers convention);
    # perturb so a random net produces nonzero residuals
    leaves, treedef = jax.tree_util.tree_flatten(m.cn_params[2])
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    m.cn_params[2] = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, ks)])
    dm = DenoiseModels(unet=m.unet, controlnets=m.controlnets, num_views=2)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    t = jnp.full((4,), 500, jnp.int32)
    embeds = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 32))
    tile = jnp.zeros((4, 64, 64, 3))
    depth = jnp.zeros((4, 64, 64, 3))
    src = jax.random.uniform(jax.random.PRNGKey(3), (4, 64, 64, 3))

    one = make_noise_pred_1pass(dm)
    eps_on = one(m.unet_params, m.cn_params, lat, t, embeds,
                 [tile, depth, src], [1.0, 0.5, 1.0], 3.0)
    eps_off = one(m.unet_params, m.cn_params, lat, t, embeds,
                  [tile, depth, src], [1.0, 0.5, 0.0], 3.0)
    assert not np.allclose(np.asarray(eps_on), np.asarray(eps_off),
                           atol=1e-5)

    p1, _ = make_noise_pred_2pass(dm)
    e_with, _, res_with = p1(m.unet_params, m.cn_params, lat, t, embeds,
                             None, 0.5, 3.0, extra_images=(src,),
                             extra_scales=(1.0,))
    e_without, _, res_without = p1(m.unet_params, m.cn_params, lat, t,
                                   embeds, None, 0.5, 3.0)
    assert not np.allclose(np.asarray(e_with), np.asarray(e_without),
                           atol=1e-5)
    assert res_without[0] is None and res_with[0] is not None


@pytest.mark.slow
@pytest.mark.parametrize("diff_bs", [8, 2])
def test_mvedit3d_view_pruning_and_schedules(tmp_path, diff_bs):
    """The view schedule prunes cameras (weights -> 0) and gathers the
    buffers down to the min bucket by the last step
    (mvedit_3d_pipeline.py:45-49,1149-1215); schedules ride as traced
    scalars (no per-step recompiles of the fit). diff_bs=2 < N drives the
    whole loop through the chunked denoise path (bucket-size-independent
    UNet programs)."""
    from mvedit_tpu.pipelines import MVEdit3DConfig, MVEdit3DPipeline
    from mvedit_tpu.apis.cameras import surround_rig
    from mvedit_tpu.models.volume_renderer import RenderConfig
    from mvedit_tpu.utils import camera as cam_utils

    key = jax.random.PRNGKey(0)
    m = _make_models(key, hint_strides=1)
    N = 6
    size = 32
    cfg = MVEdit3DConfig(
        num_views=N, mid_num_views=4, min_num_views=2, keep_first_views=1,
        render_size=size, render_size_ramp=True, latent_size=16,
        diffusion_steps=6, n_inverse_steps=2, init_inverse_steps=2,
        tet_resolution=8, tet_init_inverse_steps=2, patch_size=8,
        patch_bs=1, diff_bs=diff_bs, fit_steps_per_program=1,
        ingp=TINY_INGP,
        render=RenderConfig(num_samples=8, grid_size=8))
    rng = np.random.default_rng(0)
    from mvedit_tpu.apis.cameras import surround_rig as rig
    poses, intr = rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
    lights, _ = cam_utils.light_sampling(poses, rng=rng)
    targets = {
        "images": jnp.ones((N, size, size, 3)) * 0.5,
        "masks": jnp.ones((N, size, size, 1)),
        "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
        "cam_weights": jnp.ones((N,)),
        "cam_lights": jnp.asarray(lights),
    }
    embeds = jnp.zeros((N, 8, 32))
    pipe = MVEdit3DPipeline(m, cfg)
    out = pipe(targets, jax.random.PRNGKey(1), embeds, embeds)
    # by the final step the buffers must have been gathered to the
    # min bucket (2 views)
    assert out["renders"]["rgb"].shape[0] == cfg.min_num_views
    assert out["mesh_state"] is not None
    # phase-boundary executable eviction: after the NeRF->DMTet switch the
    # NeRF fit programs and the chunked volume renderers (one per ramp
    # size) must be dropped — compiled programs occupy HBM and would
    # otherwise crowd out the mesh-phase raster peak at full scale
    from mvedit_tpu.models import nerf_fit as NF
    assert not any(k[0] == "nerf" for k in pipe._fit_cache)
    assert not NF._RENDERER_CACHE


def test_render_all_view_chunking_matches_whole_batch():
    """render_view_chunk splits render_all into fixed-size per-chunk
    programs (ONE compiled renderer per (mode, rs) across all view-pruning
    buckets). Chunked output must equal the whole-batch render exactly in
    BOTH modes, including a ragged N (padded with dup views, sliced)."""
    from mvedit_tpu.pipelines import MVEdit3DConfig, MVEdit3DPipeline
    from mvedit_tpu.apis.cameras import surround_rig
    from mvedit_tpu.models.fields import ingp_init
    from mvedit_tpu.models.volume_renderer import RenderConfig
    from mvedit_tpu.models.mesh.structured_tets import (
        StructuredTetGrid, marching_tets_structured)

    key = jax.random.PRNGKey(0)
    m = _make_models(key, hint_strides=1)
    N, size = 5, 16                        # ragged: 5 views, chunk 2
    cfg = MVEdit3DConfig(num_views=N, render_size=size, latent_size=8,
                         patch_size=8, ingp=TINY_INGP, tet_resolution=8,
                         render=RenderConfig(num_samples=8, grid_size=8),
                         render_view_chunk=2)
    pipe = MVEdit3DPipeline(m, cfg)
    cfg_whole = MVEdit3DConfig(**{**cfg.__dict__, "render_view_chunk": 0})
    pipe_whole = MVEdit3DPipeline(m, cfg_whole)

    rng = np.random.default_rng(0)
    poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
    tgt = {"poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr)}
    field = ingp_init(jax.random.PRNGKey(1), cfg.ingp)

    # nerf mode (multiview volume renderer)
    a = pipe._render_all(field, None, None, None, tgt, size)
    b = pipe_whole._render_all(field, None, None, None, tgt, size)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-6, err_msg=f"nerf {k}")

    # mesh mode (raster + field shading)
    grid = StructuredTetGrid(8)
    v = np.asarray(grid.verts)
    sdf = jnp.asarray(0.6 - np.linalg.norm(v, axis=-1), jnp.float32)
    mt = marching_tets_structured(grid, grid.arrays(), sdf,
                                  vert_cap=512, face_cap=1024)
    ms = {"field": field}
    a = pipe._render_all(field, ms, mt, None, tgt, size)
    b = pipe_whole._render_all(field, ms, mt, None, tgt, size)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-6, err_msg=f"mesh {k}")


def test_chunked_denoise_matches_whole_batch():
    """diff_bs view chunking (the reference's --diff-bs, app.py:36) is
    EXACT in use_reference mode: per-chunk p1/p2/1-pass must reproduce the
    whole-batch outputs bit-for-bit semantics (incl. a ragged remainder
    chunk, which is padded then sliced)."""
    from mvedit_tpu.pipelines.denoise import (
        DenoiseModels, make_noise_pred_1pass, make_noise_pred_2pass,
        make_chunked_noise_pred_1pass, make_chunked_noise_pred_2pass)
    m = _make_models(jax.random.PRNGKey(0), n_cn=3, hint_strides=3)
    N, b = 5, 2                       # 2 full chunks + remainder of 1
    dm = DenoiseModels(unet=m.unet, controlnets=tuple(m.controlnets),
                       num_views=N, use_reference=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    lat = jax.random.normal(ks[0], (2 * N, 8, 8, 4))
    ref = jax.random.normal(ks[1], (N, 8, 8, 4))
    t = jnp.full((2 * N,), 500, jnp.int32)
    emb = jax.random.normal(ks[2], (2 * N, 8, 32))
    tile = jax.random.normal(ks[3], (2 * N, 64, 64, 3))
    depth = jax.random.normal(ks[4], (2 * N, 64, 64, 3))
    extra = jax.random.normal(ks[5], (2 * N, 64, 64, 3))

    p1_w, p2_w = make_noise_pred_2pass(dm)
    p1_c, p2_c = make_chunked_noise_pred_2pass(dm, b)
    eps_w, enc_w, res_w = p1_w(m.unet_params, m.cn_params, lat, t, emb,
                               None, 0.5, 3.0, extra_images=(extra,),
                               extra_scales=(1.0,), ref_noisy=ref)
    eps_c, enc_c, res_c = p1_c(m.unet_params, m.cn_params, lat, t, emb,
                               None, 0.5, 3.0, extra_images=(extra,),
                               extra_scales=(1.0,), ref_noisy=ref)
    np.testing.assert_allclose(np.asarray(eps_c), np.asarray(eps_w),
                               atol=2e-4)
    for a, bb in zip(jax.tree_util.tree_leaves(enc_c),
                     jax.tree_util.tree_leaves(enc_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4)
    for a, bb in zip(jax.tree_util.tree_leaves(res_c),
                     jax.tree_util.tree_leaves(res_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4)
    # p2 consumes the canonical-layout enc/res from EITHER p1
    e2_w = p2_w(m.unet_params, m.cn_params, lat, enc_w, res_w, t, emb,
                tile, depth, 1.0, 0.5, 3.0, ref_noisy=ref)
    e2_c = p2_c(m.unet_params, m.cn_params, lat, enc_c, res_c, t, emb,
                tile, depth, 1.0, 0.5, 3.0, ref_noisy=ref)
    np.testing.assert_allclose(np.asarray(e2_c), np.asarray(e2_w),
                               atol=2e-4)

    one_w = make_noise_pred_1pass(dm)
    one_c = make_chunked_noise_pred_1pass(dm, b)
    conds = [tile, depth, extra]
    scales = [1.0, 0.5, 1.0]
    np.testing.assert_allclose(
        np.asarray(one_c(m.unet_params, m.cn_params, lat, t, emb, conds,
                         scales, 3.0, ref_noisy=ref)),
        np.asarray(one_w(m.unet_params, m.cn_params, lat, t, emb, conds,
                         scales, 3.0, ref_noisy=ref)), atol=2e-4)


def test_reference_pair_denoise():
    """use_reference mode (mvedit_3d_pipeline.py:892 default True): the
    cond pass pairs each view with its noisy reference latent; changing
    the reference must change the prediction, and output shape is the
    per-view target batch."""
    from mvedit_tpu.pipelines import DenoiseModels, make_noise_pred_2pass
    m = _make_models(jax.random.PRNGKey(0))
    N = 3
    dm = DenoiseModels(unet=m.unet, controlnets=tuple(m.controlnets),
                       num_views=N, use_reference=True)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2 * N, 8, 8, 4))
    ref = jax.random.normal(jax.random.PRNGKey(2), (N, 8, 8, 4))
    t = jnp.full((2 * N,), 500, jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(3), (2 * N, 8, 32))
    tile = jnp.zeros((2 * N, 64, 64, 3))

    p1, p2 = make_noise_pred_2pass(dm)
    eps, enc, res = p1(m.unet_params, m.cn_params, lat, t, emb, None,
                       0.5, 3.0, ref_noisy=ref)
    assert eps.shape == (N, 8, 8, 4)
    assert np.isfinite(np.asarray(eps)).all()
    eps2 = p2(m.unet_params, m.cn_params, lat, enc, res, t, emb, tile,
              tile, 1.0, 0.5, 3.0, ref_noisy=ref)
    assert eps2.shape == (N, 8, 8, 4)
    eps_b, _, _ = p1(m.unet_params, m.cn_params, lat, t, emb, None,
                     0.5, 3.0, ref_noisy=ref * 0.1)
    assert not np.allclose(np.asarray(eps), np.asarray(eps_b), atol=1e-5)


@pytest.mark.slow
def test_texture_pipeline_instruct_extras_and_cam_weights(tmp_path):
    """Instruct retex: a third (ip2p) ControlNet conditioned on the source
    renders must change the result (adapter3d.py:1096-1099); per-view
    vonmises cam_weights reweight the fit loss (:1143-1150)."""
    from mvedit_tpu.pipelines import TextureConfig, TexturePipeline
    from mvedit_tpu.apis.cameras import surround_rig

    key = jax.random.PRNGKey(0)
    N, size = 2, 64
    mesh = _sphere_mesh()
    poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size,
                               rng=np.random.default_rng(0))
    embeds = jax.random.normal(jax.random.PRNGKey(7), (N, 8, 32)) * 0.1
    cfg = TextureConfig(num_views=N, render_size=size, diffusion_steps=2,
                        denoising_strength=1.0, n_inverse_steps=4,
                        ingp=TINY_INGP)

    m3 = _make_models(key, n_cn=3, hint_strides=1)
    # break the ip2p net's zero-conv init so its residuals are nonzero
    leaves, td = jax.tree_util.tree_flatten(m3.cn_params[2])
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    m3.cn_params[2] = jax.tree_util.tree_unflatten(
        td, [l + 0.02 * jax.random.normal(k, l.shape)
             for l, k in zip(leaves, ks)])
    out_i = TexturePipeline(m3, cfg)(
        mesh, jnp.asarray(poses), jnp.asarray(intr), embeds, embeds,
        jax.random.PRNGKey(1))
    assert np.isfinite(out_i["mesh"].albedo).all()

    # zeroing the extra net's effect (scale 0) must change the albedo
    cfg0 = TextureConfig(num_views=N, render_size=size, diffusion_steps=2,
                         denoising_strength=1.0, n_inverse_steps=4,
                         extra_control_scale=0.0, ingp=TINY_INGP)
    out_0 = TexturePipeline(m3, cfg0)(
        mesh, jnp.asarray(poses), jnp.asarray(intr), embeds, embeds,
        jax.random.PRNGKey(1))
    assert not np.allclose(out_i["mesh"].albedo, out_0["mesh"].albedo,
                           atol=1e-5)

    # cam_weights path runs and stays finite
    out_w = TexturePipeline(m3, cfg)(
        mesh, jnp.asarray(poses), jnp.asarray(intr), embeds, embeds,
        jax.random.PRNGKey(1), cam_weights=np.array([3.0, 0.5]))
    assert np.isfinite(out_w["mesh"].albedo).all()


@pytest.mark.slow
def test_texture_pipeline_view_pruning():
    """Progressive texture view pruning (mvedit_texture_pipeline.py:36,
    358-383): the rig shrinks to min_num_views by the last step, with
    keep_first_views protected."""
    from mvedit_tpu.pipelines import TextureConfig, TexturePipeline
    from mvedit_tpu.apis.cameras import surround_rig

    key = jax.random.PRNGKey(0)
    m = _make_models(key, hint_strides=1)
    N, size = 5, 64
    cfg = TextureConfig(num_views=N, render_size=size, diffusion_steps=4,
                        denoising_strength=1.0, n_inverse_steps=2,
                        min_num_views=2, keep_first_views=1,
                        ingp=TINY_INGP)
    mesh = _sphere_mesh()
    poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size,
                               rng=np.random.default_rng(0))
    pipe = TexturePipeline(m, cfg)
    embeds = jnp.zeros((N, 8, 32))
    out = pipe(mesh, jnp.asarray(poses), jnp.asarray(intr), embeds, embeds,
               jax.random.PRNGKey(1))
    assert out["renders"].shape[0] == cfg.min_num_views
    assert np.isfinite(out["mesh"].albedo).all()


@pytest.mark.slow
def test_zero123_legacy_pipeline_tiny():
    """Legacy Zero123 (input view + relative camera -> novel view): the
    8-channel latent concat, CLIP+camera token projection, CFG, and DDIM
    loop (reference lib/pipelines/zero123.py:96-660)."""
    from mvedit_tpu.pipelines import (Zero123Config, Zero123Pipeline,
                                      CLIPCameraProjection,
                                      camera_embedding)
    from mvedit_tpu.models.diffusion import (CLIPVisionConfig,
                                             CLIPVisionModel)

    key = jax.random.PRNGKey(0)
    m = _make_models(key, n_cn=0)
    # re-init the UNet for the 8-channel (noisy + image latent) input
    x8 = jnp.zeros((1, 8, 8, 8))
    m.unet_params = m.unet.init(jax.random.PRNGKey(3), x8,
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 1, 32)))["params"]
    vis_cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                               intermediate_size=64, num_layers=2,
                               num_heads=4, projection_dim=32)
    m.vision = CLIPVisionModel(vis_cfg)
    m.vision_params = m.vision.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    m.ccp = CLIPCameraProjection(embedding_dim=32)
    m.ccp_params = m.ccp.init(jax.random.PRNGKey(2),
                              jnp.zeros((1, 1, 36)))["params"]

    cam = camera_embedding(30.0, 45.0, 1.2)
    assert cam.shape == (1, 1, 4)
    np.testing.assert_allclose(float(cam[0, 0, 0]), np.deg2rad(30.0),
                               rtol=1e-6)

    cfg = Zero123Config(num_steps=2, height=32, width=32,
                        guidance_scale=3.0)
    pipe = Zero123Pipeline(m, cfg)
    out = pipe(jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)),
               30.0, 45.0, 1.2, jax.random.PRNGKey(4))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_save_tiled_viz(tmp_path):
    """--debug tile dumps (ref save_tiled_viz, mvedit_3d_pipeline.py:392):
    one 2x3 tile PNG per view per step, targets top / renders bottom."""
    import numpy as np
    from mvedit_tpu.utils.debug_viz import save_tiled_viz
    rng = np.random.default_rng(0)
    renders = {"rgb": rng.random((2, 16, 16, 3)).astype(np.float32),
               "depth": rng.random((2, 16, 16)).astype(np.float32)}
    targets = {"images": rng.random((2, 16, 16, 3)).astype(np.float32),
               "masks": np.ones((2, 16, 16, 1), np.float32)}
    save_tiled_viz(str(tmp_path), 3, renders, targets)
    from PIL import Image
    for v in range(2):
        p = tmp_path / f"003_{v:03d}.png"
        assert p.exists()
        im = np.asarray(Image.open(p))
        assert im.shape == (32, 48, 3)
