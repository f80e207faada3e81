"""End-to-end endpoint smoke tests with tiny random-weight models."""
import os

import numpy as np
import pytest

from mvedit_tpu.apis import Adapter3DRunner
from mvedit_tpu.models.mesh import Mesh


@pytest.fixture(scope="module")
def runner():
    return Adapter3DRunner(tiny_models=True, seed=0)


def _sphere_glb(tmp_path):
    import jax.numpy as jnp
    from mvedit_tpu.models.mesh.dmtet import build_grid_tets, marching_tets
    grid = build_grid_tets(10, crop_sphere=False)
    sdf = 0.55 - np.linalg.norm(grid.verts, axis=-1)
    out = marching_tets(grid, jnp.asarray(sdf))
    fm = np.asarray(out["face_mask"])
    f = np.asarray(out["faces"])[fm]
    v = np.asarray(out["verts"])
    used = np.unique(f)
    remap = np.full(len(v), -1, np.int64)
    remap[used] = np.arange(len(used))
    mesh = Mesh(v=v[used].astype(np.float32), f=remap[f].astype(np.int32))
    mesh.auto_normal()
    p = str(tmp_path / "sphere.glb")
    mesh.write_glb(p)
    return p


def test_run_text_to_img(runner):
    img = runner.run_text_to_img("a red car", steps=2)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_run_segmentation(runner):
    masks = runner.run_segmentation(np.zeros((1, 32, 32, 3), np.float32))
    assert masks.shape == (1, 32, 32, 1)


@pytest.mark.slow
def test_run_zero123plus(runner):
    grid = runner.run_zero123plus(np.zeros((48, 32, 3), np.float32),
                                  num_steps=2)
    assert grid.shape == (48, 32, 3)
    assert np.isfinite(grid).all()


@pytest.mark.slow
def test_run_3d_to_3d_end_to_end(runner, tmp_path):
    src = _sphere_glb(tmp_path)
    out_path = str(tmp_path / "edited.glb")
    out = runner.run_3d_to_3d(src, "a colorful sphere", seed=1,
                              out_path=out_path)
    assert out["mesh"] is not None
    assert os.path.exists(out_path)
    m = Mesh.load(out_path)
    assert len(m.f) > 0
    assert m.albedo is not None


@pytest.mark.slow
def test_run_stablessdnerf(runner):
    out = runner.run_stablessdnerf("a car", steps=2)
    assert out["preview"].shape == (32, 32, 3)
    assert np.isfinite(out["preview"]).all()


def test_marching_cubes_sphere():
    import jax.numpy as jnp
    from mvedit_tpu.ops.marching_cubes import extract_geometry

    def density(x):
        return 30.0 * (jnp.linalg.norm(x, axis=-1) < 0.5)

    v, f = extract_geometry(density, resolution=16, threshold=10.0)
    assert len(f) > 50
    d = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(np.median(d), 0.5, atol=0.1)


@pytest.mark.slow
def test_run_zero123plus_to_mesh_end_to_end(runner, tmp_path):
    out_path = str(tmp_path / "img23d.glb")
    out = runner.run_zero123plus_to_mesh(
        np.full((48, 32, 3), 0.6, np.float32), seed=3, passes=1,
        out_path=out_path)
    assert out["mesh"] is not None
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_run_texture_superres_end_to_end(runner, tmp_path):
    src = _sphere_glb(tmp_path)
    out_path = str(tmp_path / "sr.glb")
    out = runner.run_texture_superres(src, "shiny", seed=5,
                                      out_path=out_path)
    assert out["mesh"].albedo is not None
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_run_stablessdnerf_to_mesh_end_to_end(runner, tmp_path):
    out_path = str(tmp_path / "t23d.glb")
    out = runner.run_stablessdnerf_to_mesh("a car", seed=7,
                                           out_path=out_path)
    # random-weight fields may still extract a surface via the adaptive
    # threshold; assert the flow completed and produced finite artifacts
    assert "nerf_params" in out
    if out["mesh"] is not None:
        assert os.path.exists(out_path)


@pytest.mark.slow
def test_run_retex_instruct_front_view(runner, tmp_path):
    """Instruct retex with a front view: ip2p net loaded, vonmises cam
    weights + aux top view + per-view prompt suffixes
    (adapter3d.py:1084-1155)."""
    mesh_path = _sphere_glb(tmp_path)
    out_path = str(tmp_path / "retex.glb")
    out = runner.run_retex(mesh_path, "shiny", seed=1, steps=2,
                           n_inverse_steps=2, num_views=2,
                           instruct=True, front_view_id=3,
                           out_path=out_path)
    # +1 aux top view appended to the 2-view rig
    assert out["renders"].shape[0] == 3
    assert np.isfinite(out["mesh"].albedo).all()
    assert Mesh.load(out_path).albedo is not None


@pytest.mark.slow
def test_run_retex_chained_superres(runner, tmp_path):
    """superres=True chains proc_texture_superres onto run_retex with the
    live albedo field handed over in memory (ref ingp_states,
    adapter3d.py:1190-1204): the result carries superres_renders and the
    mesh keeps a finite atlas."""
    mesh_path = _sphere_glb(tmp_path)
    out = runner.run_retex(mesh_path, "shiny", seed=1, steps=2,
                           n_inverse_steps=2, num_views=2,
                           superres={"steps": 2})
    assert "superres_renders" in out
    assert np.isfinite(np.asarray(out["superres_renders"])).all()
    assert out["mesh"].albedo is not None
    assert np.isfinite(out["mesh"].albedo).all()
    assert "field_params" in out


def test_zero123plus_postprocess_normal_matte():
    """Normal-norm matting (pipelines/utils.py:315-347): a disk of unit
    normals over the 0.5-gray background yields alpha ~1 inside, ~0
    outside, and the output normal re-normalized then composited over
    gray."""
    from mvedit_tpu.pipelines.preproc import zero123plus_postprocess
    h = w = 64
    yy, xx = np.mgrid[:h, :w]
    inside = (yy - h / 2) ** 2 + (xx - w / 2) ** 2 < (h / 3) ** 2
    normal = np.full((h, w, 3), 0.5, np.float32)
    normal[inside] = [0.5, 0.5, 1.0]          # +z unit normal
    rgb = np.where(inside[..., None], 0.8, 0.2).astype(np.float32)
    rgb = np.repeat(rgb, 3, axis=-1).reshape(h, w, 3)
    rgba, n_out = zero123plus_postprocess(rgb, normal)
    assert rgba.shape == (h, w, 4) and n_out.shape == (h, w, 3)
    alpha = rgba[..., 3]
    core = (yy - h / 2) ** 2 + (xx - w / 2) ** 2 < (h / 4) ** 2
    far = (yy - h / 2) ** 2 + (xx - w / 2) ** 2 > (h / 2.2) ** 2
    assert alpha[core].min() > 0.9
    assert alpha[far].max() < 0.1
    # composited normal: +z in the core, gray background outside
    np.testing.assert_allclose(
        n_out[core], np.broadcast_to([0.5, 0.5, 1.0], n_out[core].shape),
        atol=0.05)
    np.testing.assert_allclose(n_out[far], 0.5, atol=0.05)


def test_proc_zero123plus_mirrored_normal_unflip(runner, monkeypatch):
    """Mirrored passes un-mirror each generated view and invert the normal
    x-channel (adapter3d.py:484-488: `255 - mv_normal[..., 0]` then
    ImageOps.mirror). Pinned with a stubbed generator returning the SAME
    grid for both passes, so the expected transform is exact."""
    rng = np.random.default_rng(0)
    grid = rng.random((48, 32, 3)).astype(np.float32)
    ngrid = rng.random((48, 32, 3)).astype(np.float32)

    def fake_run(image, seed=42, num_steps=None, version="1.1",
                 return_normal=False):
        return (grid, ngrid) if return_normal else grid

    base_img = rng.random((48, 32, 3)).astype(np.float32)
    monkeypatch.setattr(runner, "run_zero123plus", fake_run)
    views, normals = runner.proc_zero123plus(
        base_img, passes=2, version="1.2", return_normals=True)
    assert views.shape == (12, 16, 16, 3)
    assert normals.shape == (12, 16, 16, 3)
    # mirrored views: per-view horizontal mirror of the originals
    np.testing.assert_allclose(views[6:], views[:6][:, :, ::-1], atol=1e-6)
    # mirrored normals: x-channel inverted, then mirrored
    expect = normals[:6].copy()
    expect[..., 0] = 1.0 - expect[..., 0]
    expect = expect[:, :, ::-1]
    np.testing.assert_allclose(normals[6:], expect, atol=1e-6)


@pytest.mark.slow
def test_run_zero123plus1_2_to_mesh_generated_normals(runner, tmp_path):
    """v1.2 consumes the normal pipe's outputs for ALL generated views:
    a second diffusion pass (RGB-conditioned normal ControlNet) per
    Zero123++ pass, normal-norm matting min'd with TRACER, and every view
    normal-supervised (adapter3d.py:461-508,915-921)."""
    out_path = str(tmp_path / "img23d_12.glb")
    seen = {}
    orig = runner.__class__.proc_zero123plus

    def spy(self, *a, **kw):
        out = orig(self, *a, **kw)
        if kw.get("return_normals"):
            seen["views"], seen["normals"] = out
        return out

    runner.__class__.proc_zero123plus = spy
    try:
        out = runner.run_zero123plus1_2_to_mesh(
            np.full((48, 32, 3), 0.6, np.float32), seed=3, passes=1,
            out_path=out_path)
    finally:
        runner.__class__.proc_zero123plus = orig
    assert "normals" in seen, "v1.2 did not run the normal-generation pass"
    assert seen["normals"].shape[0] == 6
    assert np.isfinite(seen["normals"]).all()
    assert "nerf_params" in out
