"""Integration tests for the CLI tools (synthetic data, few iters)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=2",
           PYTHONPATH=REPO)


def _make_srn_scene(root, name, n_views=3, size=16):
    from PIL import Image
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "rgb"))
    os.makedirs(os.path.join(d, "pose"))
    rng = np.random.default_rng(hash(name) % 2 ** 31)
    for i in range(n_views):
        Image.fromarray(
            (rng.random((size, size, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(d, "rgb", f"{i:06d}.png"))
        pose = np.eye(4)
        pose[2, 3] = -1.3
        np.savetxt(os.path.join(d, "pose", f"{i:06d}.txt"),
                   pose.reshape(1, 16))
    with open(os.path.join(d, "intrinsics.txt"), "w") as f:
        f.write(f"{size} {size / 2} {size / 2} 0\n0 0 0\n{size} {size}\n")


@pytest.mark.slow
def test_train_ssdnerf_cli(tmp_path):
    data = str(tmp_path / "srn")
    os.makedirs(data)
    for i in range(4):
        _make_srn_scene(data, f"scene{i}")
    # tiny config
    cfg_path = str(tmp_path / "cfg.py")
    with open(os.path.join(REPO, "configs", "ssdnerf_cars.py")) as f:
        src = f.read()
    src = src.replace("code_shape=(3, 16, 80, 80)",
                      "code_shape=(3, 16, 8, 8)")
    src = src.replace("latent_shape=(3, 12, 40, 40)",
                      "latent_shape=(3, 12, 8, 8)")
    src = src.replace("num_samples=96", "num_samples=8")
    src = src.replace("n_rays=4096", "n_rays=32")
    src = src.replace("batch_size=4", "batch_size=2")
    src = src.replace('jnp.zeros((1, 3, 12, 40, 40))',
                      'jnp.zeros((1, 3, 12, 8, 8))')
    src = src.replace("ch: int = 128", "ch: int = 32")
    with open(cfg_path, "w") as f:
        f.write(src)
    work = str(tmp_path / "work")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_ssdnerf.py"),
         "--config", cfg_path, "--data", data, "--work-dir", work,
         "--max-iters", "3"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(work, "scene_cache.npz"))
    assert os.path.exists(os.path.join(work, "metrics.jsonl"))


def test_generate_tets_cli(tmp_path):
    out = str(tmp_path / "tets.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "generate_tets.py"),
         "--resolution", "8", "--out", out],
        env=ENV, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(out)
    assert d["indices"].shape[1] == 4


def test_glb_to_obj_cli(tmp_path):
    from mvedit_tpu.models.mesh import Mesh
    m = Mesh(v=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
             f=np.array([[0, 1, 2]], np.int32))
    src = str(tmp_path / "a.glb")
    m.write_glb(src)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "glb_to_obj.py"), src],
        env=ENV, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "a.obj"))


def test_webui_endpoint_names_match_reference():
    """The gradio tab tree must expose the reference's named API endpoints
    (app.py:94-186) — checked structurally so the test runs without
    gradio installed."""
    import re
    src = open("mvedit_tpu/apis/webui.py").read()
    # endpoint names appear as string literals (directly in api_name=,
    # in api-name tuples, or as f-string templates split across lines)
    src = re.sub(r'"\s*\n\s*"', "", src)   # join adjacent string literals
    names = set(re.findall(r'"([a-z0-9_{}.]+)"', src))
    for n in list(names):
        if "{vt}" in n:
            for vt in ("1_1", "1_2"):
                names.add(n.replace("{vt}", vt))
    expected = {
        "text_to_3d_stablessdnerf", "text_to_3d_stablessdnerf_to_mesh",
        "text_to_img", "image_segmentation",
        "img_to_3d_1_1_zero123plus", "img_to_3d_1_1_zero123plus_to_mesh",
        "img_to_3d_1_2_zero123plus", "img_to_3d_1_2_zero123plus_to_mesh",
        "3d_preproc", "3d_to_3d_mvedit", "3d_to_3d_mvedit_instruct",
        "retex_mvedit", "retex_mvedit_instruct", "mesh_to_video",
    }
    missing = expected - names
    assert not missing, f"webui missing reference endpoints: {missing}"


@pytest.mark.slow
def test_two_stage_training_and_recons_eval(tmp_path):
    """Stage-1 auto-decoder (MultiSceneNeRF analog) -> stage-2 diffusion
    warm-started from the stage-1 code cache -> recons-1v eval via
    val_optim (ref configs/paper_cfgs/stage1_*/stage2_* + multiview_recons
    protocol)."""
    data = str(tmp_path / "srn")
    os.makedirs(data)
    for i in range(4):
        _make_srn_scene(data, f"scene{i}")
    with open(os.path.join(REPO, "configs", "ssdnerf_cars.py")) as f:
        src = f.read()
    src = src.replace("code_shape=(3, 16, 80, 80)",
                      "code_shape=(3, 16, 8, 8)")
    src = src.replace("latent_shape=(3, 12, 40, 40)",
                      "latent_shape=(3, 12, 8, 8)")
    src = src.replace("num_samples=96", "num_samples=8")
    src = src.replace("n_rays=4096", "n_rays=32")
    src = src.replace("batch_size=4", "batch_size=2")
    src = src.replace('jnp.zeros((1, 3, 12, 40, 40))',
                      'jnp.zeros((1, 3, 12, 8, 8))')
    src = src.replace("ch: int = 128", "ch: int = 32")
    # stage 1: no diffusion
    src1 = src.replace("train_config = dict(",
                       "train_config = dict(\n    no_diffusion=True,")
    cfg1 = str(tmp_path / "cfg_stage1.py")
    with open(cfg1, "w") as f:
        f.write(src1)
    work = str(tmp_path / "work")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_ssdnerf.py"),
         "--config", cfg1, "--data", data, "--work-dir", work,
         "--max-iters", "2"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(work, "scene_cache.npz"))

    # stage 2: diffusion on top of the cached codes
    src2 = src.replace(
        "train_config = dict(",
        "train_config = dict(\n    init_scene_cache='scene_cache.npz',")
    cfg2 = str(tmp_path / "cfg_stage2.py")
    with open(cfg2, "w") as f:
        f.write(src2)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_ssdnerf.py"),
         "--config", cfg2, "--data", data, "--work-dir", work,
         "--max-iters", "2"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]

    # recons-1v eval: reconstruct codes from 1 cond view via val_optim
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_ssdnerf.py"),
         "--config", cfg2, "--data", data, "--work-dir", work,
         "--num-scenes", "1", "--recons-views", "1",
         "--recons-steps", "4"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PSNR" in r.stdout


def test_viewers_headless(tmp_path):
    """SSDNeRFViewer GUI actions (generate/save/load/export) and
    MeshViewer rendering work headlessly (role of the reference's
    dearpygui ssdnerf_gui/mesh_gui)."""
    import jax.numpy as jnp
    from mvedit_tpu.apis.viewer import SSDNeRFViewer, MeshViewer
    from mvedit_tpu.models.mesh import Mesh
    from mvedit_tpu.utils.camera import intrinsics_from_fov

    size = 16
    intr = intrinsics_from_fov(40.0, size, size)

    def sample_fn(prompt, negp, seed, steps, cfg_scale):
        code = np.full((4,), float(seed), np.float32)

        def render_fn(pose, intrinsics):
            return np.full((size, size, 3), 0.25, np.float32)
        return code, render_fn

    def density_fn(xyz):
        return 20.0 * (0.5 - jnp.linalg.norm(xyz, axis=-1))

    v = SSDNeRFViewer(sample_fn, intr, density_fn=density_fn)
    v.generate("a car", seed=3, steps=2)
    assert v.code is not None
    img = v.export_screenshot(str(tmp_path / "s.png"))
    assert img.shape == (size, size, 3)
    v.export_multi_view(str(tmp_path / "mv_{}.png"), num_views=2)
    v.save_scene(str(tmp_path / "scene.npz"))
    v2 = SSDNeRFViewer(sample_fn, intr)
    code = v2.load_scene(str(tmp_path / "scene.npz"),
                         lambda c: lambda pose, i: np.zeros((8, 8, 3)))
    np.testing.assert_allclose(code, v.code)
    mesh = v.export_mesh(str(tmp_path / "m.glb"), resolution=16,
                         threshold=1.0)
    assert len(mesh.f) > 0

    mv = MeshViewer(mesh, render_size=32)
    frame = mv.frame(0.3)
    assert frame.shape == (32, 32, 3)
    assert np.isfinite(frame).all()


@pytest.mark.slow  # integration tier: inception features covered by test_inception_features_shape
def test_inception_stat_cli(tmp_path):
    """tools/inception_stat.py writes {feats, mu, sigma} over a dataset
    (reference tools/inception_stat.py analog)."""
    data = str(tmp_path / "srn")
    os.makedirs(data)
    for i in range(2):
        _make_srn_scene(data, f"scene{i}")
    out = str(tmp_path / "stat.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "inception_stat.py"),
         "--data", data, "--out", out, "--batch", "4",
         "--views-per-scene", "2"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(out)
    assert d["feats"].shape == (4, 2048)
    assert d["mu"].shape == (2048,)
    assert d["sigma"].shape == (2048, 2048)


@pytest.mark.slow  # integration tier: trainer loop covered by test_two_stage_training_and_recons_eval and test_training.py
def test_train_eval_hook(tmp_path):
    """--eval-interval logs held-out PSNR to eval.jsonl during training
    (GenerativeEvalHook3D role)."""
    data = str(tmp_path / "srn")
    os.makedirs(data)
    for i in range(4):
        _make_srn_scene(data, f"scene{i}")
    with open(os.path.join(REPO, "configs", "ssdnerf_cars.py")) as f:
        src = f.read()
    for a, b in (("code_shape=(3, 16, 80, 80)", "code_shape=(3, 16, 8, 8)"),
                 ("latent_shape=(3, 12, 40, 40)",
                  "latent_shape=(3, 12, 8, 8)"),
                 ("num_samples=96", "num_samples=8"),
                 ("n_rays=4096", "n_rays=32"),
                 ("batch_size=4", "batch_size=2"),
                 ('jnp.zeros((1, 3, 12, 40, 40))',
                  'jnp.zeros((1, 3, 12, 8, 8))'),
                 ("ch: int = 128", "ch: int = 32")):
        src = src.replace(a, b)
    cfg = str(tmp_path / "cfg.py")
    with open(cfg, "w") as f:
        f.write(src)
    work = str(tmp_path / "work")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_ssdnerf.py"),
         "--config", cfg, "--data", data, "--work-dir", work,
         "--max-iters", "2", "--eval-interval", "2",
         "--eval-scenes", "1"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json
    rows = [_json.loads(l) for l in
            open(os.path.join(work, "eval.jsonl"))]
    assert rows and "psnr" in rows[0]


def test_checkpoint_cleaner_cli(tmp_path):
    """checkpoint_cleaner removes non-latest npz/step-dir checkpoints;
    --save-inf prunes non-latest npz to optimizer-free cast weights
    (reference tools/checkpoint_cleaner.py:16-27)."""
    work = tmp_path / "work"
    for step in (100, 200):
        d = work / f"ckpt_{step}"
        d.mkdir(parents=True)
        (d / "_CHECKPOINT_METADATA").write_text("{}")
    for i in (1, 2):
        np.savez(work / f"model_{i:03d}.npz",
                 w=np.ones(3, np.float32), opt_mu=np.ones(3))
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "checkpoint_cleaner.py"),
         str(work), "--save-inf", "--yes"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert not (work / "ckpt_100").exists()
    assert (work / "ckpt_200").exists()
    pruned = dict(np.load(work / "model_001.npz"))
    assert set(pruned) == {"w"} and pruned["w"].dtype == np.float16
    kept = dict(np.load(work / "model_002.npz"))
    assert "opt_mu" in kept  # latest untouched
    # plain mode removes the non-latest npz outright
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "checkpoint_cleaner.py"),
         str(work), "--yes"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert not (work / "model_001.npz").exists()
    assert (work / "model_002.npz").exists()


def test_kitti_preproc_cli(tmp_path):
    """kitti_preproc crops a fully-visible car instance into SRN layout
    with a bbox-normalized c2w pose (reference tools/kitti_preproc.py)."""
    from PIL import Image
    base = tmp_path / "training"
    for d in ("image_2", "instance_2", "label_2", "calib"):
        (base / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((128, 256, 3)) * 255).astype(np.uint8)
                    ).save(base / "image_2" / "000000.png")
    seg = np.zeros((128, 256), np.int32)
    seg[40:90, 100:180] = 1000
    # no mode= kwarg: Image.fromarray infers "I" from int32, and the
    # explicit parameter is deprecated (removal in Pillow 13, 2026-10)
    Image.fromarray(seg).save(base / "instance_2" / "000000.png")
    (base / "label_2" / "000000.txt").write_text(
        "Car 0 0 0.0 100 40 180 90 1.5 1.7 4.0 2.0 1.6 15.0 0.3\n")
    P = np.array([[700, 0, 128, 40], [0, 700, 64, 1],
                  [0, 0, 1, 0.002]], np.float32)
    lines = [f"P{i}: " + " ".join(str(v) for v in P.reshape(-1))
             for i in range(4)]
    (base / "calib" / "000000.txt").write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "kitti_preproc.py"),
         "--kitti-dir", str(base), "--out-dir", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    inst = out / "000000_000"
    assert (inst / "rgb" / "000000.png").exists()
    assert (inst / "intrinsics.txt").exists()
    c2w = np.loadtxt(inst / "pose" / "000000.txt").reshape(4, 4)
    R = c2w[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    # camera distance == |loc + cam_t| / bbox diagonal (~3.3 here)
    assert 3.0 < np.linalg.norm(c2w[:3, 3]) < 3.6


def test_webui_positional_contracts_match_schema():
    """Every named endpoint's positional input list equals the reference
    contract: [seed, media inputs] + schema-ordered widget keys (+
    superres block, + trailing extras) — reference composition at
    lib/core/webui/tab_img_to_3d.py:111-116, tab_3d_to_3d.py:91-96,
    tab_retexturing.py:93-99."""
    from mvedit_tpu.apis import parameters as P
    from mvedit_tpu.apis.webui import (endpoint_signature,
                                       schema_widget_keys, ENDPOINT_NAMES)

    nm_keys = list(P.nerf_mesh_defaults.keys())
    sr_keys = ["superres_" + k for k in P.superres_defaults.keys()]
    rt_keys = list(P.retex_defaults.keys())

    # advanced=True exposes EVERY schema key, in schema order
    sig = endpoint_signature("img_to_3d_1_1_zero123plus_to_mesh",
                             advanced=True)
    assert sig == (["seed", "image"] + nm_keys + sr_keys
                   + [f"view_{i}" for i in range(6)])

    sig = endpoint_signature("img_to_3d_1_2_zero123plus_to_mesh",
                             advanced=True)
    assert sig[2:2 + len(nm_keys)] == nm_keys
    assert len(sig) == 2 + len(nm_keys) + len(sr_keys) + 12

    sig = endpoint_signature("3d_to_3d_mvedit", advanced=True)
    assert sig == ["seed", "mesh", "front_view_id"] + nm_keys + sr_keys

    # retex: full retex schema + superres + trailing in_image
    # (non-instruct only, tab_retexturing.py:98-99)
    sig = endpoint_signature("retex_mvedit", advanced=True)
    assert sig == (["seed", "mesh", "front_view_id"] + rt_keys + sr_keys
                   + ["in_image"])
    sig_i = endpoint_signature("retex_mvedit_instruct", advanced=True)
    assert sig_i == ["seed", "mesh", "front_view_id"] + rt_keys + sr_keys

    # advanced=False: only the basic create_prompt_opts/create_base_opts
    # widgets survive, still in schema order
    basic = schema_widget_keys(
        P.nerf_mesh_defaults,
        ("prompt", "negative_prompt", "scheduler", "steps",
         "denoising_strength", "random_init", "cfg_scale"), False)
    assert basic == ["prompt", "negative_prompt", "scheduler", "steps",
                     "denoising_strength", "random_init", "cfg_scale"]
    sig = endpoint_signature("3d_to_3d_mvedit", advanced=False)
    assert sig == (["seed", "mesh", "front_view_id"] + basic
                   + ["superres_" + k for k in
                      ["do_superres", "use_ip_adapter", "scheduler",
                       "steps", "denoising_strength", "random_init",
                       "cfg_scale"]])

    # stablessdnerf: prompt opts + sampler opts (no denoising_strength,
    # no render_bs widget)
    assert endpoint_signature("text_to_3d_stablessdnerf") == \
        ["seed", "prompt", "negative_prompt", "scheduler", "steps",
         "cfg_scale"]

    # text_to_img basic: image schema order
    assert endpoint_signature("text_to_img", advanced=False) == \
        ["seed", "width", "height", "prompt", "negative_prompt",
         "scheduler", "steps", "cfg_scale"]
    assert endpoint_signature("text_to_img", advanced=True) == \
        ["seed"] + list(P.image_defaults.keys())

    # the video tool contract (tab_3d_to_video.py:52-55)
    assert endpoint_signature("mesh_to_video") == \
        ["mesh", "front_view_id", "distance", "elevation", "fov",
         "length", "resolution", "lossless", "layer"]

    # every named endpoint has a defined signature
    for name in ENDPOINT_NAMES:
        assert isinstance(endpoint_signature(name, advanced=True), list)
        assert isinstance(endpoint_signature(name, advanced=False), list)
