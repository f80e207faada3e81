import numpy as np
import jax.numpy as jnp

from mvedit_tpu.utils import camera, geometry


def test_look_at_opencv_convention():
    # camera at +x looking at origin, z-up world: forward = -x,
    # image-down (=+y col after negation) should have -z component
    rot = camera.look_at(np.array([[2.0, 0, 0]]), np.zeros((1, 3)),
                         np.array([0.0, 0, 1]))
    f = rot[0, :, 2]
    np.testing.assert_allclose(f, [-1, 0, 0], atol=1e-6)
    # -u column points world-down
    np.testing.assert_allclose(rot[0, :, 1], [0, 0, -1], atol=1e-6)
    # orthonormal
    np.testing.assert_allclose(rot[0].T @ rot[0], np.eye(3), atol=1e-6)


def test_pose_from_angles_positions():
    poses = camera.get_pose_from_angles(
        np.array([0.0, np.pi / 2]), np.array([0.0, 0.0]), 2.0)
    np.testing.assert_allclose(poses[0, :3, 3], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(poses[1, :3, 3], [0, 2, 0], atol=1e-6)
    assert poses.shape == (2, 4, 4)


def test_surround_views_orbits():
    pose0 = camera.get_pose_from_angles(
        np.array([0.3]), np.array([0.2]), 2.5)[0]
    poses = camera.surround_views(pose0, num_frames=12)
    d = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, 2.5, rtol=1e-5)


def test_random_surround_views_ring():
    rng = np.random.default_rng(0)
    poses = camera.random_surround_views(2.0, 8, use_linspace=True,
                                         begin_rad=0.0, rng=rng)
    d = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, 2.0, rtol=1e-5)


def test_light_sampling_unit_and_elev():
    poses = camera.random_surround_views(
        2.0, 16, use_linspace=True, rng=np.random.default_rng(1))[:, :3, :]
    w, c = camera.light_sampling(poses, elev_range=(10, 90),
                                 rng=np.random.default_rng(2))
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
    elev = np.degrees(np.arcsin(np.clip(w[:, 2], -1, 1)))
    assert (elev > 5).all()  # clamped toward [10, 90]


def test_view_prompts():
    azi = np.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2])
    poses = camera.get_pose_from_angles(azi, np.zeros(4), 2.0)
    prompts = camera.view_prompts(poses[:, :3], front_azi=0.0)
    assert prompts == ["", "side view", "view from behind", "side view"]


def test_ray_directions_center_pixel():
    intr = jnp.array([100.0, 100.0, 32.0, 32.0])
    dirs = geometry.get_ray_directions(64, 64, intr)
    assert dirs.shape == (64, 64, 3)
    # center-ish pixel points ~ +z
    np.testing.assert_allclose(dirs[32, 32], [0.005, 0.005, 1.0], atol=1e-5)


def test_get_rays_world():
    intr = jnp.array([100.0, 100.0, 16.0, 16.0])
    pose = camera.get_pose_from_angles(np.array([0.0]), np.array([0.0]), 2.0)
    c2w = jnp.asarray(pose[:, :3, :])
    o, d = geometry.get_cam_rays(c2w, intr, 32, 32)
    assert o.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(o[0, 0, 0], [2, 0, 0], atol=1e-5)
    # central ray points toward origin (-x)
    np.testing.assert_allclose(d[0, 16, 16], [-1, 0, 0], atol=0.02)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_depth_to_normal_flat_plane():
    # plane z = 2 in camera space -> normal pointing at the camera
    intr = jnp.array([100.0, 100.0, 16.0, 16.0])
    dirs = geometry.get_ray_directions(32, 32, intr)
    inv_depth = jnp.full((32, 32), 0.5)  # 1/z with z=2
    n = geometry.depth_to_normal(inv_depth, dirs, format="opencv")
    n_vec = np.asarray(n[16, 16]) * 2 - 1
    np.testing.assert_allclose(n_vec, [0, 0, -1], atol=1e-3)


def test_normalize_depth_range():
    depths = jnp.stack([jnp.linspace(1.0, 2.0, 64).reshape(8, 8)])
    alphas = jnp.ones((1, 8, 8, 1))
    out = geometry.normalize_depth(depths, alphas)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
