"""Shape/flow tests for the auxiliary perception nets (tiny inputs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_efficientnet_b7_feature_channels():
    from mvedit_tpu.models.segmentors import EfficientEncoderB7
    enc = EfficientEncoderB7()
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(params, x)
    assert [f.shape[-1] for f in feats] == [48, 80, 224, 640]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]  # strides 4/8/16/32


@pytest.mark.slow
def test_tracer_segment_full():
    from mvedit_tpu.models.segmentors import TracerDecoder, tracer_segment
    dec = TracerDecoder()
    x = jnp.zeros((1, 64, 64, 3))
    params = dec.init(jax.random.PRNGKey(0), x)
    masks = tracer_segment(lambda p, im: dec.apply(p, im), params,
                           jnp.ones((2, 48, 48, 3)) * 0.5, input_size=64)
    assert masks.shape == (2, 48, 48, 1)
    assert np.isfinite(np.asarray(masks)).all()
    assert float(masks.min()) >= 0 and float(masks.max()) <= 1


def test_dpt_normal_model_shapes():
    from mvedit_tpu.models.segmentors.dpt import DPTNormalModel
    m = DPTNormalModel(vit_layers=2, readout_taps=(0, 1),
                       resnet_layers=(1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_loftr_matching_flow():
    from mvedit_tpu.models.segmentors.loftr import LoFTR, match_images
    m = LoFTR(layers=1)
    img = jnp.zeros((1, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), img, img)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    pts0, pts1, conf = match_images(
        lambda p, i0, i1: m.apply(p, i0, i1), params, a, a,
        conf_thresh=0.0)
    assert pts0.shape == pts1.shape and pts0.shape[1] == 2
    # identical images with mutual-NN matching: identity correspondence
    # dominates for an untrained net is not guaranteed; just check coords
    # are inside the image
    assert (pts0 >= 0).all() and (pts0 <= 64).all()


def test_pose_elev_estimation_synthetic():
    """Generate perfect correspondences from a known elevation; the solver
    must recover it."""
    from mvedit_tpu.utils.pose_estimation import elev_estimation
    from mvedit_tpu.utils.camera import (get_pose_from_angles,
                                         intrinsics_from_fov)
    rng = np.random.default_rng(0)
    true_elev = 0.35
    dist = 2.5
    in_pose = get_pose_from_angles(np.array([0.0]), np.array([true_elev]),
                                   dist)[0]
    intr = intrinsics_from_fov(40.0, 480, 480)
    pts3d = rng.normal(size=(200, 3)) * 0.4

    def project(pose, pts):
        r = pose[:3, :3]
        t = pose[:3, 3]
        pc = (pts - t) @ r  # world -> cam (r columns = cam axes)
        uv = pc[:, :2] / pc[:, 2:3] * intr[:2] + intr[2:]
        return uv, pc[:, 2] > 0

    matches, ref_poses = [], []
    for azi in (0.8, 2.0, 4.0):
        ref_pose = get_pose_from_angles(np.array([azi]), np.array([0.1]),
                                        dist)[0]
        uv0, v0 = project(in_pose, pts3d)
        uv1, v1 = project(ref_pose, pts3d)
        keep = v0 & v1
        matches.append((uv0[keep], uv1[keep], np.ones(keep.sum())))
        ref_poses.append(ref_pose)
    elev, pose = elev_estimation(matches, ref_poses, intr)
    assert abs(elev - true_elev) < 0.02


def test_do_segmentation_refine_hook():
    """do_segmentation (pipelines/utils.py:73-153 analog): bg-color
    override + box-prompted refine_fn (SAM slot) + erosion."""
    import numpy as np
    from mvedit_tpu.pipelines.preproc import do_segmentation

    H = W = 16
    img = np.zeros((1, H, W, 3), np.float32)
    img[0, 4:12, 4:12] = 0.8          # fg block on black bg

    def segment_fn(x):
        m = (np.asarray(x)[..., 0] > 0.5).astype(np.float32)
        return m[..., None]

    boxes = []

    def refine_fn(image_uint8, bbox):
        assert image_uint8.dtype == np.uint8
        boxes.append(bbox)
        m = np.zeros((H, W), np.float32)
        m[bbox[1]:bbox[3], bbox[0]:bbox[2]] = 1.0
        return m

    masks = do_segmentation(img, segment_fn, refine_fn=refine_fn,
                            erosion=1)
    assert masks.shape == (1, H, W, 1)
    np.testing.assert_array_equal(boxes[0], [4, 4, 12, 12])
    # erosion shrinks the refined box by 1px on each side
    assert masks[0, 5:11, 5:11, 0].min() == 1.0
    assert masks[0, 4, 4, 0] == 0.0

    # bg_color override: pixels NOT matching the bg color are forced
    # foreground even when the segmenter misses them (utils.py:94-97)
    miss_fn = lambda x: np.zeros(  # noqa: E731
        (*np.asarray(x).shape[:3], 1), np.float32)
    m2 = do_segmentation(img, miss_fn, bg_color=(0.0, 0.0, 0.0))
    assert m2[0, 4:12, 4:12, 0].min() == 1.0   # fg block forced on
    assert m2[0, 0, 0, 0] == 0.0               # true bg stays off
