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
    # ReLU (non_negative) head: bounded below, clamped by callers above
    assert float(out.min()) >= 0 and np.isfinite(np.asarray(out)).all()


def test_dpt_converter_roundtrip():
    """Synthetic torch state dict in the omnidata/timm key layout maps
    exactly onto the flax tree (every leaf matched, values preserved)."""
    from mvedit_tpu.models.segmentors.dpt import (DPTNormalModel,
                                                  convert_dpt)
    vd, feats = 24, 8
    net = DPTNormalModel(vit_dim=vd, vit_layers=2, readout_taps=(0, 1),
                         resnet_layers=(1, 1, 1), features=feats,
                         pos_grid=(2, 2))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def leaf(*path):
        node = ref["params"]
        for p in path:
            node = node[p]
        return np.asarray(node)

    sd = {}

    def put_conv(tk, *path):
        sd[tk + ".weight"] = leaf(*path, "kernel").transpose(3, 2, 0, 1)
        node = ref["params"]
        for p in path:
            node = node[p]
        if "bias" in node:
            sd[tk + ".bias"] = np.asarray(node["bias"])

    def put_dense(tk, *path):
        sd[tk + ".weight"] = leaf(*path, "kernel").T
        sd[tk + ".bias"] = leaf(*path, "bias")

    def put_norm(tk, *path):
        sd[tk + ".weight"] = leaf(*path, "scale")
        sd[tk + ".bias"] = leaf(*path, "bias")

    bb = "pretrained.model.patch_embed.backbone"
    put_conv(f"{bb}.stem.conv", "backbone", "stem_conv")
    put_norm(f"{bb}.stem.norm", "backbone", "stem_norm", "gn")
    for s in range(3):
        blk = f"{bb}.stages.{s}.blocks.0"
        fx = f"stage{s}_0"
        for c in ("conv1", "conv2", "conv3"):
            put_conv(f"{blk}.{c}", "backbone", fx, c)
        for n in ("norm1", "norm2", "norm3"):
            put_norm(f"{blk}.{n}", "backbone", fx, n, "gn")
        put_conv(f"{blk}.downsample.conv", "backbone", fx,
                 "downsample_conv")
        put_norm(f"{blk}.downsample.norm", "backbone", fx,
                 "downsample_norm", "gn")
    sd["pretrained.model.cls_token"] = leaf("cls_token")
    sd["pretrained.model.pos_embed"] = leaf("pos_embed")
    put_conv("pretrained.model.patch_embed.proj", "patch_embed")
    for i in range(2):
        b = f"pretrained.model.blocks.{i}"
        put_norm(f"{b}.norm1", f"vit_{i}", "norm1")
        put_norm(f"{b}.norm2", f"vit_{i}", "norm2")
        put_dense(f"{b}.attn.qkv", f"vit_{i}", "qkv")
        put_dense(f"{b}.attn.proj", f"vit_{i}", "proj")
        put_dense(f"{b}.mlp.fc1", f"vit_{i}", "fc1")
        put_dense(f"{b}.mlp.fc2", f"vit_{i}", "fc2")
    # final ViT norm: present in ckpt, unused by the hooks
    sd["pretrained.model.norm.weight"] = np.ones((vd,), np.float32)
    sd["pretrained.model.norm.bias"] = np.zeros((vd,), np.float32)
    put_dense("pretrained.act_postprocess3.0.project.0", "readout3")
    put_conv("pretrained.act_postprocess3.3", "postproc3")
    put_dense("pretrained.act_postprocess4.0.project.0", "readout4")
    put_conv("pretrained.act_postprocess4.3", "postproc4a")
    put_conv("pretrained.act_postprocess4.4", "postproc4b")
    for n in range(1, 5):
        put_conv(f"scratch.layer{n}_rn", f"layer{n}_rn")
        put_conv(f"scratch.refinenet{n}.out_conv", f"fusion{n}",
                 "out_conv")
        put_conv(f"scratch.refinenet{n}.resConfUnit2.conv1",
                 f"fusion{n}", "rcu2", "conv1")
        put_conv(f"scratch.refinenet{n}.resConfUnit2.conv2",
                 f"fusion{n}", "rcu2", "conv2")
        if n < 4:  # refinenet4 never calls rcu1 (no skip input)
            put_conv(f"scratch.refinenet{n}.resConfUnit1.conv1",
                     f"fusion{n}", "rcu1", "conv1")
            put_conv(f"scratch.refinenet{n}.resConfUnit1.conv2",
                     f"fusion{n}", "rcu1", "conv2")
    # refinenet4.rcu1 exists in real ckpts; must be silently dropped
    sd["scratch.refinenet4.resConfUnit1.conv1.weight"] = \
        np.zeros((feats, feats, 3, 3), np.float32)
    sd["scratch.refinenet4.resConfUnit1.conv1.bias"] = \
        np.zeros((feats,), np.float32)
    for tk, fx in (("0", "head1"), ("2", "head2"), ("4", "head3")):
        put_conv(f"scratch.output_conv.{tk}", fx)

    tree, unmatched = convert_dpt(sd)
    assert unmatched == []
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(tree))
    assert len(flat_ref) == len(flat_new)
    for path, v in flat_ref:
        np.testing.assert_array_equal(np.asarray(flat_new[path]),
                                      np.asarray(v), err_msg=str(path))
    # converted params actually run
    out = net.apply(tree, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 3)


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


def test_loftr_converter_roundtrip():
    """Synthetic torch state dict in the indoor_ds_new.ckpt key layout
    (incl. the lightning `matcher.` prefix) maps exactly onto the flax
    tree."""
    from mvedit_tpu.models.segmentors.loftr import LoFTR, convert_loftr
    net = LoFTR(layers=1, topk=16)
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                   jnp.zeros((1, 32, 32, 1)))

    def leaf(*path):
        node = ref["params"]
        for p in path:
            node = node[p]
        return np.asarray(node)

    sd = {}

    def put_conv(tk, *path):
        sd[tk + ".weight"] = leaf(*path, "kernel").transpose(3, 2, 0, 1)

    def put_bn(tk, *path):
        sd[tk + ".weight"] = leaf(*path, "scale")
        sd[tk + ".bias"] = leaf(*path, "bias")
        sd[tk + ".running_mean"] = leaf(*path, "mean")
        sd[tk + ".running_var"] = leaf(*path, "var")
        sd[tk + ".num_batches_tracked"] = np.zeros((), np.int64)

    def put_enc(tk, fx):
        for t, f in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                     ("v_proj", "v_proj"), ("merge", "merge"),
                     ("mlp.0", "mlp0"), ("mlp.2", "mlp2")):
            sd[f"{tk}.{t}.weight"] = leaf(fx, f, "kernel").T
        for n in ("norm1", "norm2"):
            sd[f"{tk}.{n}.weight"] = leaf(fx, n, "scale")
            sd[f"{tk}.{n}.bias"] = leaf(fx, n, "bias")

    put_conv("backbone.conv1", "backbone", "conv1")
    put_bn("backbone.bn1", "backbone", "bn1")
    for L in ("1", "2", "3"):
        for i in range(2):
            tp, fp = f"backbone.layer{L}.{i}", f"layer{L}_{i}"
            put_conv(f"{tp}.conv1", "backbone", fp, "conv1")
            put_conv(f"{tp}.conv2", "backbone", fp, "conv2")
            put_bn(f"{tp}.bn1", "backbone", fp, "bn1")
            put_bn(f"{tp}.bn2", "backbone", fp, "bn2")
            if L != "1" and i == 0:
                put_conv(f"{tp}.downsample.0", "backbone", fp,
                         "downsample_conv")
                put_bn(f"{tp}.downsample.1", "backbone", fp,
                       "downsample_bn")
        put_conv(f"backbone.layer{L}_outconv", "backbone",
                 f"layer{L}_outconv")
    for L in ("1", "2"):
        tp, fp = f"backbone.layer{L}_outconv2", f"layer{L}_outconv2"
        put_conv(f"{tp}.0", "backbone", fp, "conv1")
        put_bn(f"{tp}.1", "backbone", fp, "bn")
        put_conv(f"{tp}.3", "backbone", fp, "conv2")
    for i in range(2):
        put_enc(f"loftr_coarse.layers.{i}", f"coarse_{i}")
        put_enc(f"loftr_fine.layers.{i}", f"fine_{i}")
    for tk, fx in (("fine_preprocess.down_proj", "down_proj"),
                   ("fine_preprocess.merge_feat", "merge_feat")):
        sd[tk + ".weight"] = leaf(fx, "kernel").T
        sd[tk + ".bias"] = leaf(fx, "bias")

    sd = {"matcher." + k: v for k, v in sd.items()}
    tree, unmatched = convert_loftr(sd)
    assert unmatched == []
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(tree))
    assert len(flat_ref) == len(flat_new)
    for path, v in flat_ref:
        np.testing.assert_array_equal(np.asarray(flat_new[path]),
                                      np.asarray(v), err_msg=str(path))
    out = net.apply(tree, jnp.zeros((1, 32, 32, 1)),
                    jnp.zeros((1, 32, 32, 1)))
    assert out["pts0"].shape == out["pts1"].shape == (16, 2)


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
