"""Shape/flow tests for the auxiliary perception nets (tiny inputs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow  # integration tier: full B7 tower compile is ~50 s on the 1-core CPU mesh; TRACER decoder + converter covered by the tracer tests
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


@pytest.mark.slow  # integration tier: DPT tower covered by test_dpt_converter_roundtrip
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


@pytest.mark.slow  # integration tier: LoFTR weights path covered by test_loftr_converter_roundtrip, pose solve by pose-estimation tests
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


# ---------------------------------------------------------------------------
# SAM (box-prompted segmentation refinement)
# ---------------------------------------------------------------------------

def test_sam_tiny_predict_box():
    """Tiny-config SAM end to end: image -> box prompt -> binary mask at
    the original resolution (reference path pipelines/utils.py:108-131)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvedit_tpu.models.segmentors import SamModel, SAM_TINY, \
        sam_predict_box

    model = SamModel(SAM_TINY)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SAM_TINY.img_size,
                                   SAM_TINY.img_size, 3)),
                        jnp.zeros((4,)))["params"]
    img = np.random.default_rng(0).random((48, 40, 3)).astype(np.float32)
    mask = sam_predict_box(model, params, img,
                           np.array([5, 5, 30, 40], np.float32))
    assert mask.shape == (48, 40)
    assert np.isfinite(np.asarray(mask)).all()
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_sam_converter_maps_torch_state_dict():
    """convert_sam consumes a synthetic torch-style vit state dict with
    the real checkpoint's key names and produces params that run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvedit_tpu.models.segmentors import SamModel, SAM_TINY, \
        convert_sam

    c = SAM_TINY
    rng = np.random.default_rng(1)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    hd = c.embed_dim // c.num_heads
    t = c.tokens_hw
    sd = {
        "image_encoder.patch_embed.proj.weight":
            r(c.embed_dim, 3, c.patch_size, c.patch_size),
        "image_encoder.patch_embed.proj.bias": r(c.embed_dim),
        "image_encoder.pos_embed": r(1, t, t, c.embed_dim),
        "image_encoder.neck.0.weight": r(c.out_chans, c.embed_dim, 1, 1),
        "image_encoder.neck.1.weight": np.ones(c.out_chans, np.float32),
        "image_encoder.neck.1.bias": r(c.out_chans),
        "image_encoder.neck.2.weight": r(c.out_chans, c.out_chans, 3, 3),
        "image_encoder.neck.3.weight": np.ones(c.out_chans, np.float32),
        "image_encoder.neck.3.bias": r(c.out_chans),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            r(2, c.out_chans // 2),
        "prompt_encoder.no_mask_embed.weight": r(1, c.out_chans),
        "mask_decoder.iou_token.weight": r(1, c.out_chans),
        "mask_decoder.mask_tokens.weight":
            r(c.num_multimask + 1, c.out_chans),
        "mask_decoder.output_upscaling.0.weight":
            r(c.out_chans, c.out_chans // 4, 2, 2),
        "mask_decoder.output_upscaling.0.bias": r(c.out_chans // 4),
        "mask_decoder.output_upscaling.1.weight":
            np.ones(c.out_chans // 4, np.float32),
        "mask_decoder.output_upscaling.1.bias": r(c.out_chans // 4),
        "mask_decoder.output_upscaling.3.weight":
            r(c.out_chans // 4, c.out_chans // 8, 2, 2),
        "mask_decoder.output_upscaling.3.bias": r(c.out_chans // 8),
        "mask_decoder.transformer.norm_final_attn.weight":
            np.ones(c.out_chans, np.float32),
        "mask_decoder.transformer.norm_final_attn.bias": r(c.out_chans),
    }
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
            r(1, c.out_chans)
    ws = c.window_size
    for i in range(c.depth):
        p = f"image_encoder.blocks.{i}"
        n = t if i in c.global_attn_indexes else ws
        sd.update({
            f"{p}.norm1.weight": np.ones(c.embed_dim, np.float32),
            f"{p}.norm1.bias": r(c.embed_dim),
            f"{p}.norm2.weight": np.ones(c.embed_dim, np.float32),
            f"{p}.norm2.bias": r(c.embed_dim),
            f"{p}.attn.qkv.weight": r(3 * c.embed_dim, c.embed_dim),
            f"{p}.attn.qkv.bias": r(3 * c.embed_dim),
            f"{p}.attn.proj.weight": r(c.embed_dim, c.embed_dim),
            f"{p}.attn.proj.bias": r(c.embed_dim),
            f"{p}.attn.rel_pos_h": r(2 * n - 1, hd),
            f"{p}.attn.rel_pos_w": r(2 * n - 1, hd),
            f"{p}.mlp.lin1.weight": r(4 * c.embed_dim, c.embed_dim),
            f"{p}.mlp.lin1.bias": r(4 * c.embed_dim),
            f"{p}.mlp.lin2.weight": r(c.embed_dim, 4 * c.embed_dim),
            f"{p}.mlp.lin2.bias": r(c.embed_dim),
        })
    d = c.out_chans
    for i in range(c.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        for attn, ds in (("self_attn", 1), ("cross_attn_token_to_image", 2),
                         ("cross_attn_image_to_token", 2)):
            dd = d // ds
            for nme, (o, in_) in (("q_proj", (dd, d)), ("k_proj", (dd, d)),
                                  ("v_proj", (dd, d)),
                                  ("out_proj", (d, dd))):
                sd[f"{p}.{attn}.{nme}.weight"] = r(o, in_)
                sd[f"{p}.{attn}.{nme}.bias"] = r(o)
        for j in range(1, 5):
            sd[f"{p}.norm{j}.weight"] = np.ones(d, np.float32)
            sd[f"{p}.norm{j}.bias"] = r(d)
        sd[f"{p}.mlp.lin1.weight"] = r(c.decoder_mlp_dim, d)
        sd[f"{p}.mlp.lin1.bias"] = r(c.decoder_mlp_dim)
        sd[f"{p}.mlp.lin2.weight"] = r(d, c.decoder_mlp_dim)
        sd[f"{p}.mlp.lin2.bias"] = r(d)
    dd = d // 2
    for nme, (o, in_) in (("q_proj", (dd, d)), ("k_proj", (dd, d)),
                          ("v_proj", (dd, d)), ("out_proj", (d, dd))):
        sd[f"mask_decoder.transformer.final_attn_token_to_image."
           f"{nme}.weight"] = r(o, in_)
        sd[f"mask_decoder.transformer.final_attn_token_to_image."
           f"{nme}.bias"] = r(o)
    for i in range(c.num_multimask + 1):
        dims = [(d, d), (d, d), (d // 8, d)]
        for j, (o, in_) in enumerate(dims):
            sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers."
               f"{j}.weight"] = r(o, in_)
            sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers."
               f"{j}.bias"] = r(o)
    for j, (o, in_) in enumerate([(d, d), (d, d),
                                  (c.num_multimask + 1, d)]):
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.weight"] = \
            r(o, in_)
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.bias"] = r(o)

    params, unmatched = convert_sam(sd, c)
    assert unmatched == [], unmatched

    model = SamModel(c)
    masks, iou = model.apply(
        {"params": params},
        jnp.zeros((1, c.img_size, c.img_size, 3)),
        jnp.asarray([4.0, 4.0, 40.0, 40.0]))
    assert masks.shape == (3, 4 * c.tokens_hw, 4 * c.tokens_hw)
    assert iou.shape == (3,)
    assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.slow  # integration tier: SAM network covered by test_sam_tiny_predict_box, TRACER endpoint by test_run_segmentation
def test_run_segmentation_use_sam():
    """use_sam=True: TRACER bbox -> SAM box-prompt refinement through the
    runner endpoint (ref adapter3d.py:720 + utils.py:108-131)."""
    import numpy as np
    from mvedit_tpu.apis import Adapter3DRunner

    runner = Adapter3DRunner(tiny_models=True, seed=0)
    imgs = np.zeros((1, 32, 32, 3), np.float32)
    imgs[0, 8:24, 8:24] = 1.0
    masks = runner.run_segmentation(imgs, use_sam=True)
    assert masks.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(masks)).all()
