"""Sparse volume interp (ops/volume_interp) + volume UNet (models/volume_unet).

Covers the reference's `lib/ops/volume_interp.py` semantics (masked /
unmasked trilinear interp with renormalized missing corners, neighbor
cache equivalence) and `lib/models/architecture/volume.py` (dense UNet
shapes/skips, masked-sparse block semantics: inactive-site invariance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvedit_tpu.ops.volume_interp import (
    SparseVolume, sparse_volume, coord_to_feat_idx, spvolume_linear_interp,
    build_neighbor, neighbor_spvolume_linear_interp, dense_from_sparse,
    sparse_from_dense)


def _full_volume(rng, shape=(4, 4, 4), B=2, C=3):
    D, H, W = shape
    idx = np.stack(np.meshgrid(np.arange(B), np.arange(D), np.arange(H),
                               np.arange(W), indexing="ij"),
                   -1).reshape(-1, 4)
    feats = rng.standard_normal((idx.shape[0], C)).astype(np.float32)
    return sparse_volume(idx, feats, shape, B), idx, feats


def _dense_ref_interp(dense, pts, b):
    """NumPy trilinear reference on a fully-occupied volume (zero pad
    out-of-range corners, unnormalized)."""
    D, H, W = dense.shape[1:4]
    s = np.array([D, H, W], np.float32)
    ci = pts * (s / 2) + (s / 2 - 0.5)
    fl = np.floor(ci).astype(int)
    fr = ci - fl
    out = np.zeros((pts.shape[0], dense.shape[-1]), np.float32)
    for corner in range(8):
        g = np.array([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
        c = fl + g
        w = np.prod(np.abs((1 - g) - fr), axis=1)
        ok = np.all((c >= 0) & (c < s.astype(int)), axis=1)
        cc = np.clip(c, 0, None)
        cc = np.minimum(cc, np.array([D - 1, H - 1, W - 1]))
        vals = dense[b[:, 0], cc[:, 0], cc[:, 1], cc[:, 2]]
        out += (w * ok)[:, None] * vals
    return out


def test_interp_matches_dense_trilinear():
    rng = np.random.default_rng(0)
    vol, idx, feats = _full_volume(rng)
    dense, mask = dense_from_sparse(vol)
    assert bool(jnp.all(mask))
    # keep all 8 corners inside the volume (cell coord in [0, 3]) so the
    # unnormalized dense reference applies (boundary cells renormalize)
    pts = rng.uniform(-0.7, 0.7, (32, 3)).astype(np.float32)
    b = rng.integers(0, 2, (32, 1)).astype(np.int32)
    out, valid = spvolume_linear_interp(vol, jnp.asarray(pts),
                                        jnp.asarray(b), masked=True)
    assert bool(jnp.all(valid))
    ref = _dense_ref_interp(np.asarray(dense), pts, b)
    # full interior occupancy: normalization divides by ~1
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_interp_missing_corner_renormalizes():
    # one active voxel: any point whose nearest voxel is it must return
    # exactly its features (all other corners renormalized away)
    idx = np.array([[0, 1, 1, 1]], np.int32)
    feats = np.array([[2.0, -3.0]], np.float32)
    vol = sparse_volume(idx, feats, (4, 4, 4), 1)
    # point near the center of voxel (1,1,1): cell coord 1.1 -> [-1,1]
    pts = jnp.array([[(1.1 - 1.5) / 2.0] * 3], jnp.float32)
    out, valid = spvolume_linear_interp(vol, pts, jnp.zeros((1, 1), int),
                                        masked=True)
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(out[0]), feats[0], rtol=1e-5)


def test_interp_masked_invalid_point():
    idx = np.array([[0, 1, 1, 1]], np.int32)
    feats = np.ones((1, 2), np.float32)
    vol = sparse_volume(idx, feats, (4, 4, 4), 1)
    # nearest voxel of this point is (3,3,3) - empty -> invalid, zero row
    pts = jnp.array([[0.9, 0.9, 0.9]], jnp.float32)
    out, valid = spvolume_linear_interp(vol, pts, jnp.zeros((1, 1), int),
                                        masked=True)
    assert not bool(valid[0])
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # unmasked: still invalid (no corner hits an active voxel)
    out2, valid2 = spvolume_linear_interp(vol, pts, jnp.zeros((1, 1), int),
                                          masked=False)
    assert not bool(valid2[0])


def test_neighbor_cache_matches_direct():
    rng = np.random.default_rng(1)
    D = H = W = 5
    n = 20
    lin = rng.choice(D * H * W, n, replace=False)
    idx = np.stack([np.zeros(n, int), lin // (H * W), (lin // W) % H,
                    lin % W], -1)
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    vol = sparse_volume(idx, feats, (D, H, W), 1)
    nbr = build_neighbor(vol)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    b = np.zeros((64, 1), np.int32)
    for masked in (True, False):
        o1, v1 = spvolume_linear_interp(vol, jnp.asarray(pts),
                                        jnp.asarray(b), masked=masked)
        o2, v2 = neighbor_spvolume_linear_interp(
            vol, jnp.asarray(pts), jnp.asarray(b), nbr, masked=masked)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-6)


def test_sparse_dense_roundtrip_and_lookup():
    rng = np.random.default_rng(2)
    vol, idx, feats = _full_volume(rng, shape=(3, 3, 3), B=1, C=2)
    dense, mask = dense_from_sparse(vol)
    vol2 = sparse_from_dense(dense, mask, capacity=27)
    d2, m2 = dense_from_sparse(vol2)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(d2))
    # point lookups: present + absent
    i, ok = coord_to_feat_idx(vol, jnp.array([[0, 1, 2, 0], [0, 5, 0, 0]]))
    assert bool(ok[0]) and not bool(ok[1])
    np.testing.assert_allclose(np.asarray(vol.features[i[0]]),
                               feats[(1 * 3 + 2) * 3 + 0])


def test_interp_grads_flow():
    rng = np.random.default_rng(3)
    vol, _, _ = _full_volume(rng, shape=(3, 3, 3), B=1, C=2)
    pts = jnp.array([[0.1, -0.2, 0.3]], jnp.float32)

    def loss(feats):
        v = SparseVolume(vol.indices, feats, vol.keys, vol.active,
                         vol.spatial_shape, vol.batch_size)
        out, _ = spvolume_linear_interp(v, pts, jnp.zeros((1, 1), int))
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vol.features)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------------
# volume UNet


@pytest.mark.slow  # integration tier: volume UNet blocks covered by test_unet_volume_encoder_stack
def test_unet_volume_shapes_and_skips():
    from mvedit_tpu.models.volume_unet import UNetVolume, VolumeUNetConfig
    cfg = VolumeUNetConfig(in_channels=4, out_channels=6,
                           block_out_channels=(8, 16), layers_per_block=1,
                           norm_num_groups=4, attention_head_dim=4)
    net = UNetVolume(cfg)
    x = jnp.zeros((1, 8, 8, 8, 4))
    params = net.init(jax.random.PRNGKey(0), x)
    out, extra = jax.jit(lambda p, x: net.apply(p, x))(params, x)
    assert out.shape == (1, 8, 8, 8, 6)
    assert len(extra) == 1 and extra[0].shape == (1, 8, 8, 8, 8)


def test_unet_volume_encoder_stack():
    from mvedit_tpu.models.volume_unet import UNetVolume, VolumeUNetConfig
    cfg = VolumeUNetConfig(in_channels=2, out_channels=None,
                           block_out_channels=(8, 16), layers_per_block=1,
                           encoder_block_out_channels=(8,),
                           encoder_layers_per_block=1,
                           norm_num_groups=4, attention_head_dim=4)
    net = UNetVolume(cfg)
    x = jnp.zeros((1, 8, 8, 8, 2))
    params = net.init(jax.random.PRNGKey(0), x)
    out, extra = net.apply(params, x)
    # conv_in + 1 resnet + 1 downsample
    assert len(extra) == 3
    assert extra[-1].shape == (1, 4, 4, 4, 8)
    assert out.shape == (1, 4, 4, 4, 8)  # no conv_out -> block_out[0] ch


def test_masked_resnet_inactive_site_invariance():
    """SubMConv semantics: outputs at active sites must not depend on
    values stored at inactive sites, and inactive outputs are zero."""
    from mvedit_tpu.models.volume_unet import ResnetBlockVolume
    rng = np.random.default_rng(4)
    blk = ResnetBlockVolume(out_channels=8, groups=2,
                            zero_init_residual=False)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 5, 8)), jnp.float32)
    mask = jnp.asarray(rng.random((1, 5, 5, 5)) < 0.4)
    params = blk.init(jax.random.PRNGKey(0), x, mask)
    mf = mask[..., None].astype(x.dtype)
    y1 = blk.apply(params, x * mf, mask)
    garbage = x * mf + 100.0 * (1 - mf)
    y2 = blk.apply(params, garbage, mask)
    # identical at active sites, regardless of inactive values...
    np.testing.assert_allclose(np.asarray(y1 * mf), np.asarray(y2 * mf),
                               rtol=2e-4, atol=2e-4)
    # ...and the residual branch contributes nothing at inactive sites
    # (the skip passes the raw input through, as in spconv where inactive
    # sites simply do not exist)
    np.testing.assert_allclose(np.asarray((y1 - x * mf) * (1 - mf)), 0.0,
                               atol=1e-5)


def test_masked_group_norm_matches_rowwise():
    from mvedit_tpu.models.volume_unet import masked_group_norm
    rng = np.random.default_rng(5)
    C, g = 8, 2
    x = rng.standard_normal((1, 3, 3, 3, C)).astype(np.float32)
    mask = rng.random((1, 3, 3, 3)) < 0.5
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    y = masked_group_norm(jnp.asarray(x), jnp.asarray(mask), g,
                          jnp.asarray(scale), jnp.asarray(bias), eps=1e-5)
    # reference: group norm over the (N_active, C) feature rows
    rows = x[0][mask[0]]  # (n, C)
    out = np.zeros_like(rows)
    for gi in range(g):
        sl = slice(gi * C // g, (gi + 1) * C // g)
        mu, var = rows[:, sl].mean(), rows[:, sl].var()
        out[:, sl] = (rows[:, sl] - mu) / np.sqrt(var + 1e-5)
    out = out * scale + bias
    np.testing.assert_allclose(np.asarray(y)[0][mask[0]], out,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(y)[0][~mask[0]], 0.0)


def test_masked_trilinear_upsample_full_mask_matches_interp():
    """On a fully-active coarse grid the masked upsample must equal the
    direct sparse interp at fine voxel centers."""
    from mvedit_tpu.models.volume_unet import masked_trilinear_upsample
    rng = np.random.default_rng(6)
    vol, _, _ = _full_volume(rng, shape=(3, 3, 3), B=1, C=2)
    dense, mask = dense_from_sparse(vol)
    fine_mask = jnp.ones((1, 6, 6, 6), bool)
    up, valid = masked_trilinear_upsample(dense, mask, fine_mask)
    # fine voxel center j -> [-1,1] coords (the reference UpsampleSpVolume
    # mapping, volume.py:617-620)
    j = np.stack(np.meshgrid(*[np.arange(6)] * 3, indexing="ij"),
                 -1).reshape(-1, 3).astype(np.float32)
    pts = j * (2 / 6) + (1 / 6 - 1)
    out, _ = spvolume_linear_interp(vol, jnp.asarray(pts),
                                    jnp.zeros((216, 1), int), masked=True)
    np.testing.assert_allclose(np.asarray(up).reshape(216, 2),
                               np.asarray(out), rtol=1e-4, atol=1e-4)
