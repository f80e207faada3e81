import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvedit_tpu.utils.evaluation import (eval_psnr, eval_ssim,
                                         fid_from_feats, kid_from_feats)


def test_psnr_known():
    a = np.zeros((1, 8, 8, 3))
    b = np.full((1, 8, 8, 3), 0.1)
    np.testing.assert_allclose(eval_psnr(a, b), 20.0, atol=1e-6)
    assert eval_psnr(a, a)[0] > 100


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3))
    assert eval_ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = eval_ssim(img, noisy)
    assert 0.0 < s < 0.95


def test_fid_kid_sanity():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(500, 16))
    b = rng.normal(size=(500, 16))
    c = rng.normal(loc=2.0, size=(500, 16))
    fid_same = fid_from_feats(a, b)
    fid_diff = fid_from_feats(a, c)
    assert fid_diff > fid_same
    kid_same = kid_from_feats(a, b, num_subsets=10, subset_size=100)
    kid_diff = kid_from_feats(a, c, num_subsets=10, subset_size=100)
    assert kid_diff > kid_same
    assert abs(kid_same) < 0.5


def test_inception_features_shape():
    from mvedit_tpu.models.inception import InceptionV3Features
    net = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert feats.shape == (1, 2048)


def test_aesthetic_head():
    from mvedit_tpu.models.inception import AestheticHead
    net = AestheticHead()
    emb = jnp.ones((2, 768))
    params = net.init(jax.random.PRNGKey(0), emb)
    s = net.apply(params, emb)
    assert s.shape == (2,)


def test_phase_timer_signature_steady():
    """steady() drops each program signature's FIRST tick (its XLA
    compile) and medians the warm rest; falls back to skip-first when no
    sigs were passed."""
    from mvedit_tpu.utils.profiling import PhaseTimer

    pt = PhaseTimer()
    pt.durations["p"] = [30.0, 1.0, 1.2, 40.0, 2.0, 1.1]
    pt.sigs["p"] = [("a",), ("a",), ("a",), ("b",), ("b",), ("a",)]
    # warm ticks: 1.0, 1.2, 2.0, 1.1 -> median 1.15
    assert abs(pt.steady("p") - 1.15) < 1e-9
    pt2 = PhaseTimer()
    pt2.durations["q"] = [30.0, 1.0, 3.0]
    pt2.sigs["q"] = [None, None, None]
    assert pt2.steady("q") == 2.0  # skip-first fallback
    pt3 = PhaseTimer()
    pt3.durations["r"] = [30.0]
    pt3.sigs["r"] = [("a",)]
    assert pt3.steady("r") is None  # nothing warm
