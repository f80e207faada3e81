import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvedit_tpu.models.diffusion import (
    AttnMode, UNetConfig, UNet2DCondition, VAEConfig, AutoencoderKL,
    CLIPTextConfig, CLIPTextModel, ControlNet, schedulers as S)

TINY_UNET = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                       attn_down=(True, False), cross_attention_dim=32,
                       num_heads=4, dtype=jnp.float32)
TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                     dtype=jnp.float32)
TINY_TEXT = CLIPTextConfig(vocab_size=100, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=4,
                           max_length=16)


def test_unet_forward_shapes():
    net = UNet2DCondition(TINY_UNET)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([10, 10])
    ctx = jnp.zeros((2, 8, 32))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)
    out = net.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_unet_enc_dec_split_matches_full():
    net = UNet2DCondition(TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([10, 10])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)
    full = net.apply(params, x, t, ctx)
    enc = net.apply(params, x, t, ctx, part="enc")
    dec = net.apply(params, x, t, ctx, part="dec", enc_state=enc)
    np.testing.assert_allclose(full, dec, atol=1e-5)


def test_unet_joint_attention_couples_views():
    """With num_views=2 the output of view 0 must depend on view 1."""
    net = UNet2DCondition(TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([10, 10])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)
    base = net.apply(params, x, t, ctx, mode=AttnMode(num_views=2))
    x2 = x.at[1].add(1.0)
    pert = net.apply(params, x2, t, ctx, mode=AttnMode(num_views=2))
    # view 0 changed because view 1 changed
    assert float(jnp.abs(pert[0] - base[0]).max()) > 1e-6
    # without joint attention, view 0 unchanged
    b0 = net.apply(params, x, t, ctx)
    p0 = net.apply(params, x2, t, ctx)
    np.testing.assert_allclose(b0[0], p0[0], atol=1e-6)


def test_controlnet_residuals_shapes_and_zero_init():
    cn = ControlNet(TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([5])
    ctx = jnp.zeros((1, 8, 32))
    hint = jnp.ones((1, 128, 128, 3))
    params = cn.init(jax.random.PRNGKey(0), x, t, ctx, hint)
    downs, mid = cn.apply(params, x, t, ctx, hint)
    # zero-init heads -> all-zero residuals at init
    assert all(float(jnp.abs(d).max()) == 0.0 for d in downs)
    assert float(jnp.abs(mid).max()) == 0.0
    # shapes line up with the UNet skip list
    net = UNet2DCondition(TINY_UNET)
    uparams = net.init(jax.random.PRNGKey(0), x, t, ctx)
    out = net.apply(uparams, x, t, ctx, down_block_res=downs,
                    mid_block_res=mid)
    assert out.shape == (1, 16, 16, 4)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 16, 16, 4)  # two blocks -> /2
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == (1, 32, 32, 3)


def test_clip_text_shapes():
    m = CLIPTextModel(TINY_TEXT)
    ids = jnp.zeros((2, 16), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 16, 32)


# ---------------------------------------------------------------------------
# scheduler numerics
# ---------------------------------------------------------------------------

def test_schedule_matches_known_values():
    sch = S.sd_schedule()
    # diffusers scaled_linear schedule endpoints
    assert sch.alphas_cumprod[0] == pytest.approx(1 - 0.00085, rel=1e-6)
    assert 0.002 < sch.alphas_cumprod[-1] < 0.01


def test_timesteps_trailing():
    ts = S.make_timesteps(4, 1000, "trailing")
    np.testing.assert_array_equal(ts, [999, 749, 499, 249])


def test_karras_sigmas_monotonic():
    sch = S.sd_schedule()
    sig, ts = S.karras_sigmas(sch, 10)
    assert (np.diff(sig) < 0).all()


def test_ddim_exact_recovery():
    """With a perfect epsilon oracle, DDIM recovers x0 at the last step."""
    sch = S.sd_schedule()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = S.make_timesteps(8, 1000, "trailing")
    x = S.add_noise(sch, x0, eps, jnp.array([ts[0]]))
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        # oracle epsilon for current x: eps_t = (x - sqrt(a) x0)/sqrt(1-a)
        sa, sn = sch.sqrt_acp(jnp.array(t))
        model_eps = (x - sa * x0) / sn
        x = S.ddim_step(sch, x, model_eps, jnp.array(t), jnp.array(t_prev))
    np.testing.assert_allclose(x, x0, atol=1e-3)


def test_dpmsolver_converges_to_x0():
    sch = S.sd_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = S.make_timesteps(12, 1000, "trailing")
    x = S.add_noise(sch, x0, eps, jnp.array([ts[0]]))
    state = S.SolverState.init(x.shape)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        sa, sn = sch.sqrt_acp(jnp.array(t))
        model_eps = (x - sa * x0) / sn
        x, state = S.dpmsolver_step(sch, x, model_eps, jnp.array(t),
                                    jnp.array(t_prev), state)
    np.testing.assert_allclose(x, x0, atol=5e-3)


def test_euler_ancestral_reduces_noise():
    sch = S.sd_schedule()
    x0 = jnp.zeros((1, 8, 8, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = S.make_timesteps(16, 1000, "trailing")
    x = S.add_noise(sch, x0, eps, jnp.array([ts[0]]))
    key = jax.random.PRNGKey(2)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        sa, sn = sch.sqrt_acp(jnp.array(t))
        model_eps = (x - sa * x0) / sn
        key, k = jax.random.split(key)
        x = S.euler_ancestral_step(sch, x, model_eps, jnp.array(t),
                                   jnp.array(t_prev), k)
    assert float(jnp.abs(x).mean()) < 0.05


def test_get_noise_scales_interpolates():
    sch = S.sd_schedule()
    sa, sn = S.get_noise_scales(sch, jnp.array(500.5))
    sa0, sn0 = sch.sqrt_acp(jnp.array(500))
    sa1, sn1 = sch.sqrt_acp(jnp.array(501))
    assert min(sa0, sa1) <= sa <= max(sa0, sa1)
    assert sa ** 2 + sn ** 2 == pytest.approx(1.0, abs=1e-5)
