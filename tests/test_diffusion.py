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


# ---------------------------------------------------------------------------
# scheduler goldens: analytic exactness + independent numpy re-derivations
# (diffusers is not installed in this env; these pin the hand-derived
# sampler math against closed forms and a second, independent derivation)
# ---------------------------------------------------------------------------

def test_timesteps_trailing_golden_24():
    """SD image-to-3D default (24 steps): literal trailing-spacing vector,
    diffusers timestep_spacing='trailing' semantics."""
    np.testing.assert_array_equal(
        S.make_timesteps(24, 1000, "trailing"),
        [999, 957, 916, 874, 832, 791, 749, 707, 666, 624, 582, 541,
         499, 457, 416, 374, 332, 291, 249, 207, 166, 124, 82, 41])


def test_karras_sigmas_golden_12():
    """Karras rho=7 respacing of the SD scaled-linear schedule: committed
    golden sigmas + nearest-timestep mapping."""
    sch = S.sd_schedule()
    sig, ts = S.karras_sigmas(sch, 12)
    np.testing.assert_allclose(
        sig, [14.614641, 9.945197, 6.617713, 4.294064, 2.708034, 1.653173,
              0.972113, 0.547239, 0.292622, 0.147135, 0.068639, 0.029167],
        rtol=1e-5)
    np.testing.assert_array_equal(
        ts, [999, 933, 854, 761, 646, 506, 345, 190, 78, 23, 4, 0])


def _oracle_eps(sch, x, x0, t):
    sa, sn = sch.sqrt_acp(jnp.array(t))
    return (x - sa * x0) / sn


def test_dpmsolver_exact_for_constant_x0():
    """DPM-Solver++ is EXACT (both orders) when the model's x0-prediction
    is constant: the probability-flow ODE solution is
    x_t = alpha_t * x0 + sigma_t * c, so every intermediate latent must lie
    on that curve to machine precision. Pins the alpha/sigma/lambda/h
    algebra including all signs."""
    sch = S.sd_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 2))
    c = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = S.make_timesteps(10, 1000, "trailing")
    acp = jnp.asarray(sch.alphas_cumprod, jnp.float32)

    def on_curve(t):
        a = acp[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * c

    x = on_curve(int(ts[0]))
    state = S.SolverState.init(x.shape)
    for i, t in enumerate(ts[:-1]):
        t_prev = int(ts[i + 1])
        model_eps = _oracle_eps(sch, x, x0, int(t))
        x, state = S.dpmsolver_step(sch, x, model_eps, jnp.array(int(t)),
                                    jnp.array(t_prev), state)
        np.testing.assert_allclose(np.asarray(x),
                                   np.asarray(on_curve(t_prev)),
                                   atol=2e-5)


def test_ddim_exact_on_curve_every_step():
    """Same closed form for DDIM (eta=0): with an exact-eps oracle the
    trajectory stays on x_t = alpha_t x0 + sigma_t eps at EVERY step, not
    just the endpoint."""
    sch = S.sd_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = S.make_timesteps(8, 1000, "trailing")
    acp = jnp.asarray(sch.alphas_cumprod, jnp.float32)
    x = jnp.sqrt(acp[int(ts[0])]) * x0 + jnp.sqrt(1 - acp[int(ts[0])]) * eps
    for i, t in enumerate(ts[:-1]):
        t_prev = int(ts[i + 1])
        x = S.ddim_step(sch, x, _oracle_eps(sch, x, x0, int(t)),
                        jnp.array(int(t)), jnp.array(t_prev))
        want = (jnp.sqrt(acp[t_prev]) * x0
                + jnp.sqrt(1 - acp[t_prev]) * eps)
        np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                                   atol=2e-5)


def _np_euler_ancestral(acp, x, model_eps, t, t_prev, noise):
    """Independent numpy EulerAncestralDiscrete step (diffusers semantics,
    sigma space; our API keeps samples in sqrt(acp)-scaled DDPM space)."""
    sig = np.sqrt((1 - acp) / acp)
    s_t = sig[t]
    s_p = sig[t_prev] if t_prev >= 0 else 0.0
    x_sig = x / np.sqrt(acp[t])
    x0 = x_sig - s_t * model_eps  # epsilon pred in sigma space
    sigma_up = np.sqrt(s_p ** 2 * (s_t ** 2 - s_p ** 2) / s_t ** 2)
    sigma_down = np.sqrt(s_p ** 2 - sigma_up ** 2)
    d = (x_sig - x0) / s_t
    x_sig = x_sig + d * (sigma_down - s_t) + noise * sigma_up
    a_p = acp[t_prev] if t_prev >= 0 else 1.0
    return x_sig * np.sqrt(a_p)


def test_euler_ancestral_matches_numpy_rederivation():
    sch = S.sd_schedule()
    acp = np.asarray(sch.alphas_cumprod, np.float64)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 2)))
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(4), x.shape))
    for t, t_prev in [(999, 749), (749, 499), (249, -1)]:
        key = jax.random.PRNGKey(t)
        noise = np.asarray(jax.random.normal(key, x.shape))
        got = S.euler_ancestral_step(sch, jnp.asarray(x), jnp.asarray(eps),
                                     jnp.array(t), jnp.array(t_prev), key)
        want = _np_euler_ancestral(acp, x, eps, t, t_prev, noise)
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=1e-4, rtol=1e-4)


def _np_dpmsolver_2m_step(acp, x, eps, t, tp, prev_x0, prev_lam, has_prev):
    """Independent numpy DPM-Solver++(2M) single step (diffusers
    DPMSolverMultistepScheduler, algorithm_type='dpmsolver++',
    solver_order=2; first step first-order)."""
    a_t = acp[t]
    a_p = acp[tp] if tp >= 0 else 1.0 - 1e-7
    al_t, sg_t = np.sqrt(a_t), np.sqrt(1 - a_t)
    al_p, sg_p = np.sqrt(a_p), np.sqrt(max(1 - a_p, 1e-12))
    lam_t, lam_p = np.log(al_t / sg_t), np.log(al_p / sg_p)
    h = lam_p - lam_t
    x0 = (x - sg_t * eps) / al_t
    out = (sg_p / sg_t) * x - al_p * (np.exp(-h) - 1.0) * x0
    if has_prev:
        r0 = (lam_t - prev_lam) / h
        d1 = (x0 - prev_x0) / r0
        out = out - 0.5 * al_p * (np.exp(-h) - 1.0) * d1
    return out, x0, lam_t


def test_dpmsolver_matches_numpy_rederivation():
    """Each step of a 12-step affine-model trajectory must match the
    independent numpy implementation on identical inputs (per-step
    comparison isolates the solver math from fp32 trajectory drift)."""
    sch = S.sd_schedule()
    acp = np.asarray(sch.alphas_cumprod, np.float64)
    b = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 2)))
    ts = [int(t) for t in S.make_timesteps(12, 1000, "trailing")]
    x = jnp.asarray(jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 2)))
    state = S.SolverState.init(x.shape)
    prev_x0, prev_lam, has_prev = None, None, False
    for i, t in enumerate(ts):
        tp = ts[i + 1] if i + 1 < len(ts) else -1
        eps = 0.3 * x + 0.1 * jnp.asarray(b)  # affine: exercises D1
        want, prev_x0, prev_lam = _np_dpmsolver_2m_step(
            acp, np.asarray(x, np.float64), np.asarray(eps, np.float64),
            t, tp, prev_x0, prev_lam, has_prev)
        has_prev = True
        x, state = S.dpmsolver_step(sch, x, eps, jnp.array(t),
                                    jnp.array(tp), state)
        # fp32 sampler vs fp64 reference: the final (t_prev=-1) step's x0
        # amplification (1/alpha_t ~ 14x) leaves ~2e-3 relative fp32 noise;
        # 5e-3 still catches any sign/term slip (those are O(1))
        np.testing.assert_allclose(np.asarray(x), want,
                                   atol=5e-4, rtol=5e-3)


def test_group_norm_nhwc_matches_flax():
    """GroupNormNHWC (layout-preserving, folded affine) == nn.GroupNorm
    for f32 and bf16 inputs, values and grads."""
    import flax.linen as nn
    from mvedit_tpu.models.diffusion.norm import GroupNormNHWC

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 64)) * 3.0 + 0.5
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        ours = GroupNormNHWC(32, epsilon=1e-6, dtype=dtype)
        ref = nn.GroupNorm(32, epsilon=1e-6, dtype=dtype)
        # identical param pytrees (scale/bias by name) -> share ref's init
        p = ref.init(key, x.astype(dtype))
        scale_k = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.3 + 1
        bias_k = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.2
        p = {"params": {"scale": scale_k, "bias": bias_k}}
        a = ours.apply(p, x.astype(dtype))
        b = ref.apply(p, x.astype(dtype))
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=tol, rtol=tol)

        def loss_ours(pp, xx):
            return jnp.sum(ours.apply(pp, xx) ** 2)

        def loss_ref(pp, xx):
            return jnp.sum(ref.apply(pp, xx) ** 2)

        ga = jax.grad(loss_ours)(p, x.astype(dtype))
        gb = jax.grad(loss_ref)(p, x.astype(dtype))
        for ka in ("scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(ga["params"][ka], np.float32),
                np.asarray(gb["params"][ka], np.float32),
                atol=tol * 50, rtol=tol * 10)
