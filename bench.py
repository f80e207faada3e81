"""Driver benchmark: 6-view UNet denoise throughput (the headline metric).

Measures one CFG denoise step of the multiview SD1.5 UNet — batch 12
(6 views x 2 for classifier-free guidance) at 64x64 latents (512^2 images)
with cross-image joint self-attention over the 6 views, exactly the hot loop
of the reference's MVEdit pipelines (`lib/pipelines/adapter3d_mixin.py:68-135`
driven with --diff-bs at `app.py:36`; the reference runs 2N CFG UNet passes
per denoise step on an A100).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is vs. the reference's operational baseline measured by the
driver harness (BASELINE.json publishes no numbers; we report throughput).
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from mvedit_tpu.models.diffusion import (UNet2DCondition, SD15_UNET,
                                             AttnMode)
    net = UNet2DCondition(SD15_UNET)
    B = 12  # 6 views x CFG
    x = jnp.zeros((B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.zeros((B, 77, 768), jnp.float32)
    params = jax.jit(lambda k: net.init(k, x[:1], t[:1], ctx[:1]))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    mode = AttnMode(num_views=6)

    @jax.jit
    def denoise_step(p, lat, t, c):
        # one full CFG denoise forward (uncond+cond batched together)
        eps = net.apply(p, lat, t, c, mode=mode)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + 7.5 * (eps_c - eps_u)

    # NOTE: block_until_ready does not synchronize through the axon tunnel;
    # a scalar readback is the only honest timing barrier here.
    float(jnp.sum(denoise_step(params, x, t, ctx)))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(denoise_step(params, x, t, ctx)))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "6-view UNet CFG denoise steps/sec (512^2, joint attn)",
        "value": round(1.0 / dt, 4),
        "unit": "steps/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
