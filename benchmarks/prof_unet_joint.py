import time, jax, jax.numpy as jnp
from mvedit_tpu.models.diffusion import UNet2DCondition, SD15_UNET, AttnMode
k = jax.random.PRNGKey(0)
ctx = jax.random.normal(k, (12, 77, 768))
x = jax.random.normal(k, (12, 64, 64, 4)); t = jnp.full((12,), 500)
net = UNet2DCondition(SD15_UNET)
params = jax.jit(lambda kk: net.init(kk, x[:1], t[:1], ctx[:1]))(k)
fwd2 = jax.jit(lambda p, x, t, c: net.apply(p, x, t, c, mode=AttnMode(num_views=6)))
float(jnp.sum(fwd2(params, x, t, ctx)))
t0 = time.perf_counter()
for _ in range(5): s = float(jnp.sum(fwd2(params, x, t, ctx)))
print(f"UNet joint-6 with pallas flash: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
