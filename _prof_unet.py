import time, jax, jax.numpy as jnp
from mvedit_tpu.models.diffusion.attention import _chunked_attention
from mvedit_tpu.models.diffusion import UNet2DCondition, SD15_UNET, AttnMode

def bench(f, *a, n=3, name=""):
    float(jnp.sum(f(*a)))
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jnp.sum(f(*a)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms")

k = jax.random.PRNGKey(0)
q = jax.random.normal(k, (2, 24576, 8, 40), jnp.bfloat16)
att = jax.jit(_chunked_attention)
bench(att, q, q, q, name="chunked attn B2 L24576 h8 d40")

q2 = jax.random.normal(k, (12, 4096, 8, 40), jnp.bfloat16)
plain = jax.jit(jax.nn.dot_product_attention)
bench(plain, q2, q2, q2, name="xla attn 12x4096 h8 d40")

ctx = jax.random.normal(k, (12, 77, 768))
x = jax.random.normal(k, (12, 64, 64, 4)); t = jnp.full((12,), 500)
net = UNet2DCondition(SD15_UNET)
params = jax.jit(lambda kk: net.init(kk, x[:1], t[:1], ctx[:1]))(k)
fwd1 = jax.jit(lambda p, x, t, c: net.apply(p, x, t, c))
bench(fwd1, params, x, t, ctx, name="UNet fwd no-joint 12x64x64")
fwd2 = jax.jit(lambda p, x, t, c: net.apply(p, x, t, c, mode=AttnMode(num_views=6)))
bench(fwd2, params, x, t, ctx, name="UNet fwd joint-6 12x64x64")
