import time, jax, jax.numpy as jnp
import mvedit_tpu.models.diffusion.attention as A

def timeit(f, *a, n=5, name=""):
    float(jnp.sum(f(*a)))
    t0 = time.perf_counter()
    for _ in range(n): s = float(jnp.sum(f(*a)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

k = jax.random.PRNGKey(0)
# 32^2 joint shape, d=80
q = jax.random.normal(k, (2, 6144, 8, 80), jnp.bfloat16)
timeit(jax.jit(jax.nn.dot_product_attention), q, q, q, name="xla attn 2x6144 d80")
timeit(jax.jit(A._pallas_flash), q, q, q, name="flash 2x6144 d80")
# 64^2 joint, d=40 (what the UNet uses via flash now)
q2 = jax.random.normal(k, (2, 24576, 8, 40), jnp.bfloat16)
timeit(jax.jit(A._pallas_flash), q2, q2, q2, name="flash 2x24576 d40")
# 64^2 per-view self-attn (no-joint), bf16
q3 = jax.random.normal(k, (12, 4096, 8, 40), jnp.bfloat16)
timeit(jax.jit(jax.nn.dot_product_attention), q3, q3, q3, name="xla attn 12x4096 d40")
# 16^2 joint
q4 = jax.random.normal(k, (2, 1536, 8, 160), jnp.bfloat16)
timeit(jax.jit(jax.nn.dot_product_attention), q4, q4, q4, name="xla attn 2x1536 d160")
# cross attn shape
q5 = jax.random.normal(k, (12, 4096, 8, 40), jnp.bfloat16)
kv5 = jax.random.normal(k, (12, 77, 8, 40), jnp.bfloat16)
timeit(jax.jit(jax.nn.dot_product_attention), q5, kv5, kv5, name="cross attn 12x4096x77")
