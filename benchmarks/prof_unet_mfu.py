"""Per-phase MFU probe of the SD1.5 UNet forward on the v5e chip."""
import time, json
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from mvedit_tpu.models.diffusion import UNet2DCondition, SD15_UNET, AttnMode

net = UNet2DCondition(SD15_UNET)
B = 12
x = jnp.zeros((B, 64, 64, 4), jnp.float32)
t = jnp.full((B,), 500, jnp.int32)
ctx = jnp.zeros((B, 77, 768), jnp.float32)
t0 = time.perf_counter()
params = jax.jit(lambda k: net.init(k, x[:1], t[:1], ctx[:1]))(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
jax.block_until_ready(params)
print("init done in %.0f s" % (time.perf_counter() - t0), flush=True)
mode = AttnMode(num_views=6)

def fwd(p, x, t, c):
    return net.apply(p, x, t, c, mode=mode)

t0 = time.perf_counter()
comp = jax.jit(fwd).lower(params, x, t, ctx).compile()
print("fwd compile done in %.0f s" % (time.perf_counter() - t0), flush=True)
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
flops = ca.get("flops", float("nan"))
bytes_ac = ca.get("bytes accessed", float("nan"))
print("XLA flops estimate: %.2f TFLOP, bytes accessed: %.2f GB" %
      (flops / 1e12, bytes_ac / 1e9), flush=True)

def timeit(f, *a, n=10):
    float(jnp.sum(f(*a)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(f(*a)))
    return (time.perf_counter() - t0) / n

dt = timeit(comp, params, x, t, ctx)
print("fwd: %.1f ms/host-step; MFU (XLA flops) = %.1f%% (peak 197 TF bf16); "
      "HBM roofline = %.1f ms at 819GB/s" % (
      dt * 1e3, flops / dt / 197e12 * 100, bytes_ac / 819e9 * 1e3), flush=True)

# amortized: 10 forwards inside one program to subtract the tunnel overhead
@jax.jit
def fwd10(p, x, t, c):
    def body(i, acc):
        return acc + net.apply(p, x + acc[0, 0, 0, 0] * 0, t, c, mode=mode)
    return jax.lax.fori_loop(0, 10, body, jnp.zeros_like(x))

t0 = time.perf_counter()
dt10 = timeit(fwd10, params, x, t, ctx, n=3) / 10
print("amortized: %.1f ms/step; MFU = %.1f%% (compile+3x10 took %.0f s)" % (
      dt10 * 1e3, flops / dt10 / 197e12 * 100, time.perf_counter() - t0),
      flush=True)
