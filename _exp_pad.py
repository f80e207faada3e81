import jax, jax.numpy as jnp, numpy as np
# If (1M, 2) int32 arrays store tile-padded (8,128), each costs 512MB and
# 25 of them OOM a 16GB chip; if packed, 25 x 8MB = 200MB is trivial.
xs = []
try:
    for i in range(25):
        x = jnp.asarray(np.random.randint(0, 100, (1_000_000, 2), np.int32))
        x.block_until_ready()
        xs.append(x)
        if i % 5 == 4:
            print(f"allocated {i+1} arrays", flush=True)
    print("ALL OK -> stored arrays are PACKED (no tile padding)", flush=True)
except Exception as e:
    print(f"OOM at {len(xs)} arrays -> stored arrays ARE tile-padded: {repr(e)[:120]}", flush=True)
