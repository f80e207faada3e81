import time, functools, jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Experiment: gather rows from a VMEM-resident table with dynamic indices.
T, F = 65536, 2     # one level's table (fits VMEM: 512KB fp32)
P = 131072          # points per call

def kern(idx_ref, tab_ref, out_ref):
    idx = idx_ref[:]          # (P,) int32
    out_ref[:] = tab_ref[idx] # vector gather from VMEM

@jax.jit
def gather_pallas(idx, tab):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((P, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, tab)

k = jax.random.PRNGKey(0)
tab = jax.random.normal(k, (T, F))
idx = jax.random.randint(k, (P,), 0, T, jnp.int32)
try:
    float(gather_pallas(idx, tab).sum())
    t0=time.perf_counter()
    for _ in range(10): s=float(gather_pallas(idx, tab).sum())
    dt=(time.perf_counter()-t0)/10
    print(f"pallas vmem gather {P} rows: {dt*1e3:.2f} ms = {P/dt/1e9:.2f} G gathers/s", flush=True)
except Exception as e:
    print("pallas gather FAIL:", repr(e)[:300], flush=True)

@jax.jit
def gather_xla(idx, tab):
    return jnp.take(tab, idx, axis=0)
float(gather_xla(idx, tab).sum())
t0=time.perf_counter()
for _ in range(10): s=float(gather_xla(idx, tab).sum())
dt=(time.perf_counter()-t0)/10
print(f"xla gather {P} rows from 64K: {dt*1e3:.2f} ms = {P/dt/1e9:.2f} G gathers/s", flush=True)

# and 2^19 table (4MB) via XLA
T2 = 1<<19
tab2 = jax.random.normal(k, (T2, F))
idx2 = jax.random.randint(k, (P,), 0, T2, jnp.int32)
float(gather_xla(idx2, tab2).sum())
t0=time.perf_counter()
for _ in range(10): s=float(gather_xla(idx2, tab2).sum())
dt=(time.perf_counter()-t0)/10
print(f"xla gather {P} rows from 512K: {dt*1e3:.2f} ms = {P/dt/1e9:.2f} G gathers/s", flush=True)
