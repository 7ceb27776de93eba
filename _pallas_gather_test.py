"""Can Mosaic gather per-lane from a VMEM table, and how fast?"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 360, 640
N = 80 * 80 * 384  # 2.4M u8 = 2.4MB


def timeit(name, f, *args, reps=20):
    try:
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:44s} {(time.time()-t0)/reps*1e3:9.2f} ms")


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (H, W), 0, N, dtype=jnp.int32)
tab_u8 = (jnp.arange(N) % 200).astype(jnp.uint8)
tab_i32 = jnp.arange(N, dtype=jnp.int32)


def kernel_take(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    ix = idx_ref[:]
    def body(i, acc):
        g = jnp.take(t, (ix + acc) % N, axis=0)
        return acc + g.astype(jnp.int32)
    out_ref[:] = jax.lax.fori_loop(0, 10, body, jnp.zeros_like(ix))


@jax.jit
def pallas_take(tab, idx):
    return pl.pallas_call(
        kernel_take,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
    )(tab, idx)


timeit("pallas 10 chained VMEM takes (u8 tab)", pallas_take, tab_u8, idx)
timeit("pallas 10 chained VMEM takes (i32 tab)", pallas_take, tab_i32, idx)


# XLA baseline
@jax.jit
def xla_take(tab, idx):
    def body(i, acc):
        g = tab[(idx + acc) % N]
        return acc + g.astype(jnp.int32)
    return jax.lax.fori_loop(0, 10, body, jnp.zeros_like(idx))


timeit("xla 10 chained gathers (u8 tab)", xla_take, tab_u8, idx)
timeit("xla 10 chained gathers (i32 tab)", xla_take, tab_i32, idx)
