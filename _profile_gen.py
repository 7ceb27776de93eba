"""Per-stage timing of the generation pipeline on the real chip (5x5 bench shape)."""
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.terrain import caves as caves_mod
from mega_minecraft_tpu.terrain import fill, heightfield, layers, pipeline

n = 5
pos_h = []
for cz in range(-1, n + 1):
    for cx in range(-1, n + 1):
        pos_h.append([cx * 16, cz * 16])
pos_h = jnp.asarray(np.array(pos_h, np.int32))


def timeit(name, f, *args, reps=5):
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:34s} compile+run {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:34s} {(time.time()-t0)/reps*1e3:9.1f} ms", flush=True)
    return out


hf, w = timeit("heightfield (49 chunks)", jax.jit(heightfield.generate_heightfield), pos_h)

hz = hx = n + 2
hf_grid = hf.reshape(hz, hx, 16, 16)
full = jnp.transpose(hf_grid, (0, 2, 1, 3)).reshape(hz * 16, hx * 16)
gathered = jnp.stack(
    [
        full[(iz + 1) * 16 - 1 : (iz + 1) * 16 + 17, (ix + 1) * 16 - 1 : (ix + 1) * 16 + 17]
        for iz in range(n)
        for ix in range(n)
    ]
)
inner = jnp.asarray(np.array([(iz + 1) * hx + ix + 1 for iz in range(n) for ix in range(n)], np.int32))
w_in, hf_in, pos_in = w[inner], hf[inner], pos_h[inner]

ls = timeit("layers (25)", jax.jit(layers.generate_layers), gathered, w_in, pos_in)
ls = layers.fix_backward_stratified(ls)
cv = timeit("caves (25)", jax.jit(caves_mod.generate_caves), hf_in, w_in, pos_in)
blocks = timeit(
    "fill (25)", jax.jit(fill.fill_chunks), hf_in, w_in, ls, cv["starts"], cv["ends"], pos_in
)
out = timeit("fused full pipeline", lambda: pipeline.generate_area_fused(pos_h, n, n))
print("chunks/s (fused):", flush=True)
t0 = time.time()
reps = 3
for _ in range(reps):
    o = pipeline.generate_area_fused(pos_h, n, n)
    np.asarray(o["blocks"])
dt = (time.time() - t0) / reps
print(f"  {n*n/dt:8.1f} chunks/s   ({dt*1e3:.1f} ms / 25 chunks)", flush=True)
