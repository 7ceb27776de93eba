"""Drive: windowed feature application — golden block-grid diff + gen timing on TPU."""
import os, time

os.environ.setdefault("MMTPU_EXACT_SIN", "1")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.terrain import pipeline

print("devices:", jax.devices())

g = np.load("tests/golden/golden_blockgrid.npz")
for cx, cz in [(-160, -160), (592, -368), (0, 0), (4096, 4096)]:
    area = pipeline.generate_area(cx // 16 - 3, cz // 16 - 3, 7, 7, features=True)
    got = np.asarray(area["blocks"][3, 3])
    want = g[f"post_{cx}_{cz}"]
    agree = (got == want).mean()
    print(f"block grid ({cx},{cz}): agreement {agree:.5f}")
    assert agree >= 0.995, (cx, cz, agree)

# generation throughput, bench-shaped leg (9x9 with features, fused)
n = 9
pos = pipeline._chunk_positions(-5, -5, n + 2, n + 2)
pos_h = jnp.asarray(pos)
fused = jax.jit(lambda p: pipeline.generate_area_fused(p, n, n, features=True)["blocks"])
t0 = time.time()
fused(pos_h).block_until_ready()
print(f"compile+first: {time.time()-t0:.1f}s")
reps = 8
t0 = time.time()
for _ in range(reps):
    fused(pos_h).block_until_ready()
dt = (time.time() - t0) / reps
print(f"warm: {dt*1000:.1f} ms/area = {n*n/dt:.0f} chunks/s (features=True)")
