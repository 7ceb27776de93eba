"""Per-substage cost breakdown of the feature pipeline on the attached TPU.

Times (warm, host-transfer-forced): generate_placements, compact_placements,
apply_features_area (and each half), place_decorators_batch — vs the featureless
fill — over a 5x5 area (same shapes as bench.py's fused program).  This is the
measurement VERDICT r3 #4 asks for before optimizing the 1074->150 chunks/s
feature tax (reference hot loop: /root/reference/src/terrain/chunk.cu:1438-1502).

Run:  python tools/feature_cost.py [ncx ncz reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MMTPU_EXACT_SIN", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("MMTPU_XLA_CACHE_DIR", "/tmp/mmtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.terrain import caves as caves_mod
from mega_minecraft_tpu.terrain import decorators as decorators_mod
from mega_minecraft_tpu.terrain import feature_placement as fp
from mega_minecraft_tpu.terrain import features as features_mod
from mega_minecraft_tpu.terrain import fill, heightfield, layers

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
print("devices:", jax.devices(), flush=True)


def timeit(name, f):
    f()  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        out = f()
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # force
    # per-rep forcing: redo with per-call sync for honest timing
    t0 = time.time()
    for _ in range(REPS):
        out = f()
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
    dt = (time.time() - t0) / REPS
    print(f"{name:34s} {dt*1e3:9.2f} ms  ({dt*1e3/(N*N):7.3f} ms/chunk)", flush=True)
    return out


pos_in = []
for iz in range(N):
    for ix in range(N):
        pos_in.append([ix * 16, iz * 16])
pos_in = jnp.asarray(np.array(pos_in, np.int32))
pos_h = []
for iz in range(-1, N + 1):
    for ix in range(-1, N + 1):
        pos_h.append([ix * 16, iz * 16])
pos_h = jnp.asarray(np.array(pos_h, np.int32))

t0 = time.time()
hf_h, w_h = heightfield.generate_heightfield(pos_h)
hz = hx = N + 2
hf_grid = hf_h.reshape(hz, hx, 16, 16)
full = jnp.transpose(hf_grid, (0, 2, 1, 3)).reshape(hz * 16, hx * 16)
gathered = jnp.stack(
    [full[(iz + 1) * 16 - 1 : (iz + 1) * 16 + 17, (ix + 1) * 16 - 1 : (ix + 1) * 16 + 17]
     for iz in range(N) for ix in range(N)]
)
inner = jnp.asarray(np.array([(iz + 1) * hx + ix + 1 for iz in range(N) for ix in range(N)], np.int32))
hf_in, w_in = hf_h[inner], w_h[inner]
ls = layers.fix_backward_stratified(layers.generate_layers(gathered, w_in, pos_in))
cv = caves_mod.generate_caves(hf_in, w_in, pos_in)
print(f"stage prep {time.time()-t0:.0f}s", flush=True)

blocks = timeit("fill_chunks (featureless)", lambda: fill.fill_chunks(hf_in, w_in, ls, cv["starts"], cv["ends"], pos_in))

pl = timeit("generate_placements", lambda: fp.generate_placements(
    hf_in, w_in, ls, cv["starts"], cv["ends"], cv["bottom_biome"], cv["top_biome"], pos_in))
lists = timeit("compact_placements", lambda: fp.compact_placements(pl, pos_in))
ns = int(np.asarray(lists["surface"]["count"]).sum())
nc = int(np.asarray(lists["cave"]["count"]).sum())
print(f"  placements in area: surface={ns} cave={nc}", flush=True)

blocks_b = jnp.asarray(blocks).reshape(N * N, 16, 16, 384)
area = (blocks_b.reshape(N, N, 16, 16, 384).transpose(0, 2, 1, 3, 4).reshape(N * 16, N * 16, 384))
origin = pos_in[0]

timeit("apply_placements_area surface", lambda: features_mod.apply_placements_area(
    area, lists["surface"], origin, N, N, cave=False))
timeit("apply_placements_area cave", lambda: features_mod.apply_placements_area(
    area, lists["cave"], origin, N, N, cave=True))
feat = timeit("apply_features_area (both)", lambda: features_mod.apply_features_area(
    blocks_b, lists["surface"], lists["cave"], pos_in, N, N))
timeit("place_decorators_batch", lambda: decorators_mod.place_decorators_batch(
    jnp.asarray(feat), hf_in, w_in, cv["starts"], cv["ends"], cv["bottom_biome"], pos_in))
