"""Diagnose the block-grid golden regression: windowed area apply vs per-chunk
49-gather apply vs the pre-decorator golden, on one failing chunk.

Isolation logic: if windowed != gathered, the windowed apply (76bd747) is the
bug; if they agree but both mismatch the golden, the divergence is upstream
(placement generation) or the 0.995 claim never held at this chunk.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MMTPU_EXACT_SIN", "1")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.terrain import feature_placement as fp
from mega_minecraft_tpu.terrain import features as fm
from mega_minecraft_tpu.terrain import pipeline
from mega_minecraft_tpu.world import biomes as bio

CX, CZ = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (0, 0)
NC = 7
print("devices:", jax.devices(), flush=True)

t0 = time.time()
area = pipeline.generate_area(CX // 16 - 3, CZ // 16 - 3, NC, NC, features=True)
print(f"generate_area(features=True) {time.time()-t0:.0f}s", flush=True)

lists = area["placements"]
pos_in = jnp.asarray(area["chunk_pos"])
blocks_pre = jnp.asarray(
    np.asarray(
        pipeline.generate_area(CX // 16 - 3, CZ // 16 - 3, NC, NC, features=False)[
            "blocks"
        ]
    ).reshape(NC * NC, 16, 16, 384)
)
print(f"pre-feature blocks done {time.time()-t0:.0f}s", flush=True)

# --- path A: windowed area apply (the current pipeline path) ---
a = np.asarray(
    fm.apply_features_area(blocks_pre, lists["surface"], lists["cave"], pos_in, NC, NC)
)
print(f"windowed apply done {time.time()-t0:.0f}s", flush=True)

# --- path B: per-chunk 49-gather + apply_features_batch (the round-2 path) ---
n = NC * NC
nb_idx = np.zeros((n, len(fp.GATHER_OFFSETS)), np.int32)
nb_ok = np.zeros((n, len(fp.GATHER_OFFSETS)), bool)
for ci in range(n):
    iz, ix = divmod(ci, NC)
    for oi, o in enumerate(fp.GATHER_OFFSETS):
        jx, jz = ix + int(o[0]), iz + int(o[1])
        if 0 <= jx < NC and 0 <= jz < NC:
            nb_idx[ci, oi] = jz * NC + jx
            nb_ok[ci, oi] = True
nbi = jnp.asarray(nb_idx)
mask = jnp.asarray(nb_ok)[..., None]


def nb_lists(per_chunk):
    out = {k: v[nbi] for k, v in per_chunk.items() if k != "count"}
    out["feature"] = jnp.where(mask, out["feature"], 0)
    return out


surf_g = fp.gather_from_neighborhood_batch(
    nb_lists(lists["surface"]), bio.MAX_GATHERED_FEATURES_PER_CHUNK
)
cave_g = fp.gather_from_neighborhood_batch(
    nb_lists(lists["cave"]), bio.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK
)
hf = jnp.asarray(area["heightfield"])
bsel = [3 * NC + 3]  # center chunk only (batch apply is slow)
b = np.asarray(
    fm.apply_features_batch(
        blocks_pre[jnp.asarray(bsel)],
        {k: v[jnp.asarray(bsel)] for k, v in surf_g.items()},
        {k: v[jnp.asarray(bsel)] for k, v in cave_g.items()},
        pos_in[jnp.asarray(bsel)],
        hf[jnp.asarray(bsel)],
    )
)
print(f"gathered apply done {time.time()-t0:.0f}s", flush=True)

gold = np.load("tests/golden/golden_blockgrid.npz")
pre = gold[f"pre_{CX}_{CZ}"]
post = gold[f"post_{CX}_{CZ}"]

center = 3 * NC + 3
A = a[center]
B = b[0]
print(f"A(windowed) vs B(gathered): agree={(A==B).mean():.5f} ndiff={(A!=B).sum()}")
print(f"A vs golden-pre:            agree={(A==pre).mean():.5f} ndiff={(A!=pre).sum()}")
print(f"B vs golden-pre:            agree={(B==pre).mean():.5f} ndiff={(B!=pre).sum()}")
full = np.asarray(area["blocks"])[3, 3]
print(f"pipeline(post-dec) vs post: agree={(full==post).mean():.5f}")

for name, got, want in (("A_vs_B", A, B), ("A_vs_pre", A, pre), ("B_vs_pre", B, pre)):
    m = got != want
    if m.sum():
        vals, cnts = np.unique(want[m], return_counts=True)
        gvals, gcnts = np.unique(got[m], return_counts=True)
        print(f"{name}: want-census {dict(zip(vals.tolist(), cnts.tolist()))}")
        print(f"{name}: got-census  {dict(zip(gvals.tolist(), gcnts.tolist()))}")
        w = np.argwhere(m)
        print(f"{name}: first sites (z,x,y): {w[:6].tolist()}  y-range {w[:,2].min()}..{w[:,2].max()}")
