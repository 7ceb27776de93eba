"""Localize block-grid golden mismatches: which y-levels / block ids / columns.

CPU-only (safe alongside a TPU process):
  JAX_PLATFORMS=cpu python tools/debug_blockgrid.py [cx cz]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.terrain import pipeline

cx, cz = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (0, 0)
g = np.load(os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "golden_blockgrid.npz"))
want = g[f"post_{cx}_{cz}"]
pre = g[f"pre_{cx}_{cz}"]
counts = g[f"counts_{cx}_{cz}"]
print("ref counts (surface/cave placements of the 7x7):", counts[:20], "...")

area = pipeline.generate_area(cx // 16 - 3, cz // 16 - 3, 7, 7, features=True)
got = np.asarray(area["blocks"][3, 3])
print("shapes", got.shape, want.shape)
print(f"agree post: {(got == want).mean():.4f}")
print(f"agree pre : {(got == pre).mean():.4f}")
print(f"ref pre-vs-post differ: {(pre != want).mean():.4f}")

mis = got != want
ys = np.where(mis.any(axis=(0, 1)))[0]
print("mismatch y-range:", (ys.min(), ys.max()) if ys.size else None, "n_y:", ys.size)
per_y = mis.sum(axis=(0, 1))
top_y = np.argsort(per_y)[::-1][:10]
print("worst y levels:", [(int(y), int(per_y[y])) for y in top_y if per_y[y]])

vals_w, cnt_w = np.unique(want[mis], return_counts=True)
vals_g, cnt_g = np.unique(got[mis], return_counts=True)
o = np.argsort(cnt_w)[::-1][:12]
print("want ids at mismatches:", dict(zip(vals_w[o].tolist(), cnt_w[o].tolist())))
o = np.argsort(cnt_g)[::-1][:12]
print("got  ids at mismatches:", dict(zip(vals_g[o].tolist(), cnt_g[o].tolist())))

# where do we match pre but not post? (= missing decoration/feature)
miss_feat = (got == pre) & mis
extra_feat = (got != pre) & mis
print(f"missing (got==pre, !=post): {miss_feat.sum()}  spurious/other: {extra_feat.sum()}")

# columns affected
cols = mis.any(axis=2)
print(f"columns affected: {cols.sum()}/256")
zz, xx = np.where(cols)
for z, x in list(zip(zz, xx))[:8]:
    yy = np.where(mis[z, x])[0]
    print(f"  col (z={z},x={x}) y={yy.tolist()[:12]} want={want[z,x,yy[:6]].tolist()} got={got[z,x,yy[:6]].tolist()}")
