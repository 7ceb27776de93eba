"""Measure each feature SDF's spatial extent (window calibration).

Evaluates every surface/cave feature builder at many random placements over a
generous grid and reports the max |fx|, |fz| and fy range that ever hits —
these size the per-type windows in features.apply_placements_area (a window
that clips a feature would drop blocks, so the applied table must dominate
these measurements; tests/test_features.py pins that).

Run alone (ONE TPU process at a time):  python tools/sdf_extents.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.ops import hashes
from mega_minecraft_tpu.terrain import features_sdf as sdf

F32 = jnp.float32
I32 = jnp.int32

R = 40  # probe half-width (XZ)
YLO, YHI = -64, 200  # probe fy range


def probe(fn, cave: bool, n_seeds: int = 48):
    gx = jnp.arange(-R, R + 1, dtype=I32)
    gy = jnp.arange(YLO, YHI + 1, dtype=I32)
    fx = gx[None, :, None].astype(F32)
    fz = gx[:, None, None].astype(F32)
    fy = gy[None, None, :].astype(F32)
    mx = mz = 0
    ylo, yhi = 10**9, -(10**9)
    brng0 = hashes.seed_3(jnp.zeros((), I32), jnp.zeros((), I32), 7777)

    @jax.jit
    def one(px, py, pz, layer_h):
        stream = sdf.draw_stream(px, py, pz, 12345)
        wx = px + fx.astype(I32)
        wy = py + fy.astype(I32)
        wz = pz + fz.astype(I32)
        extra = {"fy_pos": py, "fpos": (px, py, pz), "layer_height": layer_h}
        hit, _, _ = fn(stream, fx, fy, fz, wx, wy, wz, brng0, extra)
        hit = jnp.broadcast_to(hit, (2 * R + 1, 2 * R + 1, YHI - YLO + 1))
        any_x = hit.any(axis=(0, 2))
        any_z = hit.any(axis=(1, 2))
        any_y = hit.any(axis=(0, 1))
        return any_x, any_z, any_y

    rng = np.random.default_rng(0)
    for s in range(n_seeds):
        px = jnp.asarray(int(rng.integers(-10000, 10000)), I32)
        py = jnp.asarray(int(rng.integers(20, 250)), I32)
        pz = jnp.asarray(int(rng.integers(-10000, 10000)), I32)
        lh = jnp.asarray(int(rng.integers(4, 120)) if cave else 0, I32)
        ax, az, ay = (np.asarray(v) for v in one(px, py, pz, lh))
        xs = np.where(ax)[0]
        zs = np.where(az)[0]
        ys = np.where(ay)[0]
        if xs.size:
            mx = max(mx, int(np.abs(xs - R).max()))
        if zs.size:
            mz = max(mz, int(np.abs(zs - R).max()))
        if ys.size:
            ylo = min(ylo, int(ys.min() + YLO))
            yhi = max(yhi, int(ys.max() + YLO))
    return mx, mz, (ylo if ylo < 10**9 else 0), (yhi if yhi > -(10**9) else 0)


def main():
    print("devices:", jax.devices(), flush=True)
    print("== surface ==")
    for fid, fn in sorted(sdf.SURFACE_FEATURE_FNS.items()):
        mx, mz, ylo, yhi = probe(fn, cave=False)
        name = getattr(fn, "__name__", f"feat{fid}")
        print(f"  feat {fid:2d} {name:30s} r=({mx},{mz}) fy=[{ylo},{yhi}]", flush=True)
    print("== cave ==")
    for fid, fn in sorted(sdf.CAVE_FEATURE_FNS.items()):
        mx, mz, ylo, yhi = probe(fn, cave=True)
        name = getattr(fn, "__name__", f"feat{fid}")
        print(f"  feat {fid:2d} {name:30s} r=({mx},{mz}) fy=[{ylo},{yhi}] (layer_h<=120)", flush=True)


if __name__ == "__main__":
    main()
