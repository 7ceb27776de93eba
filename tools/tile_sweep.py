"""Sweep render tile shapes (lock-step waste tuning) on the tiled bench scene.

The band DDA loop runs to its slowest lane; smaller/squarer tiles raise ray
coherence (fewer wasted lock-step iterations) but add per-tile overhead.
Run alone (ONE TPU process at a time):
  python tools/tile_sweep.py [--res 1920x1080]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.render import brickmap, camera, sky, tracer
from mega_minecraft_tpu.terrain import pipeline


def main():
    print("devices:", jax.devices(), flush=True)
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="960x540")
    ap.add_argument(
        "--shapes",
        default=None,
        help="explicit candidates, e.g. 40x96,48x96 (overrides the built-in grid; "
        "combine with MMTPU_RENDER_DDA_UNROLL=N to probe unroll variants)",
    )
    args = ap.parse_args()
    W, H = (int(v) for v in args.res.split("x"))
    import scenelib

    scene, player, params, hmax = scenelib.benchmark_scene()
    np.asarray(scene.flat[:1])
    cam = player.camera_params(W, H)

    render = jax.jit(
        tracer.render_sample,
        static_argnames=("height", "width", "tile_rows", "tile_cols"),
    )
    if args.shapes:
        shapes = [
            tuple(int(v) for v in s.split("x")) for s in args.shapes.split(",")
        ]
    elif W >= 1920:
        shapes = [(8, 320), (4, 320), (8, 192), (8, 128), (4, 128), (16, 320), (8, 240), (4, 192)]
    else:
        shapes = [(4, None), (2, None), (8, None), (4, 120), (4, 240), (8, 120), (2, 120), (6, 160)]
    print(f"  (dda_unroll={tracer.DDA_UNROLL})", flush=True)
    for tr, tc in shapes:
        try:
            c, a, n = render(scene, cam, params, H, W, jnp.int32(0), tile_rows=tr, tile_cols=tc)
            np.asarray(c[0, 0, 0])
            reps = 4
            t0 = time.time()
            for fid in range(1, reps + 1):
                c, a, n = render(scene, cam, params, H, W, jnp.int32(fid), tile_rows=tr, tile_cols=tc)
            np.asarray(c[0, 0, 0])
            dt = (time.time() - t0) / reps
            print(f"  tile ({tr} x {tc or W}): {dt*1e3:6.0f} ms/frame", flush=True)
        except Exception as e:
            print(f"  tile ({tr} x {tc}): failed {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
