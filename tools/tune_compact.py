"""TPU tuning: legacy vs compacted renderer, seg_lanes sweep, aerial + grazing cam.

Run manually after TPU recovery (ONE TPU process at a time):
    python _tune_compact.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.render import brickmap, camera, sky, tracer
from mega_minecraft_tpu.terrain import pipeline


def bench(fn, *args, reps=4, **kw):
    out = fn(*args, **kw)
    np.asarray(out[0][0, 0, 0])  # sync (compile + run)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(out[0][0, 0, 0])
    return (time.time() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    import scenelib

    scene, _player, params, hmax = scenelib.benchmark_scene()
    W, H = 1920, 1080

    legacy = jax.jit(tracer.render_sample, static_argnames=(
        "height", "width", "tile_rows", "tile_cols"))
    comp = jax.jit(tracer.render_sample_compact, static_argnames=(
        "height", "width", "tile_rows", "tile_cols", "seg_lanes"))

    cams = {
        "aerial": camera.Player(
            pos=np.array([0.0, hmax + 16.0, -60.0], np.float32), theta=0.05, phi=-0.22
        ).camera_params(W, H),
        "grazing": camera.Player(
            pos=np.array([0.0, hmax - 20.0, -70.0], np.float32), theta=0.0, phi=-0.05
        ).camera_params(W, H),
    }
    for name, cam in cams.items():
        dt = bench(legacy, scene, cam, params, H, W, jnp.int32(1))
        print(f"{name} legacy: {dt*1e3:.0f} ms", flush=True)
        for sl in (4096, 8192, 16384):
            dt = bench(comp, scene, cam, params, H, W, jnp.int32(1), seg_lanes=sl)
            print(f"{name} compact seg={sl}: {dt*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
