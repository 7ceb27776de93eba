"""Verify drive: 9x9 scene on the real TPU with the two-level hierarchical DDA.

Renders 960x540 1spp, times warm frames, writes /tmp/verify_frame.ppm, and runs
two engine ticks + a scheduler state count.  ONE TPU process at a time.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    print("devices:", jax.devices(), flush=True)
    from mega_minecraft_tpu.render import brickmap, camera, sky, tracer, tonemap
    from mega_minecraft_tpu.terrain import pipeline

    t0 = time.time()
    area = pipeline.generate_area(-4, -4, 9, 9, features=True)
    np.asarray(area["blocks"][0, 0, 0, 0])
    print(f"gen 9x9: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    scene = brickmap.build_scene(jnp.asarray(area["blocks"]), -4, -4)
    np.asarray(scene.flat[:1])
    print(f"scene build (fine+macro): {time.time()-t0:.1f}s; flat={scene.flat.shape} dims={scene.dims}", flush=True)

    hmax = float(np.asarray(area["heightfield"]).max())
    player = camera.Player(
        pos=np.array([0.0, hmax + 16.0, -60.0], np.float32), theta=0.05, phi=-0.22
    )
    params = sky.sky_params(1.0, 0.0)
    W, H = 960, 540
    cam = player.camera_params(W, H)

    render = jax.jit(
        tracer.render_sample, static_argnames=("height", "width", "tile_rows", "tile_cols")
    )
    t0 = time.time()
    c, a, n = render(scene, cam, params, H, W, jnp.int32(0))
    np.asarray(c[0, 0, 0])
    print(f"540p compile+first frame: {time.time()-t0:.1f}s", flush=True)
    reps = 5
    t0 = time.time()
    for fid in range(1, reps + 1):
        c, a, n = render(scene, cam, params, H, W, jnp.int32(fid))
    np.asarray(c[0, 0, 0])
    dt = (time.time() - t0) / reps
    print(f"540p warm: {dt*1e3:.0f} ms/frame ({W*H/dt/1e6:.2f} Mpaths/s)", flush=True)

    u8 = np.asarray(tonemap.present(c))
    lum = u8.mean(axis=-1) / 255.0
    print(f"frame luminance min={lum.min():.3f} max={lum.max():.3f} mean={lum.mean():.3f}")
    with open("/tmp/verify_frame.ppm", "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (W, H))
        f.write(u8.tobytes())
    print("wrote /tmp/verify_frame.ppm", flush=True)

    # engine ticks (scheduler + config wiring)
    from mega_minecraft_tpu.app.engine import Engine, EngineConfig

    eng = Engine(EngineConfig(width=320, height=180, skip_erosion=True))
    for i in range(3):
        eng.tick(1.0 / 30.0)
    print(
        "engine after 3 ticks: drawable_count=",
        eng.scheduler.drawable_count(),
        " loaded=",
        len(eng.scheduler.loaded_chunks()),
        flush=True,
    )
    print("VERIFY OK")


if __name__ == "__main__":
    sys.exit(main())
