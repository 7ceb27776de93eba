"""BASELINE.md benchmark config (4): static-scene path trace, 9×9 chunks,
1920×1080, 1 spp with accumulation.  Prints ms/frame and Mrays/s (primary paths;
each path additionally carries up to 4 bounce + shadow traces).

Also reports the reference's USE_UPSCALING mode (render 960×540, denoise-upscale)."""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def run(H, W, scene, cam, params, reps=8, compact=False):
    from mega_minecraft_tpu.render import tracer

    fn = tracer.render_sample_compact if compact else tracer.render_sample
    render = jax.jit(fn, static_argnames=(
        ("height", "width", "tile_rows", "tile_cols", "seg_lanes")
        if compact else ("height", "width", "tile_rows", "tile_cols")
    ))
    fbs = tracer.init_framebuffers(H, W)
    c, a, n = render(scene, cam, params, H, W, jnp.int32(0))
    fbs = tracer.accumulate(fbs, c, a, n, jnp.int32(0))
    np.asarray(fbs.color[0, 0, 0])  # sync (compile + run)
    t0 = time.time()
    for fid in range(1, reps + 1):
        c, a, n = render(scene, cam, params, H, W, jnp.int32(fid))
        fbs = tracer.accumulate(fbs, c, a, n, jnp.int32(fid))
    np.asarray(fbs.color[0, 0, 0])
    dt = (time.time() - t0) / reps
    return dt, fbs


def main():
    from mega_minecraft_tpu.render import brickmap, camera, denoise, sky
    from mega_minecraft_tpu.terrain import pipeline
    from tools import scenelib

    t0 = time.time()
    if "--scene=9x9" in sys.argv:  # legacy scene (own ~15 min cold compile)
        area = pipeline.generate_area(-4, -4, 9, 9, features=True)
        scene = brickmap.build_scene(jnp.asarray(area["blocks"]), -4, -4)
        hmax = float(np.asarray(area["heightfield"]).max())
        player = camera.Player(
            pos=np.array([0.0, hmax + 16.0, -60.0], np.float32), theta=0.05, phi=-0.22
        )
        params = sky.sky_params(1.0, 0.0)
    else:  # default: the shared tiled 10x10 scene (ONE cached program, scenelib)
        scene, player, params, hmax = scenelib.benchmark_scene()
    gen_s = time.time() - t0

    W, H = 1920, 1080
    cam = player.camera_params(W, H)
    dt_full, fbs = run(H, W, scene, cam, params)
    dt_compact, fbs_c = run(H, W, scene, cam, params, compact=True)
    # sanity: the two paths must agree (same seed streams; fp-chaos tolerance)
    diff = float(jnp.mean(jnp.abs(fbs.color - fbs_c.color)))

    cam_half = player.camera_params(W // 2, H // 2)
    dt_half, fbs_half = run(H // 2, W // 2, scene, cam_half, params)

    def dn():
        img = denoise.atrous_denoise(fbs_half.color, fbs_half.albedo, fbs_half.normal)
        img = denoise.upscale2x(img)
        np.asarray(img[0, 0, 0])

    dn()  # compile
    t0 = time.time()
    for _ in range(4):
        dn()
    denoise_s = (time.time() - t0) / 4

    print(json.dumps({
        "config": "static 9x9 chunks, 1080p, 1spp, accumulation",
        "gen_seconds_9x9": round(gen_s, 1),
        "ms_per_frame_1080p": round(dt_full * 1e3, 1),
        "mpaths_per_s_1080p": round(W * H / dt_full / 1e6, 3),
        "ms_per_frame_1080p_compact": round(dt_compact * 1e3, 1),
        "compact_mean_abs_diff": round(diff, 6),
        "ms_per_frame_upscaled(540p render)": round(dt_half * 1e3, 1),
        "denoise_upscale_ms": round(denoise_s * 1e3, 1),
        "fps_upscaled": round(1.0 / (dt_half + denoise_s), 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
