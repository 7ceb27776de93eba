"""BASELINE.md benchmark config (5): interactive fly-through with action-time chunk
streaming + postprocess.  Prints one JSON line (not the driver headline; see bench.py).

Mirrors the reference's real workload shape (terrain.cpp:65-67,1036-1041): generation
spiral to radius 40, drawable window 33×33 (≈1089 chunks), zone erosion streaming ON,
and — like the reference's USE_UPSCALING mode (defines.hpp:12, README.md:326-328) —
rendering at 960×540 and denoise-upscaling to 1080p.  The player flies forward while
the scheduler streams generation under the action-time budget and every frame is
path-traced, denoised and tonemapped (reference main loop, main.cpp:661-717).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


def run(reference_scale: bool = True, n_frames: int = 30) -> dict:
    """Run the fly-through benchmark; returns the stats dict (JSON-safe)."""
    from mega_minecraft_tpu.app.engine import Engine, EngineConfig

    compact = os.environ.get("MMTPU_COMPACT", "") not in ("", "0")
    if reference_scale:
        cfg = EngineConfig(
            width=1920,
            height=1080,
            view_chunks=33,  # chunkVbosGenRadius 16 -> 33x33 drawable
            gen_radius=None,  # reference CHUNK_MAX_GEN_RADIUS 40
            skip_erosion=False,
            use_denoising=True,
            use_upscaling=True,  # render 960x540, 2x denoise-upscale (USE_UPSCALING)
            use_compaction=compact,  # MMTPU_COMPACT=1: A/B the compacted bounce loop
        )
    else:  # clipped round-1 config, kept for A/B history
        cfg = EngineConfig(
            width=960, height=540, view_chunks=17, gen_radius=11,
            skip_erosion=True, use_denoising=True, use_upscaling=False,
        )

    # prewarm: a throwaway engine compiles every stage program + scene update +
    # render (stage batches are padded to a fixed size and the scene volume is
    # sized by view_chunks, so all shapes match the real run below).  It must
    # drain COMPLETELY at a radius that reaches every pipeline stage including
    # zone erosion — round 5 measured that a 40-frame prewarm left the later
    # stage programs cold and the "initial drain" then recorded ~350 s of XLA
    # compile as if it were generation (warm drain of the same work: seconds).
    warm_cfg = dataclasses.replace(cfg, gen_radius=20)
    warm = Engine(warm_cfg)
    warm.scheduler.drain()
    warm._upload_new_chunks()
    warm.tick(1.0 / 30.0)
    _ = warm.present()
    del warm

    eng = Engine(cfg)
    t0 = time.time()
    drain_frames = eng.scheduler.drain()
    eng._upload_new_chunks()
    gen_s = time.time() - t0
    drawable = eng.drawable_chunks()

    # warm the render path (compile)
    eng.tick(1.0 / 30.0)
    _ = eng.present()

    t0 = time.time()
    for i in range(n_frames):
        eng.tick(1.0 / 30.0, move=(0.0, 0.0, 2.0))
    img = eng.present()  # denoise + tonemap (+2x upscale) + host transfer
    dt = (time.time() - t0) / n_frames
    assert img.shape[0] == cfg.height and np.isfinite(dt)

    out = {
        "metric": "fly-through ms/frame (streaming + denoise"
        + (" + 2x upscale to 1080p" if cfg.use_upscaling else "")
        + ")",
        "value": round(dt * 1e3, 1),
        "unit": "ms/frame",
        "initial_drain_s": round(gen_s, 1),
        "drain_frames": drain_frames,
        "drawable_chunks": drawable,
        "erosion_streaming": not cfg.skip_erosion and (cfg.gen_radius or 40) >= 18,
        "render_res": [eng.render_w, eng.render_h],
        "present_res": [cfg.width, cfg.height],
        "scheduler": type(eng.scheduler).__name__,
        "reprojection": cfg.use_reprojection,
    }
    if cfg.use_reprojection:
        # effective samples per pixel carried through the flight — the temporal-
        # reprojection quality win (1.0 would mean every frame restarted at 1 spp
        # the way the reference's accumulation reset does)
        out["mean_effective_spp"] = round(float(np.asarray(eng.fbs.nsamp).mean()), 1)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    print(json.dumps(run(reference_scale="--clipped" not in sys.argv)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
