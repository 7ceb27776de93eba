"""Quantify the fast path's trace bias vs exact-reference semantics.

The production tracer caps bounce/shadow marches (BOUNCE_TRACE_STEPS /
SHADOW_TRACE_STEPS, unresolved lanes report miss -> sky/fog) and uses a
stochastic alpha estimator for secondary rays; the reference traces to
termination with exact anyhit alpha (basic_shaders.cu:604-664,1022-1068).
``exact=True`` (config.render.exact_trace) reproduces the reference semantics.
This tool accumulates N samples in both modes on two scenes — the forested 9x9
aerial view and a cave interior — and reports the converged-image delta, so the
caps are either justified by measurement or tightened.

Run alone (ONE TPU process at a time):
  python tools/trace_bias.py [--res 480x270] [--samples 48]
"""

import argparse
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


def accumulate(scene, cam, params, H, W, samples, exact):
    # jit per (H, W, exact): eager render_sample executes per-op through the
    # ~8 ms dispatch tunnel (the invalid-render-bench failure mode, VERDICT r4)
    render = jax.jit(
        tracer.render_sample,
        static_argnames=("height", "width", "tile_rows", "tile_cols", "exact"),
    )
    acc = jax.jit(tracer.accumulate)
    fbs = tracer.init_framebuffers(H, W)
    t0 = time.time()
    for fid in range(samples):
        c, a, n = render(scene, cam, params, H, W, jnp.int32(fid), exact=exact)
        fbs = acc(fbs, c, a, n, jnp.int32(fid))
    img = np.asarray(fbs.color)
    return img, time.time() - t0


def report(name, img_fast, img_exact, t_fast, t_exact):
    d = np.abs(img_fast - img_exact)
    mse = float(np.mean((img_fast - img_exact) ** 2))
    peak = max(float(img_exact.max()), 1e-6)
    psnr = 10 * np.log10(peak * peak / max(mse, 1e-12))
    print(
        f"{name}: mean|d|={d.mean():.5f} p99|d|={np.percentile(d, 99):.5f} "
        f"max|d|={d.max():.4f} PSNR={psnr:.1f} dB  "
        f"(fast {t_fast:.1f}s vs exact {t_exact:.1f}s for the run)"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="480x270")
    ap.add_argument("--samples", type=int, default=48)
    args = ap.parse_args()
    W, H = (int(v) for v in args.res.split("x"))

    import scenelib

    blocks, hmax, (cx0, cz0) = scenelib.tiled_blocks()  # [10, 10, 16, 16, 384]
    scene = brickmap.build_scene(jnp.asarray(blocks), cx0, cz0)
    params = sky.sky_params(1.0, 0.0)

    # cave interior: drop the camera into the largest air pocket below the surface
    nb = blocks.shape[0] * 16
    vol = blocks.transpose(0, 2, 1, 3, 4).reshape(nb, nb, 384)
    air = vol == 0
    underground = air[:, :, :96]  # below y=96: caves, not sky
    zz, xx, yy = np.nonzero(underground)
    pick = np.argmax(yy)  # a high cave ceiling gives a real interior view
    cave_pos = np.array(
        [xx[pick] + cx0 * 16 + 0.5, yy[pick] - 1.5, zz[pick] + cz0 * 16 + 0.5],
        np.float32,
    )

    cams = {
        "aerial": camera.Player(
            pos=np.array([0.0, hmax + 16.0, -60.0], np.float32), theta=0.05, phi=-0.22
        ),
        "cave": camera.Player(pos=cave_pos, theta=0.7, phi=-0.15),
    }
    for name, player in cams.items():
        cam = player.camera_params(W, H)
        img_f, t_f = accumulate(scene, cam, params, H, W, args.samples, exact=False)
        img_e, t_e = accumulate(scene, cam, params, H, W, args.samples, exact=True)
        report(name, img_f, img_e, t_f, t_e)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
