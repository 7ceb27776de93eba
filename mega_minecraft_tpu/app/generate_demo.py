"""CLI demo: generate an area, print a block histogram + terrain slice; optionally
path-trace a frame to PNG/PPM.

Usage:
    python -m mega_minecraft_tpu.app.generate_demo [--chunks N] [--origin CX CZ]
        [--features] [--render OUT.png] [--width W] [--height H] [--spp N]

The offline analogue of the reference's visual QA loop (debug dumps
/root/reference/src/main.cpp:391-431 + eyeballing the window).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--chunks", type=int, default=5, help="area side length in chunks")
    p.add_argument("--origin", type=int, nargs=2, default=None, metavar=("CX", "CZ"))
    p.add_argument("--features", action="store_true", help="apply SDF features + decorators")
    p.add_argument("--render", type=str, default=None, metavar="OUT", help="trace a frame to this PNG/PPM")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8, help="accumulated samples when rendering")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from ..native import block_histogram
    from ..terrain import pipeline
    from ..world.blocks import Block

    n = args.chunks
    cx0, cz0 = args.origin if args.origin else (-(n // 2), -(n // 2))
    print(f"generating {n}x{n} chunks at origin ({cx0}, {cz0}) on {jax.devices()[0]} ...")
    out = pipeline.generate_area(cx0, cz0, n, n, features=args.features)
    blocks = np.asarray(out["blocks"])  # [n, n, 16, 16, 384]
    hf = np.asarray(out["heightfield"])

    names = {int(b): b.name for b in Block}
    hist = block_histogram(blocks)
    print(f"\nheightfield min/max: {hf.min():.1f} / {hf.max():.1f}")
    print("block histogram (top 14):")
    for bid in np.argsort(hist)[::-1][:14]:
        if hist[bid]:
            print(f"  {names.get(int(bid), str(bid)):22s} {int(hist[bid]):>10d}")

    # ascii shade map of the heightfield (darker = lower)
    grid = hf.reshape(n, n, 16, 16).transpose(0, 2, 1, 3).reshape(n * 16, n * 16)
    lo, hi = grid.min(), grid.max() + 1e-3
    shades = " .:-=+*#%@"
    print("\nheightfield shade map:")
    step = max(1, n * 16 // 48)
    for r in range(0, n * 16, step * 2):
        row = grid[r, ::step]
        print("  " + "".join(shades[int((v - lo) / (hi - lo) * 9.999)] for v in row))

    if args.render:
        from ..render import brickmap, camera, denoise, sky, tonemap, tracer

        scene = brickmap.build_scene(jnp.asarray(blocks), cx0, cz0)
        player = camera.Player(
            pos=np.array(
                [(cx0 + n / 2) * 16, float(hf.max()) + 14.0, cz0 * 16 - 40.0], np.float32
            ),
            theta=0.0,
            phi=-0.3,
        )
        W, H = args.width, args.height
        cam = player.camera_params(W, H)
        params = sky.sky_params(1.0, 0.0)
        render = jax.jit(tracer.render_sample, static_argnames=("height", "width", "tile_rows"))
        fbs = tracer.init_framebuffers(H, W)
        for fid in range(args.spp):
            c, a, nn = render(scene, cam, params, H, W, jnp.int32(fid))
            fbs = tracer.accumulate(fbs, c, a, nn, jnp.int32(fid))
        img = denoise.atrous_denoise(fbs.color, fbs.albedo, fbs.normal)
        u8 = np.asarray(tonemap.present(img))
        path = args.render
        try:
            from PIL import Image

            Image.fromarray(u8).save(path)
        except ImportError:
            if not path.endswith(".ppm"):
                path += ".ppm"
            with open(path, "wb") as f:
                f.write(b"P6\n%d %d\n255\n" % (W, H) + u8.tobytes())
        print(f"\nwrote {path}  (min/max/mean {u8.min()}/{u8.max()}/{u8.mean():.1f})")

    return 0


if __name__ == "__main__":
    sys.exit(main())
