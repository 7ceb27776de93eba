"""Denoiser/upscaler quality measurement (VERDICT r1 item 9): PSNR of the à-trous
output (and the half-res upscaled present path) against a high-spp accumulated
reference frame on the 9×9 static scene, day + cave viewpoints.

The reference's published convergence marks (README.md:320): < 1 s to a clean image
aboveground, ≈ 5 s underground (no emissive NEE).  Here "clean" is quantified as
PSNR vs a REF_SPP-accumulated frame of the same scene, and convergence time is
(spp needed to reach the floor) × (measured ms/frame).

Run from the repo root on the TPU:  python tools/denoise_quality.py [--spp 256]
Prints one JSON line per viewpoint.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from mega_minecraft_tpu.render import brickmap, camera, denoise, sky, tonemap, tracer
from mega_minecraft_tpu.terrain import pipeline


def find_cave_viewpoint(area) -> np.ndarray | None:
    """Pick the center of the largest cave layer in the area (camera inside it)."""
    starts = np.asarray(area["caves"]["starts"])  # [B, 16, 16, 32]
    ends = np.asarray(area["caves"]["ends"])
    size = np.where(ends > starts, ends - starts, 0)
    size = np.where(starts < 120, size, 0)  # underground only (no emissive NEE there)
    if size.max() < 4:
        return None
    b, z, x, i = np.unravel_index(np.argmax(size), size.shape)
    pos = np.asarray(area["chunk_pos"])[b]
    y = 0.5 * (starts[b, z, x, i] + ends[b, z, x, i])
    return np.array([pos[0] + x + 0.5, y, pos[1] + z + 0.5], np.float32)


def measure(scene, player, params, H, W, ref_spp, test_spps):
    cam = player.camera_params(W, H)
    fbs = tracer.init_framebuffers(H, W)
    render = jax.jit(
        tracer.render_accumulate, static_argnames=("height", "width")
    )
    checkpoints = {}
    t0 = time.time()
    ms_per_frame = None
    for fid in range(ref_spp):
        fbs = render(fbs, scene, cam, params, H, W, jnp.int32(fid))
        if fid + 1 in test_spps:
            checkpoints[fid + 1] = fbs
        if fid == 0:
            np.asarray(fbs.color[0, 0, 0])  # compile barrier
            t0 = time.time()
    ref = np.asarray(fbs.color)
    ms_per_frame = (time.time() - t0) / max(ref_spp - 1, 1) * 1e3

    out = {"ms_per_frame": round(ms_per_frame, 1), "ref_spp": ref_spp}
    refj = jnp.asarray(ref)
    for spp, f in checkpoints.items():
        raw = denoise.psnr(f.color, refj)
        den = denoise.psnr(denoise.atrous_denoise(f.color, f.albedo, f.normal), refj)
        ns = jnp.full(f.color.shape[:2], float(spp), jnp.float32)
        den_n = denoise.psnr(
            denoise.atrous_denoise(f.color, f.albedo, f.normal, nsamp=ns), refj
        )
        out[f"psnr_raw_{spp}spp"] = round(raw, 2)
        out[f"psnr_denoised_{spp}spp"] = round(den, 2)
        out[f"psnr_denoised_nsamp_{spp}spp"] = round(den_n, 2)
        out[f"seconds_to_{spp}spp"] = round(spp * ms_per_frame / 1e3, 2)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--size", type=int, nargs=2, default=(960, 540))
    args = p.parse_args()
    W, H = args.size
    test_spps = {1, 4, 8, 16, 32}

    import scenelib

    blocks, hmax, (cx0, cz0) = scenelib.tiled_blocks()
    scene = brickmap.build_scene(jnp.asarray(blocks), cx0, cz0)
    params = sky.sky_params(1.0, 0.0)

    day = camera.Player(
        pos=np.array([0.0, hmax + 14.0, -55.0], np.float32), theta=0.05, phi=-0.25
    )
    r = {"view": "day", **measure(scene, day, params, H, W, args.spp, test_spps)}
    print(json.dumps(r), flush=True)

    # cave viewpoint from the blocks themselves (the scenelib refactor dropped
    # the staged-area dict this tool used to read cave layers from)
    nb = blocks.shape[0] * 16
    vol = blocks.transpose(0, 2, 1, 3, 4).reshape(nb, nb, 384)
    underground = (vol == 0)[:, :, :96]
    zz, xx, yy = np.nonzero(underground)
    cave_pos = None
    if yy.size:
        pick = np.argmax(yy)
        cave_pos = np.array(
            [xx[pick] + cx0 * 16 + 0.5, yy[pick] - 1.5, zz[pick] + cz0 * 16 + 0.5],
            np.float32,
        )
    if cave_pos is not None:
        cave = camera.Player(pos=cave_pos, theta=1.2, phi=-0.1)
        r = {"view": "cave", **measure(scene, cave, params, H, W, args.spp, test_spps)}
        print(json.dumps(r), flush=True)
    else:
        print(json.dumps({"view": "cave", "error": "no cave found in 9x9 area"}))


if __name__ == "__main__":
    main()
