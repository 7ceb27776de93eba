"""DDA step-count diagnostics: where do the render's gathers actually go?

The traversal cost model is one i32 gather per DDA step (~7-9 ns/lane measured),
so per-ray step counts ARE the render cost.  This tool histograms them per ray
class (primary / diffuse bounce / shadow) for the 9×9 benchmark scene under the
two benchmark cameras, to direct optimization at the class that dominates.

Run alone (ONE TPU process at a time):  python tools/step_stats.py [--res 480x270]
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

from mega_minecraft_tpu.ops import hashes
from mega_minecraft_tpu.render import brickmap, camera, tracer
from mega_minecraft_tpu.terrain import pipeline


def stats(name, steps, mask=None):
    s = np.asarray(steps).ravel()
    if mask is not None:
        s = s[np.asarray(mask).ravel()]
    if s.size == 0:
        print(f"  {name}: (no rays)")
        return
    qs = np.percentile(s, [50, 90, 99, 100])
    print(
        f"  {name}: n={s.size} mean={s.mean():.1f} p50={qs[0]:.0f} "
        f"p90={qs[1]:.0f} p99={qs[2]:.0f} max={qs[3]:.0f} total={s.sum()}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="480x270")
    ap.add_argument("--scene", default="tiled", choices=("tiled", "9x9"))
    args = ap.parse_args()
    W, H = (int(v) for v in args.res.split("x"))

    if args.scene == "9x9":  # legacy scene (own ~15 min cold compile)
        area = pipeline.generate_area(-4, -4, 9, 9, features=True)
        scene = brickmap.build_scene(jnp.asarray(area["blocks"]), -4, -4)
        hmax = float(np.asarray(area["heightfield"]).max())
    else:  # default: shared tiled 10x10 scene — ONE cached program (scenelib)
        import scenelib

        blocks, hmax, (cx0, cz0) = scenelib.tiled_blocks()
        scene = brickmap.build_scene(jnp.asarray(blocks), cx0, cz0)

    @jax.jit
    def probe(scene, cam):
        jx = jnp.zeros((H, W), jnp.float32) + 0.5
        dx, dy, dz = camera.pixel_rays(cam, W, H, (jx, jx))
        o = cam.position
        ox = jnp.broadcast_to(o[0], (H, W))
        oy = jnp.broadcast_to(o[1], (H, W))
        oz = jnp.broadcast_to(o[2], (H, W))
        med = jnp.zeros((H, W), jnp.uint8)
        res, st_p = tracer.trace(scene, ox, oy, oz, dx, dy, dz, med, want_steps=True)

        # shadow rays from the primary hits toward a fixed sun direction
        eps = 1e-3
        hx = ox + dx * res.t + res.nx * eps
        hy = oy + dy * res.t + res.ny * eps
        hz = oz + dz * res.t + res.nz * eps
        sun = jnp.asarray([0.42, 0.65, 0.63], jnp.float32)
        sx = jnp.broadcast_to(sun[0], (H, W))
        sy = jnp.broadcast_to(sun[1], (H, W))
        sz = jnp.broadcast_to(sun[2], (H, W))
        _, st_s = tracer.trace(
            scene, hx, hy, hz, sx, sy, sz, med,
            max_steps=tracer.SHADOW_TRACE_STEPS, active=res.hit, want_steps=True,
        )

        # one diffuse bounce from the primary hits
        seed = hashes.tea(
            jnp.arange(H * W, dtype=jnp.uint32).reshape(H, W), jnp.uint32(7)
        )
        u1, seed = hashes.lcg_u01(seed)
        u2, _ = hashes.lcg_u01(seed)
        bx, by, bz = tracer._cosine_hemisphere(res.nx, res.ny, res.nz, u1, u2)
        _, st_b = tracer.trace(
            scene, hx, hy, hz, bx, by, bz, med,
            max_steps=tracer.BOUNCE_TRACE_STEPS, active=res.hit, want_steps=True,
        )
        return res.hit, st_p, st_s, st_b

    cams = {
        "aerial": camera.Player(
            pos=np.array([0.0, hmax + 16.0, -60.0], np.float32), theta=0.05, phi=-0.22
        ).camera_params(W, H),
        "grazing": camera.Player(
            pos=np.array([0.0, hmax - 20.0, -70.0], np.float32), theta=0.0, phi=-0.05
        ).camera_params(W, H),
    }
    for name, cam in cams.items():
        t0 = time.time()
        hit, st_p, st_s, st_b = probe(scene, cam)
        hit = np.asarray(hit)
        print(f"{name} ({W}x{H}, hit rate {hit.mean():.2f}, {time.time()-t0:.0f}s):")
        stats("primary (all)", st_p)
        stats("primary (hit)", st_p, hit)
        stats("primary (miss)", st_p, ~hit)
        stats("shadow", st_s, hit)
        stats("bounce", st_b, hit)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
