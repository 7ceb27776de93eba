"""Shared benchmark-scene builder: tile the ONE fused 5×5 generation program.

Every render tool (bench.py leg_render, bench_render.py, step_stats.py,
trace_bias.py, tile_sweep.py) needs a featured multi-chunk scene, and each
distinct area shape costs its own ~15-minute cold XLA compile of the fused
pipeline (the round-3 failure mode: the driver's render leg never started
because a 9×9-shape compile ate the budget).  This module builds any even-sided
scene by tiling runs of the EXACT fused 5×5 program bench.py's generation leg
compiles — same shapes, same flags ⇒ one persistent-cache entry shared by every
tool and the driver.

Tile seams lose cross-tile feature gathers (a tree in the last chunk-row of one
tile can't overhang into the next); for benchmark scenes that is invisible and
the determinism is what matters — every tool renders the SAME world.
"""

import numpy as np


def tiled_blocks(n_tiles: int = 2, tile_n: int = 5, center: bool = True):
    """Generate an (n_tiles·tile_n)² chunk scene as n_tiles² fused tile runs.

    Returns (blocks [NC, NC, 16, 16, 384] u8 numpy, hmax float, (cx0, cz0)).
    The grid is centered on the origin when ``center`` (chunk coords
    [-N/2, N/2)), matching bench.py's leg_render placement.
    """
    import jax.numpy as jnp

    from mega_minecraft_tpu.terrain import pipeline

    n = tile_n
    half = (n_tiles * n) // 2 if center else 0
    rows, hmax = [], 0.0
    for tz in range(n_tiles):
        row = []
        for tx in range(n_tiles):
            cx0, cz0 = -half + tx * n, -half + tz * n
            pos_h = []
            for cz in range(cz0 - 1, cz0 + n + 1):
                for cx in range(cx0 - 1, cx0 + n + 1):
                    pos_h.append([cx * 16, cz * 16])
            out = pipeline.generate_area_fused(
                jnp.asarray(np.array(pos_h, np.int32)), n, n, features=True
            )
            row.append(np.asarray(out["blocks"]).reshape(n, n, 16, 16, 384))
            hmax = max(hmax, float(np.asarray(out["heightfield"]).max()))
        rows.append(np.concatenate(row, axis=1))
    blocks = np.concatenate(rows, axis=0)
    return blocks, hmax, (-half, -half)


def benchmark_scene(n_tiles: int = 2, tile_n: int = 5):
    """The standard benchmark scene + camera: 10×10 chunks from four fused 5×5
    tiles, player at the bench.py leg_render viewpoint.  Returns
    (scene, player, params, hmax)."""
    import jax.numpy as jnp

    from mega_minecraft_tpu.render import brickmap, camera, sky

    blocks, hmax, (cx0, cz0) = tiled_blocks(n_tiles, tile_n)
    scene = brickmap.build_scene(jnp.asarray(blocks), cx0, cz0)
    player = camera.Player(
        pos=np.array([0.0, hmax + 16.0, -60.0], np.float32), theta=0.05, phi=-0.22
    )
    params = sky.sky_params(1.0, 0.0)
    return scene, player, params, hmax
