"""Break down render_sample cost on the real chip with tunnel-safe timing:
chain many calls, force one tiny host transfer at the end."""
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.render import brickmap, camera, sky, tracer
from mega_minecraft_tpu.world.blocks import Block

vol = np.zeros((80, 80, 384), np.uint8)
vol[:, :, :100] = int(Block.STONE)
vol[:, :, 99:100] = int(Block.GRASS_BLOCK)
vol[20:24, 20:24, 100:120] = int(Block.GLOWSTONE)
vol[30:40, 5:15, 95:100] = int(Block.WATER)
chunks = vol.reshape(5, 16, 5, 16, 384).transpose(0, 2, 1, 3, 4)
scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)
W, H = 640, 360
player = camera.Player(pos=np.array([40.0, 130.0, -10.0], np.float32), theta=0.2, phi=-0.35)
cam = player.camera_params(W, H)
params = sky.sky_params(1.0, 0.0)


def timeit(name, f, *args, reps=10):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # 4-byte transfer
    dt = (time.time() - t0) / reps
    print(f"{name:36s} {dt*1e3:9.1f} ms")
    return dt


@jax.jit
def primary(scene, cam, fid):
    iy = jnp.arange(H, dtype=jnp.int32)[:, None]
    z = jnp.zeros((H, W), jnp.float32) + fid * 0.0
    dx, dy, dz = camera.pixel_rays(cam, W, H, (z, z))
    pos = tuple(jnp.broadcast_to(cam.position[i], (H, W)) for i in range(3))
    res = tracer.trace(scene, *pos, dx, dy, dz, jnp.full((H, W), jnp.uint8(0)))
    return res.t


@jax.jit
def sky_loop_mode(params, fid):
    ix = jnp.arange(W, dtype=jnp.float32)[None, :] / W - 0.5 + fid * 0.0
    iy = jnp.arange(H, dtype=jnp.float32)[:, None] / H
    dx = ix
    dy = 0.3 + 0.5 * iy
    dz = jnp.ones((H, W), jnp.float32)
    n = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    (r, g, b), f = sky.sky_color(dx / n, dy / n, dz / n, params)
    return r


render = jax.jit(tracer.render_sample, static_argnames=("height", "width", "tile_rows", "tile_cols"))

timeit("primary trace (i32 field)", primary, scene, cam, jnp.float32(0))
timeit("sky_color loop mode", sky_loop_mode, params, jnp.float32(0))
timeit("render_sample full", lambda s, c, p: render(s, c, p, H, W, jnp.int32(0)), scene, cam, params)
