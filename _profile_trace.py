import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.render import brickmap, camera, sky, tracer
from mega_minecraft_tpu.world.blocks import Block

# synthetic 9x9-chunk scene
vol = np.zeros((144, 144, 384), np.uint8)
hills = (120 + 30 * np.sin(np.arange(144) / 9)[:, None] * np.cos(np.arange(144) / 11)[None, :]).astype(int)
for z in range(144):
    for x in range(144):
        vol[z, x, : hills[z, x]] = int(Block.STONE)
chunks = vol.reshape(9, 16, 9, 16, 384).transpose(0, 2, 1, 3, 4)
scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)

W, H = 640, 360
player = camera.Player(pos=np.array([72.0, 170.0, -20.0], np.float32), theta=0.1, phi=-0.3)
cam = player.camera_params(W, H)
params = sky.sky_params(1.5, 0.0)

def bench(name, fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.1f} ms")
    return out

# primary rays only
ix = jnp.zeros((H, W), jnp.float32)
dx, dy, dz = camera.pixel_rays(cam, W, H, (ix, ix))
ox = jnp.full((H, W), 72.0)
oy = jnp.full((H, W), 170.0)
oz = jnp.full((H, W), -20.0)
med = jnp.full((H, W), jnp.uint8(0))

trace_j = jax.jit(tracer.trace)
res = bench("trace primary", trace_j, scene, ox, oy, oz, dx, dy, dz, med)
print("   hit fraction:", float(res.hit.mean()))

skyf = jax.jit(lambda dx, dy, dz: sky.sky_color(dx, dy, dz, params)[0])
bench("sky lean", skyf, dx, dy, dz)
skyfull = jax.jit(lambda dx, dy, dz: sky.sky_color(dx, dy, dz, params, origin=(ox, oy, oz), first_hit=jnp.ones((H, W), bool))[0])
bench("sky full (clouds+stars)", skyfull, dx, dy, dz)

render = jax.jit(tracer.render_sample, static_argnames=("height", "width", "tile_rows", "tile_cols"))
bench("full render_sample", render, scene, cam, params, H, W, jnp.int32(1), n=2)
