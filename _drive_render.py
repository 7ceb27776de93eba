import os, sys, time
small = "--small" in sys.argv
if small:
    os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.render import brickmap, camera, sky, tracer, tonemap
from mega_minecraft_tpu.world.blocks import Block

if small:
    # synthetic scene: 3x3 chunks, stone floor at y<100, one glowstone pillar
    vol = np.zeros((48, 48, 384), np.uint8)
    vol[:, :, :100] = int(Block.STONE)
    vol[:, :, 99:100] = int(Block.GRASS_BLOCK)
    vol[20:24, 20:24, 100:120] = int(Block.GLOWSTONE)
    vol[30:40, 5:15, 95:100] = int(Block.WATER)
    chunks = vol.reshape(3, 16, 3, 16, 384).transpose(0, 2, 1, 3, 4)
    scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)
    W = H = 128
    player = camera.Player(pos=np.array([24.0, 130.0, -10.0], np.float32), theta=0.2, phi=-0.35)
else:
    from mega_minecraft_tpu.terrain import pipeline
    t0 = time.time()
    area = pipeline.generate_area(-2, -2, 5, 5, features=True)
    print(f"generated 5x5 chunks in {time.time()-t0:.1f}s")
    scene = brickmap.build_scene(jnp.asarray(area["blocks"]), -2, -2)
    W, H = 640, 360
    hmax = float(np.asarray(area["heightfield"]).max())
    player = camera.Player(pos=np.array([8.0, hmax + 18.0, -44.0], np.float32), theta=0.1, phi=-0.30)

# pick a daytime sun position
sts = np.linspace(0, 2 * np.pi, 100)
best_st = max(sts, key=lambda st: float(np.asarray(sky.sky_params(st, 0.0).sun_dir)[1]))
params = sky.sky_params(sun_time=float(best_st), time=0.0)
print("sun_dir:", np.asarray(params.sun_dir), "moon:", np.asarray(params.moon_dir))
cam = player.camera_params(W, H)

render = jax.jit(tracer.render_sample, static_argnames=("height", "width", "tile_rows", "tile_cols"))
t0 = time.time()
color, albedo, normal = render(scene, cam, params, H, W, jnp.int32(0))
color.block_until_ready()
print(f"first render (compile+run): {time.time()-t0:.1f}s")

fbs = tracer.init_framebuffers(H, W)
t0 = time.time()
N = 8
for fid in range(N):
    c, a, n = render(scene, cam, params, H, W, jnp.int32(fid))
    fbs = tracer.accumulate(fbs, c, a, n, jnp.int32(fid))
fbs.color.block_until_ready()
dt = time.time() - t0
rays = W * H * N
print(f"{N} frames in {dt:.2f}s -> {rays/dt/1e6:.2f} Mpaths/s, {dt/N*1e3:.1f} ms/frame")

img = np.asarray(tonemap.present(fbs.color))
# write PPM
with open("/tmp/render.ppm", "wb") as f:
    f.write(b"P6\n%d %d\n255\n" % (W, H))
    f.write(img.tobytes())
print("wrote /tmp/render.ppm  mean rgb:", img.reshape(-1, 3).mean(0))

# ascii luminance preview
lum = img.mean(-1)
ramp = " .:-=+*#%@"
step = max(1, H // 24)
for row in lum[::step, :: max(1, W // 60)]:
    print("".join(ramp[min(9, int(v / 25.6))] for v in row))
