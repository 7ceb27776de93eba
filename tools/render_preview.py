import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from mega_minecraft_tpu.render import brickmap, camera, denoise, sky, tonemap, tracer, materials
from mega_minecraft_tpu.terrain import pipeline

print("real atlas:", materials.HAS_REAL_ATLAS)
import scenelib  # noqa: E402

scene, player, params, hmax = scenelib.benchmark_scene()
W, H = 640, 360
cam = player.camera_params(W, H)
fbs = tracer.init_framebuffers(H, W)
for fid in range(8):
    c, a, n = tracer.render_sample(scene, cam, params, H, W, jnp.int32(fid))
    fbs = tracer.accumulate(fbs, c, a, n, jnp.int32(fid))
img = denoise.atrous_denoise(fbs.color, fbs.albedo, fbs.normal)
out = np.asarray(tonemap.present(img))
outf = out.astype(np.float32) / 255.0
lum = 0.2126*outf[...,0] + 0.7152*outf[...,1] + 0.0722*outf[...,2]
print(f"tonemapped luminance: min={lum.min():.3f} max={lum.max():.3f} mean={lum.mean():.3f}")
print("nan/inf:", np.isnan(out).any(), np.isinf(out).any())
from PIL import Image
Image.fromarray(out).save("/tmp/verify_frame.png")
print("wrote /tmp/verify_frame.png")
# ascii shade map 64x18
sh = lum[::H//18, ::W//64]
chars = " .:-=+*#%@"
for row in sh:
    print("".join(chars[min(int(v*9.99),9)] for v in row))
