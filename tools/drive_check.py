"""Round-2 verify drive (one TPU process, sequential):
1. remainder-band tiling: tiled render with a non-dividing height must equal untiled
2. engine streaming drive: ticks, chunk-state counts, present luminance
3. HTTP viewer end-to-end: serve, fetch frames, post input, confirm player motion
"""
import json
import threading
import time
import urllib.request

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from mega_minecraft_tpu.render import brickmap, camera, sky, tracer
from mega_minecraft_tpu.terrain import pipeline

# ---- 1. remainder band ----
area = pipeline.generate_area(-1, -1, 3, 3, features=False)
scene = brickmap.build_scene(jnp.asarray(area["blocks"]).reshape(3, 3, 16, 16, 384), -1, -1)
hmax = float(np.asarray(area["heightfield"]).max())
player = camera.Player(pos=np.array([24.0, hmax + 10.0, -20.0], np.float32), theta=0.1, phi=-0.3)
H, W = 38, 64  # 38 % 4 == 2 -> remainder band path
cam = player.camera_params(W, H)
params = sky.sky_params(1.0, 0.0)
c_t, a_t, n_t = tracer.render_sample(scene, cam, params, H, W, jnp.int32(3), tile_rows=4, tile_cols=None)
c_u, a_u, n_u = tracer.render_sample(scene, cam, params, H, W, jnp.int32(3), tile_rows=None, tile_cols=None)
for t, u, name in [(c_t, c_u, "color"), (a_t, a_u, "albedo"), (n_t, n_u, "normal")]:
    t, u = np.asarray(t), np.asarray(u)
    assert t.shape == (H, W, 3), t.shape
    assert np.allclose(t, u, atol=1e-3, rtol=1e-3), (
        f"{name} mismatch: max abs diff {np.abs(t - u).max()}")
print("1. remainder-band tiled ~= untiled (fp tolerance), shape", c_t.shape, flush=True)
# determinism of the remainder path itself: same tiling twice is bit-equal
c_t2, _, _ = tracer.render_sample(scene, cam, params, H, W, jnp.int32(3), tile_rows=4, tile_cols=None)
assert np.array_equal(np.asarray(c_t), np.asarray(c_t2)), "tiled render nondeterministic"
print("   same-tiling rerun bit-equal", flush=True)

# ---- 2. engine drive ----
from mega_minecraft_tpu.app.engine import Engine, EngineConfig


cfg = EngineConfig(width=64, height=36, view_chunks=3, gen_radius=0, capacity=64)
eng = Engine(cfg)
for i in range(6):
    eng.tick(1.0 / 30.0, move=(0.0, 0.0, 1.0))
img = eng.present()
print("2. engine drive: drawable =", eng.drawable_chunks(),
      "chunk info =", eng.debug_chunk_info(), flush=True)
print("   present", img.shape, img.dtype, "lum range", int(img.min()), int(img.max()),
      "mean", round(float(img.mean()), 1), flush=True)
assert img.shape == (36, 64, 3) and img.max() > 16, "present frame is black"

# ---- 3. viewer end-to-end (same cfg -> warm cache) ----
from mega_minecraft_tpu.app import viewer

result = {}

def serve():
    result["engine"] = viewer.run_http_viewer(cfg, port=8699, max_frames=400)

th = threading.Thread(target=serve, daemon=True)
th.start()

base = "http://127.0.0.1:8699"
page = None
for _ in range(150):
    try:
        page = urllib.request.urlopen(base + "/", timeout=60).read().decode()
        break
    except Exception:
        time.sleep(2)
assert page is not None, "server never came up"
print("3. viewer page OK:", len(page), "bytes", flush=True)


def get_frame():
    r = urllib.request.urlopen(base + "/frame.png", timeout=300)
    return r.read(), int(r.headers.get("x-frame", 0)), r.headers.get("x-fps")


def post(msg):
    urllib.request.urlopen(
        urllib.request.Request(base + "/input", data=json.dumps(msg).encode(),
                               method="POST"), timeout=60)


def wait_frames(n, timeout_s=420):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        f, fid, fps = get_frame()
        if fid >= n:
            return f, fid, fps
        time.sleep(1)
    raise AssertionError(f"frame {n} never arrived")


f1, fid1, fps1 = wait_frames(1)
print("   frame", fid1, ":", len(f1), "bytes, fps hdr:", fps1, flush=True)
assert f1[:8] == b"\x89PNG\r\n\x1a\n"

post({"held": ["w", "shift"], "dtheta": 0.2, "dphi": -0.1, "events": ["k", "]", "f"]})
f2, fid2, _ = wait_frames(fid1 + 3)
post({"held": [], "events": ["escape"]})
print("   frame", fid2, ":", len(f2), "bytes; changed:", f1 != f2, flush=True)

th.join(timeout=600)
eng2 = result["engine"]
p = eng2.player.pos
print("   player pos after held-W:", p, "theta:", round(eng2.player.theta, 3),
      "freecam:", eng2.freecam, flush=True)
assert p[2] > -15.0 + 0.01, "player never moved forward"
assert abs(eng2.player.theta - 0.2) < 1e-5
assert eng2.freecam is True
assert f1 != f2
print("DRIVE OK")
