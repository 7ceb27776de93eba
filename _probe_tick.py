import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from mega_minecraft_tpu.app.engine import Engine, EngineConfig
from mega_minecraft_tpu.render import sky, tracer

cfg = EngineConfig(width=320, height=180, gen_radius=2, view_chunks=9, capacity=512, skip_erosion=True)
eng = Engine(cfg)
eng.scheduler.drain(max_frames=500)
eng._upload_new_chunks()
# warm up render path
eng.tick(1/30.0); eng.tick(1/30.0)
np.asarray(eng.fbs.color[0,0,0])

def t(name, f):
    t0=time.time(); r=f(); 
    try: np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    except Exception: pass
    print(f"{name:28s} {(time.time()-t0)*1e3:8.1f} ms"); return r

for k in range(3):
    print(f"--- tick {k}")
    t("scheduler.tick", lambda: eng.scheduler.tick(1/30.))
    params = t("sky_params", lambda: sky.sky_params(eng.sun_time, eng.time))
    cam = t("camera_params", lambda: eng.player.camera_params(eng.render_w, eng.render_h))
    out = t("render", lambda: eng._render(eng.scene, cam, params, eng.render_h, eng.render_w, jnp.int32(0)))
    c,a,n = out
    fbs = t("accumulate", lambda: tracer.accumulate(eng.fbs, c, a, n, jnp.int32(0)))
t0=time.time()
for k in range(5): eng.tick(1/30., move=(0.,0.,1.))
np.asarray(eng.fbs.color[0,0,0])
print(f"5 full ticks (move): {(time.time()-t0):.2f}s")
