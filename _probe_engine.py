import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from mega_minecraft_tpu.app.engine import Engine, EngineConfig
from mega_minecraft_tpu.utils.profiling import StageTimer

cfg = EngineConfig(width=320, height=180, gen_radius=6, view_chunks=9, capacity=2048, skip_erosion=True)
eng = Engine(cfg)
eng.scheduler.timer = StageTimer()
t0 = time.time()
frames = eng.scheduler.drain(max_frames=3000)
print(f"drain: {time.time()-t0:.1f}s over {frames} frames")
print(eng.scheduler.timer.dump())
t0=time.time(); eng._upload_new_chunks(); print(f"upload_new_chunks: {time.time()-t0:.1f}s")
for name in ("tick-render-only",):
    t0 = time.time()
    for i in range(5):
        eng.tick(1/30.0, move=(0.0,0.0,1.0))
    print(f"5 ticks: {time.time()-t0:.1f}s")
t0=time.time(); img = eng.present(); print(f"present: {time.time()-t0:.1f}s")
