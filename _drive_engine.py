import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.app.engine import Engine, EngineConfig

cfg = EngineConfig(width=320, height=180, gen_radius=6, view_chunks=9, capacity=2048, skip_erosion=True)
eng = Engine(cfg)
t0 = time.time()
frames = eng.scheduler.drain(max_frames=3000)
print(f"drained initial gen in {time.time()-t0:.1f}s over {frames} scheduler frames; "
      f"drawable={eng.drawable_chunks()}", flush=True)
eng._upload_new_chunks()

t0 = time.time()
for i in range(5):
    eng.tick(1/30.0, move=(0.0, 0.0, 1.0))
img = eng.present()
print(f"5 fly-through frames in {time.time()-t0:.1f}s; mean rgb {img.reshape(-1,3).mean(0)}")
from PIL import Image
Image.fromarray(img).save("/tmp/engine.png")
state_counts = {}
from mega_minecraft_tpu.terrain.scheduler import ChunkState
import numpy as np
for s in np.unique(eng.scheduler.t.state[eng.scheduler.t.in_use]):
    state_counts[ChunkState(int(s)).name] = int((eng.scheduler.t.state[eng.scheduler.t.in_use] == s).sum())
print("chunk states:", state_counts)
