"""Measure the generation cost of the correctly-rounded hash sin
(config.terrain.exact_sin / MMTPU_EXACT_SIN) — the measurement
config.py promises next to the default.

Times heightfield + caves + fill (the sin-hash-heavy stages) over a 5×5 area
in BOTH sin modes in one process.  The mode is read at TRACE time and baked
into each compiled program, and flipping it does NOT invalidate @jax.jit
caches (same shapes, same static args -> the second mode would silently hit
the first mode's executables and report exact/plain ~= 1.0) — so each flip is
followed by jax.clear_caches(); the persistent disk cache keeps re-compiles
cheap.

Run alone (ONE TPU process at a time):  python tools/exact_sin_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("MMTPU_EXACT_SIN", None)  # set_exact_sin must win in this tool

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.ops import hashes
from mega_minecraft_tpu.terrain import caves as caves_mod
from mega_minecraft_tpu.terrain import fill, heightfield, layers

N = 5
REPS = 8
print("devices:", jax.devices(), flush=True)

pos_h = []
for iz in range(-1, N + 1):
    for ix in range(-1, N + 1):
        pos_h.append([ix * 16, iz * 16])
pos_h = jnp.asarray(np.array(pos_h, np.int32))
pos_in = jnp.asarray(
    np.array([[ix * 16, iz * 16] for iz in range(N) for ix in range(N)], np.int32)
)


def timed(name, f):
    f()  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        out = f()
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)
    dt = (time.time() - t0) / REPS
    print(f"  {name:28s} {dt*1e3:8.2f} ms", flush=True)
    return dt


results = {}
for mode in (False, True):
    hashes.set_exact_sin(mode)
    assert hashes.EXACT_SIN == mode
    # drop every traced program: EXACT_SIN is baked in at trace time, and the
    # jit caches key only on shapes/statics — without this the True pass times
    # the False-mode executables (the measured failure this tool shipped with)
    jax.clear_caches()
    print(f"exact_sin={mode}:", flush=True)
    dt_h = timed("heightfield (7x7 halo)", lambda: heightfield.generate_heightfield(pos_h))
    hf, w = heightfield.generate_heightfield(pos_h)
    hz = N + 2
    grid = hf.reshape(hz, hz, 16, 16)
    full = jnp.transpose(grid, (0, 2, 1, 3)).reshape(hz * 16, hz * 16)
    gathered = jnp.stack(
        [full[(iz + 1) * 16 - 1:(iz + 1) * 16 + 17, (ix + 1) * 16 - 1:(ix + 1) * 16 + 17]
         for iz in range(N) for ix in range(N)]
    )
    inner = jnp.asarray(
        np.array([(iz + 1) * hz + ix + 1 for iz in range(N) for ix in range(N)], np.int32)
    )
    hf_in, w_in = hf[inner], w[inner]
    ls = layers.fix_backward_stratified(layers.generate_layers(gathered, w_in, pos_in))
    dt_c = timed("caves", lambda: caves_mod.generate_caves(hf_in, w_in, pos_in))
    cv = caves_mod.generate_caves(hf_in, w_in, pos_in)
    dt_f = timed(
        "fill_chunks",
        lambda: fill.fill_chunks(hf_in, w_in, ls, cv["starts"], cv["ends"], pos_in),
    )
    results[mode] = dt_h + dt_c + dt_f

ratio = results[True] / results[False]
print(f"total sin-heavy stages: plain {results[False]*1e3:.1f} ms, "
      f"exact {results[True]*1e3:.1f} ms  ->  exact/plain = {ratio:.3f}")
assert ratio > 1.05, (
    f"exact/plain = {ratio:.3f} ~ 1.0: the mode flip did not take "
    "(stale jit cache — clear_caches missing?)"
)
