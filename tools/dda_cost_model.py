"""Decompose the DDA march's per-lane-step cost on the real chip.

The render cost model is lanes x lock-step-iterations x c_lane, with measured
c_lane ~ 5-7 ns.  This microbench isolates c_lane's components so optimization
targets the dominant one:

  gather   — one i32 gather per step from a scene-sized flat table (HBM random)
  gather8  — same from a u8 table 1/4 the size (locality effect)
  gatherS  — same from a 64 KB table (VMEM-cacheable: the locality ceiling)
  math     — the ~120-op DDA body arithmetic with NO gather
  loop     — an (almost) empty while_loop body (per-iteration fixed overhead)
  full     — gather + math together (the real body shape)

Run alone (ONE TPU process at a time):  python tools/dda_cost_model.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

F32 = jnp.float32
I32 = jnp.int32

LANES = 3840  # one 4-row 960-wide band, the production tile shape
ITERS = 512
TABLE_WORDS = 144 * 144 * 384  # the 9x9-scene fine field


def run(name, make_body, carry_extra=(), reps=5, lanes=None):
    global LANES
    if lanes is not None:
        LANES = lanes
    def cond(s):
        return s[0] < ITERS

    body = make_body()

    @jax.jit
    def go(x, tab):
        init = (jnp.zeros((), I32), x) + carry_extra
        out = jax.lax.while_loop(cond, lambda s: body(s, tab), init)
        return out[1]

    tab_i32 = jnp.asarray(
        np.random.randint(140, 2**20, TABLE_WORDS, dtype=np.int32)
    )
    x0 = jnp.asarray(np.random.uniform(10, 100, LANES).astype(np.float32))
    r = go(x0, tab_i32)
    np.asarray(r[:1])
    t0 = time.time()
    for _ in range(reps):
        r = go(x0, tab_i32)
    np.asarray(r[:1])
    dt = (time.time() - t0) / reps
    per = dt / ITERS / LANES * 1e9
    print(f"  {name:8s}: {dt*1e3:7.2f} ms/loop  {dt/ITERS*1e6:7.2f} us/iter  {per:6.2f} ns/lane-step")
    return per


def main():
    print("devices:", jax.devices(), f"lanes={LANES} iters={ITERS}")

    # loop: body keeps a trivial dependence so nothing is DCE'd
    def loop_body():
        def body(s, tab):
            it, x = s
            return (it + 1, x + F32(1.0))
        return body

    # gather: one i32 gather per lane per step, index depends on x (serial chain)
    def gather_body(words, dtype):
        def body(s, tab):
            it, x = s
            idx = (x.astype(I32) * I32(-1640531527) & I32(0x7FFFFFFF)) % I32(words)
            v = tab[idx].astype(F32)
            return (it + 1, x + v * F32(1e-9) + F32(1.0))
        return body

    # math: ~the DDA body's arithmetic intensity (~120 vector ops), no gather
    def math_body():
        def body(s, tab):
            it, x = s
            v = x
            for k in range(12):
                a = v * F32(1.0001) + F32(0.3)
                b = jnp.where(a > v, a, v * F32(0.999))
                c = jnp.minimum(jnp.maximum(a, b), v + F32(2.0))
                d = jnp.floor(c) - jnp.abs(b)
                v = c + d * F32(1e-3)
            return (it + 1, v)
        return body

    def full_body(words):
        mb = math_body()
        gb = gather_body(words, I32)
        def body(s, tab):
            s = gb(s, tab)
            it, x = s
            _, x = mb((it, x), tab)
            return (it, x)
        return body

    run("loop", loop_body)
    run("math", math_body)
    run("gather", lambda: gather_body(TABLE_WORDS, I32))
    run("gatherS", lambda: gather_body(16 * 1024, I32))
    run("full", lambda: full_body(TABLE_WORDS))

    # lane scaling: does a fatter band amortize fixed overhead?
    for lanes in (3840, 15360, 61440, 245760):
        run(f"full x{lanes//3840}", lambda: full_body(TABLE_WORDS), lanes=lanes)


if __name__ == "__main__":
    main()
