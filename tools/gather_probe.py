"""Probe XLA:TPU gather formulations for the DDA's hot op.

dda_cost_model.py measured ~15 ns/lane for a 1-D table[idx] gather regardless
of table size (64 KB vs 32 MB) — the cost is the gather LOWERING, not memory.
This probes alternative formulations for a faster path:

  base      — table[idx] (the tracer's current form)
  take_clip — jnp.take(table, idx, mode="clip")
  row8      — 2-D [N/8, 8] table, gather one 8-wide row per index
  row128    — 2-D [N/128, 128] table, gather one 128-wide row per index
  u8        — u8 table (does element width matter?)
  pair      — [N, 2] i32, one row of 2 per index
  sortidx   — same gather with block-sorted indices (locality sensitivity)
  onehot16k — one-hot matmul gather from a 16 K-entry table (MXU route, small
              tables only — the per-block palette/props case)

Run alone (ONE TPU process at a time):  python tools/gather_probe.py
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

LANES = 3840
ITERS = 256
N = 144 * 144 * 384


def bench(name, fn, *args, reps=5):
    @jax.jit
    def go(*a):
        def body(s):
            it, acc = s
            v = fn(acc, *a)
            return (it + 1, acc + v * F32(1e-9) + F32(1.0))

        return jax.lax.while_loop(lambda s: s[0] < ITERS, body, (jnp.zeros((), I32), a[-1]))[1]

    r = go(*args)
    np.asarray(r[:1])
    t0 = time.time()
    for _ in range(reps):
        r = go(*args)
    np.asarray(r[:1])
    dt = (time.time() - t0) / reps
    print(f"  {name:10s}: {dt*1e3:7.2f} ms  {dt/ITERS/LANES*1e9:6.2f} ns/lane-step", flush=True)


def hashidx(acc, n):
    return (acc.astype(I32) * I32(-1640531527) & I32(0x7FFFFFFF)) % I32(n)


def main():
    print("devices:", jax.devices(), f"lanes={LANES} iters={ITERS}")
    tab = jnp.asarray(np.random.randint(140, 2**20, N, dtype=np.int32))
    tab8 = (tab & 0xFF).astype(jnp.uint8)
    tab_r8 = tab.reshape(N // 8, 8)
    tab_r128 = tab.reshape(N // 128, 128)
    tab_pair = jnp.stack([tab, tab], -1)  # [N, 2]
    tab16k = tab[: 16 * 1024].astype(jnp.bfloat16)
    x0 = jnp.asarray(np.random.uniform(10, 100, LANES).astype(np.float32))

    bench("base", lambda acc, tab, x: tab[hashidx(acc, N)].astype(F32), tab, x0)
    bench(
        "take_clip",
        lambda acc, tab, x: jnp.take(tab, hashidx(acc, N), mode="clip").astype(F32),
        tab,
        x0,
    )
    bench(
        "row8",
        lambda acc, tab, x: tab[hashidx(acc, N // 8)].sum(-1).astype(F32),
        tab_r8,
        x0,
    )
    bench(
        "row8_1",
        lambda acc, tab, x: tab[hashidx(acc, N // 8), 0].astype(F32),
        tab_r8,
        x0,
    )
    bench(
        "row128_1",
        lambda acc, tab, x: tab[hashidx(acc, N // 128), 0].astype(F32),
        tab_r128,
        x0,
    )
    bench("u8", lambda acc, tab, x: tab[hashidx(acc, N)].astype(F32), tab8, x0)
    bench(
        "pair",
        lambda acc, tab, x: tab[hashidx(acc, N)].sum(-1).astype(F32),
        tab_pair,
        x0,
    )
    # sorted indices: same count, but consecutive lanes hit consecutive addresses
    def sorted_fn(acc, tab, x):
        i0 = hashidx(acc[:1], N)  # one scalar-ish base per step
        idx = jnp.clip(i0 + jnp.arange(LANES, dtype=I32) // 8, 0, N - 1)
        return tab[idx].astype(F32)

    bench("sortidx", sorted_fn, tab, x0)

    # row gathers with an in-row SELECT (the form a [N/k, k] scene table needs):
    # is the 8-words-per-index discount real when only one word is consumed?
    def row2_sel(acc, tab, x):
        i = hashidx(acc, N)
        row = tab[i >> 1]
        return jnp.where((i & 1) == 0, row[..., 0], row[..., 1]).astype(F32)

    def row8_sel(acc, tab, x):
        i = hashidx(acc, N)
        row = tab[i >> 3]
        k = (i & 7)[..., None]
        return (row * (jnp.arange(8, dtype=I32) == k)).sum(-1).astype(F32)

    bench("row2_sel", row2_sel, tab.reshape(N // 2, 2), x0)
    bench("row8_sel", row8_sel, tab.reshape(N // 8, 8), x0)

    def onehot_fn(acc, tab, x):
        idx = hashidx(acc, 16 * 1024)
        oh = jax.nn.one_hot(idx, 16 * 1024, dtype=jnp.bfloat16)
        return (oh @ tab).astype(F32)

    bench("onehot16k", onehot_fn, tab16k, x0)


if __name__ == "__main__":
    main()
