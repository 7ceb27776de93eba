"""Driver benchmark: prints ONE JSON line with the headline metric.

Round-1 metric: full-generation-pipeline throughput (chunks/sec) over a 5×5 chunk
area, warm (compile excluded) — BASELINE.json config (2).  The reference's comparable
number: initial world generation drains ~1089 filled chunks in ~7.7 s on an RTX-class
GPU (timings.txt:15-80) ≈ 141 chunks/s; vs_baseline is measured against that.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REFERENCE_CHUNKS_PER_SEC = 1089.0 / 7.7  # timings.txt drain over filled chunks


def main():
    from mega_minecraft_tpu.terrain import caves, fill, gather, heightfield, layers

    n = 5  # 5x5 chunk zone (BASELINE.json config 2)
    pos_h = []
    for cz in range(-1, n + 1):
        for cx in range(-1, n + 1):
            pos_h.append([cx * 16, cz * 16])
    pos_h = jnp.asarray(np.array(pos_h, np.int32))

    def run_once():
        hf, w = heightfield.generate_heightfield(pos_h)
        hf_grid = np.asarray(hf).reshape(n + 2, n + 2, 16, 16)
        full = hf_grid.transpose(0, 2, 1, 3).reshape((n + 2) * 16, (n + 2) * 16)
        gathered = np.empty((n * n, 18, 18), np.float32)
        for iz in range(n):
            for ix in range(n):
                z0 = (iz + 1) * 16 - 1
                x0 = (ix + 1) * 16 - 1
                gathered[iz * n + ix] = full[z0 : z0 + 18, x0 : x0 + 18]
        w_grid = np.asarray(w).reshape(n + 2, n + 2, 24, 16, 16)
        idx = [
            (iz + 1) * (n + 2) + ix + 1 for iz in range(n) for ix in range(n)
        ]
        w_in = w[jnp.asarray(idx)]
        hf_in = hf[jnp.asarray(idx)]
        pos_in = pos_h[jnp.asarray(idx)]
        ls = layers.generate_layers(jnp.asarray(gathered), w_in, pos_in)
        ls = layers.fix_backward_stratified(ls)
        cv = caves.generate_caves(hf_in, w_in, pos_in)
        blocks = fill.fill_chunks(
            hf_in, w_in, ls, cv["starts"], cv["ends"], pos_in
        )
        return np.asarray(blocks)  # forces full sync

    run_once()  # warm (compile)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run_once()
    dt = (time.time() - t0) / reps
    chunks_per_sec = (n * n) / dt

    print(
        json.dumps(
            {
                "metric": "chunks/sec generated (full pipeline, 5x5 zone, warm)",
                "value": round(chunks_per_sec, 2),
                "unit": "chunks/s",
                "vs_baseline": round(chunks_per_sec / REFERENCE_CHUNKS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
