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
    from mega_minecraft_tpu.terrain import pipeline

    n = 5  # 5x5 chunk zone (BASELINE.json config 2)
    pos_h = []
    for cz in range(-1, n + 1):
        for cx in range(-1, n + 1):
            pos_h.append([cx * 16, cz * 16])
    pos_h = jnp.asarray(np.array(pos_h, np.int32))

    def run_once():
        out = pipeline.generate_area_fused(pos_h, n, n)
        # sync on a slice of the result: the whole fused program must complete to
        # produce it.  Blocks stay DEVICE-RESIDENT by design — the DDA renderer
        # consumes them in HBM (the reference's DtoH readback exists only to feed
        # its CPU mesher, terrain.cpp:156-176; we have no such host round-trip).
        return np.asarray(out["blocks"][0, 0, 0])

    run_once()  # warm (compile)
    t0 = time.time()
    reps = 8
    # chain dispatches and sync once at the end: each host sync costs a full
    # tunnel round-trip (~10-20 ms) that would otherwise dominate the measurement
    for _ in range(reps - 1):
        pipeline.generate_area_fused(pos_h, n, n)
    run_once()
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
