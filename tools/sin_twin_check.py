"""Bit-equality check: ops/hashes._sin_cr (JAX, on the default backend) vs the
C twin compiled into tools/golden/golden_gen (`sinmap` command).

Goldens are bit-comparable only if BOTH sides round every sin-dot hash draw
identically; this pins that over the real argument ranges:
  - rand2_from3 grid-corner draws: d = dot((gx, gz, seed), basis) with seeds up
    to feature·518721 (isFeaturePos, chunk.cu:999-1008,1134) → |d| up to ~7e9,
  - generic noise-hash args (|d| up to ~1e7),
  - a dense sweep near quadrant boundaries (k·pi) where reduction errors bite.

Run from the repo root: python tools/sin_twin_check.py [n_per_class]
"""
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MMTPU_XLA_CACHE_DIR", "/tmp/mmtpu_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mega_minecraft_tpu.ops import hashes

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
rng = np.random.default_rng(7)

classes = {}
# placement-seed-range draws (the round-3/4 regression range)
mag = np.exp(rng.uniform(np.log(1e3), np.log(7e9), N)).astype(np.float32)
classes["placement"] = (mag * rng.choice([-1, 1], N)).astype(np.float32)
# generic hash args
mag = np.exp(rng.uniform(np.log(1e-3), np.log(1e7), N)).astype(np.float32)
classes["noise"] = (mag * rng.choice([-1, 1], N)).astype(np.float32)
# near-quadrant sweep: k*pi + eps for k up to 2^31
k = np.floor(np.exp(rng.uniform(0, np.log(2.0**31), N))).astype(np.float64)
eps = rng.uniform(-0.1, 0.1, N)
classes["quadrant"] = (k * np.pi + eps).astype(np.float32)
# exact grid-corner dots: gx, gz multiples of 16 in [-16k, 16k], real seeds
gx = (rng.integers(-1000, 1000, N) * 16).astype(np.float32)
gz = (rng.integers(-1000, 1000, N) * 16).astype(np.float32)
seed = (rng.integers(1, 21, N) * 518721).astype(np.float32)
d1 = gx * np.float32(127.1) + gz * np.float32(311.7) + seed * np.float32(74.7)
d2 = gx * np.float32(269.5) + gz * np.float32(183.3) + seed * np.float32(246.1)
classes["grid_dot"] = np.concatenate([d1, d2]).astype(np.float32)

gg = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "golden_gen")
sin_dev = jax.jit(hashes._sin_cr)

print("backend:", jax.default_backend(), flush=True)
worst = 0.0
for name, args in classes.items():
    with tempfile.TemporaryDirectory() as td:
        fi, fo = os.path.join(td, "in.f32"), os.path.join(td, "out.f32")
        args.tofile(fi)
        subprocess.run([gg, "sinmap", fi, fo], check=True)
        want = np.fromfile(fo, np.float32)
    got = np.asarray(sin_dev(jnp.asarray(args)))
    neq = got.view(np.uint32) != want.view(np.uint32)
    rate = neq.mean()
    worst = max(worst, rate)
    msg = f"{name:10s} n={args.size} bit-mismatch rate {rate:.2e}"
    if neq.any():
        i = np.nonzero(neq)[0][0]
        msg += f"  first: d={args[i]!r} jax={got[i]!r} c={want[i]!r}"
    print(msg, flush=True)

print("WORST", worst, "=> goldens", "BIT-COMPARABLE" if worst == 0 else "NOT bit-equal")
