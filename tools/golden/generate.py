"""Generate golden .npz files from the reference-compiled golden_gen CLI.

Run from the repo root:  python tools/golden/generate.py
Rebuilds the CLI if needed, emits tests/golden/golden_{noise,chunks}.npz.

The chunk positions cover the BASELINE configs' terrain variety: the origin,
a mountainous/rocky region, an oceanic region, and a far-field chunk.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT_DIR = os.path.join(REPO, "tests", "golden")
BIN = os.path.join(HERE, "golden_gen")

# world-block chunk corners (multiples of 16); chosen to land in different
# biome-noise regimes so all 24 height formulas get weight somewhere
CHUNKS = [(0, 0), (592, -368), (-1024, 2048), (4096, 4096), (-160, -160)]

NOISE_PLANES = [
    "simplex2",
    "fbm4_2d",
    "fbm5_3d",
    "worley2_f1",
    "worley2_edge",
    "special_cave",
    "rand1from2",
    "lcg_u01",
]


def run(cmd):
    subprocess.run(cmd, check=True)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    if not os.path.exists(BIN):
        run(["sh", os.path.join(HERE, "build.sh")])

    tmp = "/tmp/golden_raw.bin"

    run([BIN, "noise", tmp])
    # golden_gen emits the 8 named planes plus triage planes (carve-formula
    # terms, see emitNoise) — only the named ones are packaged
    raw = np.fromfile(tmp, np.float32).reshape(-1, 48, 48)[: len(NOISE_PLANES)]
    np.savez_compressed(
        os.path.join(OUT_DIR, "golden_noise.npz"),
        **{name: raw[i] for i, name in enumerate(NOISE_PLANES)},
    )

    chunks = {}
    for cx, cz in CHUNKS:
        key = f"{cx}_{cz}"
        run([BIN, "heightfield", str(cx), str(cz), tmp])
        raw = np.fromfile(tmp, np.float32)
        chunks[f"hf18_{key}"] = raw[: 18 * 18].reshape(18, 18)
        chunks[f"weights_{key}"] = raw[18 * 18 :].reshape(24, 16, 16)

        run([BIN, "layers", str(cx), str(cz), tmp])
        chunks[f"layers_{key}"] = np.fromfile(tmp, np.float32).reshape(20, 16, 16)

        run([BIN, "caves", str(cx), str(cz), tmp])
        with open(tmp, "rb") as f:
            mask = np.frombuffer(f.read(256 * 384), np.uint8).reshape(16, 16, 384)
            starts = np.frombuffer(f.read(256 * 32 * 4), np.int32).reshape(16, 16, 32)
            ends = np.frombuffer(f.read(256 * 32 * 4), np.int32).reshape(16, 16, 32)
            bb = np.frombuffer(f.read(256 * 32 * 4), np.int32).reshape(16, 16, 32)
            tb = np.frombuffer(f.read(256 * 32 * 4), np.int32).reshape(16, 16, 32)
        chunks[f"cavemask_{key}"] = mask
        chunks[f"cavestarts_{key}"] = starts
        chunks[f"caveends_{key}"] = ends
        chunks[f"cavebottom_{key}"] = bb
        chunks[f"cavetop_{key}"] = tb

    np.savez_compressed(os.path.join(OUT_DIR, "golden_chunks.npz"), **chunks)

    # full block grids (BASELINE config 1 "block-grid diff"): fill -> SDF
    # features -> decorators for the center chunk of a 7x7 neighborhood
    # (skip-erosion semantics).  Positions chosen for coverage: forest+decorators,
    # mountains, ocean, far-field.
    bg = {}
    for cx, cz in [(-160, -160), (592, -368), (0, 0), (4096, 4096)]:
        run([BIN, "blockgrid", str(cx), str(cz), tmp])
        raw = np.fromfile(tmp, np.uint8)
        n = 16 * 384 * 16
        bg[f"pre_{cx}_{cz}"] = raw[:n].reshape(16, 16, 384)
        bg[f"post_{cx}_{cz}"] = raw[n : 2 * n].reshape(16, 16, 384)
        bg[f"counts_{cx}_{cz}"] = np.frombuffer(raw[2 * n :].tobytes(), np.int32)
    np.savez_compressed(os.path.join(OUT_DIR, "golden_blockgrid.npz"), **bg)

    # zone erosion (BASELINE config 3): two 24x24-chunk zones — the origin region
    # and a mountainous one (both corners multiples of 16).  Stores the
    # pre-erosion gathered grid AND the reference-eroded result, so the test can
    # isolate erosion semantics from upstream heightfield/layer epsilons.
    ero = {}
    for cx, cz in [(0, 0), (400, -560)]:
        run([BIN, "erosion", str(cx), str(cz), tmp])
        raw = np.fromfile(tmp, np.float32).reshape(2, 9, 384, 384)
        ero[f"input_{cx}_{cz}"] = raw[0]
        ero[f"eroded_{cx}_{cz}"] = raw[1]
    np.savez_compressed(os.path.join(OUT_DIR, "golden_erosion.npz"), **ero)
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    sys.exit(main())
