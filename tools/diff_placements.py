"""Diff our feature placements against the reference's per-chunk lists.

Prereq:  tools/golden/golden_gen placements CX CZ /tmp/ref_placements_CX_CZ.bin
Run:     JAX_PLATFORMS=cpu python tools/diff_placements.py [cx cz]

Record formats (golden_gen.cpp `placements` command): per chunk (row-major
j, i over the 7x7), i32 n_surface + n_surface * i32[5] {feature, x, y, z,
canReplace}; i32 n_cave + n_cave * i32[6] {feature, x, y, z, layerHeight,
canReplace}.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# run on the DEFAULT backend (the TPU): the exact-sin hash is only bit-equal
# to golden_gen's C twin on TPU (XLA:CPU contracts the double-single ops
# differently — measured ~100% of draws 1 ulp off), so a CPU run reports
# spurious placement diffs.  MMTPU_TEST_PLATFORM=cpu still forces CPU.
if os.environ.get("MMTPU_TEST_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MMTPU_TEST_PLATFORM"])
os.environ.setdefault("MMTPU_EXACT_SIN", "1")

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MMTPU_XLA_CACHE_DIR", "/tmp/mmtpu_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def read_ref(path):
    raw = np.fromfile(path, np.int32)
    off = 0
    chunks = []
    for _ in range(49):
        ns = raw[off]; off += 1
        surf = raw[off : off + ns * 5].reshape(ns, 5); off += ns * 5
        nc = raw[off]; off += 1
        cave = raw[off : off + nc * 6].reshape(nc, 6); off += nc * 6
        chunks.append((surf, cave))
    assert off == raw.size, (off, raw.size)
    return chunks


def main():
    cx, cz = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (0, 0)
    ref = read_ref(f"/tmp/ref_placements_{cx}_{cz}.bin")

    from mega_minecraft_tpu.terrain import pipeline

    area = pipeline.generate_area(cx // 16 - 3, cz // 16 - 3, 7, 7, features=True)
    lists = area["placements"]  # {"surface": {...[B,cap]}, "cave": {...}}

    n_surf_bad = n_cave_bad = 0
    for j in range(7):
        for i in range(7):
            b = j * 7 + i
            rs, rc = ref[b]
            # ours: compacted per-chunk lists in reference order
            sf = {k: np.asarray(v[b]) for k, v in lists["surface"].items()}
            cf = {k: np.asarray(v[b]) for k, v in lists["cave"].items()}
            ns = int(sf["count"]) if "count" in sf else int((sf["feature"] > 0).sum())
            nc = int(cf["count"]) if "count" in cf else int((cf["feature"] > 0).sum())
            got_s = np.stack(
                [sf["feature"], sf["x"], sf["y"], sf["z"], sf["replace"]], -1
            )[: max(ns, len(rs))]
            got_c = np.stack(
                [cf["feature"], cf["x"], cf["y"], cf["z"], cf["height"], cf["replace"]],
                -1,
            )[: max(nc, len(rc))]
            s_ok = ns == len(rs) and np.array_equal(got_s[: len(rs)], rs)
            c_ok = nc == len(rc) and np.array_equal(got_c[: len(rc)], rc)
            if not s_ok:
                n_surf_bad += 1
                if n_surf_bad <= 3:
                    print(f"chunk[{j}][{i}] surface: ref n={len(rs)} got n={ns}")
                    lim = min(len(rs), len(got_s))
                    neq = (got_s[:lim] != rs[:lim]).any(-1)
                    k = np.where(neq)[0][:6]
                    for q in k:
                        print(f"   [{q}] ref={rs[q]} got={got_s[q]}")
                    if len(rs) != ns and len(rs) > lim:
                        print(f"   ref extra: {rs[lim:lim+4]}")
            if not c_ok:
                n_cave_bad += 1
                if n_cave_bad <= 3:
                    print(f"chunk[{j}][{i}] cave: ref n={len(rc)} got n={nc}")
                    lim = min(len(rc), len(got_c))
                    neq = (got_c[:lim] != rc[:lim]).any(-1)
                    k = np.where(neq)[0][:6]
                    for q in k:
                        print(f"   [{q}] ref={rc[q]} got={got_c[q]}")
                    if len(rc) != nc:
                        a, g = len(rc), nc
                        print(f"   count mismatch ref={a} got={g}")
    print(f"chunks with surface mismatch: {n_surf_bad}/49, cave mismatch: {n_cave_bad}/49")


if __name__ == "__main__":
    main()
