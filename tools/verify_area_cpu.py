"""CPU-tractable equality check: apply_features_area vs per-chunk gathered path.

Uses SYNTHETIC placement lists (generate_placements' XLA:CPU compile alone needs
>68 GB — never run it on CPU) and trims the SDF registries to the two lightest
features (sphere, test pillar).  The geometry functions are shared verbatim by
both paths; what this validates is exactly what the area refactor changes: the
spiral-rank/slot priority combine, cross-chunk overhang writes, border clipping,
replace semantics, and surface-over-cave arbitration.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mega_minecraft_tpu.terrain import feature_placement as fp
from mega_minecraft_tpu.terrain import features as fm
from mega_minecraft_tpu.terrain import features_sdf as sdf
from mega_minecraft_tpu.world.blocks import Block
from mega_minecraft_tpu.world.features_data import CaveFeature, Feature
from mega_minecraft_tpu.world import biomes as bio2

I32 = np.int32


def gathered_reference(blocks, lists, pos, ncx, ncz):
    n = ncz * ncx
    nb_idx = np.zeros((n, len(fp.GATHER_OFFSETS)), np.int32)
    nb_ok = np.zeros((n, len(fp.GATHER_OFFSETS)), bool)
    for ci in range(n):
        iz, ix = divmod(ci, ncx)
        for oi, o in enumerate(fp.GATHER_OFFSETS):
            jx, jz = ix + int(o[0]), iz + int(o[1])
            if 0 <= jx < ncx and 0 <= jz < ncz:
                nb_idx[ci, oi] = jz * ncx + jx
                nb_ok[ci, oi] = True
    nbi = jnp.asarray(nb_idx)
    mask = jnp.asarray(nb_ok)[..., None]

    def nb_lists(per_chunk):
        out = {k: v[nbi] for k, v in per_chunk.items()}
        out["feature"] = jnp.where(mask, out["feature"], 0)
        return out

    surf = fp.gather_from_neighborhood_batch(
        nb_lists(lists["surface"]), bio2.MAX_GATHERED_FEATURES_PER_CHUNK
    )
    cave = fp.gather_from_neighborhood_batch(
        nb_lists(lists["cave"]), bio2.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK
    )
    hf = jnp.zeros((n, 16, 16), jnp.float32)
    return np.asarray(fm.apply_features_batch(blocks, surf, cave, pos, hf))


def make_lists(B, surf_entries, cave_entries):
    """entries: list per chunk of (feature, x, y, z, replace[, height])."""
    surf = {k: np.zeros((B, 64), I32) for k in ("feature", "x", "y", "z", "replace")}
    cave = {k: np.zeros((B, 128), I32) for k in ("feature", "x", "y", "z", "replace", "height")}
    for b, entries in enumerate(surf_entries):
        for s, (f, x, y, z, r) in enumerate(entries):
            surf["feature"][b, s] = int(f)
            surf["x"][b, s], surf["y"][b, s], surf["z"][b, s] = x, y, z
            surf["replace"][b, s] = r
    for b, entries in enumerate(cave_entries):
        for s, (f, x, y, z, r, h) in enumerate(entries):
            cave["feature"][b, s] = int(f)
            cave["x"][b, s], cave["y"][b, s], cave["z"][b, s] = x, y, z
            cave["replace"][b, s] = r
            cave["height"][b, s] = h
    return (
        {k: jnp.asarray(v) for k, v in surf.items()},
        {k: jnp.asarray(v) for k, v in cave.items()},
    )


def main():
    print("devices:", jax.devices(), flush=True)
    # trim registries to the two lightest geometry fns (shared by both paths)
    sdf.SURFACE_FEATURE_FNS = {
        int(Feature.SPHERE): sdf.SURFACE_FEATURE_FNS[int(Feature.SPHERE)]
    }
    sdf.CAVE_FEATURE_FNS = {
        int(CaveFeature.TEST_GLOWSTONE_PILLAR):
            sdf.CAVE_FEATURE_FNS[int(CaveFeature.TEST_GLOWSTONE_PILLAR)]
    }

    ncx = ncz = 2
    B = 4
    pos = jnp.asarray(np.array([[0, 0], [16, 0], [0, 16], [16, 16]], np.int32))
    SP = Feature.SPHERE
    PIL = CaveFeature.TEST_GLOWSTONE_PILLAR
    surf_entries = [
        # chunk 0: sphere on the border corner (overhangs all 4 chunks) + a
        # second sphere in-chunk overlapping the first (slot order decides) + a
        # replace=1 sphere half-buried in the stone floor
        [(SP, 14, 150, 14, 0), (SP, 12, 150, 12, 0), (SP, 4, 144, 4, 1),
         (SP, 8, 92, 8, 0)],  # overlaps the cave pillar top (surface wins)
        # chunk 1: sphere whose volume overlaps chunk 0's first sphere across
        # the border (spiral-rank priority decides per voxel)
        [(SP, 18, 150, 14, 0)],
        # chunk 2: none (tests empty source lists)
        [],
        # chunk 3: sphere overhanging back into chunks 0-2
        [(SP, 18, 150, 18, 0)],
    ]
    cave_entries = [
        [(PIL, 8, 60, 8, 0, 30)],
        [],
        [(PIL, 24, 60, 8, 0, 25)],
        [],
    ]
    surf, cave = make_lists(B, surf_entries, cave_entries)
    lists = {"surface": surf, "cave": cave}

    blocks = np.zeros((B, 16, 16, 384), np.uint8)
    blocks[:, :, :, :146] = int(Block.STONE)
    blocks[:, :, :, 60:91] = 0  # carved cave layer
    blocks = jnp.asarray(blocks)

    ref = gathered_reference(blocks, lists, pos, ncx, ncz)
    print("gathered path done", flush=True)
    area = np.asarray(
        fm.apply_features_area(blocks, surf, cave, pos, ncx, ncz)
    )
    print("area path done", flush=True)

    base = np.asarray(blocks)
    n_feat = int((ref != base).sum())
    n_cross = 0
    # count writes outside the source chunk of the corner sphere (overhang proof)
    for b in (1, 2, 3):
        n_cross += int((ref[b] != base[b]).sum())
    diff = int((area != ref).sum())
    print(f"feature blocks={n_feat} cross-chunk={n_cross} mismatches={diff}", flush=True)
    assert n_feat > 200, "vacuous"
    assert n_cross > 10, "no cross-chunk overhang exercised"
    if diff:
        w = np.argwhere(area != ref)[:10]
        print("first mismatches:", w)
        for b, z, x, y in w[:5]:
            print(int(b), int(z), int(x), int(y), "ref", ref[b, z, x, y], "area", area[b, z, x, y])
    assert diff == 0
    print("AREA EQUALITY OK", flush=True)


if __name__ == "__main__":
    main()
