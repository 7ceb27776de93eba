"""Meshing: visible-face quad extraction (VBO-creation parity, for export/debug).

TPU-native equivalent of the reference's mesher (reference behavior:
/root/reference/src/terrain/chunk.cu:1751-2021 ``Chunk::createVBOs`` — per filled
chunk with 4 filled neighbors, emits quads for visible faces using the transparency
rules, X-shaped crossed quads with jittered position, per-face UVs from the 16×16
atlas with optional seeded random rotation/flip, and a per-vertex material class).

The DDA path tracer renders voxels directly and never needs meshes — this module
exists for tooling parity: world export (OBJ), debug rasterization, and tests.  Face
visibility is computed vectorized; vertex emission is host-side numpy (the reference's
mesher is also CPU).
"""

from __future__ import annotations

import numpy as np

from ..ops import hashes
from ..world import blocks as bl
from ..world.blocks import Block, Transparency

# 6 face directions in the reference's order (enums.hpp:43-50)
DIR_VECS = np.array(
    [[0, 0, 1], [1, 0, 0], [0, 0, -1], [-1, 0, 0], [0, 1, 0], [0, -1, 0]], np.int32
)

# quad corner offsets per direction (chunk.cu:1768-1775)
DIRECTION_VERT_POSITIONS = np.array(
    [
        [[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
        [[1, 0, 1], [1, 0, 0], [1, 1, 0], [1, 1, 1]],
        [[1, 0, 0], [0, 0, 0], [0, 1, 0], [1, 1, 0]],
        [[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0]],
        [[0, 1, 1], [1, 1, 1], [1, 1, 0], [0, 1, 0]],
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
    ],
    np.float32,
)

UV_OFFSETS = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.int32)

_X_OFF = 0.5 * np.sin(np.radians(45.0))
X_SHAPED_VERTS = np.array(
    [
        [_X_OFF, 0, _X_OFF], [-_X_OFF, 0, -_X_OFF], [-_X_OFF, 1, -_X_OFF], [_X_OFF, 1, _X_OFF],
        [-_X_OFF, 0, _X_OFF], [_X_OFF, 0, -_X_OFF], [_X_OFF, 1, -_X_OFF], [-_X_OFF, 1, _X_OFF],
    ],
    np.float32,
)


def _should_display(this_trans, this_block, nb_block):
    """Transparency rules (chunk.cu:1913-1927)."""
    nb_trans = bl.TRANSPARENCY[nb_block]
    opaque_like = (this_trans == int(Transparency.OPAQUE)) | (
        this_trans == int(Transparency.SEMI_TRANSPARENT)
    )
    disp_opaque = nb_trans != int(Transparency.OPAQUE)
    disp_transparent = (nb_block == int(Block.AIR)) | (
        nb_trans == int(Transparency.SEMI_TRANSPARENT)
    )
    return np.where(opaque_like, disp_opaque, disp_transparent)


def mesh_chunk(blocks, neighbors, world_block_pos):
    """Mesh one chunk.

    Args:
      blocks: [16, 16, 384] u8 ([z, x, y]).
      neighbors: dict {(+1,0): blocks_east, (-1,0): ..., (0,+1): south(+z), (0,-1)}
        — 4-neighbor block volumes (None = boundary face culled like a null
        neighbor, chunk.cu:1904-1907).
      world_block_pos: (wx, wz) world block coords of chunk origin.

    Returns dict with 'positions' [V, 3] f32, 'normals' [V, 3], 'uvs' [V, 2],
    'mats' [V] u8, 'indices' [I] i32.
    """
    b = np.asarray(blocks)
    wx0, wz0 = int(world_block_pos[0]), int(world_block_pos[1])

    # padded volume for neighbor lookups: [18, 18, 384]
    pad = np.zeros((18, 18, 384), np.uint8)
    pad[1:17, 1:17] = b
    nb_e = neighbors.get((1, 0))
    nb_w = neighbors.get((-1, 0))
    nb_s = neighbors.get((0, 1))
    nb_n = neighbors.get((0, -1))
    if nb_e is not None:
        pad[1:17, 17] = np.asarray(nb_e)[:, 0]
    if nb_w is not None:
        pad[1:17, 0] = np.asarray(nb_w)[:, 15]
    if nb_s is not None:
        pad[17, 1:17] = np.asarray(nb_s)[0, :]
    if nb_n is not None:
        pad[0, 1:17] = np.asarray(nb_n)[15, :]
    has_nb = {
        (1, 0): nb_e is not None, (-1, 0): nb_w is not None,
        (0, 1): nb_s is not None, (0, -1): nb_n is not None,
    }

    trans = bl.TRANSPARENCY[b]
    solid_any = b != int(Block.AIR)
    x_shaped = trans == int(Transparency.X_SHAPED)

    positions, normals, uvs, mats, indices = [], [], [], [], []

    def add_quad(base_idx):
        indices.extend([base_idx, base_idx + 1, base_idx + 2, base_idx, base_idx + 2, base_idx + 3])

    # --- X-shaped flora: two crossed quads with seeded jitter (chunk.cu:1833-1872)
    zs, xs, ys = np.nonzero(x_shaped)
    for z, x, y in zip(zs, xs, ys):
        blk = int(b[z, x, y])
        wx, wz = wx0 + int(x), wz0 + int(z)
        jx, jz = hashes.rand2_from2(np.float32(wx), np.float32(wz))
        jx = 0.4 * (float(jx) - 0.5)
        jz = 0.4 * (float(jz) - 0.5)
        base = np.array([x + 0.5 + jx, y, z + 0.5 + jz], np.float32)
        uv0 = bl.UV_TILES[blk, 0]
        i0 = len(positions)
        for i in range(8):
            positions.append(base + X_SHAPED_VERTS[i])
            n = [0.70710678, 0, -0.70710678] if i < 4 else [0.70710678, 0, 0.70710678]
            normals.append(n)
            uvs.append((uv0 + UV_OFFSETS[i % 4]) * 0.0625)
            mats.append(bl.MATERIAL[blk])
        add_quad(i0)
        add_quad(i0 + 4)

    # --- regular faces ---
    for dir_idx in range(6):
        d = DIR_VECS[dir_idx]
        dz, dx, dy = int(d[2]), int(d[0]), int(d[1])
        if dy == 0:
            nb = pad[1 + dz : 17 + dz, 1 + dx : 17 + dx, :]
            boundary_missing = np.zeros((16, 16, 384), bool)
            if dx == 1 and not has_nb[(1, 0)]:
                boundary_missing[:, 15, :] = True
            if dx == -1 and not has_nb[(-1, 0)]:
                boundary_missing[:, 0, :] = True
            if dz == 1 and not has_nb[(0, 1)]:
                boundary_missing[15, :, :] = True
            if dz == -1 and not has_nb[(0, -1)]:
                boundary_missing[0, :, :] = True
        else:
            nb = np.empty_like(b)
            if dy == 1:
                nb[:, :, :383] = b[:, :, 1:]
                nb[:, :, 383] = int(Block.AIR)
            else:
                nb[:, :, 1:] = b[:, :, :383]
                nb[:, :, 0] = int(Block.AIR)
            boundary_missing = np.zeros((16, 16, 384), bool)

        disp = _should_display(trans, b, nb) & solid_any & ~x_shaped & ~boundary_missing
        # vertical out-of-range faces always display (chunk.cu:1881 — only y in
        # [0,384) uses neighbor test; top/bottom faces at the world edge emit)
        zs, xs, ys = np.nonzero(disp)
        face = 4 if dy == 1 else (5 if dy == -1 else None)
        for z, x, y in zip(zs, xs, ys):
            blk = int(b[z, x, y])
            uv_face = 1 if dy == 1 else (2 if dy == -1 else 0)
            uv0 = bl.UV_TILES[blk, uv_face]
            rot = bl.RAND_ROT[blk, uv_face]
            flip = bl.RAND_FLIP[blk, uv_face]
            uv_start = 0
            flip_idx = -1
            if rot or flip:
                wx, wy, wz = wx0 + int(x), int(y), wz0 + int(z)
                state = hashes.seed_4(wx, wy, wz, dir_idx)
                if rot:
                    v, state = hashes.lcg_uniform(state, 0.0, 4.0)
                    uv_start = int(np.asarray(v))
                if flip:
                    v, state = hashes.lcg_uniform(state, 0.0, 4.0)
                    flip_idx = int(np.asarray(v))
            i0 = len(positions)
            for j in range(4):
                positions.append(
                    np.array([x, y, z], np.float32) + DIRECTION_VERT_POSITIONS[dir_idx, j]
                )
                normals.append(d.astype(np.float32))
                off = UV_OFFSETS[(uv_start + j) % 4].copy()
                if flip_idx != -1:
                    if flip_idx & 1:
                        off[0] = 1 - off[0]
                    if flip_idx & 2:
                        off[1] = 1 - off[1]
                uvs.append((uv0 + off) * 0.0625)
                mats.append(bl.MATERIAL[blk])
            add_quad(i0)

    return {
        "positions": np.asarray(positions, np.float32).reshape(-1, 3),
        "normals": np.asarray(normals, np.float32).reshape(-1, 3),
        "uvs": np.asarray(uvs, np.float32).reshape(-1, 2),
        "mats": np.asarray(mats, np.uint8).reshape(-1),
        "indices": np.asarray(indices, np.int32),
    }


def export_obj(mesh, path: str):
    """Write a mesh dict to a Wavefront OBJ file."""
    with open(path, "w") as f:
        for p in mesh["positions"]:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for n in mesh["normals"]:
            f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        for t in mesh["uvs"]:
            f.write(f"vt {t[0]} {t[1]}\n")
        idx = mesh["indices"].reshape(-1, 3)
        for a, b, c in idx + 1:
            f.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")
