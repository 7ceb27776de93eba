"""Neighbor-gather helpers: assemble halo'd arrays from per-chunk arrays.

Replaces the reference's CPU flood-fill + memcpy gathers
(/root/reference/src/terrain/chunk.cu:231-302 ``gatherHeightfield``) with pure array
reshapes — in the TPU build, chunk data lives in device-resident arrays, so a "gather"
is a transpose+slice, not a host copy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_chunk_grid(per_chunk):
    """[CZ, CX, 16, 16] per-chunk arrays ([z, x] within chunk) -> [CZ*16, CX*16]."""
    cz, cx = per_chunk.shape[0], per_chunk.shape[1]
    return jnp.transpose(per_chunk, (0, 2, 1, 3)).reshape(cz * 16, cx * 16)


def split_chunk_grid(grid, cz: int, cx: int):
    """Inverse of assemble_chunk_grid."""
    return jnp.transpose(grid.reshape(cz, 16, cx, 16), (0, 2, 1, 3))


@jax.jit
def gather_heightfield_3x3(hf_3x3):
    """[3, 3, 16, 16] neighborhood ([cz, cx, z, x]) -> [18, 18] gathered heightfield
    (center chunk + 1-block halo), matching chunk.cu:237-302."""
    full = assemble_chunk_grid(hf_3x3)  # [48, 48]
    return full[15:33, 15:33]


def gather_heightfields_batch(hf_neighborhoods):
    """[B, 3, 3, 16, 16] -> [B, 18, 18]."""
    return jax.vmap(gather_heightfield_3x3)(hf_neighborhoods)
