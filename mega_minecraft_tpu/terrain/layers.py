"""Stage 2: terrain material layers, batched over chunks.

TPU-native equivalent of the reference's layers kernel (reference behavior:
/root/reference/src/terrain/chunk.cu:306-469 ``kernGenerateLayers``): per column,
20 material layer heights — 10 forward stratified (fBm thickness × biome-material
weight), 2 backward stratified (RED_SANDSTONE, SANDSTONE), 8 eroded/loose top layers
with thickness scaled by ``(maxSlope − slope)/maxSlope``.

Design: the 24→20 biome-to-material weight contraction is a single MXU matmul over the
whole batch; the 8-neighbor max-slope stencil reads the 18×18 gathered heightfield with
static shifts (no gathers); the per-layer cumulative sums are tiny static unrolls.
Layout: layers[B, 20, 16, 16] — layers[l] is the absolute start height of material l;
material l occupies [layers[l], layers[l+1]) with layers[20] ≡ heightfield.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.noise import fbm2
from ..world import biomes as bio

F32 = jnp.float32
SQRT_2 = F32(1.41421356237309504880)


def total_material_weights(biome_weights):
    """[B, 24, 16, 16] biome weights -> [B, 20, 16, 16] material weights (MXU matmul)."""
    bmw = jnp.asarray(bio.BIOME_MATERIAL_WEIGHTS, F32)  # [24, 20]
    return jnp.einsum(
        "bczx,cm->bmzx", biome_weights, bmw, preferred_element_type=jnp.float32
    )


def max_slope(gathered_hf):
    """8-neighbor max slope from the 18×18 gathered heightfield ([B, 18, 18] [z, x])."""
    center = gathered_hf[:, 1:17, 1:17]
    slope = jnp.zeros_like(center)
    for i, (dx, dz) in enumerate(bio.DIR_VECS_2D):
        nb = gathered_hf[:, 1 + dz : 17 + dz, 1 + dx : 17 + dx]
        s = jnp.abs(nb - center)
        if i % 2 == 1:  # diagonal (chunk.cu:376)
            s = s * SQRT_2
        slope = jnp.maximum(slope, s)
    return slope


def _stratified_thickness(layer_idx: int, mat_weight, wx, wz):
    """getStratifiedMaterialThickness (chunk.cu:308-320)."""
    th = F32(float(bio.MATERIAL_THICKNESS[layer_idx]))
    amp = F32(float(bio.MATERIAL_AMPLITUDE_OR_TAN_REPOSE[layer_idx]))
    scale = F32(float(bio.MATERIAL_SCALE_OR_MAX_SLOPE[layer_idx]))
    off = F32(jnp.float32(layer_idx) * 5283.64)
    n = fbm2(wx * scale + off, wz * scale + off)
    t = jnp.maximum(F32(0.0), th + amp * n) * mat_weight
    return jnp.where(mat_weight > F32(0.0), t, F32(0.0))


@jax.jit
def generate_layers(gathered_hf, biome_weights, chunk_pos):
    """Batched stage 2.

    Args:
      gathered_hf: [B, 18, 18] f32 — heightfield with 1-block neighbor halo ([z, x]).
      biome_weights: [B, 24, 16, 16] f32.
      chunk_pos: [B, 2] int32 world-block (x, z) of chunk origins.

    Returns:
      layers [B, 20, 16, 16] f32 — absolute start height per material layer.
      (Backward-stratified slots 10..11 hold *cumulative thickness from the eroded
      base*, to be fixed up after erosion — same contract as the reference,
      chunk.cu:395-401 + 725-749.)
    """
    lx = jnp.arange(16, dtype=jnp.int32)
    wx = (chunk_pos[:, 0, None, None] + lx[None, None, :]).astype(F32)
    wz = (chunk_pos[:, 1, None, None] + lx[None, :, None]).astype(F32)
    B = wx.shape[0]
    # flatten columns to [B, 256] for full VPU lane utilization (see heightfield.py)
    wx = jnp.broadcast_to(wx, (B, 16, 16)).reshape(B, 256)
    wz = jnp.broadcast_to(wz, (B, 16, 16)).reshape(B, 256)

    tmw = total_material_weights(biome_weights).reshape(B, bio.NUM_MATERIALS, 256)
    slope = max_slope(gathered_hf).reshape(B, 256)
    max_height = gathered_hf[:, 1:17, 1:17].reshape(B, 256)

    n_fwd = bio.NUM_FORWARD_MATERIALS  # 10
    n_strat = bio.NUM_STRATIFIED_MATERIALS  # 12
    n_mat = bio.NUM_MATERIALS  # 20

    out = [None] * n_mat

    # forward stratified: starts are the running sum of thicknesses below
    height = jnp.zeros_like(max_height)
    for l in range(n_fwd):
        out[l] = height
        if l < n_fwd - 1:
            height = height + _stratified_thickness(l, tmw[:, l], wx, wz)

    # backward stratified: cumulative thickness measured downward from the eroded base
    height = jnp.zeros_like(max_height)
    for l in range(n_strat - 1, n_fwd - 1, -1):
        height = height + _stratified_thickness(l, tmw[:, l], wx, wz)
        out[l] = height

    # eroded layers: peel thicknesses down from the heightfield, slope-limited
    height = max_height
    for l in range(n_mat - 1, n_strat - 1, -1):
        th = F32(float(bio.MATERIAL_THICKNESS[l]))
        mslope = F32(float(bio.MATERIAL_SCALE_OR_MAX_SLOPE[l]))
        layer_h = jnp.maximum(F32(0.0), th * ((mslope - slope) / mslope)) * tmw[:, l]
        height = height - layer_h
        out[l] = height

    return jnp.stack(out, axis=1).reshape(B, n_mat, 16, 16)


def fix_backward_stratified(layers):
    """Post-erosion fixup (chunk.cu:725-749): convert backward-stratified cumulative
    thicknesses into absolute start heights anchored at the eroded base (layers[12])."""
    n_fwd = bio.NUM_FORWARD_MATERIALS
    n_strat = bio.NUM_STRATIFIED_MATERIALS
    eroded_start = layers[:, n_strat]
    fixed = layers
    for l in range(n_fwd, n_strat):
        fixed = fixed.at[:, l].set(eroded_start - layers[:, l])
    return fixed
