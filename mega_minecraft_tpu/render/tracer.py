"""Wavefront voxel path tracer: brick-skipping DDA + the reference's light transport.

TPU-native equivalent of the reference OptiX megakernel path tracer (reference
behavior: /root/reference/src/shaders/basic_shaders.cu:558-1090 — jittered pinhole
rays, ≤4 bounces with specular bounces not counting depth, per-bounce NEE shadow ray
to a sampled sun-or-moon disk with 0.05/0.02 compensation, Russian roulette after
depth 2, volumetric scatter events (exp fog, FOG_SCATTER −0.005, scattered rays
direct-light-only), water (IOR 1.33, fBm wave normals) / crystal (IOR 2.3)
reflect/refract with Schlick fresnel, GGX importance-sampled microfacets
(roughness 0.4/0.6/0.9), emissive blocks, per-pixel running-average accumulation of
color/albedo/normal AOVs keyed by frame id; TEA+LCG per-pixel RNG,
random_number_generators.h).

Design: rays are whole-image component arrays ([H, W] lanes); traversal is a
restart-parametric DDA over the merged distance-field/block volume (brickmap.py) —
every iteration all rays do the identical step: ONE i32 gather whose value is either
the hit block id or a safe Chebyshev empty-space skip, so the loop is pure VPU math
with the minimum possible gather count (per-lane gathers are the scarce resource on
TPU).  Per-block shading properties come from a single packed-word gather
(materials.BLOCK_PROPS).  RTX BVH traversal is replaced entirely; "anyhit alpha
cutout" becomes an analytic crossed-quad intersection for X-shaped flora (pure VPU
math inside the march — see trace()'s quad test).  The bounce loop is
a single ``lax.while_loop`` whose body contains one radiance DDA + one shadow DDA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashes
from ..world.blocks import Block, X_SHAPED_HI, X_SHAPED_LO
from . import sky as sky_mod
from .brickmap import EMPTY_BASE, MACRO_SCALE, SKY_R, Scene
from .materials import (
    BLOCK_PROPS,
    MAT_IOR,
    MAT_ROUGHNESS,
    MAT_SPECULAR,
    MAT_WAVY,
    TEX_DIFF_PACKED,
    TEX_EMIS_PACKED,
    TEX_NORM_PACKED,
    mat_scalar,
    unpack_diffuse_texel,
    unpack_props,
    unpack_texel,
)
from .sky import SkyParams, linearstep, smoothstep

F32 = jnp.float32
I32 = jnp.int32
U8 = jnp.uint8

# module defaults from the config tree (config.py replaces the reference's
# #defines); env-overridable before import via MMTPU_RENDER_* — and the trace
# entry points additionally take per-call overrides (``exact=``)
from ..config import load_config as _load_config  # noqa: E402

_RCFG = _load_config().render
MAX_RAY_DEPTH = _RCFG.max_ray_depth
MAX_LOOP_ITERS = MAX_RAY_DEPTH + 3  # + specular extensions
MAX_TRACE_STEPS = _RCFG.max_trace_steps
# secondary/shadow rays carry RR/albedo-attenuated weight — a straggler ray
# stepping hundreds of cells holds the whole lock-stepped frame hostage for
# contribution below perceptual relevance, so their marches are capped tighter
# (unresolved lanes report miss → sky/fog)
BOUNCE_TRACE_STEPS = _RCFG.bounce_trace_steps
SHADOW_TRACE_STEPS = _RCFG.shadow_trace_steps
#: exact-reference trace mode default (see config.RenderConfig.exact_trace)
EXACT_TRACE = _RCFG.exact_trace
#: normal-map atlas perturbation (config.render.mapped_normals; off = parity)
MAPPED_NORMALS = _RCFG.mapped_normals
#: DDA steps per while_loop iteration (config.render.dda_unroll)
DDA_UNROLL = getattr(_RCFG, "dda_unroll", 1)
FOG_SCATTER = _RCFG.fog_scatter
# rays are terminated once their horizontal travel saturates the fog
# (smoothstep(220, 300) -> 1, basic_shaders.cu fogFactor); bounds the straggler
# tail that otherwise dominates the lock-stepped DDA loop
FOG_FULL_DIST = 320.0
AIR = int(Block.AIR)

from ..world.blocks import SOLID as _SOLID_NP  # noqa: E402


def _solid_tab():
    # numpy constant -> embedded as an XLA literal at trace time (never cached as a
    # traced value, which would leak tracers across jit scopes)
    return jnp.asarray(_SOLID_NP)


class TraceResult(NamedTuple):
    hit: jnp.ndarray
    t: jnp.ndarray
    block: jnp.ndarray  # u8
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray


def trace(scene: Scene, ox, oy, oz, dx, dy, dz, medium, max_steps: int = MAX_TRACE_STEPS,
          active=None, want_steps: bool = False, alpha: str = "exact", seed=None,
          use_macro: bool = True):
    """Distance-field DDA from (o, d) in world space: ONE u8 gather per step; empty
    space is skipped by the Chebyshev distance stored in the field (brickmap.py).
    medium: u8 block id the ray currently travels through (AIR / WATER / crystal).
    All args [..] arrays.

    ``active``: optional bool mask — lanes outside it never march, so the
    ``jnp.any(alive)`` loop bound is set by the worst lane that MATTERS, not by a
    stale parked ray whose result the caller would mask off anyway (done lanes in
    a bounce iteration, non-NEE lanes in a shadow trace).

    ``alpha``: cutout policy for alpha-flagged voxels (field bit 31).
      "exact" — park-and-resolve: the march parks on the voxel and a resolve
        pass between marches alpha-tests the actual texel (the reference's
        anyhit, basic_shaders.cu:1022-1068).  Used for PRIMARY rays, where
        cutout silhouettes are directly visible.
      "stochastic" — the lane passes through the voxel with probability equal
        to its tile's transparent-texel fraction (field bits 8-15, stashed by
        brickmap._encode) and otherwise hits it as opaque; zero extra gathers
        and NO outer park/resolve rounds.  Used for bounce and shadow rays:
        under a forest canopy every secondary ray crosses flagged leaf voxels,
        and exact parking there serializes the whole tile's march into dozens
        of park rounds (measured 6× frame cost on the 9×9 scene with the real
        atlases); the stochastic estimator is unbiased in expectation and its
        noise is absorbed by the same accumulation that integrates the path
        tracer's other dimensions.  Requires ``seed`` (per-lane u32); each
        (lane, voxel) decision re-hashes the seed with the voxel coords, so
        decisions decorrelate across bounces and frames without consuming the
        lane's seed stream.

    Two-level traversal: each lane carries a coarse/fine level bit.  Fine lanes
    whose directional clearance saturates its 63 cap ASCEND to the macro field
    (same encoding at 1/MACRO_SCALE³ resolution, brickmap.MACRO_SCALE), where
    every skip formula applies scaled by MACRO_SCALE — extending the skip range
    to 63·MACRO_SCALE blocks.  A coarse lane entering an occupied macro cell
    DESCENDS (level flips, t unchanged) and resolves the surface at fine
    resolution; hits only ever happen at the fine level.  Both levels gather
    from ONE concatenated flat table, so the march keeps its
    one-gather-per-step cost floor."""
    zdim, xdim, ydim = scene.dims
    MS = MACRO_SCALE
    zm, xm, ym = zdim // MS, xdim // MS, ydim // MS
    macro_off = zdim * xdim * ydim
    orig = scene.origin.astype(F32)  # world (x, y, z) of volume corner

    inv = lambda d: jnp.where(jnp.abs(d) < F32(1e-12), F32(1e12) * jnp.sign(d) + F32(1e12) * (d == 0), F32(1.0) / d)
    idx_ = inv(dx)
    idy_ = inv(dy)
    idz_ = inv(dz)

    # AABB clip
    lo = (orig[0], orig[1], orig[2])
    hi = (orig[0] + F32(xdim), orig[1] + F32(ydim), orig[2] + F32(zdim))
    tx0 = (lo[0] - ox) * idx_
    tx1 = (hi[0] - ox) * idx_
    ty0 = (lo[1] - oy) * idy_
    ty1 = (hi[1] - oy) * idy_
    tz0 = (lo[2] - oz) * idz_
    tz1 = (hi[2] - oz) * idz_
    t_in = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)), jnp.minimum(tz0, tz1)
    )
    t_out = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)), jnp.maximum(tz0, tz1)
    )
    t_start = jnp.maximum(t_in, F32(0.0)) + F32(1e-4)
    alive0 = (t_out > t_start) & (t_out > F32(0.0))
    if active is not None:
        alive0 = alive0 & active
    # fog-saturation cap: beyond FOG_FULL_DIST horizontal blocks the fog factor is 1
    # and any hit is invisible — terminating there bounds grazing-ray step counts
    horiz = jnp.sqrt(dx * dx + dz * dz)
    t_out = jnp.minimum(t_out, t_start + F32(FOG_FULL_DIST) / jnp.maximum(horiz, F32(1e-3)))

    # fine ++ macro in one flat gather table, concatenated ONCE at scene
    # build/update (Scene.flat) — an in-trace concat gets rematerialized inside
    # the DDA while_loop by XLA (measured 112 s/frame at 540p)
    flat_field = scene.flat
    med_i32 = medium.astype(I32)
    is_air_medium = med_i32 == I32(AIR)
    empty_base = I32(EMPTY_BASE)
    _tex_diff_tab = jnp.asarray(TEX_DIFF_PACKED)  # in-march alpha cutout table

    ascending = dy >= F32(0.0)
    # loop-invariant inverse speeds: a t-advance of s moves s·|component| blocks
    # along each axis, so clearance-based skips divide by the relevant speed —
    # near-axial rays ride a clearance byte much further than its raw value
    h_inf = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dz)), F32(1e-6))
    inv_h = F32(1.0) / h_inf
    inv_dy_abs = F32(1.0) / jnp.maximum(jnp.abs(dy), F32(1e-6))
    inv_maxc = F32(1.0) / jnp.maximum(h_inf, jnp.abs(dy))

    def _step(state):
        t, alive, hit, hit_block, hit_x, x_use_a, pending, coarse, lane_steps, step = state
        lane_steps = lane_steps + alive.astype(I32)
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        vx = jnp.clip(jnp.floor(px - orig[0]).astype(I32), 0, xdim - 1)
        vy = jnp.clip(jnp.floor(py - orig[1]).astype(I32), 0, ydim - 1)
        vz = jnp.clip(jnp.floor(pz - orig[2]).astype(I32), 0, zdim - 1)

        fine_idx = (vz * xdim + vx) * ydim + vy
        mac_idx = I32(macro_off) + ((vz // MS) * xm + vx // MS) * ym + vy // MS
        packed = flat_field[jnp.where(coarse, mac_idx, fine_idx)]  # the ONE gather
        val = packed & I32(0xFF)
        # fine: block id if solid; macro: 0 if the cell contains any solid
        is_solid = val < empty_base  # fine empty stores >= EMPTY_BASE
        # coarse lane on an occupied macro cell: DESCEND — flip to fine without
        # advancing; the next iteration resolves the cell's interior exactly
        descend = coarse & is_solid
        # direction-matched clearances (brickmap.py encoding): at-or-above for
        # non-descending rays; slab-2/slab-8 + skyline descent for descending rays.
        # Solid voxels store a transparent-fraction byte in bits 8-15 (their
        # clearances are all 0 by construction), so mask the reads to 0 there —
        # only a stochastically-passed-through lane ever advances FROM a solid
        # voxel, and it must take the exact cell-exit step, not a bogus skip.
        nsol = (~is_solid).astype(F32)
        up_b = ((packed >> I32(8)) & I32(0x3F)).astype(F32) * nsol
        c2_b = ((packed >> I32(14)) & I32(0x3F)).astype(F32) * nsol
        c8_b = ((packed >> I32(20)) & I32(0x3F)).astype(F32) * nsol
        sky_q = ((packed >> I32(26)) & I32(0x1F)).astype(F32) * nsol  # bit 31 = alpha flag
        is_x = (val >= I32(X_SHAPED_LO)) & (val < I32(X_SHAPED_HI))

        # cell exit param (needed by both the X-quad test and the advance);
        # coarse lanes exit their MACRO_SCALE-aligned macro cell instead
        cellx = jnp.where(coarse, vx // MS * MS, vx).astype(F32)
        celly = jnp.where(coarse, vy // MS * MS, vy).astype(F32)
        cellz = jnp.where(coarse, vz // MS * MS, vz).astype(F32)
        csz = jnp.where(coarse, F32(MS), F32(1.0))
        bx = jnp.where(dx > 0, cellx + orig[0] + csz, cellx + orig[0])
        by = jnp.where(dy > 0, celly + orig[1] + csz, celly + orig[1])
        bz = jnp.where(dz > 0, cellz + orig[2] + csz, cellz + orig[2])
        # axis-parallel rays never exit through that axis (a degenerate boundary term
        # would otherwise clamp t_exit to ~0 and stall the march)
        big = F32(3e38)
        tex = jnp.where(jnp.abs(dx) < F32(1e-12), big, (bx - ox) * idx_)
        tey = jnp.where(jnp.abs(dy) < F32(1e-12), big, (by - oy) * idy_)
        tez = jnp.where(jnp.abs(dz) < F32(1e-12), big, (bz - oz) * idz_)
        t_exit = jnp.minimum(jnp.minimum(tex, tey), tez)

        # hit rule: in air, any solid; in a dense medium, anything that is not the
        # medium itself — the first non-medium voxel (air included) is the interface.
        # Hits only ever happen at the FINE level (coarse lanes descend first).
        candidate = alive & ~coarse & jnp.where(is_air_medium, is_solid, val != med_i32)

        # X-shaped flora: intersect the two crossed diagonal quads of the voxel
        # (reference draws crossed cutout quads, chunk.cu:1901-1935; the geometric
        # quad test is pure VPU math — no extra gathers).  The ray occupies
        # [t, t_exit] inside this voxel, so a plane hit in that interval is inside.
        cx0 = vx.astype(F32) + orig[0]
        cz0 = vz.astype(F32) + orig[2]
        den_a = dx - dz
        den_b = dx + dz
        t_a = ((cx0 - cz0) + (oz - ox)) / jnp.where(jnp.abs(den_a) < F32(1e-6), F32(1.0), den_a)
        t_b = ((F32(1.0) + cx0 + cz0) - (ox + oz)) / jnp.where(jnp.abs(den_b) < F32(1e-6), F32(1.0), den_b)
        ok_a = (jnp.abs(den_a) >= F32(1e-6)) & (t_a >= t) & (t_a <= t_exit)
        ok_b = (jnp.abs(den_b) >= F32(1e-6)) & (t_b >= t) & (t_b <= t_exit)

        # ---- alpha cutout (the anyhit equivalent, basic_shaders.cu:1022-1052):
        # field bit 31 marks solids whose diffuse tile has zero-alpha texels
        # (X flora + leaf holes with the real atlas; never set for the solid
        # procedural fallback).  "exact" mode does NO texel work in the march —
        # it PARKS the lane on the voxel (pending=True, t unmoved) and the
        # resolve phase between marches does the texel gathers once per parked
        # voxel, reviving lanes whose texel was transparent.  This keeps the
        # march at its one-gather-per-step floor on every scene.  (Two rejected
        # designs, both measured: a tile-scalar lax.cond around in-march texel
        # gathers made XLA:TPU re-materialize the captured 3.4 MB atlas inside
        # the loop — a ~25× frame-time regression even with zero flagged
        # voxels; and unconditional masked-index gathers tripled the march's
        # gather count.)  "stochastic" mode never parks — see the docstring.
        flagged = candidate & (packed < I32(0))
        if alpha == "stochastic":
            pend_new = flagged & False
            t_frac = ((packed >> I32(8)) & I32(0xFF)).astype(F32) * F32(1.0 / 255.0)
            hsh = (
                vx * I32(-1640531535) ^ (vy * I32(-2048144777) + vz * I32(-1028477379))
            ) ^ seed.astype(I32)
            r_a, _ = hashes.rnd(hsh)
            # transparent roll: the lane passes through (stays alive; solid
            # voxels have zero clearances so its advance is the exact cell exit)
            opaque_roll = ~flagged | (r_a >= t_frac)
        else:
            pend_new = flagged
            opaque_roll = True

        # unflagged X flora (procedural-atlas fallback): pure geometric quads
        t_q = jnp.where(ok_a & (~ok_b | (t_a <= t_b)), t_a, t_b)
        quad_ok = ok_a | ok_b
        use_a = ok_a & (~ok_b | (t_a <= t_b))

        new_hit = candidate & ~pend_new & jnp.where(is_x, quad_ok, True) & opaque_roll
        new_x = new_hit & is_x
        hit_block = jnp.where(
            new_hit & is_solid, val.astype(U8), jnp.where(new_hit, U8(AIR), hit_block)
        )
        hit = hit | new_hit
        hit_x = hit_x | new_x
        x_use_a = jnp.where(new_x, use_a, x_use_a)
        # X hits stop ON the quad: park t there so the shading point is exact
        t = jnp.where(new_x, t_q, t)
        pending = pending | pend_new
        alive = alive & ~new_hit & ~pend_new

        # advance: at least to the current 1³ cell exit; in air additionally take
        # the largest safe skip.  Every skip keeps the ray inside voxels PROVEN
        # empty by the gathered clearances (so landings are always in empty
        # voxels and solid/X voxels are only ever entered by exact boundary
        # steps — traversal results are bit-identical for any skip policy):
        #   3-D: t-advance s moves ≤ s·max|comp| in L∞, safe while < dist
        #   up (dy ≥ 0): horizontal move s·max(|dx|,|dz|) < dxz↑, rise unlimited
        #   slab-k (dy < 0): horizontal < c_k AND drop s·|dy| ≤ k
        #   skyline (dy < 0): horizontal ≤ SKY_R AND drop ≤ 4·q − 1 (the voxel is
        #     4q−1 above every solid top within SKY_R — steep aerial descents
        #     reach terrain in a few steps instead of 8-block drops)
        skip3d = (val.astype(F32) - F32(EMPTY_BASE)) * inv_maxc  # <0 at solids
        s_up = (up_b - F32(1.0)) * inv_h
        s2 = jnp.minimum((c2_b - F32(1.0)) * inv_h, F32(2.0) * inv_dy_abs)
        s8 = jnp.minimum((c8_b - F32(1.0)) * inv_h, F32(8.0) * inv_dy_abs)
        s_sky = jnp.minimum(
            F32(SKY_R) * inv_h, (F32(4.0) * sky_q - F32(1.0)) * inv_dy_abs
        )
        skip_dir = jnp.where(ascending, s_up, jnp.maximum(jnp.maximum(s2, s8), s_sky))
        # at the macro level every skip formula holds scaled by MACRO_SCALE: a
        # clearance of c macro cells proves a fine L∞ move of MS·(c−1) blocks
        # from any position inside the current cell (see brickmap.MACRO_SCALE)
        scale = jnp.where(coarse, F32(MS), F32(1.0))
        skip = jnp.where(is_air_medium, jnp.maximum(skip3d, skip_dir), F32(0.0)) * scale
        t_next = jnp.maximum(t + jnp.maximum(skip, 0.0), t_exit)
        t_next = jnp.maximum(t_next, t) * (F32(1.0) + F32(1e-5)) + F32(1e-4)
        t = jnp.where(alive & ~descend, t_next, t)
        # ASCEND when the direction-relevant fine clearance saturates its 63 cap —
        # the macro level exists precisely to extend that cap (clearance bytes are
        # nsol-masked to 0 on solid voxels, so sat never fires there)
        sat = jnp.where(
            ascending, up_b >= F32(63.0), (c8_b >= F32(63.0)) | (sky_q >= F32(8.0))
        )
        if use_macro:  # static: use_macro=False pins single-level traversal
            coarse = (coarse & ~descend) | (alive & ~coarse & is_air_medium & sat)
        else:
            coarse = coarse & False
        alive = alive & (t < t_out)
        return t, alive, hit, hit_block, hit_x, x_use_a, pending, coarse, lane_steps, step + 1

    def body(state):
        # DDA_UNROLL > 1 amortizes per-iteration while_loop overhead (sync +
        # dispatch) over several masked steps; the cond's max_steps bound then
        # overshoots by at most UNROLL-1 masked sub-steps (all alive-gated)
        for _ in range(DDA_UNROLL):
            state = _step(state)
        return state

    def cond(state):
        alive = state[1]
        step = state[-1]
        return jnp.any(alive) & (step < max_steps)

    def resolve(state):
        """Alpha-test every parked lane (field bit 31) and either confirm the hit
        or revive the march past the voxel.  Runs BETWEEN marches, so its three
        gathers (field word + two texels) cost once per parked voxel, not per
        DDA step."""
        t, alive, hit, hit_block, hit_x, x_use_a, pending, coarse, lane_steps, step = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        vx = jnp.clip(jnp.floor(px - orig[0]).astype(I32), 0, xdim - 1)
        vy = jnp.clip(jnp.floor(py - orig[1]).astype(I32), 0, ydim - 1)
        vz = jnp.clip(jnp.floor(pz - orig[2]).astype(I32), 0, zdim - 1)
        # parked lanes are always at the fine level (only fine lanes park)
        widx = jnp.where(pending, (vz * xdim + vx) * ydim + vy, I32(0))
        packed = flat_field[widx]
        val = packed & I32(0xFF)
        is_x = (val >= I32(X_SHAPED_LO)) & (val < I32(X_SHAPED_HI))

        # cell exit (same formulas as the march)
        bx = jnp.where(dx > 0, vx.astype(F32) + orig[0] + 1, vx.astype(F32) + orig[0])
        by = jnp.where(dy > 0, vy.astype(F32) + orig[1] + 1, vy.astype(F32) + orig[1])
        bz = jnp.where(dz > 0, vz.astype(F32) + orig[2] + 1, vz.astype(F32) + orig[2])
        big = F32(3e38)
        tex = jnp.where(jnp.abs(dx) < F32(1e-12), big, (bx - ox) * idx_)
        tey = jnp.where(jnp.abs(dy) < F32(1e-12), big, (by - oy) * idy_)
        tez = jnp.where(jnp.abs(dz) < F32(1e-12), big, (bz - oz) * idz_)
        t_exit = jnp.minimum(jnp.minimum(tex, tey), tez)

        # crossed-quad geometry (X flora)
        cx0 = vx.astype(F32) + orig[0]
        cz0 = vz.astype(F32) + orig[2]
        den_a = dx - dz
        den_b = dx + dz
        t_a = ((cx0 - cz0) + (oz - ox)) / jnp.where(jnp.abs(den_a) < F32(1e-6), F32(1.0), den_a)
        t_b = ((F32(1.0) + cx0 + cz0) - (ox + oz)) / jnp.where(jnp.abs(den_b) < F32(1e-6), F32(1.0), den_b)
        ok_a = (jnp.abs(den_a) >= F32(1e-6)) & (t_a >= t) & (t_a <= t_exit)
        ok_b = (jnp.abs(den_b) >= F32(1e-6)) & (t_b >= t) & (t_b <= t_exit)

        def _texel_alpha(u, v, face_base, on):
            # variant 0: alpha-holed blocks never enable random rotation/flip
            tu = jnp.floor(jnp.clip(u - jnp.floor(u), 0.0, 0.999) * F32(16.0)).astype(I32)
            tv = jnp.floor(jnp.clip(v - jnp.floor(v), 0.0, 0.999) * F32(16.0)).astype(I32)
            idx = jnp.where(on, val * I32(3 * 8 * 256) + face_base + tv * 16 + tu, I32(0))
            texel = _tex_diff_tab[idx]
            return ((texel >> jnp.uint32(24)) & jnp.uint32(1)) > 0

        # X quads: uv on the side tile; u runs along the quad diagonal = frac x,
        # v down from the block top
        qa_u = ox + dx * t_a
        qa_v = F32(1.0) - ((oy + dy * t_a) - jnp.floor(oy + dy * t_a))
        qb_u = ox + dx * t_b
        qb_v = F32(1.0) - ((oy + dy * t_b) - jnp.floor(oy + dy * t_b))
        # full blocks (leaves): the entry-face texel
        exf = (vx.astype(F32) + (dx < 0) + orig[0] - ox) * idx_
        eyf = (vy.astype(F32) + (dy < 0) + orig[1] - oy) * idy_
        ezf = (vz.astype(F32) + (dz < 0) + orig[2] - oz) * idz_
        t_en = jnp.maximum(jnp.maximum(exf, eyf), ezf)
        on_yf = (eyf >= t_en) & (exf < t_en)
        on_xf = exf >= t_en
        face_b = jnp.where(
            on_yf, jnp.where(dy < 0, I32(1 * 8 * 256), I32(2 * 8 * 256)), I32(0)
        )
        hxf = ox + dx * t_en
        hyf = oy + dy * t_en
        hzf = oz + dz * t_en
        fu = jnp.where(on_yf, hxf, jnp.where(on_xf, hzf, hxf))
        fv = jnp.where(on_yf, hzf, F32(1.0) - (hyf - jnp.floor(hyf)))

        u1 = jnp.where(is_x, qa_u, fu)
        v1 = jnp.where(is_x, qa_v, fv)
        fb1 = jnp.where(is_x, I32(0), face_b)
        a1 = _texel_alpha(u1, v1, fb1, pending)
        a2 = _texel_alpha(qb_u, qb_v, I32(0), pending & is_x)

        ok_a &= a1
        ok_b &= a2
        t_q = jnp.where(ok_a & (~ok_b | (t_a <= t_b)), t_a, t_b)
        use_a = ok_a & (~ok_b | (t_a <= t_b))
        res_hit = pending & jnp.where(is_x, ok_a | ok_b, a1)

        hit = hit | res_hit
        hit_x = hit_x | (res_hit & is_x)
        x_use_a = jnp.where(res_hit & is_x, use_a, x_use_a)
        hit_block = jnp.where(res_hit, val.astype(U8), hit_block)
        t = jnp.where(res_hit & is_x, t_q, t)

        # transparent texel: revive past the voxel (the march's exact-exit step)
        revived = pending & ~res_hit
        t_next = jnp.maximum(t, t_exit) * (F32(1.0) + F32(1e-5)) + F32(1e-4)
        t = jnp.where(revived, t_next, t)
        alive = alive | (revived & (t < t_out))
        pending = pending & False
        return t, alive, hit, hit_block, hit_x, x_use_a, pending, coarse, lane_steps, step

    def outer_body(state):
        state = jax.lax.while_loop(cond, body, state)
        return resolve(state)

    t0 = jnp.where(alive0, t_start, F32(1e20))
    # init carries derive from alive0 so their shard_map varying-axes match the
    # loop outputs (a bare jnp.zeros literal is unvarying and fails vma checks)
    false0 = alive0 ^ alive0
    init = (
        t0,
        alive0,
        false0,
        false0.astype(U8),
        false0,
        false0,
        false0,
        false0,  # coarse: rays start at the fine level and ascend on saturation
        false0.astype(I32),
        jnp.zeros((), I32),
    )
    # nested march/resolve ("exact"): the inner while_loop marches until every
    # lane hit, died, or parked on an alpha-flagged voxel; resolve() then
    # alpha-tests the parked lanes in one go and revives the transparent ones,
    # and the outer loop re-enters the march for the survivors.  On scenes with
    # no flagged voxels the outer loop runs exactly once.  "stochastic" never
    # parks, so it is ONE plain march with no resolve pass at all (and the
    # texel atlas is never captured into the program).
    if alpha == "stochastic":
        if seed is None:
            raise ValueError("alpha='stochastic' requires a per-lane seed")
        final = jax.lax.while_loop(cond, body, init)
    else:
        final = jax.lax.while_loop(cond, outer_body, init)
    t, _, hit, hit_block, hit_x, x_use_a, _, _, lane_steps, _ = final

    # hit voxel + entry-face normal
    px = ox + dx * t
    py = oy + dy * t
    pz = oz + dz * t
    vx = jnp.floor(px - orig[0])
    vy = jnp.floor(py - orig[1])
    vz = jnp.floor(pz - orig[2])
    ex = (vx + (dx < 0) + orig[0] - ox) * idx_
    ey = (vy + (dy < 0) + orig[1] - oy) * idy_
    ez = (vz + (dz < 0) + orig[2] - oz) * idz_
    t_entry = jnp.maximum(jnp.maximum(ex, ey), ez)
    nx = jnp.where(ex >= t_entry, -jnp.sign(dx), 0.0)
    ny = jnp.where((ey >= t_entry) & (ex < t_entry), -jnp.sign(dy), 0.0)
    nz = jnp.where((ez >= t_entry) & (ex < t_entry) & (ey < t_entry), -jnp.sign(dz), 0.0)
    # X-shaped flora stopped ON their crossed quad: the march parked t at the quad
    # param; the normal is the quad plane's, oriented against the ray
    inv_s2 = F32(0.70710678)
    sd_a = jnp.sign(dx - dz)
    sd_b = jnp.sign(dx + dz)
    xq_nx = jnp.where(x_use_a, -sd_a * inv_s2, -sd_b * inv_s2)
    xq_nz = jnp.where(x_use_a, sd_a * inv_s2, -sd_b * inv_s2)
    nx = jnp.where(hit_x, xq_nx, nx)
    ny = jnp.where(hit_x, F32(0.0), ny)
    nz = jnp.where(hit_x, xq_nz, nz)
    t_hit = jnp.where(
        hit, jnp.where(hit_x, t, jnp.maximum(t_entry, F32(0.0))), F32(1e20)
    )

    # water/crystal exit into air: surface normal points out of the dense medium
    exit_iface = (medium != U8(AIR)) & (hit_block == U8(AIR)) & hit
    nx = jnp.where(exit_iface, -nx, nx)
    ny = jnp.where(exit_iface, -ny, ny)
    nz = jnp.where(exit_iface, -nz, nz)

    res = TraceResult(hit=hit, t=t_hit, block=hit_block, nx=nx, ny=ny, nz=nz)
    if want_steps:
        # per-lane DDA iteration count (profiling/diagnostics: one gather per step
        # is the traversal cost model, so this IS the per-ray cost in gathers)
        return res, lane_steps
    return res


# ---------------------------------------------------------------------------
# Sampling helpers (basic_shaders.cu:113-168, 777-800)
# ---------------------------------------------------------------------------

SQRT_ONE_THIRD = 0.57735026918962576450914878050


def _perp_dirs(nx, ny, nz):
    ax = jnp.abs(nx) < F32(SQRT_ONE_THIRD)
    ay = jnp.abs(ny) < F32(SQRT_ONE_THIRD)
    ox = jnp.where(ax, F32(1.0), F32(0.0))
    oy = jnp.where(~ax & ay, F32(1.0), F32(0.0))
    oz = jnp.where(~ax & ~ay, F32(1.0), F32(0.0))
    # p1 = normalize(cross(n, o))
    p1x = ny * oz - nz * oy
    p1y = nz * ox - nx * oz
    p1z = nx * oy - ny * ox
    inv = F32(1.0) / jnp.sqrt(jnp.maximum(p1x * p1x + p1y * p1y + p1z * p1z, 1e-12))
    p1x, p1y, p1z = p1x * inv, p1y * inv, p1z * inv
    p2x = ny * p1z - nz * p1y
    p2y = nz * p1x - nx * p1z
    p2z = nx * p1y - ny * p1x
    inv2 = F32(1.0) / jnp.sqrt(jnp.maximum(p2x * p2x + p2y * p2y + p2z * p2z, 1e-12))
    return p1x, p1y, p1z, p2x * inv2, p2y * inv2, p2z * inv2


def _cosine_hemisphere(nx, ny, nz, s1, s2):
    up = jnp.sqrt(s1)
    over = jnp.sqrt(jnp.maximum(F32(1.0) - s1, 0.0))
    around = s2 * F32(2.0 * np.pi)
    p1x, p1y, p1z, p2x, p2y, p2z = _perp_dirs(nx, ny, nz)
    ca = jnp.cos(around) * over
    sa = jnp.sin(around) * over
    return (
        up * nx + ca * p1x + sa * p2x,
        up * ny + ca * p1y + sa * p2y,
        up * nz + ca * p1z + sa * p2z,
    )


def _sample_star(params: SkyParams, is_sun, scattering, s1, s2):
    """sampleStar (basic_shaders.cu:148-168): jittered direction within the disk."""
    star = jnp.where(is_sun[..., None], params.sun_dir, params.moon_dir)
    nx, ny, nz = star[..., 0], star[..., 1], star[..., 2]
    radius = jnp.where(is_sun, F32(0.1000), F32(0.0775))
    p1x, p1y, p1z, p2x, p2y, p2z = _perp_dirs(nx, ny, nz)
    around = s2 * F32(2.0 * np.pi)
    ddx = jnp.cos(around) * p1x + jnp.sin(around) * p2x
    ddy = jnp.cos(around) * p1y + jnp.sin(around) * p2y
    ddz = jnp.cos(around) * p1z + jnp.sin(around) * p2z
    inv = F32(1.0) / jnp.sqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-12))
    rx = nx + s1 * radius * ddx * inv
    ry = ny + s1 * radius * ddy * inv
    rz = nz + s1 * radius * ddz * inv
    n = F32(1.0) / jnp.sqrt(rx * rx + ry * ry + rz * rz)
    out = (rx * n, ry * n, rz * n)
    return tuple(jnp.where(scattering, a, b) for a, b in zip((nx, ny, nz), out))


def _reflect(dx, dy, dz, nx, ny, nz):
    d = dx * nx + dy * ny + dz * nz
    return dx - 2 * d * nx, dy - 2 * d * ny, dz - 2 * d * nz


def _refract(dx, dy, dz, nx, ny, nz, eta):
    """GLSL-style refract (basic_shaders.cu:209-217); returns 0 vec on TIR."""
    nd = nx * dx + ny * dy + nz * dz
    k = F32(1.0) - eta * eta * (F32(1.0) - nd * nd)
    ok = k >= F32(0.0)
    ks = jnp.sqrt(jnp.maximum(k, 0.0))
    rx = eta * dx - (eta * nd + ks) * nx
    ry = eta * dy - (eta * nd + ks) * ny
    rz = eta * dz - (eta * nd + ks) * nz
    inv = F32(1.0) / jnp.sqrt(jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-12))
    return (
        jnp.where(ok, rx * inv, 0.0),
        jnp.where(ok, ry * inv, 0.0),
        jnp.where(ok, rz * inv, 0.0),
        ok,
    )


def _schlick(dx, dy, dz, nx, ny, nz, ior):
    cos_t = jnp.abs(dx * nx + dy * ny + dz * nz)
    r0 = (F32(1.0) - ior) / (F32(1.0) + ior)
    r0 = r0 * r0
    return r0 + (F32(1.0) - r0) * jnp.power(F32(1.0) - cos_t, F32(5.0))


def _ggx_sample(nx, ny, nz, rough, s1, s2):
    a = rough * rough
    phi = F32(2.0 * np.pi) * s1
    cos_t = jnp.sqrt((F32(1.0) - s2) / (F32(1.0) + (a * a - F32(1.0)) * s2))
    sin_t = jnp.sqrt(jnp.maximum(F32(1.0) - cos_t * cos_t, 0.0))
    p1x, p1y, p1z, p2x, p2y, p2z = _perp_dirs(nx, ny, nz)
    whx = jnp.cos(phi) * sin_t * p1x + jnp.sin(phi) * sin_t * p2x + cos_t * nx
    why = jnp.cos(phi) * sin_t * p1y + jnp.sin(phi) * sin_t * p2y + cos_t * ny
    whz = jnp.cos(phi) * sin_t * p1z + jnp.sin(phi) * sin_t * p2z + cos_t * nz
    inv = F32(1.0) / jnp.sqrt(jnp.maximum(whx * whx + why * why + whz * whz, 1e-12))
    return whx * inv, why * inv, whz * inv


def _trowbridge_reitz_d(whx, why, whz, nx, ny, nz, rough):
    cos2 = (whx * nx + why * ny + whz * nz) ** 2
    tan2 = (F32(1.0) - cos2) / jnp.maximum(cos2, 1e-12)
    cos4 = cos2 * cos2
    # (cos2Phi + sin2Phi) / rough² == 1/rough² — the reference's anisotropy collapses
    e = jnp.abs(jnp.sqrt(tan2) / (rough * rough))
    d = F32(1.0) / (F32(np.pi) * rough * rough * jnp.maximum(cos4, 1e-12) * (F32(1.0) + e) ** 2)
    return jnp.maximum(d, 0.0)


def _wave_normal(px, py, pz, nx, ny, nz, time):
    """applyWaveNoise (basic_shaders.cu:766-777): fBm-perturbed water normal."""
    ax = (px + py) * F32(0.45)
    az = pz + py
    at = time * F32(0.3)
    perlin_x = sky_mod.fbm_p(ax, az, jnp.broadcast_to(at, ax.shape), octaves=4)
    perlin_z = sky_mod.fbm_p(
        ax + F32(74159.21), az + F32(21982.43), jnp.broadcast_to(at + F32(18923.34), ax.shape), octaves=4
    )
    nx2 = nx + perlin_x * F32(0.3)
    nz2 = nz + perlin_z * F32(0.3)
    inv = F32(1.0) / jnp.sqrt(jnp.maximum(nx2 * nx2 + ny * ny + nz2 * nz2, 1e-12))
    return nx2 * inv, ny * inv, nz2 * inv


#: clamp stored first-hit distances so temporal-reprojection math stays finite in
#: f32 (sky pixels park at the cap; relative depth tests still classify them)
DEPTH_CAP = 1e6


class FrameBuffers(NamedTuple):
    color: jnp.ndarray  # [H, W, 3] running average
    albedo: jnp.ndarray
    normal: jnp.ndarray
    #: temporal-history extras (None on the legacy frame-id-weighted path):
    depth: jnp.ndarray | None = None  # [H, W] first-hit camera distance
    nsamp: jnp.ndarray | None = None  # [H, W] per-pixel history length


def init_framebuffers(height: int, width: int, temporal: bool = False) -> FrameBuffers:
    z = jnp.zeros((height, width, 3), F32)
    if not temporal:
        return FrameBuffers(color=z, albedo=z, normal=z)
    return FrameBuffers(
        color=z, albedo=z, normal=z,
        depth=jnp.full((height, width), F32(DEPTH_CAP)),
        nsamp=jnp.zeros((height, width), F32),
    )


def _rng(seed):
    return hashes.rnd(seed)


def _make_body(scene, params, depth_sink=None, exact: bool | None = None):
    """Build the per-bounce state transition (one radiance DDA + shading + NEE
    shadow DDA) over an arbitrary lane shape.  The returned ``body`` derives every
    lane-shaped constant from the state itself, so the SAME function drives both
    the spatial band renderer (_render_rows, [h, w] lanes) and the compacted
    bounce loop (render_sample_compact, [n] lanes).  ``depth_sink``: optional
    list that receives the primary-hit camera distance on a first=True call
    (the temporal-reprojection AOV).  ``exact``: exact-reference trace mode —
    uncapped bounce/shadow marches + exact alpha on all ray types (the
    reference's semantics; default from config.render.exact_trace).
    Returns (body, active_of)."""
    if exact is None:
        exact = EXACT_TRACE
    props_tab = jnp.asarray(BLOCK_PROPS)
    tex_diff_tab = jnp.asarray(TEX_DIFF_PACKED)
    tex_emis_tab = jnp.asarray(TEX_EMIS_PACKED)
    tex_norm_tab = jnp.asarray(TEX_NORM_PACKED) if MAPPED_NORMALS else None

    sun_y = params.sun_dir[1]

    def active_of(s):
        return ~s["done"] & ~s["scattered"] & (s["depth"] < MAX_RAY_DEPTH)

    def body(s, first: bool = False):
        """One bounce.  ``first=True`` (static) enables the first-hit-only logic —
        clouds+stars in the sky, AOV capture, volumetric scatter events.  Since every
        ray resolves its first hit in iteration 0, the while_loop body compiles with
        ``first=False`` and stays lean (reference gates the same logic on
        prd.needsFirstHitData, basic_shaders.cu)."""
        active = active_of(s)
        ox, oy, oz = s["pos"]
        ddx, ddy, ddz = s["dir"]
        seed = s["seed"]
        # non-first: constant False, but derived from the carry so the shard_map
        # varying axes match the loop output (a bare zeros literal is unvarying)
        needs_first = s["needs_first"] if first else s["needs_first"] & False

        # primary rays get exact alpha cutout (their silhouettes are directly
        # visible); bounce rays use the stochastic estimator (see trace()) —
        # their noise is integrated by accumulation like every other sampled
        # path dimension, and exact parking under canopies measured ~6× frame
        # cost on the forested 9×9 scene
        res = trace(
            scene, ox, oy, oz, ddx, ddy, ddz, s["medium"],
            max_steps=MAX_TRACE_STEPS if (first or exact) else BOUNCE_TRACE_STEPS,
            active=active,
            alpha="exact" if (first or exact) else "stochastic",
            seed=None if (first or exact) else seed,
        )
        if first and depth_sink is not None:
            # primary-hit camera distance (res.t is 1e20 on miss), for temporal
            # reprojection; captured outside the while_loop so no carry is added
            # (the non-depth program's HLO — and compile cache — is unchanged)
            depth_sink.append(jnp.minimum(res.t, F32(DEPTH_CAP)))
        hit = res.hit & active
        miss = ~res.hit & active

        isx = ox + ddx * res.t
        isy = oy + ddy * res.t
        isz = oz + ddz * res.t

        # ---- sky evaluations (shared by miss + fog colors) ----
        if first:
            (sky_r, sky_g, sky_b), _found = sky_mod.sky_color(
                ddx, ddy, ddz, params, origin=s["pos"], first_hit=needs_first
            )
            (fog_r, fog_g, fog_b), _ = sky_mod.sky_color(
                ddx, ddy, ddz, params, origin=s["pos"], first_hit=needs_first, include_stars=False
            )
        else:
            (sky_r, sky_g, sky_b), _found = sky_mod.sky_color(ddx, ddy, ddz, params)
            fog_r = fog_g = fog_b = s["fog_factor"] * F32(0.0)

        pr, pg, pb = s["pixel_color"]
        rr, rg, rb = s["ray_color"]
        ar, ag, ab = s["albedo"]
        nr, ng, nb = s["normal"]
        fcr, fcg, fcb = s["fog_color"]
        fog_factor = s["fog_factor"]
        scatter_factor = s["scatter_factor"]
        scattered = s["scattered"]
        scatter_pos = s["scatter_pos"]
        done = s["done"]
        medium = s["medium"]

        r_scatter, seed = _rng(seed)

        # ======== MISS (sky) — basic_shaders.cu:727-748 ========
        pr = pr + jnp.where(miss, sky_r * rr, 0.0)
        pg = pg + jnp.where(miss, sky_g * rg, 0.0)
        pb = pb + jnp.where(miss, sky_b * rb, 0.0)
        if first:
            m_first = miss & needs_first
            ar = jnp.where(m_first, sky_r, ar)
            ag = jnp.where(m_first, sky_g, ag)
            ab = jnp.where(m_first, sky_b, ab)
            nr = jnp.where(m_first, -ddx, nr)
            ng = jnp.where(m_first, -ddy, ng)
            nb = jnp.where(m_first, -ddz, nb)
            sky_time = jnp.log(jnp.maximum(F32(1.0) - r_scatter, 1e-7)) / F32(FOG_SCATTER)
            scatter_pos = tuple(
                jnp.where(m_first, o + d * sky_time, sp)
                for o, d, sp in zip((ox, oy, oz), (ddx, ddy, ddz), scatter_pos)
            )
            m_sf = smoothstep(0.0, 3.5, r_scatter)
            scattered = scattered | m_first
            scatter_factor = jnp.where(m_first, m_sf, scatter_factor)
            fcr = jnp.where(m_first, sky_r, fcr)
            fcg = jnp.where(m_first, sky_g, fcg)
            fcb = jnp.where(m_first, sky_b, fcb)
            fog_factor = jnp.where(m_first, F32(1.0) - m_sf, fog_factor)
            needs_first = needs_first & ~m_first
        done = done | miss

        # ======== HIT ========
        # single packed-property gather per lookup (materials.BLOCK_PROPS)
        blk = res.block.astype(I32)
        # water/crystal exiting into AIR keeps the medium's material
        exit_to_air = (medium != U8(AIR)) & (res.block == U8(AIR))
        eff_blk = jnp.where(exit_to_air, medium.astype(I32), blk)
        props = props_tab[eff_blk]
        col_r, col_g, col_b, mat, emis_w = unpack_props(props)
        is_spec = mat_scalar(mat, MAT_SPECULAR)
        rough = mat_scalar(mat, MAT_ROUGHNESS)
        ior = mat_scalar(mat, MAT_IOR)
        # 16×16 atlas fetch (real gamma-linearized atlases when available,
        # procedural fallback otherwise — materials.TEX_DIFF_PACKED) by per-face
        # tile with a per-voxel/face random rotation+flip VARIANT baked into the
        # table (the reference's texture sampling, chunk.cu:1950-1990 + the
        # closesthit fetch); ONE u32 gather.  face: 0=side 1=top 2=bottom.
        # The medium-exit pseudo-surface keeps the flat palette color.
        frac = lambda a: a - jnp.floor(a)
        on_y = jnp.abs(res.ny) > F32(0.5)
        on_x = jnp.abs(res.nx) > F32(0.5)
        face = jnp.where(on_y, jnp.where(res.ny > 0, I32(1), I32(2)), I32(0))
        fu = jnp.where(on_y, frac(isx), jnp.where(on_x, frac(isz), frac(isx)))
        fv = jnp.where(on_y, frac(isz), F32(1.0) - frac(isy))
        tu = jnp.clip(jnp.floor(fu * F32(16.0)).astype(I32), 0, 15)
        tv = jnp.clip(jnp.floor(fv * F32(16.0)).astype(I32), 0, 15)
        vxf = jnp.floor(isx - res.nx * 0.5)
        vyf = jnp.floor(isy - res.ny * 0.5)
        vzf = jnp.floor(isz - res.nz * 0.5)
        hface = hashes.rand1_from3(vxf + res.nx, vyf + res.ny * 2, vzf + res.nz * 3)
        variant = jnp.floor(hface * F32(8.0)).astype(I32)
        texel = tex_diff_tab[((eff_blk * 3 + face) * 8 + variant) * 256 + tv * 16 + tu]
        tr, tg, tb, _alpha, emis_w_tex = unpack_diffuse_texel(texel)
        col_r = jnp.where(exit_to_air, col_r, tr)
        col_g = jnp.where(exit_to_air, col_g, tg)
        col_b = jnp.where(exit_to_air, col_b, tb)
        horiz = jnp.sqrt(ddx * ddx + ddz * ddz) * res.t
        hit_fog_factor = smoothstep(220.0, 300.0, horiz)

        # ---- volumetric scatter event at first hit (closesthit:868-880) ----
        if first:
            scatter_chance = (F32(1.0) - jnp.exp(F32(FOG_SCATTER) * res.t)) * smoothstep(0.55, 0.35, sun_y)
            h_first = hit & needs_first
            h_scatter = h_first & (scatter_chance > r_scatter)
            ar = jnp.where(h_scatter, col_r, ar)
            ag = jnp.where(h_scatter, col_g, ag)
            ab = jnp.where(h_scatter, col_b, ab)
            nr = jnp.where(h_scatter, res.nx, nr)
            ng = jnp.where(h_scatter, res.ny, ng)
            nb = jnp.where(h_scatter, res.nz, nb)
            sc_t = jnp.log(jnp.maximum(F32(1.0) - r_scatter, 1e-7)) / F32(FOG_SCATTER)
            scatter_pos = tuple(
                jnp.where(h_scatter, o + d * sc_t, sp)
                for o, d, sp in zip((ox, oy, oz), (ddx, ddy, ddz), scatter_pos)
            )
            scattered = scattered | h_scatter
            scatter_factor = jnp.where(h_scatter, smoothstep(0.0, 3.5, F32(1.0) - r_scatter), scatter_factor)
            fcr = jnp.where(h_scatter, fog_r, fcr)
            fcg = jnp.where(h_scatter, fog_g, fcg)
            fcb = jnp.where(h_scatter, fog_b, fcb)
            fog_factor = jnp.where(h_scatter, hit_fog_factor, fog_factor)
            needs_first = needs_first & ~h_scatter
            h_shade = hit & ~h_scatter
        else:
            h_shade = hit

        # ---- specular (water/crystal) ----
        nx, ny, nz = res.nx, res.ny, res.nz
        if MAPPED_NORMALS:
            # normal-map atlas perturbation (config.render.mapped_normals; the
            # third atlas of optixRenderer.cpp:218-220 — application is an
            # extension, the reference's own is commented out).  Tangent frame
            # follows the (fu, fv) axes used for the texel fetch above; fv grows
            # downward on side faces, so B = the -v direction in world space.
            ntex = tex_norm_tab[((eff_blk * 3 + face) * 8 + variant) * 256 + tv * 16 + tu]
            tnx, tny, tnz = unpack_texel(ntex)[:3]
            tnx, tny, tnz = tnx * 2.0 - 1.0, tny * 2.0 - 1.0, tnz * 2.0 - 1.0
            # T, B per face: top/bottom (fu=x, fv=z); x-face (fu=z, fv=-y);
            # z-face (fu=x, fv=-y)
            tx = jnp.where(on_y | ~on_x, F32(1.0), F32(0.0))
            tz = jnp.where(~on_y & on_x, F32(1.0), F32(0.0))
            bx = jnp.zeros_like(tx)
            by = jnp.where(on_y, F32(0.0), F32(-1.0))
            bz = jnp.where(on_y, F32(1.0), F32(0.0))
            pnx = tx * tnx + bx * tny + nx * tnz
            pny = by * tny + ny * tnz
            pnz = tz * tnx + bz * tny + nz * tnz
            inv_n = jax.lax.rsqrt(jnp.maximum(pnx * pnx + pny * pny + pnz * pnz, 1e-12))
            blk_is_x = (res.block >= U8(X_SHAPED_LO)) & (res.block < U8(X_SHAPED_HI))
            use_map = h_shade & ~exit_to_air & ~blk_is_x
            nx = jnp.where(use_map, pnx * inv_n, nx)
            ny = jnp.where(use_map, pny * inv_n, ny)
            nz = jnp.where(use_map, pnz * inv_n, nz)
        wavy = mat_scalar(mat, MAT_WAVY) & h_shade
        # the fBm wave normal is ~2 four-octave Perlin stacks per lane; most tiles
        # contain no water at all, so gate it on a per-tile scalar branch
        wnx, wny, wnz = jax.lax.cond(
            jnp.any(wavy),
            lambda: _wave_normal(isx, isy, isz, nx, ny, nz, params.time),
            lambda: (nx, ny, nz),
        )
        nx = jnp.where(wavy, wnx, nx)
        ny = jnp.where(wavy, wny, ny)
        nz = jnp.where(wavy, wnz, nz)

        spec = h_shade & is_spec
        entering = ddx * nx + ddy * ny + ddz * nz  # dot(rayDir, nor)
        r_spec, seed = _rng(seed)

        # ENTERING (entering < 0)
        ent = entering < F32(0.0)
        refr_e = r_spec < -entering
        fres_in = _schlick(ddx, ddy, ddz, nx, ny, nz, ior)
        rfx, rfy, rfz, _ok = _refract(ddx, ddy, ddz, nx, ny, nz, F32(1.0) / jnp.maximum(ior, 1e-6))
        rlx, rly, rlz = _reflect(ddx, ddy, ddz, nx, ny, nz)
        # EXITING
        sin_tt = ior * jnp.sqrt(jnp.maximum(F32(1.0) - entering * entering, 0.0))
        refr_x = r_spec < entering / jnp.maximum(F32(1.0), sin_tt)
        rfx2, rfy2, rfz2, _ok2 = _refract(ddx, ddy, ddz, -nx, -ny, -nz, ior)
        rlx2, rly2, rlz2 = _reflect(ddx, ddy, ddz, -nx, -ny, -nz)
        fres_out = _schlick(ddx, ddy, ddz, -nx, -ny, -nz, ior)

        new_dx = jnp.where(ent, jnp.where(refr_e, rfx, rlx), jnp.where(refr_x, rfx2, rlx2))
        new_dy = jnp.where(ent, jnp.where(refr_e, rfy, rly), jnp.where(refr_x, rfy2, rly2))
        new_dz = jnp.where(ent, jnp.where(refr_e, rfz, rlz), jnp.where(refr_x, rfz2, rlz2))
        off = jnp.where(ent, jnp.where(refr_e, F32(-0.001), F32(0.001)), jnp.where(refr_x, F32(0.001), F32(-0.001)))
        spec_px = isx + nx * off
        spec_py = isy + ny * off
        spec_pz = isz + nz * off
        spec_weight = jnp.where(
            ent,
            jnp.where(refr_e, F32(1.0) - fres_in, fres_in),
            jnp.where(refr_x, F32(1.0) - fres_out, fres_out),
        ) * ior

        # medium update on refraction through the interface
        # entering refr: medium <- hit block; exiting refr: medium <- AIR
        new_medium = jnp.where(
            spec & ent & refr_e,
            res.block,
            jnp.where(spec & ~ent & refr_x, U8(AIR), medium),
        )

        # ---- microfacet / diffuse ----
        g1, seed = _rng(seed)
        g2, seed = _rng(seed)
        cdx, cdy, cdz = _cosine_hemisphere(nx, ny, nz, g1, g2)
        gx1, seed = _rng(seed)
        gx2, seed = _rng(seed)
        whx, why, whz = _ggx_sample(nx, ny, nz, jnp.maximum(rough, F32(1e-3)), gx1, gx2)
        wox, woy, woz = -ddx, -ddy, -ddz
        owh = wox * whx + woy * why + woz * whz
        mdx = 2 * owh * whx - wox
        mdy = 2 * owh * why - woy
        mdz = 2 * owh * whz - woz
        minv = F32(1.0) / jnp.sqrt(jnp.maximum(mdx * mdx + mdy * mdy + mdz * mdz, 1e-12))
        mdx, mdy, mdz = mdx * minv, mdy * minv, mdz * minv
        is_micro = rough > F32(0.0)
        d_ggx = _trowbridge_reitz_d(whx, why, whz, nx, ny, nz, jnp.maximum(rough, F32(1e-3)))
        ndl = jnp.abs(nx * mdx + ny * mdy + nz * mdz)
        ndv = jnp.abs(nx * wox + ny * woy + nz * woz)
        micro_mul = jnp.clip(d_ggx / jnp.maximum(F32(4.0) * ndl * ndv, 1e-6), 1.0, 4.0)
        dif_dx = jnp.where(is_micro, mdx, cdx)
        dif_dy = jnp.where(is_micro, mdy, cdy)
        dif_dz = jnp.where(is_micro, mdz, cdz)
        dcol_r = jnp.where(is_micro, col_r * micro_mul, col_r)
        dcol_g = jnp.where(is_micro, col_g * micro_mul, col_g)
        dcol_b = jnp.where(is_micro, col_b * micro_mul, col_b)

        # ---- emissive (per texel, basic_shaders.cu:974-993): a black diffuse
        # texel with emissive w > 0 emits emissive rgb × (first ? 1.5 : w×100).
        _ = emis_w  # block-level emission superseded by the per-texel channel
        emissive = (
            h_shade & ~spec & ~exit_to_air
            & ((texel & jnp.uint32(0xFFFFFF)) == 0) & (emis_w_tex > F32(0.0))
        )

        # unconditional emissive-rgb gather with index zeroed on non-emissive
        # lanes (a lax.cond here re-materializes the captured 3.4 MB emissive
        # table per bounce iteration — same pathology as the in-march alpha cond)
        e_idx = jnp.where(
            emissive, ((eff_blk * 3 + face) * 8 + variant) * 256 + tv * 16 + tu, I32(0)
        )
        e_r, e_g, e_b = unpack_texel(tex_emis_tab[e_idx])
        if first:
            e_strength = jnp.where(needs_first, F32(1.5), emis_w_tex * F32(100.0))
        else:
            e_strength = emis_w_tex * F32(100.0)
        ecr, ecg, ecb = e_r * e_strength, e_g * e_strength, e_b * e_strength
        pr = pr + jnp.where(emissive, rr * ecr, 0.0)
        pg = pg + jnp.where(emissive, rg * ecg, 0.0)
        pb = pb + jnp.where(emissive, rb * ecb, 0.0)
        if first:
            # the reference records the emissive color itself as the first-hit
            # albedo (closesthit emission branch) and stops first-hit capture
            em_first = emissive & needs_first
            ar = jnp.where(em_first, ecr, ar)
            ag = jnp.where(em_first, ecg, ag)
            ab = jnp.where(em_first, ecb, ab)
            nr = jnp.where(em_first, nx, nr)
            ng = jnp.where(em_first, ny, ng)
            nb = jnp.where(em_first, nz, nb)
            fcr = jnp.where(em_first, fog_r, fcr)
            fcg = jnp.where(em_first, fog_g, fcg)
            fcb = jnp.where(em_first, fog_b, fcb)
            fog_factor = jnp.where(em_first, hit_fog_factor, fog_factor)
            needs_first = needs_first & ~em_first

        # ---- ray color / position / direction updates ----
        diffuse_like = h_shade & ~spec & ~emissive
        rr = jnp.where(spec, rr * spec_weight * col_r, jnp.where(diffuse_like, rr * dcol_r, rr))
        rg = jnp.where(spec, rg * spec_weight * col_g, jnp.where(diffuse_like, rg * dcol_g, rg))
        rb = jnp.where(spec, rb * spec_weight * col_b, jnp.where(diffuse_like, rb * dcol_b, rb))

        new_px = jnp.where(spec, spec_px, jnp.where(diffuse_like, isx + nx * F32(0.001), ox))
        new_py = jnp.where(spec, spec_py, jnp.where(diffuse_like, isy + ny * F32(0.001), oy))
        new_pz = jnp.where(spec, spec_pz, jnp.where(diffuse_like, isz + nz * F32(0.001), oz))
        upd_dir = spec | diffuse_like
        new_ddx = jnp.where(spec, new_dx, jnp.where(diffuse_like, dif_dx, ddx))
        new_ddy = jnp.where(spec, new_dy, jnp.where(diffuse_like, dif_dy, ddy))
        new_ddz = jnp.where(spec, new_dz, jnp.where(diffuse_like, dif_dz, ddz))
        medium = jnp.where(spec, new_medium, medium)
        _ = upd_dir

        # first-hit AOVs for shaded hits
        if first:
            hf2 = h_shade & needs_first
            ar = jnp.where(hf2, col_r, ar)
            ag = jnp.where(hf2, col_g, ag)
            ab = jnp.where(hf2, col_b, ab)
            nr = jnp.where(hf2, nx, nr)
            ng = jnp.where(hf2, ny, ng)
            nb = jnp.where(hf2, nz, nb)
            fcr = jnp.where(hf2, fog_r, fcr)
            fcg = jnp.where(hf2, fog_g, fcg)
            fcb = jnp.where(hf2, fog_b, fcb)
            fog_factor = jnp.where(hf2, hit_fog_factor, fog_factor)
            needs_first = needs_first & ~hf2

        done = done | emissive

        # ======== NEE shadow ray (raygen:626-665) ========
        nee = (active & ~spec & ~done) | (scattered & active)
        x1, seed = _rng(seed)
        x2, seed = _rng(seed)
        r_sun, seed = _rng(seed)
        sun_chance = linearstep(-0.1, 0.1, sun_y)
        is_sun = r_sun < sun_chance
        sdx, sdy, sdz = _sample_star(params, is_sun, scattered, x1, x2)
        spx = tuple(jnp.where(scattered, sp, p) for sp, p in zip(scatter_pos, (new_px, new_py, new_pz)))
        # shadow rays always use stochastic alpha (canopy-dappled shadows are
        # a transmittance estimate; noise converges under accumulation).  Salt
        # the seed so the shadow roll decorrelates from the same voxel's
        # radiance-ray roll.
        sres = trace(
            scene, spx[0], spx[1], spx[2], sdx, sdy, sdz, jnp.full_like(s["medium"], U8(AIR)),
            max_steps=MAX_TRACE_STEPS if exact else SHADOW_TRACE_STEPS, active=nee,
            alpha="exact" if exact else "stochastic",
            seed=None if exact else seed ^ jnp.uint32(0x5BD1E995),
        )
        shadow_miss = ~sres.hit
        # doFog's getSkyColor runs with needsFirstHitData already false -> disks yes,
        # stars/clouds no
        (ssr, ssg, ssb), s_found = sky_mod.sky_color(sdx, sdy, sdz, params)
        # doFog (basic_shaders.cu:1030-1043): height attenuation for scattered sky paths
        sf = jnp.where(
            scattered & done, scatter_factor * smoothstep(256.0, 128.0, spx[1]), scatter_factor
        )
        add = nee & shadow_miss
        pr = pr + jnp.where(add, ssr * rr * sf, 0.0)
        pg = pg + jnp.where(add, ssg * rg * sf, 0.0)
        pb = pb + jnp.where(add, ssb * rb * sf, 0.0)
        found = add & s_found
        comp = jnp.where(is_sun, F32(0.05), F32(0.02))
        apply_comp = nee & found & ~done
        pr = jnp.where(apply_comp, pr * comp, jnp.where(nee & ~found, 0.0, pr))
        pg = jnp.where(apply_comp, pg * comp, jnp.where(nee & ~found, 0.0, pg))
        pb = jnp.where(apply_comp, pb * comp, jnp.where(nee & ~found, 0.0, pb))

        # ======== depth & russian roulette ========
        # specular hits on even depths don't count toward depth (raygen:621-623:
        # --depth before the loop's ++depth); RR checks the decremented value
        spec_even = spec & (s["depth"] % 2 == 0)
        depth_eff = s["depth"] - jnp.where(spec_even, 1, 0)
        depth = jnp.where(active, depth_eff + 1, s["depth"])

        rr_active = active & ~done & ~scattered & (depth_eff > 2)
        lum = F32(0.2126) * pr + F32(0.7152) * pg + F32(0.0722) * pb
        q = jnp.maximum(F32(0.05), F32(1.0) - lum)
        r_rr, seed = _rng(seed)
        killed = rr_active & (r_rr < q)
        pr = jnp.where(killed, 0.0, jnp.where(rr_active, pr / (F32(1.0) - q), pr))
        pg = jnp.where(killed, 0.0, jnp.where(rr_active, pg / (F32(1.0) - q), pg))
        pb = jnp.where(killed, 0.0, jnp.where(rr_active, pb / (F32(1.0) - q), pb))
        done = done | killed

        return dict(
            depth=depth,
            it=s["it"] + 1,
            pos=(new_px, new_py, new_pz),
            dir=(new_ddx, new_ddy, new_ddz),
            medium=medium,
            seed=seed,
            ray_color=(rr, rg, rb),
            pixel_color=(pr, pg, pb),
            albedo=(ar, ag, ab),
            normal=(nr, ng, nb),
            needs_first=needs_first,
            done=done,
            scattered=scattered,
            scatter_pos=scatter_pos,
            scatter_factor=scatter_factor,
            fog_color=(fcr, fcg, fcb),
            fog_factor=fog_factor,
        )

    return body, active_of


def _init_state(cam, height, width, frame_id, row0, full_height, col0=0, full_width=None):
    """Fresh path state for a ``height``x``width`` tile whose top-left global pixel
    is (``row0``, ``col0``).  Seeds and camera rays are keyed by GLOBAL pixel
    coordinates, so any tiling of the frame computes the same paths."""
    from .camera import pixel_rays

    if full_width is None:
        full_width = width
    ix = jnp.arange(width, dtype=I32)[None, :] + jnp.asarray(col0, I32)
    iy = jnp.arange(height, dtype=I32)[:, None] + jnp.asarray(row0, I32)
    seed = hashes.tea(iy * full_width + ix, jnp.asarray(frame_id, I32), rounds=4)
    seed = jnp.broadcast_to(seed, (height, width))

    j1, seed = _rng(seed)
    j2, seed = _rng(seed)
    dx, dy, dz = pixel_rays(
        cam, width, height, (j1, j2),
        row0=row0, full_height=full_height, col0=col0, full_width=full_width,
    )

    # all loop-state zeros/constants derive from the (row0-dependent) rays so
    # their shard_map varying-axes match the loop outputs (bare literals are
    # unvarying and fail the while_loop vma check under shard_map)
    zeros = dx * F32(0.0)
    f0 = lambda: (zeros, zeros, zeros)

    pos = (
        cam.position[0] + zeros,
        cam.position[1] + zeros,
        cam.position[2] + zeros,
    )

    return dict(
        depth=zeros.astype(I32),
        it=jnp.zeros((), I32),
        pos=pos,
        dir=(dx, dy, dz),
        medium=(zeros + F32(AIR)).astype(U8),
        seed=seed,
        ray_color=(zeros + 1.0, zeros + 1.0, zeros + 1.0),
        pixel_color=f0(),
        albedo=f0(),
        normal=f0(),
        needs_first=zeros == zeros,
        done=zeros != zeros,
        scattered=zeros != zeros,
        scatter_pos=pos,
        scatter_factor=zeros + 1.0,
        fog_color=f0(),
        fog_factor=zeros,
    )


def _render_rows(
    scene: Scene,
    cam,
    params: SkyParams,
    height: int,
    width: int,
    frame_id,
    row0,
    full_height: int,
    col0=0,
    full_width: int | None = None,
    want_depth: bool = False,
    exact: bool | None = None,
):
    """One 1-spp path-traced sample of a ``height``x``width`` tile whose top-left
    global pixel is (``row0``, ``col0``) of the full frame.

    Returns (color, albedo, normal) [height, width, 3] f32 (NOT accumulated);
    with ``want_depth`` additionally the primary-hit camera distance [height,
    width] (DEPTH_CAP where the primary ray escaped) for temporal reprojection.
    All per-pixel state (seeds, rays) is keyed by GLOBAL pixel coordinates, so the
    image is bit-identical for any tiling.
    """
    state = _init_state(cam, height, width, frame_id, row0, full_height, col0, full_width)

    _first_depth: list = []
    body, active_of = _make_body(
        scene, params, depth_sink=_first_depth if want_depth else None, exact=exact
    )

    def cond(s):
        return jnp.any(active_of(s)) & (s["it"] < MAX_LOOP_ITERS)

    # iteration 0 (first-hit logic: clouds, stars, AOVs, scatter events) runs outside
    # the loop; the loop body compiles lean
    state = body(state, first=True)
    out = jax.lax.while_loop(cond, lambda s: body(s, first=False), state)

    pr, pg, pb = out["pixel_color"]
    fcr, fcg, fcb = out["fog_color"]
    ff = out["fog_factor"]
    pr = pr + (fcr - pr) * ff
    pg = pg + (fcg - pg) * ff
    pb = pb + (fcb - pb) * ff

    color = jnp.stack([pr, pg, pb], axis=-1)
    albedo = jnp.stack(out["albedo"], axis=-1)
    normal = jnp.stack(out["normal"], axis=-1)
    if want_depth:
        return color, albedo, normal, _first_depth[0]
    return color, albedo, normal


# default row-band height for tiled rendering: small enough that a sky-dominated
# band's DDA loops exit after a handful of iterations instead of being held to the
# frame-global worst ray (the whole-frame while_loop is the lock-step analogue of the
# reference's megakernel divergence, SURVEY.md hard-part #3); large enough that each
# iteration still fills the (8, 128) VPU.  Measured on v5e at 640x360 (80x80-chunk
# scene): untiled 710 ms, 40 rows 282 ms, 8 rows 161 ms, 4 rows 153 ms, 2 rows 166 ms.
TILE_ROWS = 4


def _plain_hash_mode(fn):
    """Trace the render path with exact-arithmetic hashing OFF, always.

    Exact mode (hashes.exact_scope) exists to make TERRAIN decisions bit-exact
    vs the golden generator; the tracer's only mode-sensitive call is the
    texture-variant hash (aesthetics).  Pinning the render trace to plain mode
    makes every render program identical under either ambient mode — one
    compile and one persistent-cache entry instead of two (the round-4 exact
    feature-half program hit 44 MB / ~18 min cold XLA; render must not pay a
    mode tax like that for nothing)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with hashes.exact_scope(False):
            return fn(*args, **kwargs)

    return wrapped


@_plain_hash_mode
def render_sample(
    scene: Scene,
    cam,
    params: SkyParams,
    height: int,
    width: int,
    frame_id,
    tile_rows: int | str | None = "auto",
    tile_cols: int | str | None = "auto",
    row0=0,
    full_height: int | None = None,
    want_depth: bool = False,
    compact: bool = False,
    exact: bool | None = None,
):
    """One 1-spp path-traced sample of ``height`` rows starting at global row
    ``row0`` of a ``full_height``-row frame (defaults: the full frame).  ``row0``
    may be a traced scalar — the multi-chip path (parallel.sharding.sharded_render)
    passes each device's band offset from inside ``shard_map``.

    Returns (color, albedo, normal) [height, W, 3] f32 (NOT accumulated); with
    ``want_depth`` additionally the primary-hit distance [height, W].

    ``tile_rows`` (static): path-trace the frame in independent horizontal bands,
    sequenced by ``lax.map`` — every band runs its own bounce/DDA ``while_loop``s and
    stops as soon as ITS worst ray resolves, so total work is Σ_band(max steps in
    band) instead of H·W·(global max).  ``None`` renders the frame as one band.

    ``tile_cols`` (static): additionally split each band into column tiles (must
    divide ``width``), isolating horizontal divergence too (sky left of a mountain
    no longer waits on it).  Rays are keyed by GLOBAL pixel, so any tiling computes
    the same paths; outputs agree bit-for-bit between runs of the same tiling and
    to float tolerance (~1e-5, XLA reassociation across differently-shaped
    programs) between tilings.  ``"auto"``
    picks ~320-wide tiles for wide frames (measured on the 9x9 scene: 1080p
    5.09 -> 2.55 s/frame, 540p 1.22 -> 0.74) and no column tiling below 960 px.
    """
    if compact:
        return render_sample_compact(
            scene, cam, params, height, width, frame_id, tile_rows, tile_cols,
            want_depth=want_depth, row0=row0, full_height=full_height,
        )
    if full_height is None:
        full_height = height
    if tile_cols == "auto":
        tile_cols = None
        if width >= 512:
            for c in (96, 128, 80, 64, 320):
                if width % c == 0:
                    tile_cols = c
                    break
    if tile_rows == "auto":
        # round-5 resweep AFTER the macro DDA level landed: the macro skips cut
        # straggler step counts so hard that per-tile overhead now dominates the
        # old lock-step-divergence tradeoff — tall narrow tiles win everywhere
        # (measured, tiled 10x10 scene, v5e: 1080p (8,320) 4255 -> (40,96)
        # 2128 ms; 540p 1257 -> 708 ms; 640x360 (4,640) 894 -> (40,128) 389 ms)
        tile_rows = 40 if tile_cols else TILE_ROWS
    row0 = jnp.asarray(row0, I32)
    if tile_rows is None or tile_rows >= height:
        return _render_rows(
            scene, cam, params, height, width, frame_id, row0, full_height,
            want_depth=want_depth, exact=exact,
        )

    n_full = height // tile_rows
    rem = height - n_full * tile_rows
    # a remainder is rendered as ONE MORE full-shaped tile overlapping the previous
    # band (its first tile_rows−rem rows are recomputed and dropped): rays are keyed
    # by global pixel so the overlap is bit-identical, and the program needs no
    # second differently-shaped tile body (an extra multi-minute XLA compile)
    row_offs = [r * tile_rows for r in range(n_full)]
    if rem:
        row_offs.append(height - tile_rows)
    n_bands = len(row_offs)

    if tile_cols is not None and width % tile_cols == 0 and tile_cols < width:
        nc = width // tile_cols

        def tile(off):
            return _render_rows(
                scene, cam, params, tile_rows, tile_cols, frame_id,
                row0 + off[0], full_height, off[1], width, want_depth=want_depth,
                exact=exact,
            )

        offs = np.array(
            [(r, c * tile_cols) for r in row_offs for c in range(nc)], np.int32
        )
        outs = jax.lax.map(tile, jnp.asarray(offs))  # [n_bands*nc, tr, tc(, 3)]

        def asm(x):
            ch = x.shape[3:]  # () for depth, (3,) for color/aovs
            x = x.reshape((n_bands, nc, tile_rows, tile_cols) + ch)
            perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(ch)))
            return jnp.transpose(x, perm).reshape(
                (n_bands * tile_rows, width) + ch
            )

        outs = tuple(asm(x) for x in outs)
    else:
        def band(band_row0):
            return _render_rows(
                scene, cam, params, tile_rows, width, frame_id, band_row0,
                full_height, want_depth=want_depth, exact=exact,
            )

        offsets = row0 + jnp.asarray(np.array(row_offs, np.int32))
        outs = jax.lax.map(band, offsets)  # [n_bands, tile_rows, W(, 3)] each
        outs = tuple(
            x.reshape((n_bands * tile_rows, width) + x.shape[3:]) for x in outs
        )
    if rem:  # drop the overlap rows recomputed by the final band
        cut = n_full * tile_rows
        keep = lambda x: jnp.concatenate(
            [x[:cut], x[cut + (tile_rows - rem):]], axis=0
        )
        outs = tuple(keep(x) for x in outs)
    return outs


def _first_bounce_rows(scene, cam, params, height, width, frame_id, row0,
                       full_height, col0, full_width, want_depth, dup_row_cut,
                       row0_local, out_height, out_width):
    """Primary bounce of one tile, returning the full path state (with each lane's
    OUTPUT pixel id attached) instead of finishing the path — phase 1 of
    ``render_sample_compact``.  Rays/seeds are keyed by GLOBAL pixel (row0/col0 of
    the full frame); pix indexes the caller's [out_height, out_width] output band
    (they differ under shard_map, where each device renders one band of the full
    frame).  ``dup_row_cut``: when the band has a remainder (rendered as one more
    full-shaped tile overlapping the previous one), local rows below this cut
    inside that tile are recomputed duplicates; they are marked done with an
    out-of-range pix so the final scatter drops them."""
    state = _init_state(cam, height, width, frame_id, row0, full_height, col0, full_width)
    sink: list = []
    body, _ = _make_body(scene, params, depth_sink=sink if want_depth else None)
    st = body(state, first=True)
    ix = jnp.arange(width, dtype=I32)[None, :] + jnp.asarray(col0, I32)
    iyl = jnp.arange(height, dtype=I32)[:, None] + jnp.asarray(row0_local, I32)
    # + row0·0: derives pix from the (shard-varying) global row so its shard_map
    # varying-axes match the permuted pix the bounce loop carries back
    pix = iyl * I32(out_width) + ix + jnp.asarray(row0, I32) * I32(0)
    if dup_row_cut is not None:
        # the remainder tile is the unique one with row0_local == out_height − height
        is_rem = jnp.asarray(row0_local, I32) == I32(out_height - height)
        dup = is_rem & (iyl < I32(dup_row_cut))
        pix = jnp.where(dup, I32(out_height * out_width), pix)
        st["done"] = st["done"] | dup
        st["needs_first"] = st["needs_first"] & ~dup
    st["pix"] = pix
    if want_depth:
        return st, sink[0]
    return st


@_plain_hash_mode
def render_sample_compact(
    scene: Scene,
    cam,
    params: SkyParams,
    height: int,
    width: int,
    frame_id,
    tile_rows: int | str | None = "auto",
    tile_cols: int | str | None = "auto",
    seg_lanes: int = 8192,
    want_depth: bool = False,
    row0=0,
    full_height: int | None = None,
):
    """One 1-spp sample with RAY COMPACTION between bounces.

    Phase 1 (coherent): the primary bounce runs spatially tiled exactly like
    ``render_sample`` — same rays, same per-global-pixel seed streams — but each
    tile returns its full path state instead of finishing the path.
    Phase 2 (compacted): surviving bounce rays from ALL tiles are stably
    partitioned actives-first each iteration and re-tiled into ``seg_lanes``-wide
    segments; one ``body()`` maps over the segments, so a segment holding only
    finished rays exits its DDA ``while_loop``s immediately and the per-bounce
    cost tracks the number of SURVIVORS instead of the frame area.  The
    reference gets this for free from the GPU warp scheduler retiring finished
    threads; on TPU the repartition must be explicit (VERDICT r1 next-step #2).

    Every ray consumes the identical seed stream as in ``render_sample``, so the
    two agree to the cross-program-shape tolerance of the tiling tests (XLA
    fusion reassociation at grazing voxel boundaries — not a different
    algorithm).  ``row0``/``full_height`` (as in render_sample) render a band of
    a taller frame — under shard_map each device runs its own compacted band,
    partitioning only its local rays (no collectives).
    """
    if full_height is None:
        full_height = height
    if tile_cols == "auto":
        tile_cols = None
        if width >= 512:
            for c in (96, 128, 80, 64, 320):
                if width % c == 0:
                    tile_cols = c
                    break
    if tile_rows == "auto":
        tile_rows = 40 if tile_cols else TILE_ROWS
    if tile_rows is None or tile_rows > height:
        tile_rows = height
    if tile_cols is None or width % tile_cols != 0:
        tile_cols = width

    n_full = height // tile_rows
    rem = height - n_full * tile_rows
    row_offs = [r * tile_rows for r in range(n_full)]
    if rem:
        row_offs.append(height - tile_rows)
    nc = width // tile_cols
    offs = np.array(
        [(r, c * tile_cols) for r in row_offs for c in range(nc)], np.int32
    )
    dup_row_cut = n_full * tile_rows if rem else None

    row0 = jnp.asarray(row0, I32)

    def tile(off):
        return _first_bounce_rows(
            scene, cam, params, tile_rows, tile_cols, frame_id,
            row0 + off[0], full_height, off[1], width, want_depth, dup_row_cut,
            off[0], height, width,
        )

    outs = jax.lax.map(tile, jnp.asarray(offs))
    if want_depth:
        st, depth_tiles = outs
    else:
        st = outs

    tmap = jax.tree_util.tree_map
    npix = height * width
    pix0 = st["pix"].reshape(-1)

    def scat3(tup):
        v = jnp.stack([x.reshape(-1) for x in tup], axis=-1)
        return (
            jnp.zeros((npix, 3), F32).at[pix0].set(v, mode="drop")
            .reshape(height, width, 3)
        )

    # AOVs are finalized by the first bounce (every lane resolves its first-hit
    # data in iteration 0) — scatter them to frame layout now; only the radiance
    # state rides through the compacted bounce loop
    albedo = scat3(st.pop("albedo"))
    normal = scat3(st.pop("normal"))
    if want_depth:
        depth = (
            jnp.full((npix,), F32(DEPTH_CAP)).at[pix0]
            .set(depth_tiles.reshape(-1), mode="drop").reshape(height, width)
        )

    n_lanes = offs.shape[0] * tile_rows * tile_cols
    n_segs = -(-n_lanes // seg_lanes)
    n_pad = n_segs * seg_lanes
    padn = n_pad - n_lanes

    def flat(a):
        a = a.reshape((n_lanes,) + a.shape[3:])
        if padn:
            a = jnp.pad(a, [(0, padn)] + [(0, 0)] * (a.ndim - 1))
        return a

    st.pop("it")
    pix = flat(st.pop("pix"))
    st = tmap(flat, st)
    # per-lane iteration counter derived from varying state (see pix note above)
    st["it"] = st["depth"] * I32(0)
    # AOV keys must exist for body()'s carry structure; they are dead weight here
    st["albedo"] = (st["fog_factor"] * 0,) * 3
    st["normal"] = (st["fog_factor"] * 0,) * 3
    if padn:
        pix = pix.at[n_lanes:].set(I32(npix))
        st["done"] = st["done"].at[n_lanes:].set(True)
        st["needs_first"] = st["needs_first"].at[n_lanes:].set(False)

    body, active_of = _make_body(scene, params)

    def bounce(carry):
        it, st, pix = carry
        # stable partition: actives first — grouped by direction octant so rays
        # with similar traversal cost share segments (a sky-bound bounce ray
        # exits in a few clearance-cap skips; a terrain-crawler takes ~100 steps;
        # mixing them makes every segment pay the crawler) — finished rays packed
        # at the tail where whole segments exit after one cond evaluation.
        # Per-lane results are permutation-invariant (seeds ride with the lane).
        act = active_of(st)
        ddx, ddy, ddz = st["dir"]
        octant = (
            (ddx > 0).astype(jnp.int32)
            + 2 * (ddy > 0).astype(jnp.int32)
            + 4 * (ddz > 0).astype(jnp.int32)
        )
        order = jnp.argsort(jnp.where(act, octant, jnp.int32(8)), stable=True)
        st = tmap(lambda a: a[order], st)
        pix = pix[order]
        segs = tmap(lambda a: a.reshape((n_segs, seg_lanes)), st)
        out = jax.lax.map(lambda s: body(s, first=False), segs)
        st = tmap(lambda a: a.reshape((n_pad,) + a.shape[2:]), out)
        return it + jnp.int32(1), st, pix

    def loop_cond(carry):
        it, st, _ = carry
        return jnp.any(active_of(st)) & (it < MAX_LOOP_ITERS)

    _, st, pix = jax.lax.while_loop(loop_cond, bounce, (jnp.int32(1), st, pix))

    pr, pg, pb = st["pixel_color"]
    fcr, fcg, fcb = st["fog_color"]
    ff = st["fog_factor"]
    pr = pr + (fcr - pr) * ff
    pg = pg + (fcg - pg) * ff
    pb = pb + (fcb - pb) * ff
    col = jnp.stack([pr, pg, pb], axis=-1)
    color = (
        jnp.zeros((npix, 3), F32).at[pix].set(col, mode="drop")
        .reshape(height, width, 3)
    )
    if want_depth:
        return color, albedo, normal, depth
    return color, albedo, normal


def accumulate(fbs: FrameBuffers, color, albedo, normal, frame_id) -> FrameBuffers:
    """Running-average accumulation keyed by frame id (raygen:697-709)."""
    fid = jnp.asarray(frame_id, F32)
    mult = F32(1.0) / (fid + F32(1.0))
    return FrameBuffers(
        color=(color + fid * fbs.color) * mult,
        albedo=(albedo + fid * fbs.albedo) * mult,
        normal=(normal + fid * fbs.normal) * mult,
    )


def render_accumulate(
    fbs: FrameBuffers,
    scene: Scene,
    cam,
    params: SkyParams,
    height: int,
    width: int,
    frame_id,
    tile_rows: int | str | None = "auto",
    tile_cols: int | str | None = "auto",
    compact: bool = False,
) -> FrameBuffers:
    """One sample + accumulation as a single program — jit this (donating ``fbs``)
    so a streaming frame costs ONE dispatch instead of two (each dispatch pays a
    host round-trip on linked-TPU backends)."""
    c, a, n = render_sample(
        scene, cam, params, height, width, frame_id, tile_rows, tile_cols,
        compact=compact,
    )
    return accumulate(fbs, c, a, n, frame_id)
