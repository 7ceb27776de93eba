"""Feature SDF library: the per-block geometry tests for all feature types.

TPU-native equivalent of the reference's device feature builders (reference behavior:
/root/reference/src/terrain/featurePlacement.hpp:15-144 SDF/spline primitives,
147-1107 ``placeFeature`` — 20 surface features, 1110-1380 ``placeCaveFeature`` —
9 cave features).

Design: the reference re-seeds its per-feature RNG from the placement position for
every (block, feature) evaluation, so the draw sequence is identical for all blocks of
one placement — here the first 64 u01 draws are precomputed per placement
("the stream"), and each feature test is pure vectorized geometry over the block
volume using scalar stream values.  Per-block randomness (leaf variants, glow
chances) uses the threaded blockRng state exactly like the reference.

Each test function signature:
    fn(stream[64] f32, fx, fy, fz (int block - placement offsets, arrays),
       wx, wy, wz (world block coords, arrays), brng (blockRng u32 state array),
       extra dict) -> (hit bool array, block u8 array, new_brng)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops import hashes
from ..ops.noise import fbm2, simplex2, simplex3, smoothstep, worley2
from ..world import biomes as bio
from ..world.blocks import Block
from ..world.features_data import CaveFeature, Feature

F32 = jnp.float32
I32 = jnp.int32
U8 = jnp.uint8

PI = math.pi
TWO_PI = 2 * math.pi
PI_OVER_TWO = math.pi / 2

_B = Block
SEA_LEVEL = bio.SEA_LEVEL


def _u8(b):
    return U8(int(b))


def _f(x):
    return jnp.asarray(x, F32)


def _no_hit(fx, brng):
    z = jnp.zeros(jnp.shape(fx), bool)
    return z, jnp.zeros(jnp.shape(fx), U8), brng


def _sel(hit, block_val, base_block):
    return jnp.where(hit, block_val, base_block)


def _length2(x, z):
    # sqrt_cr: TPU sqrt is ~57% correctly rounded (v5e); 1-ulp length drift
    # moved whole SDF shells vs the golden (the round-4 purple-mushroom diff)
    return hashes.sqrt_cr(x * x + z * z)


def _length3(x, y, z):
    return hashes.sqrt_cr(x * x + y * y + z * z)


def _in_range(v, lo, hi):
    return (v >= lo) & (v <= hi)


def _line_params(px, py, pz, ax, ay, az, bx, by, bz):
    """calculateLineParams (rng.hpp:52-63): returns (ratio, dist, in01)."""
    vx, vy, vz = bx - ax, by - ay, bz - az
    wx_, wy_, wz_ = px - ax, py - ay, pz - az
    denom = vx * vx + vy * vy + vz * vz
    ratio = hashes.div_cr(wx_ * vx + wy_ * vy + wz_ * vz, jnp.where(denom == 0, F32(1e-9), denom))
    lx, ly, lz = vx * ratio, vy * ratio, vz * ratio
    dist = _length3(wx_ - lx, wy_ - ly, wz_ - lz)
    return ratio, dist, (ratio >= 0.0) & (ratio <= 1.0)


def _in_rasterized_line(fx, fy, fz, ax, ay, az, bx, by, bz):
    """isInRasterizedLine (featurePlacement.hpp:68-74)."""
    px, py, pz = _f(fx) + 0.5, _f(fy) + 0.5, _f(fz) + 0.5
    ratio, dist, in01 = _line_params(px, py, pz, ax, ay, az, bx, by, bz)
    mx = ax + (bx - ax) * ratio
    my = ay + (by - ay) * ratio
    mz = az + (bz - az) * ratio
    same_cell = (
        (fx == jnp.floor(mx).astype(I32))
        & (fy == jnp.floor(my).astype(I32))
        & (fz == jnp.floor(mz).astype(I32))
    )
    return in01 & (dist < 2.0) & same_cell


def _jungle_leaves(px, py, pz, max_h, min_r, max_r, rand):
    """jungleLeaves (featurePlacement.hpp:80-90)."""
    mult = F32(0.8) + F32(0.4) * rand
    ratio = py / max_h
    radius = (max_r + (min_r - max_r) * ratio) * mult
    return _in_range(py, F32(0.0), max_h) & (_length2(px, pz) < radius)


def _de_casteljau(ctrl, spline_size: int):
    """deCasteljau over scalar control points list [(x,y,z), ...] -> spline list."""
    n = len(ctrl)
    out = []
    for i in range(spline_size):
        t = i / (spline_size - 1)
        pts = list(ctrl)
        m = n
        while m > 1:
            pts = [
                tuple(a + (b - a) * t for a, b in zip(pts[j], pts[j + 1]))
                for j in range(m - 1)
            ]
            m -= 1
        out.append(pts[0])
    return out


def _crystal_radius(ratio):
    cone_start = F32(0.8)
    cone_n = F32(1.0 / (1.0 - 0.8))
    return jnp.where(
        ratio < cone_start, F32(0.8) + F32(0.25) * ratio, cone_n * (F32(1.0) - ratio)
    )


def _in_crystal(px, py, pz, ax, ay, az, bx, by, bz, radius_mult):
    """isInCrystal (featurePlacement.hpp:107-125): 6-sided prism along a line."""
    ratio, dist, in01 = _line_params(px, py, pz, ax, ay, az, bx, by, bz)
    radius = _crystal_radius(jnp.clip(ratio, 0.0, 1.0)) * radius_mult
    lx, ly, lz = bx - ax, by - ay, bz - az
    qx = px - (ax + ratio * lx)
    qy = py - (ay + ratio * ly)
    qz = pz - (az + ratio * lz)
    qlen = _length3(qx, qy, qz)
    # axis = normalize(cross(line, (1,0,0)))
    cx_, cy_, cz_ = F32(0.0) * qx + 0.0, lz + 0.0 * qx, -ly + 0.0 * qx
    cl = jnp.sqrt(cy_ * cy_ + cz_ * cz_)
    cl = jnp.where(cl == 0, F32(1e-9), cl)
    dot = (qy * cy_ + qz * cz_) / (jnp.where(qlen == 0, F32(1e-9), qlen) * cl)
    ang = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    pos_angle = jnp.where(qlen == 0, F32(0.0), ang + F32(TWO_PI))
    p = F32(PI / 6.0)
    radius = radius * jnp.cos(p) / jnp.cos(p - jnp.mod(pos_angle, F32(2.0) * p))
    return in01 & (dist < radius)


def _random_crystal_block(rand):
    cr = rand * F32(3.0)
    return jnp.where(
        cr < 1.0,
        _u8(_B.MAGENTA_CRYSTAL),
        jnp.where(cr < 2.0, _u8(_B.CYAN_CRYSTAL), _u8(_B.GREEN_CRYSTAL)),
    )


def _brng_draw(brng, mask):
    """Advance blockRng where mask; returns (u01 value, new state)."""
    nxt = hashes.lcg_next(brng)
    v = (nxt - jnp.uint32(1)).astype(F32) / F32(2147483645.0)
    return v, jnp.where(mask, nxt, brng)


# ---------------------------------------------------------------------------
# Surface features (placeFeature, featurePlacement.hpp:147-1107)
# ---------------------------------------------------------------------------


def _feat_sphere(s, fx, fy, fz, wx, wy, wz, brng, extra):
    dx, dy, dz = _f(fx), _f(fy), _f(fz)
    hit = dx * dx + dy * dy + dz * dz <= F32(25.0)
    return hit, jnp.where(hit, _u8(_B.GRAVEL), U8(0)), brng


def _feat_coral(s, fx, fy, fz, wx, wy, wz, brng, extra):
    fpy = extra["fy_pos"]
    px, py, pz = _f(fx), _f(fy), _f(fz)
    in_reef = (fpy <= SEA_LEVEL - 6) & (_length2(px, pz) <= F32(8.0))
    coral_rand = jnp.floor(s[0] * F32(5.0)).astype(I32)

    # brain (case 0)
    r_brain = F32(2.8) + F32(1.4) * s[1] + F32(0.4) * simplex3(
        _f(wx) * 0.2, _f(wy) * 0.2, _f(wz) * 0.2
    )
    hit_brain = _length3(px, py * F32(1.15), pz) < r_brain
    # bubble (case 1)
    r_bub = F32(2.2) + F32(1.7) * s[1] + F32(1.2) * simplex3(
        _f(wx) * 0.3, _f(wy) * 0.3, _f(wz) * 0.3
    )
    hit_bub = _length3(px, py * F32(1.25), pz) < r_bub
    # fire/horn (cases 2, 3): rasterized branch lines
    # draw order z,y,x (g++ right-to-left vec3 ctor, featurePlacement.hpp:224)
    p1z = (s[1] * 2 - 1) * F32(2.5)
    p1y = s[2] * F32(3.5)
    p1x = (s[3] * 2 - 1) * F32(2.5)
    hit_line = _in_rasterized_line(fx, fy, fz, F32(0.0), F32(0.0), F32(0.0), p1x, p1y, p1z)
    k = 4
    for _ in range(5):
        p2x = p1x + F32(4.0) * (s[k] * 2 - 1)
        p2y = p1y + F32(2.0) + F32(3.0) * s[k + 1]
        p2z = p1z + F32(4.0) * (s[k + 2] * 2 - 1)
        hit_line = hit_line | _in_rasterized_line(fx, fy, fz, p1x, p1y, p1z, p2x, p2y, p2z)
        k += 3
    # tube (case 4)
    w = worley2(_f(wx) * 0.7, _f(wz) * 0.7, want_edge=True)
    h_tube = ((F32(1.0) - w["f1"]) + w["edge"]) * F32(3.5)
    h_tube = h_tube * smoothstep(3.7, 2.5, _length2(px, pz)) - F32(2.0)
    hit_tube = _in_range(py, F32(-1.0), h_tube)

    hit = jnp.where(
        coral_rand == 0, hit_brain,
        jnp.where(coral_rand == 1, hit_bub,
        jnp.where(coral_rand <= 3, hit_line, hit_tube)),
    ) & in_reef
    block = jnp.where(
        coral_rand == 0, _u8(_B.BRAIN_CORAL_BLOCK),
        jnp.where(coral_rand == 1, _u8(_B.BUBBLE_CORAL_BLOCK),
        jnp.where(coral_rand == 2, _u8(_B.FIRE_CORAL_BLOCK),
        jnp.where(coral_rand == 3, _u8(_B.HORN_CORAL_BLOCK), _u8(_B.TUBE_CORAL_BLOCK)))),
    )
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_kelp(s, fx, fy, fz, wx, wy, wz, brng, extra):
    fpy = extra["fy_pos"]
    height = jnp.floor(F32(5.0) + F32(15.0) * s[0]).astype(I32)
    height = jnp.minimum(height, I32(SEA_LEVEL) - fpy - I32(1))
    on_column = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)
    is_end = fy == height
    block = jnp.where(is_end, _u8(_B.KELP_END), _u8(_B.KELP_MAIN))
    return on_column, jnp.where(on_column, block, U8(0)), brng


def _feat_iceberg(s, fx, fy, fz, wx, wy, wz, brng, extra):
    fpy = extra["fy_pos"]
    px, pz = _f(fx), _f(fz)
    py = _f(wy) - F32(SEA_LEVEL)
    ok_pos = fpy <= SEA_LEVEL - 32
    hd = _length2(px, pz)
    radius = F32(20.0) + F32(12.0) * s[0]
    center_ratio = F32(1.0) - hd / radius
    nx = _f(wx) * F32(0.0450)
    nz = _f(wz) * F32(0.0450)
    fb = fbm2(nx, nz, octaves=3)
    start_h = F32(-6.0) - F32(34.0) * center_ratio + F32(14.0) * fb
    end_h = F32(-4.0) + F32(20.0) * center_ratio + F32(8.0) * fb
    hit = (
        ok_pos
        & (center_ratio <= F32(1.15))
        & (end_h >= start_h)
        & _in_range(py, start_h, end_h)
    )
    packed_h = F32(-2.2) + F32(5.6) * center_ratio + F32(1.2) * simplex2(nx * 0.8, nz * 0.8)
    block = jnp.where(
        py < F32(-4.0),
        _u8(_B.BLUE_ICE),
        jnp.where(py > end_h - packed_h, _u8(_B.PACKED_ICE), _u8(_B.BLUE_ICE)),
    )
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_acacia(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    in_bounds = jnp.maximum(jnp.abs(fx), jnp.abs(fz)) <= 15
    trunk_h = jnp.floor(F32(4.5) + F32(1.5) * s[0]).astype(I32)
    trunk = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), trunk_h)

    angle = s[1] * F32(TWO_PI)
    bsy = trunk_h.astype(F32)
    bex = jnp.cos(angle) * (F32(2.0) + F32(1.5) * s[2])
    bez = jnp.sin(angle) * (F32(2.0) + F32(1.5) * s[2])
    bey = bsy + F32(2.5) + F32(1.5) * s[3]
    branch1 = _in_rasterized_line(
        fx, fy, fz,
        jnp.floor(F32(0.0)), jnp.floor(bsy), jnp.floor(F32(0.0)),
        jnp.ceil(bex), jnp.ceil(bey), jnp.ceil(bez),
    )
    l1 = _jungle_leaves(px - bex, py - bey + F32(0.5), pz - bez, F32(2.0), F32(2.0), F32(4.0), F32(0.5) + F32(0.5) * s[4])

    second = s[5] < F32(0.5)
    angle2 = angle + F32(PI_OVER_TWO) + s[6] * F32(PI)
    bs2y = trunk_h.astype(F32) - F32(0.8) - F32(0.8) * s[7]
    be2x = jnp.cos(angle2) * (F32(1.5) + F32(1.0) * s[8])
    be2z = jnp.sin(angle2) * (F32(1.5) + F32(1.0) * s[8])
    be2y = bs2y + F32(2.0) + F32(1.0) * s[9]
    branch2 = second & _in_rasterized_line(
        fx, fy, fz,
        jnp.floor(F32(0.0)), jnp.floor(bs2y), jnp.floor(F32(0.0)),
        jnp.ceil(be2x), jnp.ceil(be2y), jnp.ceil(be2z),
    )
    l2 = second & _jungle_leaves(
        px - be2x, py - be2y + F32(0.5), pz - be2z, F32(2.001), F32(1.5), F32(3.5), F32(0.5) + F32(0.5) * s[10]
    )

    wood = (trunk | branch1 | branch2) & in_bounds
    leaves = (l1 | l2) & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.ACACIA_WOOD), _u8(_B.ACACIA_LEAVES))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_redwood(s, fx, fy, fz, wx, wy, wz, brng, extra):
    fpos = extra["fpos"]
    scale = F32(0.6) + F32(0.3) * s[0]
    px, py, pz = _f(fx) * scale, _f(fy) * scale, _f(fz) * scale
    height = F32(27.0) + F32(13.0) * s[1]
    hd = _length2(px, pz)
    leaves_start = F32(10.0) + F32(4.0) * s[2]
    in_bounds = ~(
        (py > height + 8.0) | (hd > 12.0) | ((py < leaves_start - 4.0) & (hd > 3.0))
    )

    trunk_ratio = (py - F32(-4.0)) / (height - F32(-4.0))
    sat = (trunk_ratio >= 0) & (trunk_ratio <= 1)
    trunk_r = F32(2.0) / (trunk_ratio + F32(2.0)) + F32(0.08) / jnp.power(trunk_ratio + F32(0.4), F32(3.0))
    trunk_r = trunk_r + F32(0.3) * simplex3(_f(wx) * 0.13, _f(wy) * 0.13, _f(wz) * 0.13) * smoothstep(0.6, 0.2, trunk_ratio)
    trunk = sat & (hd < trunk_r)

    leaves_end = height + F32(1.5) + F32(1.0) * s[3]
    in_leaf_band = _in_range(py, leaves_start, leaves_end)

    cell_base = (jnp.floor(py * F32(0.5)) * 2).astype(I32)
    branch_seed = F32(593.23) * hashes.rand1_from3(_f(fpos[0]), _f(fpos[1]), _f(fpos[2]))
    leaves_seed = F32(412.39) * hashes.rand1_from1(branch_seed)
    leaves_simplex = F32(1.1) * simplex3(_f(wx) * 0.2, _f(wy) * 0.2, _f(wz) * 0.2)
    in_leaves = jnp.zeros(jnp.shape(fx), bool)
    branch_hit = jnp.zeros(jnp.shape(fx), bool)
    for dy in (-4, -2, 0, 2, 4):
        cell_h = (cell_base + dy).astype(F32)
        hr = (cell_h - leaves_start) / (leaves_end - leaves_start)
        hr = F32(1.1) - F32(0.5) * hr
        r0, r1, r2 = hashes.rand3_from2(cell_h, jnp.broadcast_to(leaves_seed, cell_h.shape))
        ccx = (r0 - F32(0.5)) * F32(7.5) * hr
        ccy = (r1 - F32(0.5)) * F32(1.3) * hr
        ccz = (r2 - F32(0.5)) * F32(7.5) * hr
        ccy = jnp.minimum(ccy + cell_h, height + F32(0.8))
        bsy = ccy - F32(2.0) - F32(1.5) * hashes.rand1_from1(cell_h + branch_seed)
        ratio, dist, in01 = _line_params(px, py, pz, F32(0.0) * px, bsy, F32(0.0) * px, ccx, ccy, ccz)
        branch_hit = branch_hit | (in01 & (dist < F32(0.5)))
        lx = px - ccx
        ly = (py - ccy) * F32(1.7)
        lz = pz - ccz
        ld = _length3(lx, ly, lz)
        lr = (F32(2.5) + F32(0.5) * hashes.rand1_from1(cell_h + leaves_seed) + leaves_simplex) * hr
        in_leaves = in_leaves | ((ld <= F32(5.0)) & (ld < lr))

    wood = (trunk | (branch_hit & in_leaf_band)) & in_bounds
    leaves = in_leaves & in_leaf_band & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.REDWOOD_WOOD), _u8(_B.REDWOOD_LEAVES))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_cypress(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    trunk_h = F32(25.0) + F32(12.0) * s[0]
    td = _length2(px, pz)
    in_bounds = ~((py > trunk_h + 4.0) | (td > 12.0))

    ratio = (py - F32(-2.0)) / (trunk_h - F32(-2.0))
    sat = (ratio >= 0) & (ratio <= 1)
    trunk_r = F32(0.5) * ((F32(1.3) + ratio) / jnp.power(F32(0.73) + ratio, F32(4.0))) + F32(0.5)
    trunk_r = trunk_r * (F32(1.0) + F32(0.3) * simplex3(_f(wx) * 0.15, _f(wy) * 0.15, _f(wz) * 0.15) * smoothstep(0.55, 0.15, ratio))
    trunk = sat & (td < trunk_r)

    top_leaves = _jungle_leaves(px, py - trunk_h, pz, F32(2.0), F32(3.0), F32(4.5), s[1])

    num_branches = 6 + int(0)  # actual count from stream below (mask per iteration)
    wood = trunk
    leaves = top_leaves
    n_branches_f = F32(6.0) + jnp.floor(s[2] * F32(5.0))
    branch_h = trunk_h - F32(1.0)
    angle = s[3] * F32(TWO_PI)
    k = 4
    for i in range(10):
        live = F32(i) < n_branches_f
        branch_h = branch_h - (F32(1.0) + F32(3.6) * s[k])
        angle = angle + F32(PI_OVER_TWO) + s[k + 1] * F32(PI)
        blen = F32(4.0) + F32(1.5) * s[k + 2]
        bex = jnp.cos(angle) * blen
        bez = jnp.sin(angle) * blen
        bey = F32(2.2) + F32(1.2) * s[k + 3]
        shrink = F32(1.0) - F32(0.3) * (branch_h / trunk_h)
        bex, bey, bez = bex * shrink, bey * shrink, bez * shrink
        bey = bey + branch_h
        in_line = _in_rasterized_line(
            jnp.floor(px).astype(I32), jnp.floor(py).astype(I32), jnp.floor(pz).astype(I32),
            F32(0.0) * px, branch_h + 0.0 * px, F32(0.0) * px, bex + 0.0 * px, bey + 0.0 * px, bez + 0.0 * px,
        )
        wood = wood | (live & in_line)
        lx = px - bex + F32(0.3)
        ly = py - bey + F32(0.3)
        lz = pz - bez + F32(0.3)
        droop = hashes.rand1_from2(_f(wx), _f(wz))
        droop_mask = (droop < F32(0.2)) & _in_range(ly, jnp.maximum(F32(-2.0), droop * F32(-10.0)), F32(0.0))
        ly = jnp.where(droop_mask, F32(0.0), ly)
        leaves = leaves | (live & _jungle_leaves(lx, ly, lz, F32(2.0), F32(2.5), F32(4.0), s[k + 4]))
        k += 5

    wood = wood & in_bounds
    leaves = leaves & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.CYPRESS_WOOD), _u8(_B.CYPRESS_LEAVES))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_birch(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    height = jnp.floor(F32(6.2) + F32(4.0) * s[0]).astype(I32)
    tall = s[1] < F32(0.08)
    height = jnp.where(tall, (height.astype(F32) * F32(1.9)).astype(I32), height)
    in_bounds = (jnp.maximum(jnp.abs(fx), jnp.abs(fz)) <= 8) & _in_range(fy, I32(0), height + I32(6))
    trunk = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)

    mult = jnp.where(tall, F32(1.5), F32(1.0))
    leaves_start = height.astype(F32) - (F32(3.0) - F32(2.2) * s[2]) * mult
    leaves_end = height.astype(F32) + (F32(4.2) + F32(1.2) * s[3]) * mult
    ratio = (py - leaves_start) / (leaves_end - leaves_start)
    in_band = _in_range(ratio, F32(0.0), F32(1.0))
    x = jnp.power(jnp.clip(ratio, 0.0, 1.0), F32(0.8))
    radius = F32(5.0) * (F32(0.5) * x**3 - F32(1.5) * x**2 + x) * (F32(2.8) + F32(0.8) * s[4])
    leaves = in_band & (_length2(px, pz) <= radius)

    leaf_rand = s[5]
    leaf_block = jnp.where(
        leaf_rand < 0.1, _u8(_B.YELLOW_BIRCH_LEAVES),
        jnp.where(leaf_rand < 0.2, _u8(_B.ORANGE_BIRCH_LEAVES), _u8(_B.BIRCH_LEAVES)),
    )
    wood = trunk & in_bounds
    leaves = leaves & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.BIRCH_WOOD), leaf_block)
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_pine(s, fx, fy, fz, wx, wy, wz, brng, extra):
    height = jnp.floor(F32(7.0) + F32(4.0) * s[0]).astype(I32)
    in_bounds = (fy >= 0) & (fy <= height + 4) & (jnp.maximum(jnp.abs(fx), jnp.abs(fz)) <= 6)
    trunk = (fx == 0) & (fz == 0) & (fy <= height)
    py = _f(fy)
    leaves_start = height.astype(F32) - F32(4.0) - F32(2.5) * s[1]
    leaves_end = height.astype(F32) + F32(3.0)
    ratio = (py - leaves_start) / (leaves_end - leaves_start)
    radius = F32(3.0) + (F32(1.0) - F32(3.0)) * ratio
    leaves = _in_range(ratio, F32(0.0), F32(1.0)) & (_length2(_f(fx), _f(fz)) < radius)
    leaf_block = jnp.where(s[2] < 0.5, _u8(_B.PINE_LEAVES_1), _u8(_B.PINE_LEAVES_2))
    wood = trunk & in_bounds
    leaves = leaves & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.PINE_WOOD), leaf_block)
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_pine_shrub(s, fx, fy, fz, wx, wy, wz, brng, extra):
    height = jnp.floor(F32(2.0) + F32(2.0) * s[0]).astype(I32)
    in_bounds = (fy >= 0) & (fy <= height + 4) & (jnp.maximum(jnp.abs(fx), jnp.abs(fz)) <= 6)
    trunk = (fx == 0) & (fz == 0) & (fy <= height)
    leaves = _jungle_leaves(
        _f(fx), _f(fy) - (height.astype(F32) - F32(1.0)), _f(fz), F32(2.5), F32(1.5), F32(2.5), s[1]
    )
    leaf_block = jnp.where(s[2] < 0.5, _u8(_B.PINE_LEAVES_1), _u8(_B.PINE_LEAVES_2))
    wood = trunk & in_bounds
    leaves = leaves & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.PINE_WOOD), leaf_block)
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_medium_purple_mushroom(s, fx, fy, fz, wx, wy, wz, brng, extra):
    manh = jnp.abs(fx) + jnp.abs(fz)
    in_bounds = manh <= 8
    height = jnp.floor(F32(1.5) + F32(2.3) * s[0]).astype(I32)
    stem = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)
    radius = jnp.where(s[1] < 0.5, F32(1.8), F32(2.5))
    cap = (fy == height + 1) & (_length2(_f(fx), _f(fz)) < radius)
    wood = stem & in_bounds
    caph = cap & in_bounds & ~wood
    hit = wood | caph
    block = jnp.where(wood, _u8(_B.MUSHROOM_STEM), _u8(_B.PURPLE_MUSHROOM_CAP))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_purple_mushroom(s, fx, fy, fz, wx, wy, wz, brng, extra):
    universal = F32(1.0) + s[0] * F32(1.2)
    px, py, pz = _f(fx) * universal, _f(fy) * universal, _f(fz) * universal
    half = s[1] < F32(0.2)
    px = jnp.where(half, px * 0.5, px)
    py = jnp.where(half, py * 0.5, py)
    pz = jnp.where(half, pz * 0.5, pz)
    height = F32(25.0) + s[2] * F32(30.0)
    hd = _length2(px, pz)
    far_cap = _length3(px, py - height, pz) > F32(35.0)
    in_bounds = ~((py < -1) | (py > height + 12.0) | ((hd > 8.0) & ((py < height - 12.0) | far_cap)))

    # spline control points (5 pts, draws 3..14), spline size 7; traced jnp
    # scalars.  Draw order is z, y, x: the reference's `vec3(u11(rng), u11(rng),
    # u11(rng))` (featurePlacement.hpp:700) has unspecified C++ argument
    # evaluation order, and g++ (the golden/reference host build) evaluates
    # constructor args RIGHT to LEFT — verified by the strict-numpy emulation
    # (/tmp recipe in round-4 notes): x,y,z order left 1516 of the golden's
    # 1617 mushroom voxels displaced, z,y,x order matches all 1617 exactly.
    ctrl_j = [(F32(0.0), F32(0.0), F32(0.0))]
    kk = 3
    for i in range(1, 5):
        scale = 0.6 if i == 4 else 1.0
        oz = (s[kk] * 2 - 1) * F32(6.0 * scale)
        oy = (s[kk + 1] * 2 - 1) * F32(2.0 * scale)
        ox = (s[kk + 2] * 2 - 1) * F32(6.0 * scale)
        t = F32(i / 4.0)
        ctrl_j.append((ox, height * t + oy, oz))
        kk += 3
    spline = _de_casteljau(ctrl_j, 7)

    hit = jnp.zeros(jnp.shape(fx), bool)
    block = jnp.zeros(jnp.shape(fx), U8)
    # last-segment draws: direction extension (s[15]), cap radius (s[16])
    for i in range(7):
        ax, ay, az = spline[i]
        if i < 6:
            bx, by, bz = spline[i + 1]
            band = ~((py < ay - 3) | (py > by + 3))
        else:
            prevx, prevy, prevz = spline[5]
            dx_, dy_, dz_ = ax - prevx, ay - prevy, az - prevz
            n = hashes.sqrt_cr(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
            n = jnp.where(n == 0, F32(1e-9), n)
            ext = F32(3.0) + s[15] * F32(1.5)
            bx, by, bz = (ax + hashes.div_cr(dx_, n) * ext, ay + hashes.div_cr(dy_, n) * ext, az + hashes.div_cr(dz_, n) * ext)
            band = jnp.ones(jnp.shape(fx), bool)
        ratio, dist, in01 = _line_params(px, py, pz, ax + 0 * px, ay + 0 * px, az + 0 * px, bx + 0 * px, by + 0 * px, bz + 0 * px)
        if i < 6:
            t = (i + jnp.clip(ratio, 0.0, 1.0)) / 6.0
            xq = t - F32(0.5)
            radius = (F32(4.0) * xq * xq + F32(1.5)) * F32(1.2)
            pot_block = jnp.broadcast_to(_u8(_B.MUSHROOM_STEM), jnp.shape(fx))
        else:
            # glm::mix does NOT clamp: height < 33 shrinks the cap below 0.8x
            # (featurePlacement.hpp:746) — a clamp here overgrew small caps
            radius = (F32(7.0) * s[16] + F32(12.0)) * (F32(0.8) + F32(0.4) * hashes.div_cr(height - F32(33.0), F32(40.0)))
            underside = (dist < radius - 1.8) & (ratio < 0.5) & (universal < F32(1.4))
            pot_block = jnp.where(underside, _u8(_B.MUSHROOM_UNDERSIDE), _u8(_B.PURPLE_MUSHROOM_CAP))
        seg_hit = (in01 & (dist <= radius)) | (
            (i < 6) & (ratio < 0) & (_length3(px - ax, py - ay, pz - az) < radius)
        ) | (
            (i < 5) & (ratio > 1) & (_length3(px - bx, py - by, pz - bz) < radius)
        )
        seg_hit = seg_hit & band & ~hit
        block = jnp.where(seg_hit, pot_block, block)
        hit = hit | seg_hit

    hit = hit & in_bounds
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_rafflesia(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    in_bounds = ~((py > 10.0) | (_length3(px, py, pz) > 15.0))
    px, py, pz = px * F32(0.8), py * F32(0.8), pz * F32(0.8)
    cx, cy, cz = px, (py - F32(1.0)) * F32(1.4), pz
    spikes = _length3(cx, cy, cz) - F32(1.0) < 0

    center_sdf = jnp.abs(_length3(cx, cy - 1.0, cz) - F32(2.0)) - F32(0.8)
    hole = _length3(cx, cy - 1.8, cz) - F32(1.8)
    center_sdf = jnp.maximum(center_sdf, -hole)
    center = center_sdf < 0
    center_block = jnp.where(cy > F32(1.0), _u8(_B.RAFFLESIA_CENTER), _u8(_B.RAFFLESIA_STEM))

    petal_hit = jnp.zeros(jnp.shape(fx), bool)
    start_angle = s[0] * F32(TWO_PI)
    for i in range(5):
        ang = start_angle + F32(i * TWO_PI * 0.2)
        st = jnp.sin(-ang)
        ct = jnp.cos(-ang)
        ppx = px * ct + pz * st
        ppy = py - F32(3.2)
        ppz = -px * st + pz * ct
        ppy = ppy - F32(i % 2) * F32(0.53)
        ppy = ppy + jnp.clip((jnp.abs(ppx - 3.0) - F32(1.5)) / F32(1.5), 0.0, 1.0) * F32(1.3)
        ppx = ppx - F32(3.8)
        ppz = ppz * F32(1.2)
        # sdCappedCylinder(p, r=2.5, h=0.5)
        dlx = jnp.abs(_length2(ppx, ppz)) - F32(2.5)
        dly = jnp.abs(ppy) - F32(0.5)
        sd = jnp.minimum(jnp.maximum(dlx, dly), 0.0) + _length2(jnp.maximum(dlx, 0.0), jnp.maximum(dly, 0.0))
        petal_hit = petal_hit | (sd < 0)

    hit1 = spikes
    hit2 = center & ~hit1
    hit3 = petal_hit & ~hit1 & ~hit2
    hit = (hit1 | hit2 | hit3) & in_bounds
    block = jnp.where(hit1, _u8(_B.RAFFLESIA_SPIKES), jnp.where(hit2, center_block, _u8(_B.RAFFLESIA_PETAL)))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_large_jungle(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    height = F32(18.0) + F32(10.0) * s[0]
    in_bounds = ~((py > height + 6.0) | (_length2(px, pz) > 15.0))
    trunk = _in_range(py, F32(0.0), height) & (fx >= 0) & (fx <= 1) & (fz >= 0) & (fz <= 1)

    qx = px - F32(0.5)
    qz = pz - F32(0.5)
    top_leaf = _jungle_leaves(qx, py - (height - F32(2.0)), qz, F32(4.0), F32(4.0), F32(7.0), s[1])
    r_top, brng = _brng_draw(brng, top_leaf & in_bounds & ~trunk)
    top_block = jnp.where(r_top < F32(0.5), _u8(_B.JUNGLE_LEAVES_FRUITS), _u8(_B.JUNGLE_LEAVES_PLAIN))

    num_branches = F32(0.5) + F32(2.5) * s[2]
    branch_h = height
    wood = trunk
    leaves = top_leaf
    leaf_block = top_block
    k = 3
    for i in range(3):
        live = F32(i) < num_branches
        branch_h = branch_h - (F32(8.0) + s[k] * F32(3.0)) * (height / F32(30.0))
        ang = F32(TWO_PI) * s[k + 1]
        bex = jnp.cos(-ang) * (F32(3.0) + F32(1.5) * s[k + 2])
        bez = jnp.sin(-ang) * (F32(3.0) + F32(1.5) * s[k + 2])
        bey = branch_h + F32(1.0) + F32(1.5) * s[k + 3]
        ratio, dist, in01 = _line_params(qx, py, qz, F32(0.0) * px, branch_h + 0 * px, F32(0.0) * px, bex + 0 * px, bey + 0 * px, bez + 0 * px)
        br = F32(1.2) - F32(0.4) * ratio
        wood = wood | (live & in01 & (dist < br))
        bl = _jungle_leaves(qx - bex, py - bey + F32(0.2), qz - bez, F32(2.0), F32(2.5), F32(3.5), s[k + 4])
        new_leaf = live & bl & ~leaves
        r_b, brng = _brng_draw(brng, new_leaf & in_bounds & ~wood)
        lb = jnp.where(r_b < F32(0.25), _u8(_B.JUNGLE_LEAVES_FRUITS), _u8(_B.JUNGLE_LEAVES_PLAIN))
        leaf_block = jnp.where(new_leaf, lb, leaf_block)
        leaves = leaves | new_leaf
        k += 5

    wood = wood & in_bounds
    leaves = leaves & in_bounds & ~wood
    hit = wood | leaves
    block = jnp.where(wood, _u8(_B.JUNGLE_WOOD), leaf_block)
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_small_jungle(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    height = F32(8.0) + F32(4.0) * s[0]
    max_dist = jnp.where(py < height - 2.0, F32(2.0), F32(8.0))
    in_bounds = ~((py > height + 4.0) | (_length2(px, pz) > max_dist))
    trunk = _in_range(py, F32(0.0), height) & (fx == 0) & (fz == 0)
    leaves = _jungle_leaves(px, py - (height - F32(1.0)), pz, F32(3.0), F32(2.0), F32(4.0), s[1])
    lv = leaves & in_bounds & ~trunk
    r, brng = _brng_draw(brng, lv)
    leaf_block = jnp.where(r < F32(0.25), _u8(_B.JUNGLE_LEAVES_FRUITS), _u8(_B.JUNGLE_LEAVES_PLAIN))
    wood = trunk & in_bounds
    hit = wood | lv
    block = jnp.where(wood, _u8(_B.JUNGLE_WOOD), leaf_block)
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_tiny_jungle(s, fx, fy, fz, wx, wy, wz, brng, extra):
    in_bounds = (fx + fy + fz) <= 8
    height = jnp.floor(F32(0.5) + F32(2.5) * s[0]).astype(I32)
    trunk = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)
    manh = jnp.abs(fx) + jnp.abs(fy - height) + jnp.abs(fz)
    leaf = manh == 1
    wood = trunk & in_bounds
    leaf = leaf & in_bounds & ~wood
    hit = wood | leaf
    block = jnp.where(wood, _u8(_B.JUNGLE_WOOD), _u8(_B.JUNGLE_LEAVES_PLAIN))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_cactus(s, fx, fy, fz, wx, wy, wz, brng, extra):
    in_bounds = (jnp.abs(fx) <= 5) & (jnp.abs(fz) <= 5)
    height = jnp.floor(F32(7.5) + s[0] * F32(6.0)).astype(I32)
    in_bounds = in_bounds & (_f(fy) <= height.astype(F32) + F32(2.0))
    hit = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)
    k = 1
    for arm_idx in range(4):
        has_arm = s[k] < F32(0.35)
        a_start = jnp.floor(F32(4.0) + s[k + 1] * (height.astype(F32) - F32(10.0))).astype(I32)
        a_len = jnp.floor(F32(2.0) + s[k + 2] * F32(1.0)).astype(I32)
        a_h = jnp.floor(F32(3.0) + s[k + 3] * F32(3.0)).astype(I32)
        a_h = jnp.minimum(height - a_start - I32(1), a_h)
        dx, dz = (int(bio.DIR_VECS_2D[arm_idx * 2][0]), int(bio.DIR_VECS_2D[arm_idx * 2][1]))
        # segment 1: (0, a_start, 0) -> dir * len
        p2x, p2z = dx * a_len, dz * a_len
        seg1 = (
            _in_range(fx, jnp.minimum(I32(0), p2x), jnp.maximum(I32(0), p2x))
            & _in_range(fz, jnp.minimum(I32(0), p2z), jnp.maximum(I32(0), p2z))
            & (fy == a_start)
        )
        seg2 = (
            (fx == p2x) & (fz == p2z) & _in_range(fy, a_start, a_start + a_h)
        )
        hit = hit | (has_arm & (seg1 | seg2))
        k += 4
    hit = hit & in_bounds
    return hit, jnp.where(hit, _u8(_B.CACTUS), U8(0)), brng


def _feat_palm(s, fx, fy, fz, wx, wy, wz, brng, extra):
    px, py, pz = _f(fx), _f(fy), _f(fz)
    in_bounds = ~((fy < -2) | (fy > 28) | ((jnp.abs(fx) + jnp.abs(fz)) > 24))

    # 4 control points random walk (draws 0..8)
    ctrl = [(F32(0.0), F32(0.0), F32(0.0))]
    cx = cy = cz = F32(0.0)
    k = 0
    # draw order z,y,x: g++ evaluates vec3(u..,u..,u..) ctor args right-to-left
    # (featurePlacement.hpp:991; verified empirically on the purple mushroom)
    for i in range(1, 4):
        walk = F32(1.0 + (i / 4.0) * 5.0)
        cz = cz + walk * (s[k] * 2 - 1)
        cy = cy + F32(3.0) + F32(5.0) * s[k + 1]
        cx = cx + walk * (s[k + 2] * 2 - 1)
        ctrl.append((cx, cy, cz))
        k += 3
    minx = jnp.minimum(jnp.minimum(F32(0.0), ctrl[1][0]), jnp.minimum(ctrl[2][0], ctrl[3][0]))
    miny = jnp.minimum(jnp.minimum(F32(0.0), ctrl[1][1]), jnp.minimum(ctrl[2][1], ctrl[3][1]))
    minz = jnp.minimum(jnp.minimum(F32(0.0), ctrl[1][2]), jnp.minimum(ctrl[2][2], ctrl[3][2]))
    maxx = jnp.maximum(jnp.maximum(F32(0.0), ctrl[1][0]), jnp.maximum(ctrl[2][0], ctrl[3][0]))
    maxy = jnp.maximum(jnp.maximum(F32(0.0), ctrl[1][1]), jnp.maximum(ctrl[2][1], ctrl[3][1]))
    maxz = jnp.maximum(jnp.maximum(F32(0.0), ctrl[1][2]), jnp.maximum(ctrl[2][2], ctrl[3][2]))
    in_box = (
        (px >= minx - 7) & (px <= maxx + 7)
        & (py >= miny - 1) & (py <= maxy + 6)
        & (pz >= minz - 7) & (pz <= maxz + 7)
    )

    spline = _de_casteljau(ctrl, 5)
    tx = jnp.floor(spline[4][0]).astype(I32)
    ty = jnp.floor(spline[4][1]).astype(I32)
    tz = jnp.floor(spline[4][2]).astype(I32)
    lx = fx - tx
    ly = fy - ty
    lz = fz - tz
    ld = _length2(_f(lx), _f(lz))
    ld = ld * (F32(0.6) + F32(0.3) * jnp.clip((F32(20.0) - ty.astype(F32)) * F32(0.05), 0.0, 1.0) + F32(0.3) * s[9])
    on_spoke = (lx == 0) | (lz == 0) | (jnp.abs(lx) == jnp.abs(lz))
    leaf_h = jnp.where(ld > F32(3.0), I32(-1), I32(0))
    leaves = _in_range(ly, I32(-1), I32(0)) & (ld < F32(3.9)) & on_spoke & (ly == leaf_h)

    wood = jnp.zeros(jnp.shape(fx), bool)
    for i in range(4):
        ax, ay, az = spline[i]
        bx, by, bz = spline[i + 1]
        ddx, ddy, ddz = bx - ax, by - ay, bz - az
        n = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        n = jnp.where(n == 0, F32(1e-9), n)
        padx, pady, padz = ddx / n * F32(0.5), ddy / n * F32(0.5), ddz / n * F32(0.5)
        if i > 0:
            ax, ay, az = ax - padx, ay - pady, az - padz
        if i + 1 < 4:
            bx, by, bz = bx + padx, by + pady, bz + padz
        wood = wood | _in_rasterized_line(fx, fy, fz, ax + 0 * px, ay + 0 * px, az + 0 * px, bx + 0 * px, by + 0 * px, bz + 0 * px)

    leaves = leaves & in_box & in_bounds
    wood = wood & in_box & in_bounds & ~leaves
    hit = wood | leaves
    block = jnp.where(leaves, _u8(_B.PALM_LEAVES), _u8(_B.PALM_WOOD))
    return hit, jnp.where(hit, block, U8(0)), brng


def _feat_crystal(s, fx, fy, fz, wx, wy, wz, brng, extra, medium: bool):
    fpy = extra["fy_pos"]
    ok = fpy <= 180
    scale = F32(0.55) + F32(0.4) * s[0]
    if medium:
        scale = scale * F32(2.0)
    px = _f(fx) * scale
    py = (_f(fy) + F32(2.0)) * scale
    pz = _f(fz) * scale
    in_bounds = jnp.maximum(jnp.abs(fx), jnp.abs(fz)) <= 25

    # draw order z,y,x (g++ right-to-left vec3 ctor, featurePlacement.hpp:1066)
    cez = F32(12.0) * (s[1] * 2 - 1)
    cey = F32(18.0) + F32(8.0) * s[2]
    cex = F32(12.0) * (s[3] * 2 - 1)
    not_above = py <= cey + F32(2.0)
    crystal_block = _random_crystal_block(s[4])

    hit = _in_crystal(px, py, pz, F32(0.0) * px, F32(0.0) * px, F32(0.0) * px,
                      cex + 0 * px, cey + 0 * px, cez + 0 * px, F32(4.0) + F32(1.2) * s[5])

    qx, qy, qz = px * F32(0.8), py * F32(0.8), pz * F32(0.8)
    nsc = F32(4.0) + F32(2.0) * s[6]
    ang = s[7] * F32(TWO_PI)
    k = 8
    for i in range(6):
        live = F32(i) < nsc
        ang = ang + F32(PI_OVER_TWO) + F32(PI) * s[k]
        sx = jnp.cos(ang)
        sz = jnp.sin(ang)
        ex = sx * (F32(6.0) + F32(3.0) * s[k + 1])
        ez = sz * (F32(6.0) + F32(3.0) * s[k + 1])
        ey = F32(7.0) + F32(5.0) * s[k + 2]
        hit = hit | (
            live
            & _in_crystal(qx, qy, qz, F32(0.0) * px, F32(0.0) * px, F32(0.0) * px,
                          ex + 0 * px, ey + 0 * px, ez + 0 * px, F32(1.5) + F32(1.5) * s[k + 3])
        )
        k += 4

    hit = hit & ok & in_bounds & not_above
    return hit, jnp.where(hit, crystal_block, U8(0)), brng


# ---------------------------------------------------------------------------
# Cave features (placeCaveFeature, featurePlacement.hpp:1110-1380)
# extra provides "layer_height" (int array-compatible scalar) and fy_top = fy - height
# ---------------------------------------------------------------------------


def _cave_test_pillar(block):
    def fn(s, fx, fy, fz, wx, wy, wz, brng, extra):
        h = extra["layer_height"]
        hit = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), h)
        return hit, jnp.where(hit, _u8(block), U8(0)), brng

    return fn


def _cave_vine(s, fx, fy, fz, wx, wy, wz, brng, extra):
    h = extra["layer_height"]
    ty = fy - h  # floorTopPos.y
    height = jnp.floor(F32(3.0) + F32(12.0) * s[0]).astype(I32)
    height = jnp.minimum(height, h)
    on_col = (fx == 0) & (fz == 0) & _in_range(ty, -height, I32(0))
    r, brng = _brng_draw(brng, on_col)
    glowing = r < F32(0.2)
    is_end = ty == -height
    block = jnp.where(
        is_end,
        jnp.where(glowing, _u8(_B.CAVE_VINES_GLOW_END), _u8(_B.CAVE_VINES_END)),
        jnp.where(glowing, _u8(_B.CAVE_VINES_GLOW_MAIN), _u8(_B.CAVE_VINES_MAIN)),
    )
    return on_col, jnp.where(on_col, block, U8(0)), brng


def _cave_glowstone_cluster(s, fx, fy, fz, wx, wy, wz, brng, extra):
    h = extra["layer_height"]
    px, pz = _f(fx), _f(fz)
    tyf = (_f(fy) - h.astype(F32)) * F32(1.35)
    sc = F32(1.0) + F32(0.5) * s[0]
    tx, ty2, tz = px * sc, tyf * sc, pz * sc
    radius = _length3(tx, ty2, tz)
    xz_angle = jnp.arctan2(pz, px)
    max_r = F32(3.5) + F32(2.0) * simplex2(xz_angle * F32(1.5), _f(wy) * F32(1.5))
    hit = (radius <= F32(6.0)) & (radius < max_r)
    return hit, jnp.where(hit, _u8(_B.GLOWSTONE), U8(0)), brng


def _cave_stormlight(ceiling: bool):
    def fn(s, fx, fy, fz, wx, wy, wz, brng, extra):
        h = extra["layer_height"]
        radius = F32(3.5) + F32(4.0) * s[0]
        if ceiling:
            dist = _length3(_f(fx), _f(fy) - h.astype(F32), _f(fz))
        else:
            dist = _length3(_f(fx), _f(fy), _f(fz))
        inside = dist <= radius
        ratio = dist / radius
        light_chance = smoothstep(0.4, 0.2, ratio)
        r, brng = _brng_draw(brng, inside)
        block = jnp.where(r < light_chance, _u8(_B.GLOWSTONE), _random_crystal_block(s[1]))
        return inside, jnp.where(inside, block, U8(0)), brng

    return fn


def _cave_crystal_pillar(s, fx, fy, fz, wx, wy, wz, brng, extra):
    h = extra["layer_height"].astype(F32)
    py = _f(fy)
    ty = py - h
    in_bounds = ~((py < -8.0) | (ty > 8.0))
    d2 = _length2(_f(fx), _f(fz))
    in_bounds = in_bounds & (d2 <= F32(7.0))
    hr = py / jnp.where(h == 0, F32(1e-9), h)
    dist = jnp.where(hr < 0, _length3(_f(fx), py, _f(fz)), jnp.where(hr > 1, _length3(_f(fx), ty, _f(fz)), d2))
    hr = jnp.clip(hr, 0.0, 1.0)
    radius = hr - F32(0.5)
    radius = F32(4.0) * (F32(2.0) * radius * radius + F32(0.5))
    inside = in_bounds & (dist <= radius)
    ratio = dist / radius
    block = jnp.where(ratio < F32(0.4), _u8(_B.GLOWSTONE), _random_crystal_block(s[0]))
    return inside, jnp.where(inside, block, U8(0)), brng


def _cave_warped_fungus(s, fx, fy, fz, wx, wy, wz, brng, extra):
    fpos = extra["fpos"]
    manh = jnp.abs(fx) + jnp.abs(fz)
    in_bounds = manh <= 6
    height = jnp.floor(F32(2.5) + F32(3.0) * s[0]).astype(I32)
    in_bounds = in_bounds & ~((fy < -2) | (fy > height + 3))
    stem = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)

    sh = fy - (height - I32(1))
    shroom_zone = _in_range(sh, I32(0), I32(1)) & (manh == 1) & in_bounds & ~stem
    r, brng = _brng_draw(brng, shroom_zone)
    chance = jnp.where(sh == 0, F32(0.2), F32(0.5))
    shroom = shroom_zone & (r < chance)

    cap_r = _length2(_f(fx), _f(fz))
    cap_ok = cap_r <= F32(3.7)
    cap_end = height + I32(1) - (cap_r / F32(2.5)).astype(I32)
    cap_start = cap_end.astype(F32) - (
        F32(4.2)
        * simplex2((_f(wx) + _f(fpos[1])) * F32(3.0), (_f(wz) + _f(fpos[1])) * F32(3.0))
        * jnp.maximum(cap_r - F32(2.3), 0.0)
    )
    cap = cap_ok & (_f(fy) >= jnp.floor(cap_start)) & (fy <= cap_end) & in_bounds

    h1 = stem & in_bounds
    h2 = shroom & ~h1
    h3 = cap & ~h1 & ~h2
    hit = h1 | h2 | h3
    block = jnp.where(h1, _u8(_B.WARPED_STEM), jnp.where(h2, _u8(_B.SHROOMLIGHT), _u8(_B.WARPED_WART)))
    return hit, jnp.where(hit, block, U8(0)), brng


def _cave_amber_fungus(s, fx, fy, fz, wx, wy, wz, brng, extra):
    manh = jnp.abs(fx) + jnp.abs(fz)
    in_bounds = manh <= 4
    height = jnp.floor(F32(4.5) + F32(4.5) * s[0]).astype(I32)
    in_bounds = in_bounds & ~((fy < -2) | (fy > height + 3))
    stem = (fx == 0) & (fz == 0) & _in_range(fy, I32(0), height)
    wart_top = (fx == 0) & (fz == 0) & (fy == height + 1)

    cap_start = height // 2
    cap_start = cap_start - jnp.where(simplex2(_f(wx), _f(wz)) < 0, I32(1), I32(0))
    in_cap = _in_range(fy, cap_start, height)
    cap_manh = jnp.where((fy - cap_start) < (height // 4 + 1), I32(2), I32(1))
    on_ring = in_cap & (manh == cap_manh)
    # shroomlight: jittered 2-grid positions.  The reference's
    # (worldBlockPos / 2) * 2 (featurePlacement.hpp:1358) is C integer division
    # — TRUNCATING toward zero — so negative world coordinates must not floor
    # (python //): at wz = -3, C gives -2 while floor gives -4, shifting the
    # jitter grid and flipping SHROOMLIGHT/AMBER_WART at odd-negative columns
    # (the round-4 block-grid residual: 8 of the 9 stray blocks at (592,-368)).
    tdiv2 = lambda v: jnp.where(v < 0, -((-v) // 2), v // 2)
    gx = tdiv2(wx) * 2
    gy = tdiv2(wy) * 2
    gz = tdiv2(wz) * 2
    r0, r1, r2 = hashes.rand3_from3(_f(gx), _f(gy), _f(gz))
    sx = gx + jnp.floor(r0 * F32(2.0)).astype(I32)
    sy = gy + jnp.floor(r1 * F32(2.0)).astype(I32)
    sz = gz + jnp.floor(r2 * F32(2.0)).astype(I32)
    at_grid = (wx == sx) & (wy == sy) & (wz == sz)
    r, brng = _brng_draw(brng, on_ring & at_grid & in_bounds)
    shroom = on_ring & at_grid & (r < F32(0.65))

    h1 = (stem | wart_top) & in_bounds
    h2 = on_ring & in_bounds & ~h1
    hit = h1 | h2
    block = jnp.where(
        stem & in_bounds, _u8(_B.AMBER_STEM),
        jnp.where(shroom & h2, _u8(_B.SHROOMLIGHT), _u8(_B.AMBER_WART)),
    )
    return hit, jnp.where(hit, block, U8(0)), brng


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

SURFACE_FEATURE_FNS = {
    int(Feature.SPHERE): _feat_sphere,
    int(Feature.CORAL): _feat_coral,
    int(Feature.KELP): _feat_kelp,
    int(Feature.ICEBERG): _feat_iceberg,
    int(Feature.ACACIA_TREE): _feat_acacia,
    int(Feature.REDWOOD_TREE): _feat_redwood,
    int(Feature.CYPRESS_TREE): _feat_cypress,
    int(Feature.BIRCH_TREE): _feat_birch,
    int(Feature.PINE_TREE): _feat_pine,
    int(Feature.PINE_SHRUB): _feat_pine_shrub,
    int(Feature.RAFFLESIA): _feat_rafflesia,
    int(Feature.LARGE_JUNGLE_TREE): _feat_large_jungle,
    int(Feature.SMALL_JUNGLE_TREE): _feat_small_jungle,
    int(Feature.TINY_JUNGLE_TREE): _feat_tiny_jungle,
    int(Feature.MEDIUM_PURPLE_MUSHROOM): _feat_medium_purple_mushroom,
    int(Feature.PURPLE_MUSHROOM): _feat_purple_mushroom,
    int(Feature.MEDIUM_CRYSTAL): lambda *a: _feat_crystal(*a, medium=True),
    int(Feature.CRYSTAL): lambda *a: _feat_crystal(*a, medium=False),
    int(Feature.PALM_TREE): _feat_palm,
    int(Feature.CACTUS): _feat_cactus,
}

CAVE_FEATURE_FNS = {
    int(CaveFeature.TEST_GLOWSTONE_PILLAR): _cave_test_pillar(_B.GLOWSTONE),
    int(CaveFeature.TEST_SHROOMLIGHT_PILLAR): _cave_test_pillar(_B.SHROOMLIGHT),
    int(CaveFeature.CAVE_VINE): _cave_vine,
    int(CaveFeature.GLOWSTONE_CLUSTER): _cave_glowstone_cluster,
    int(CaveFeature.STORMLIGHT_SPHERE): _cave_stormlight(False),
    int(CaveFeature.CEILING_STORMLIGHT_SPHERE): _cave_stormlight(True),
    int(CaveFeature.CRYSTAL_PILLAR): _cave_crystal_pillar,
    int(CaveFeature.WARPED_FUNGUS): _cave_warped_fungus,
    int(CaveFeature.AMBER_FUNGUS): _cave_amber_fungus,
}

SEED_SURFACE_FEATURE_RNG = 1293012  # featurePlacement.hpp:153
SEED_SURFACE_BLOCK_RNG = 57847812
SEED_CAVE_FEATURE_RNG = 398132  # featurePlacement.hpp:1119
SEED_CAVE_BLOCK_RNG = 9322743

STREAM_LEN = 64


def draw_stream(fpos_x, fpos_y, fpos_z, seed: int):
    """First STREAM_LEN u01 draws of the per-placement feature RNG ([..., 64])."""
    state = hashes.seed_4(fpos_x, fpos_y, fpos_z, seed)
    vals = []
    for _ in range(STREAM_LEN):
        v, state = hashes.lcg_u01(state)
        vals.append(v)
    return jnp.stack(vals, axis=-1)
