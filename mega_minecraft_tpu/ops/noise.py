"""GLM-compatible noise library, vectorized for TPU (f32 throughout).

Reproduces the noise primitives the reference terrain formulas are built on
(reference behavior: /root/reference/src/util/rng.hpp:159-320):

- ``simplex2`` / ``simplex3``: GLM's ``glm::simplex`` (the public webgl-noise /
  Ashima Arts algorithm used by GLM), implemented here from the published algorithm.
- ``fbm2`` / ``fbm3``: octave sums with amplitude halved per octave (rng.hpp:166-179).
- ``worley2`` / ``worley3``: cellular noise with F1 distance, cell color and
  edge-distance outputs (rng.hpp:193-278); tie-break order matches the reference's
  x→y(→z) neighbor iteration with strict comparisons.
- ``special_cave_noise``: the modified 3-min-distance Worley ratio (rng.hpp:282-320).
- ``smoothstep``: GLM semantics (works with descending edges as the reference uses).

All functions take/return component-wise jnp arrays of any broadcastable shape and are
elementwise vector math — XLA maps them straight onto the VPU with no gathers, which is
exactly the layout the terrain kernels need.
"""

from __future__ import annotations

import jax.numpy as jnp

from .hashes import div_cr, rand2_from2, rand3_from2, rand3_from3, sqrt_cr, strict_sum

F32 = jnp.float32


def _f(x):
    return jnp.asarray(x, F32)


def smoothstep(edge0, edge1, x):
    """GLM smoothstep; edges may be arrays; descending edges behave like GLM's."""
    t = jnp.clip((_f(x) - _f(edge0)) / (_f(edge1) - _f(edge0)), F32(0.0), F32(1.0))
    return t * t * (F32(3.0) - F32(2.0) * t)


def clamp(x, lo, hi):
    return jnp.clip(_f(x), _f(lo), _f(hi))


def fract(x):
    x = _f(x)
    return x - jnp.floor(x)


def _mod289(x):
    return x - jnp.floor(x * F32(1.0 / 289.0)) * F32(289.0)


def _glm_mod289_lattice(x):
    """``glm::mod(x, vec(289))`` = ``x - 289*floor(x/289)`` (func_common.inl:217),
    the OUTER lattice wrap of glm's 2D simplex — a correctly-rounded division,
    i.e. the true floored mod for integer-valued lattice coords (CUDA single
    division is IEEE-exact too).  This is NOT the same as detail::mod289's
    multiply-by-reciprocal form (``_mod289``): that one returns 289 instead of 0
    at negative multiples of 289 once ``|x| >= ~144k``, which flipped whole
    gradient cells vs the reference at far world coordinates.  Computed in i32
    (jnp.mod is floored) so the result is backend-independent — TPU f32 division
    is not guaranteed correctly rounded."""
    return jnp.mod(x.astype(jnp.int32), jnp.int32(289)).astype(F32)


def _permute(x):
    return _mod289((x * F32(34.0) + F32(1.0)) * x)


def _taylor_inv_sqrt(r):
    return F32(1.79284291400159) - F32(0.85373472095314) * r


def simplex2(px, py):
    """2D simplex noise, GLM-compatible. px/py: f32 arrays."""
    px = _f(px)
    py = _f(py)
    Cx = F32(0.211324865405187)
    Cy = F32(0.366025403784439)
    Cz = F32(-0.577350269189626)
    Cw = F32(0.024390243902439)

    # glm evaluates the skew factors as dot products — two products then a sum
    # (noise.inl:599-600) — NOT (px+py)*Cy; the rounding difference flips
    # floor() at cell boundaries, so match it exactly.
    s = px * Cy + py * Cy
    ix = jnp.floor(px + s)
    iy = jnp.floor(py + s)
    t = ix * Cx + iy * Cx
    x0x = px - ix + t
    x0y = py - iy + t

    gt = x0x > x0y
    i1x = jnp.where(gt, F32(1.0), F32(0.0))
    i1y = jnp.where(gt, F32(0.0), F32(1.0))

    x12x = x0x + Cx - i1x
    x12y = x0y + Cx - i1y
    x12z = x0x + Cz
    x12w = x0y + Cz

    imx = _glm_mod289_lattice(ix)
    imy = _glm_mod289_lattice(iy)

    p0 = _permute(_permute(imy) + imx)
    p1 = _permute(_permute(imy + i1y) + imx + i1x)
    p2 = _permute(_permute(imy + F32(1.0)) + imx + F32(1.0))

    m0 = jnp.maximum(F32(0.5) - (x0x * x0x + x0y * x0y), F32(0.0))
    m1 = jnp.maximum(F32(0.5) - (x12x * x12x + x12y * x12y), F32(0.0))
    m2 = jnp.maximum(F32(0.5) - (x12z * x12z + x12w * x12w), F32(0.0))
    m0 = m0 * m0
    m0 = m0 * m0
    m1 = m1 * m1
    m1 = m1 * m1
    m2 = m2 * m2
    m2 = m2 * m2

    def grad(p):
        x = F32(2.0) * fract(p * Cw) - F32(1.0)
        h = jnp.abs(x) - F32(0.5)
        ox = jnp.floor(x + F32(0.5))
        a0 = x - ox
        return a0, h

    a00, h0 = grad(p0)
    a01, h1 = grad(p1)
    a02, h2 = grad(p2)

    m0 = m0 * (_taylor_inv_sqrt(a00 * a00 + h0 * h0))
    m1 = m1 * (_taylor_inv_sqrt(a01 * a01 + h1 * h1))
    m2 = m2 * (_taylor_inv_sqrt(a02 * a02 + h2 * h2))

    g0 = a00 * x0x + h0 * x0y
    g1 = a01 * x12x + h1 * x12y
    g2 = a02 * x12z + h2 * x12w

    return F32(130.0) * (m0 * g0 + m1 * g1 + m2 * g2)


def simplex3(px, py, pz):
    """3D simplex noise, GLM-compatible. px/py/pz: f32 arrays."""
    px = _f(px)
    py = _f(py)
    pz = _f(pz)
    C_x = F32(1.0 / 6.0)
    C_y = F32(1.0 / 3.0)

    # dot-product evaluation order (three products, left-assoc sum) matches glm
    # noise.inl:654-655 — see the simplex2 note.  strict_sum pins the per-term
    # roundings: XLA's simplifier otherwise factors x·C + y·C + z·C into
    # (x+y+z)·C, 1 ulp off the reference's IEEE evaluation ~50% of the time.
    s = strict_sum(px * C_y, py * C_y, pz * C_y)
    ix = jnp.floor(px + s)
    iy = jnp.floor(py + s)
    iz = jnp.floor(pz + s)
    t = strict_sum(ix * C_x, iy * C_x, iz * C_x)
    x0x = px - ix + t
    x0y = py - iy + t
    x0z = pz - iz + t

    # g = step(x0.yzx, x0.xyz); l = 1 - g
    gx = jnp.where(x0x >= x0y, F32(1.0), F32(0.0))
    gy = jnp.where(x0y >= x0z, F32(1.0), F32(0.0))
    gz = jnp.where(x0z >= x0x, F32(1.0), F32(0.0))
    lx = F32(1.0) - gx
    ly = F32(1.0) - gy
    lz = F32(1.0) - gz
    i1x = jnp.minimum(gx, lz)
    i1y = jnp.minimum(gy, lx)
    i1z = jnp.minimum(gz, ly)
    i2x = jnp.maximum(gx, lz)
    i2y = jnp.maximum(gy, lx)
    i2z = jnp.maximum(gz, ly)

    x1x = x0x - i1x + C_x
    x1y = x0y - i1y + C_x
    x1z = x0z - i1z + C_x
    x2x = x0x - i2x + C_y
    x2y = x0y - i2y + C_y
    x2z = x0z - i2z + C_y
    x3x = x0x - F32(0.5)
    x3y = x0y - F32(0.5)
    x3z = x0z - F32(0.5)

    ix = _mod289(ix)
    iy = _mod289(iy)
    iz = _mod289(iz)

    def perm4(base, a, b):
        # permute(base + [0, a, b, 1]) applied component-wise
        return (
            _permute(base),
            _permute(base + a),
            _permute(base + b),
            _permute(base + F32(1.0)),
        )

    pz0, pz1, pz2, pz3 = perm4(iz, i1z, i2z)
    py0 = _permute(pz0 + iy)
    py1 = _permute(pz1 + iy + i1y)
    py2 = _permute(pz2 + iy + i2y)
    py3 = _permute(pz3 + iy + F32(1.0))
    p0 = _permute(py0 + ix)
    p1 = _permute(py1 + ix + i1x)
    p2 = _permute(py2 + ix + i2x)
    p3 = _permute(py3 + ix + F32(1.0))

    n_ = F32(0.142857142857)
    ns_x = n_ * F32(2.0) - F32(0.0)  # n_*D.w - D.x
    ns_y = n_ * F32(0.5) - F32(1.0)  # n_*D.y - D.z
    ns_z = n_ * F32(1.0) - F32(0.0)  # n_*D.z - D.x

    def gradcorner(p):
        j = p - F32(49.0) * jnp.floor(p * ns_z * ns_z)
        x_ = jnp.floor(j * ns_z)
        y_ = jnp.floor(j - F32(7.0) * x_)
        x = x_ * ns_x + ns_y
        y = y_ * ns_x + ns_y
        h = F32(1.0) - jnp.abs(x) - jnp.abs(y)
        # b0 = (x, y) pair; sign fixup per webgl-noise
        sx = jnp.floor(x) * F32(2.0) + F32(1.0)
        sy = jnp.floor(y) * F32(2.0) + F32(1.0)
        sh = -jnp.where(h <= F32(0.0), F32(1.0), F32(0.0))
        ax = x + sx * sh
        ay = y + sy * sh
        return ax, ay, h

    g0x, g0y, g0z = gradcorner(p0)
    g1x, g1y, g1z = gradcorner(p1)
    g2x, g2y, g2z = gradcorner(p2)
    g3x, g3y, g3z = gradcorner(p3)

    n0 = _taylor_inv_sqrt(g0x * g0x + g0y * g0y + g0z * g0z)
    n1 = _taylor_inv_sqrt(g1x * g1x + g1y * g1y + g1z * g1z)
    n2 = _taylor_inv_sqrt(g2x * g2x + g2y * g2y + g2z * g2z)
    n3 = _taylor_inv_sqrt(g3x * g3x + g3y * g3y + g3z * g3z)

    m0 = jnp.maximum(F32(0.6) - (x0x * x0x + x0y * x0y + x0z * x0z), F32(0.0))
    m1 = jnp.maximum(F32(0.6) - (x1x * x1x + x1y * x1y + x1z * x1z), F32(0.0))
    m2 = jnp.maximum(F32(0.6) - (x2x * x2x + x2y * x2y + x2z * x2z), F32(0.0))
    m3 = jnp.maximum(F32(0.6) - (x3x * x3x + x3y * x3y + x3z * x3z), F32(0.0))
    m0 = m0 * m0
    m1 = m1 * m1
    m2 = m2 * m2
    m3 = m3 * m3

    d0 = (g0x * n0) * x0x + (g0y * n0) * x0y + (g0z * n0) * x0z
    d1 = (g1x * n1) * x1x + (g1y * n1) * x1y + (g1z * n1) * x1z
    d2 = (g2x * n2) * x2x + (g2y * n2) * x2y + (g2z * n2) * x2z
    d3 = (g3x * n3) * x3x + (g3y * n3) * x3y + (g3z * n3) * x3z

    return F32(42.0) * (m0 * m0 * d0 + m1 * m1 * d1 + m2 * m2 * d2 + m3 * m3 * d3)


# ---------------------------------------------------------------------------
# fBm (rng.hpp:166-191): amplitude halves each octave starting at 0.5, pos doubles.
# ---------------------------------------------------------------------------


def fbm2(px, py, octaves: int = 5):
    px = _f(px)
    py = _f(py)
    total = None
    amplitude = 1.0
    for _ in range(octaves):
        amplitude *= 0.5
        term = F32(amplitude) * simplex2(px, py)
        total = term if total is None else total + term
        px = px * F32(2.0)
        py = py * F32(2.0)
    return total


def fbm3(px, py, pz, octaves: int = 5):
    px = _f(px)
    py = _f(py)
    pz = _f(pz)
    total = None
    amplitude = 1.0
    for _ in range(octaves):
        amplitude *= 0.5
        term = F32(amplitude) * simplex3(px, py, pz)
        total = term if total is None else total + term
        px = px * F32(2.0)
        py = py * F32(2.0)
        pz = pz * F32(2.0)
    return total


def simplex2_from2(px, py):
    """vec2(simplex(p), simplex(p + (5923.45, 4129.42)))  (rng.hpp:161-164)."""
    return simplex2(px, py), simplex2(px + F32(5923.45), py + F32(4129.42))


def fbm2_from2(px, py, octaves: int = 5):
    """(fbm(p), fbm(p + (5923.45, 4129.42)))  (rng.hpp:181-185)."""
    return (
        fbm2(px, py, octaves),
        fbm2(px + F32(5923.45), py + F32(4129.42), octaves),
    )


def fbm3_from3(px, py, pz, octaves: int = 5):
    """(fbm(p), fbm(p+o1), fbm(p+o2))  (rng.hpp:187-191)."""
    return (
        fbm3(px, py, pz, octaves),
        fbm3(px + F32(5923.45), py + F32(4129.42), pz + F32(5790.48), octaves),
        fbm3(px + F32(1765.68), py + F32(4704.36), pz + F32(5692.12), octaves),
    )


# ---------------------------------------------------------------------------
# Worley / cellular noise (rng.hpp:193-278)
# ---------------------------------------------------------------------------

_FLT_MAX = F32(3.4028235e38)


def worley2(px, py, want_color: bool = False, want_edge: bool = False):
    """2D Worley. Returns dict with 'f1' and optionally 'color' (3-tuple), 'edge'."""
    px = _f(px)
    py = _f(py)
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    fx = px - ix
    fy = py - iy

    min1 = jnp.full(jnp.shape(px), _FLT_MAX, F32)
    min2 = min1
    cpx = jnp.zeros_like(min1)
    cpy = jnp.zeros_like(min1)

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            rx, ry = rand2_from2(ix + F32(ox), iy + F32(oy))
            dx = F32(ox) + rx - fx
            dy = F32(oy) + ry - fy
            d = sqrt_cr(dx * dx + dy * dy)
            is1 = d < min1
            is2 = jnp.logical_and(~is1, d < min2)
            min2 = jnp.where(is1, min1, jnp.where(is2, d, min2))
            min1 = jnp.where(is1, d, min1)
            cpx = jnp.where(is1, rx, cpx)
            cpy = jnp.where(is1, ry, cpy)

    out = {"f1": min1}
    if want_color:
        out["color"] = rand3_from2(cpx, cpy)
    if want_edge:
        out["edge"] = (min2 - min1) * F32(0.5)
    return out


def worley3(px, py, pz, want_color: bool = False, want_edge: bool = False):
    """3D Worley. Returns dict with 'f1' and optionally 'color' (3-tuple), 'edge'."""
    px = _f(px)
    py = _f(py)
    pz = _f(pz)
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    iz = jnp.floor(pz)
    fx = px - ix
    fy = py - iy
    fz = pz - iz

    min1 = jnp.full(jnp.shape(px), _FLT_MAX, F32)
    min2 = min1
    cpx = jnp.zeros_like(min1)
    cpy = jnp.zeros_like(min1)
    cpz = jnp.zeros_like(min1)

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                rx, ry, rz = rand3_from3(ix + F32(ox), iy + F32(oy), iz + F32(oz))
                dx = F32(ox) + rx - fx
                dy = F32(oy) + ry - fy
                dz = F32(oz) + rz - fz
                d = sqrt_cr(dx * dx + dy * dy + dz * dz)
                is1 = d < min1
                is2 = jnp.logical_and(~is1, d < min2)
                min2 = jnp.where(is1, min1, jnp.where(is2, d, min2))
                min1 = jnp.where(is1, d, min1)
                cpx = jnp.where(is1, rx, cpx)
                cpy = jnp.where(is1, ry, cpy)
                cpz = jnp.where(is1, rz, cpz)

    out = {"f1": min1}
    if want_color:
        out["color"] = rand3_from3(cpx, cpy, cpz)
    if want_edge:
        out["edge"] = (min2 - min1) * F32(0.5)
    return out


def special_cave_noise(px, py, pz):
    """3-min-distance Worley ratio: min3/min1 - 1 (rng.hpp:282-320)."""
    px = _f(px)
    py = _f(py)
    pz = _f(pz)
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    iz = jnp.floor(pz)
    fx = px - ix
    fy = py - iy
    fz = pz - iz

    min1 = jnp.full(jnp.shape(px), _FLT_MAX, F32)
    min2 = min1
    min3 = min1

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                rx, ry, rz = rand3_from3(ix + F32(ox), iy + F32(oy), iz + F32(oz))
                dx = F32(ox) + rx - fx
                dy = F32(oy) + ry - fy
                dz = F32(oz) + rz - fz
                d = sqrt_cr(dx * dx + dy * dy + dz * dz)
                is1 = d < min1
                is2 = jnp.logical_and(~is1, d < min2)
                is3 = jnp.logical_and(jnp.logical_and(~is1, ~is2), d < min3)
                min3 = jnp.where(
                    is1, min2, jnp.where(is2, min2, jnp.where(is3, d, min3))
                )
                # careful: on is1, min3 <- old min2; on is2, min3 <- old min2 as well
                min2 = jnp.where(is1, min1, jnp.where(is2, d, min2))
                min1 = jnp.where(is1, d, min1)

    return div_cr(min3, min1) - F32(1.0)
