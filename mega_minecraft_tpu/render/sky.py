"""Procedural sky: sun/moon disks + halos, Worley-cell stars, fBm cloud march,
sunset band, day/night base — plus the renderer-side Perlin noise it is built on.

TPU-native equivalent of the reference sky (reference behavior:
/root/reference/src/shaders/basic_shaders.cu:148-556 ``getSkyColor`` /
``getStarsColor`` / ``getCloudCoverage`` / ``pnoise``; sun/moon/star rotation clock
/root/reference/src/rendering/optixRenderer.cpp:878-900).

All functions are elementwise over ray-direction component arrays; colors are
(r, g, b) tuples of arrays so XLA keeps everything in registers/VPU lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32



def _fade(t):
    return t * t * t * (t * (t * F32(6.0) - F32(15.0)) + F32(10.0))


def _grad(h, x, y, z):
    h = h & I32(15)
    u = jnp.where(h < I32(8), x, y)
    v = jnp.where(h < I32(4), y, jnp.where((h == I32(12)) | (h == I32(14)), x, z))
    return jnp.where(h & I32(1) == 0, u, -u) + jnp.where(h & I32(2) == 0, v, -v)


def _lattice_hash(ix, iy, iz):
    """Gather-free lattice hash replacing the permutation-table lookups.

    TPU-first deviation from the reference: the reference's Perlin uses the classic
    256-entry table (basic_shaders.cu:221-251), but per-lane table gathers are the
    slowest op on the VPU (~3 s/frame for the cloud march) — an arithmetic integer
    mix gives statistically equivalent gradients in pure vector ALU.  This only
    affects renderer aesthetics (clouds/stars/waves); world content determinism is
    untouched (terrain noise lives in ops/noise.py).
    """
    u32 = jnp.uint32
    h = (
        ix.astype(u32) * u32(0x8DA6B343)
        + iy.astype(u32) * u32(0xD8163841)
        + iz.astype(u32) * u32(0xCB1AB31F)
    )
    h = h ^ (h >> u32(13))
    h = h * u32(0x9E3779B1)
    h = h ^ (h >> u32(16))
    return h.astype(I32)


def pnoise(px, py, pz):
    """Classic Perlin noise structure with a hash-based lattice (see _lattice_hash)."""
    px = jnp.asarray(px, F32)
    py = jnp.asarray(py, F32)
    pz = jnp.asarray(pz, F32)
    xf = jnp.floor(px)
    yf = jnp.floor(py)
    zf = jnp.floor(pz)
    X = xf.astype(I32)
    Y = yf.astype(I32)
    Z = zf.astype(I32)
    x = px - xf
    y = py - yf
    z = pz - zf
    u = _fade(x)
    v = _fade(y)
    w = _fade(z)

    def lerp(t, a, b):
        return a + t * (b - a)

    def g(dx_, dy_, dz_):
        return _grad(
            _lattice_hash(X + dx_, Y + dy_, Z + dz_), x - dx_, y - dy_, z - dz_
        )

    return lerp(
        w,
        lerp(v, lerp(u, g(0, 0, 0), g(1, 0, 0)), lerp(u, g(0, 1, 0), g(1, 1, 0))),
        lerp(v, lerp(u, g(0, 0, 1), g(1, 0, 1)), lerp(u, g(0, 1, 1), g(1, 1, 1))),
    )


def fbm_p(px, py, pz, octaves: int = 5):
    """Renderer-side fBm over pnoise (basic_shaders.cu:306-320)."""
    total = None
    amplitude = 1.0
    for _ in range(octaves):
        amplitude *= 0.5
        term = F32(amplitude) * pnoise(px, py, pz)
        total = term if total is None else total + term
        px = px * F32(2.0)
        py = py * F32(2.0)
        pz = pz * F32(2.0)
    return total


def smoothstep(e0, e1, x):
    t = jnp.clip((jnp.asarray(x, F32) - F32(e0)) / (F32(e1) - F32(e0)), 0.0, 1.0)
    return t * t * (F32(3.0) - F32(2.0) * t)


def linearstep(e0, e1, x):
    return jnp.clip((jnp.asarray(x, F32) - F32(e0)) / (F32(e1) - F32(e0)), 0.0, 1.0)


def _fract(x):
    return x - jnp.floor(x)


def _rand1_from3_r(px, py, pz):
    """Renderer-side sin hash (basic_shaders.cu:336-340): different constants from the
    terrain-side hash."""
    d = px * F32(185.3) + py * F32(563.9) + pz * F32(887.2)
    return _fract(jnp.sin(d) * F32(58293.492))


def _rand3_from3_r(px, py, pz):
    d0 = px * F32(185.3) + py * F32(563.9) + pz * F32(887.2)
    d1 = px * F32(593.1) + py * F32(591.2) + pz * F32(402.1)
    d2 = px * F32(938.2) + py * F32(723.4) + pz * F32(768.9)
    s = lambda d: _fract(jnp.sin(d) * F32(58293.492))
    return s(d0), s(d1), s(d2)


class SkyParams(NamedTuple):
    """Sun/moon/star state (launch params analogue)."""

    sun_dir: jnp.ndarray  # [3]
    moon_dir: jnp.ndarray  # [3]
    stars_rot: jnp.ndarray  # [3, 3] inverse sun rotation
    time: jnp.ndarray  # scalar f32


_SUN_AXIS_FORWARD = np.array([6.0, -2.0, 2.0]) / np.linalg.norm([6.0, -2.0, 2.0])
_SUN_AXIS_RIGHT = np.cross(_SUN_AXIS_FORWARD, [0.0, 1.0, 0.0])
_SUN_AXIS_RIGHT /= np.linalg.norm(_SUN_AXIS_RIGHT)
_SUN_AXIS_UP = np.cross(_SUN_AXIS_RIGHT, _SUN_AXIS_FORWARD)
_SUN_AXIS_UP /= np.linalg.norm(_SUN_AXIS_UP)


def sky_params(sun_time, time) -> SkyParams:
    """Sun clock (optixRenderer.cpp:878-900): sunTime advances at −0.025 rad/s."""
    st = jnp.asarray(sun_time, F32)
    fwd = jnp.asarray(_SUN_AXIS_FORWARD, F32)
    right0 = jnp.asarray(_SUN_AXIS_RIGHT, F32)
    up0 = jnp.asarray(_SUN_AXIS_UP, F32)
    rot_right = jnp.cos(st) * right0 + jnp.sin(st) * up0
    rot_up = jnp.cross(rot_right, fwd)
    rot_up = rot_up / jnp.linalg.norm(rot_up)
    # column-major mat3(rotatedAxisRight, sunAxisForward, rotatedAxisUp)
    m = jnp.stack([rot_right, fwd, rot_up], axis=1)  # columns

    def app(v):
        v = jnp.asarray(v, F32)
        r = m @ v
        return r / jnp.linalg.norm(r)

    return SkyParams(
        sun_dir=app([1.0, 0.15, 0.0]),
        moon_dir=app([-1.0, 0.50, 0.0]),
        stars_rot=m.T,
        time=jnp.asarray(time, F32),
    )


def _stars_color(dx, dy, dz):
    """getStarsColor (basic_shaders.cu:355-398)."""
    ux, uy, uz = dx * F32(30.0), dy * F32(30.0), dz * F32(30.0)
    ix, iy, iz = jnp.floor(ux), jnp.floor(uy), jnp.floor(uz)
    rx, ry, rz = _rand3_from3_r(ix, iy, iz)
    px = F32(0.1) + F32(0.9) * rx
    py = F32(0.1) + F32(0.9) * ry
    pz = F32(0.1) + F32(0.9) * rz
    dxx = px - (ux - ix)
    dyy = py - (uy - iy)
    dzz = pz - (uz - iz)
    dist = jnp.sqrt(dxx * dxx + dyy * dyy + dzz * dzz)
    rand = _rand1_from3_r(px, py, pz)
    brightness = smoothstep(0.08, 0.05, dist)

    def pal(r):
        return (
            jnp.where(r < 0.35, F32(1.000), jnp.where(r < 0.70, F32(0.929), jnp.where(r < 0.82, F32(0.482), jnp.where(r < 0.94, F32(1.000), F32(1.000))))),
            jnp.where(r < 0.35, F32(0.863), jnp.where(r < 0.70, F32(0.984), jnp.where(r < 0.82, F32(0.816), jnp.where(r < 0.94, F32(0.663), F32(0.455))))),
            jnp.where(r < 0.35, F32(0.333), jnp.where(r < 0.70, F32(1.000), jnp.where(r < 0.82, F32(1.000), jnp.where(r < 0.94, F32(0.271), F32(0.282))))),
        )

    cr, cg, cb = pal(rand)
    s = brightness * F32(3.0)
    return cr * s, cg * s, cb * s


def _clouds_noise(cx, cy, cz, time):
    """sampleCloudsNoise (basic_shaders.cu:400-407)."""
    n1 = pnoise(cx - F32(962.43), cy - F32(962.43), cz - F32(962.43)) * F32(0.01)
    n2 = pnoise(cx * F32(254.32), cy * F32(254.32), cz * F32(254.32)) * F32(0.01)
    cn = (fbm_p(cx * F32(0.05) + n1, cz * F32(0.05) + n2, jnp.broadcast_to(time * F32(0.015), cx.shape), octaves=3) + F32(1.0)) * F32(0.5)
    cn = cn + fbm_p(cx * F32(0.15) - F32(325.32), cz * F32(0.15) + F32(613.58), jnp.broadcast_to(time * F32(0.040), cx.shape), octaves=3) * F32(0.3)
    cn = cn * (pnoise(cx * F32(0.03) + F32(821.23), cz * F32(0.03) - F32(721.33), jnp.broadcast_to(time * F32(0.003) + F32(276.21), cx.shape)) + F32(1.0)) * F32(0.9)
    return smoothstep(0.35, 0.75, cn - F32(0.01) * cy)


def _cloud_coverage(pos, dx, dy, dz, params: SkyParams):
    """getCloudCoverage (basic_shaders.cu:410-433); pos: (x, y, z) arrays."""
    t = F32(20.0) / dy
    cx = dx * t + pos[0] * F32(0.01) + F32(0.3) * params.time
    cy = jnp.zeros_like(dx)
    cz = dz * t + pos[2] * F32(0.01) + F32(0.6) * params.time
    coverage = jnp.zeros_like(dx)
    for i in range(12):
        step = F32(0.2 * i)
        cx = cx + dx * step
        cy = cy + dy * step
        cz = cz + dz * step
        coverage = coverage + _clouds_noise(cx, cy, cz, params.time) * step
    coverage = jnp.minimum(F32(1.0), coverage * F32(0.1))
    return jnp.where(dy < F32(0.04), F32(0.0), coverage)


def sky_color(dx, dy, dz, params: SkyParams, origin=None, first_hit=None, include_stars=True):
    """getSkyColor (basic_shaders.cu:436-556).

    Args:
      dx/dy/dz: ray direction components (any shape).
      origin: (x, y, z) ray-origin arrays — needed for clouds (first-hit rays).
      first_hit: bool array — rays that still need first-hit data (clouds+stars only
        render for those).  None -> treated as all-False.
    Returns ((r, g, b), found_light) where found_light marks sun/moon disk hits.
    """
    sun = params.sun_dir
    moon = params.moon_dir
    sun_y = sun[1]

    entire = smoothstep(-0.4, 0.2, dy)
    base_strength = F32(0.04) + F32(0.96) * smoothstep(-0.25, 0.10, sun_y)
    ground = (F32(1.0) * F32(0.5) * base_strength, F32(0.8) * F32(0.5) * base_strength, F32(0.65) * F32(0.5) * base_strength)

    r = jnp.zeros_like(dy)
    g = jnp.zeros_like(dy)
    b = jnp.zeros_like(dy)

    sun_strength = smoothstep(-0.5, -0.2, sun_y)
    sun_d = dx * sun[0] + dy * sun[1] + dz * sun[2]
    is_sun_or_moon = jnp.zeros_like(dy, dtype=bool)

    if include_stars:
        sun_color_mod = smoothstep(-0.05, 0.40, sun_y)
        scr = F32(1.20)
        scg = F32(0.05) + F32(0.70) * sun_color_mod
        scb = F32(0.42) * sun_color_mod
        halo = smoothstep(0.05, 0.20, sun_y) * F32(0.4)
        halo_f = jnp.power(smoothstep(0.98, 0.9975, sun_d), F32(3.0)) * halo
        disk = sun_d > F32(0.995)
        disk_f = jnp.where(
            disk,
            (F32(1.0) - F32(5000.0) * (F32(1.0) - sun_d) ** 2) * (F32(0.3) + F32(0.7) * sun_color_mod) * F32(45.0),
            F32(0.0),
        )
        active = (sun_strength > F32(0.0)) & (sun_d > F32(0.98))
        r = r + jnp.where(active, (halo_f * (scr + F32(0.0)) + disk_f * scr) * sun_strength, 0.0)
        g = g + jnp.where(active, (halo_f * (scg + F32(0.1)) + disk_f * scg) * sun_strength, 0.0)
        b = b + jnp.where(active, (halo_f * (scb + F32(0.1)) + disk_f * scb) * sun_strength, 0.0)
        is_sun_or_moon = is_sun_or_moon | (active & disk)

        moon_strength = smoothstep(-0.5, -0.2, moon[1])
        moon_d = dx * moon[0] + dy * moon[1] + dz * moon[2]
        mcr, mcg, mcb = F32(0.6 * 0.3), F32(0.7 * 0.3), F32(1.0 * 0.3)
        mhalo = smoothstep(0.05, 0.20, moon[1]) * F32(0.2)
        mhalo_f = jnp.power(smoothstep(0.985, 0.9983, moon_d), F32(3.0)) * mhalo
        mdisk = moon_d > F32(0.997)
        mdisk_f = jnp.where(mdisk, F32(24.0), F32(0.0))
        mactive = (moon_strength > F32(0.0)) & (moon_d > F32(0.985))
        r = r + jnp.where(mactive, (mhalo_f * mcr + mdisk_f * mcr) * moon_strength, 0.0)
        g = g + jnp.where(mactive, (mhalo_f * mcg + mdisk_f * mcg) * moon_strength, 0.0)
        b = b + jnp.where(mactive, (mhalo_f * (mcb + F32(0.15)) + mdisk_f * mcb) * moon_strength, 0.0)
        is_sun_or_moon = is_sun_or_moon | (mactive & mdisk)

    # base color + stars
    base_lerp = smoothstep(0.15, -0.15, dy) * F32(0.14)
    sbr = F32(0.10) + (F32(0.8) - F32(0.10)) * base_lerp
    sbg = F32(0.16) + (F32(0.8) - F32(0.16)) * base_lerp
    sbb = F32(0.20) + (F32(1.0) - F32(0.20)) * base_lerp
    not_body = ~is_sun_or_moon
    r = r + jnp.where(not_body, sbr * base_strength, 0.0)
    g = g + jnp.where(not_body, sbg * base_strength, 0.0)
    b = b + jnp.where(not_body, sbb * base_strength, 0.0)

    stars_strength = smoothstep(0.03, -0.22, sun_y)
    if include_stars and first_hit is not None:
        m = params.stars_rot
        sx = m[0, 0] * dx + m[0, 1] * dy + m[0, 2] * dz
        sy = m[1, 0] * dx + m[1, 1] * dy + m[1, 2] * dz
        sz = m[2, 0] * dx + m[2, 1] * dy + m[2, 2] * dz
        str_, stg, stb = _stars_color(sx, sy, sz)
        sm = not_body & first_hit
        r = r + jnp.where(sm, str_ * stars_strength, 0.0)
        g = g + jnp.where(sm, stg * stars_strength, 0.0)
        b = b + jnp.where(sm, stb * stars_strength, 0.0)

    # sunrise/sunset orange band
    hd = jnp.arccos(jnp.clip(dx * sun[0] + dz * sun[2], -1.0, 1.0))
    orange = (
        smoothstep(-0.13, -0.02, sun_y)
        * smoothstep(0.25, 0.05, sun_y)
        * smoothstep(-2.5, 0.65, sun_d)
        * smoothstep(1.05, 0.18, dy + smoothstep(0.0, np.pi, hd) * F32(0.6))
    )
    orange = jnp.where((sun_strength > F32(0.0)) & not_body, orange, F32(0.0))
    r = r + (F32(1.40) - r) * orange
    g = g + (F32(0.35) - g) * orange
    b = b + (F32(0.0) - b) * orange

    # clouds — only for first-hit rays
    if first_hit is not None and origin is not None:
        cov = _cloud_coverage(origin, dx, dy, dz, params)
        cov = jnp.where(first_hit, jnp.minimum(F32(0.92), cov), F32(0.0))
        ccr = F32(0.9) * jnp.power(base_strength, F32(1.15))
        ccg = ccr
        ccb = ccr
        ccr = ccr + (F32(1.20) - ccr) * (orange * F32(0.9))
        ccg = ccg + (F32(0.30) - ccg) * (orange * F32(0.9))
        ccb = ccb + (F32(0.10) - ccb) * (orange * F32(0.9))
        r = r + (ccr - r) * cov
        g = g + (ccg - g) * cov
        b = b + (ccb - b) * cov

    out_r = ground[0] + (r - ground[0]) * entire
    out_g = ground[1] + (g - ground[1]) * entire
    out_b = ground[2] + (b - ground[2]) * entire
    return (out_r, out_g, out_b), is_sun_or_moon
