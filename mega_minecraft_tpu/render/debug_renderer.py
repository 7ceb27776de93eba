"""Debug renderer: direct-light Lambert + shadowing + volumetric fog + bloom.

TPU-native equivalent of the reference's OpenGL debug rasterizer (reference behavior:
/root/reference/src/rendering/renderer.cpp:19-523 behind DEBUG_USE_GL_RENDERER — an
8192² shadow map with PCF, Lambert sun/moon/ambient shading, a procedural sky quad,
a 320×180×128 froxel volumetric fog (fill + raymarch compute passes), bloom
(bright-pass + separable Gaussian ping-pong), and an ACES final pass).

TPU-first redesign: a rasterizer + shadow map maps poorly onto XLA, and the engine
already owns a voxel DDA — so the debug path is ONE primary trace + ONE sun shadow
trace per pixel (the shadow *ray* replaces the shadow *map*; exact hard shadows, no
PCF needed), Lambert shading from the same material table, an analytic exponential
fog with shadowed in-scatter sampled along the primary ray (the froxel-grid
raymarch collapsed to K jittered samples), and bloom + ACES as image-space JAX ops.
It is deterministic and noise-free in one frame — the debug half of the reference's
QA story (chunk/zone tint overlays CHUNK_COLOR/ZONE_COLOR, defines.glsl:5-6, are the
``tint`` option).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..world.blocks import Block
from . import sky as sky_mod
from .brickmap import Scene
from .materials import BLOCK_PROPS, unpack_props
from .sky import SkyParams, smoothstep
from .tracer import trace

F32 = jnp.float32
U8 = jnp.uint8
AIR = int(Block.AIR)

FOG_DENSITY = 0.004
FOG_SAMPLES = 8
BLOOM_THRESHOLD = 1.0
BLOOM_PASSES = 5


def _gauss_blur(img, stride: int):
    """6-tap-ish separable Gaussian (bloom_blur.frag.glsl's weights)."""
    w = (0.227027, 0.1945946, 0.1216216, 0.054054, 0.016216)
    out = img * F32(w[0])
    for i in range(1, 5):
        out = out + (jnp.roll(img, i * stride, axis=1) + jnp.roll(img, -i * stride, axis=1)) * F32(w[i])
    img = out
    out = img * F32(w[0])
    for i in range(1, 5):
        out = out + (jnp.roll(img, i * stride, axis=0) + jnp.roll(img, -i * stride, axis=0)) * F32(w[i])
    return out


@partial(jax.jit, static_argnames=("height", "width", "tint"))
def render_debug(
    scene: Scene,
    cam,
    params: SkyParams,
    height: int,
    width: int,
    tint: str = "none",
):
    """One deterministic direct-light frame.  Returns [H, W, 3] linear HDR.

    tint: 'none' | 'chunk' | 'zone' — the CHUNK_COLOR/ZONE_COLOR debug overlays.
    """
    from .camera import pixel_rays

    shape = (height, width)
    z = jnp.zeros(shape, F32)
    dx, dy, dz = pixel_rays(cam, width, height, (z, z))
    pos = tuple(jnp.broadcast_to(cam.position[i], shape) for i in range(3))

    res = trace(scene, *pos, dx, dy, dz, jnp.full(shape, U8(AIR)))
    hit = res.hit & (res.block != U8(AIR))

    isx = pos[0] + dx * res.t
    isy = pos[1] + dy * res.t
    isz = pos[2] + dz * res.t

    props = jnp.asarray(BLOCK_PROPS)[res.block.astype(jnp.int32)]
    col_r, col_g, col_b, _mat, emis = unpack_props(props)

    # tint overlays (lambert.frag.glsl:98-108)
    if tint != "none":
        cell = 16.0 if tint == "chunk" else 16.0 * 12.0
        cx = jnp.floor(isx / F32(cell))
        cz = jnp.floor(isz / F32(cell))
        h = sky_mod._rand3_from3_r(cx, cz, cx + cz)
        col_r = col_r * (F32(0.5) + F32(0.5) * h[0])
        col_g = col_g * (F32(0.5) + F32(0.5) * h[1])
        col_b = col_b * (F32(0.5) + F32(0.5) * h[2])

    # sun (or moon at night) shadow ray from the hit point
    sun = params.sun_dir
    moon = params.moon_dir
    use_sun = sun[1] > F32(0.0)
    ldir = jnp.where(use_sun, sun, moon)
    lx = jnp.broadcast_to(ldir[0], shape)
    ly = jnp.broadcast_to(ldir[1], shape)
    lz = jnp.broadcast_to(ldir[2], shape)
    eps = F32(1e-3)
    sres = trace(
        scene,
        isx + res.nx * eps,
        isy + res.ny * eps,
        isz + res.nz * eps,
        lx,
        ly,
        lz,
        jnp.full(shape, U8(AIR)),
    )
    lit = ~sres.hit

    ndotl = jnp.maximum(res.nx * lx + res.ny * ly + res.nz * lz, 0.0)
    sun_i = jnp.where(use_sun, F32(1.0), F32(0.12))
    light_strength = smoothstep(-0.1, 0.1, jnp.abs(jnp.where(use_sun, sun[1], moon[1])))
    ambient = F32(0.22) + F32(0.18) * smoothstep(-0.25, 0.10, sun[1])
    direct = jnp.where(lit, ndotl * sun_i * light_strength, 0.0)
    shade = ambient + direct + emis * F32(4.0)

    r = col_r * shade
    g = col_g * shade
    b = col_b * shade

    # sky for misses
    (skr, skg, skb), _ = sky_mod.sky_color(dx, dy, dz, params, origin=pos, first_hit=~hit)
    r = jnp.where(hit, r, skr)
    g = jnp.where(hit, g, skg)
    b = jnp.where(hit, b, skb)

    # volumetric fog: K shadowed in-scatter samples along the primary ray
    # (volume_fill + volume_raymarch collapsed; exp height+distance falloff)
    t_end = jnp.where(hit, res.t, F32(300.0))
    in_scatter = jnp.zeros(shape, F32)
    for k in range(FOG_SAMPLES):
        frac = F32((k + 0.5) / FOG_SAMPLES)
        tk = t_end * frac
        fx = pos[0] + dx * tk
        fy = pos[1] + dy * tk
        fz = pos[2] + dz * tk
        fsh = trace(scene, fx, fy, fz, lx, ly, lz, jnp.full(shape, U8(AIR)))
        dens = jnp.exp(-jnp.maximum(fy - F32(128.0), 0.0) * F32(0.01))
        in_scatter = in_scatter + jnp.where(fsh.hit, 0.0, dens) / F32(FOG_SAMPLES)
    fog_amount = F32(1.0) - jnp.exp(-t_end * F32(FOG_DENSITY))
    fog_amount = fog_amount * (F32(0.35) + F32(0.65) * in_scatter) * light_strength
    (fr, fg, fb), _ = sky_mod.sky_color(dx, jnp.abs(dy) * 0 + F32(0.05), dz, params)
    r = r + (fr - r) * fog_amount
    g = g + (fg - g) * fog_amount
    b = b + (fb - b) * fog_amount

    img = jnp.stack([r, g, b], axis=-1)

    # bloom: bright-pass + widening Gaussian pings (postprocess_1 + bloom_blur)
    lum = F32(0.2126) * r + F32(0.7152) * g + F32(0.0722) * b
    bright = jnp.where((lum > F32(BLOOM_THRESHOLD))[..., None], img, 0.0)
    blur = bright
    for p in range(BLOOM_PASSES):
        blur = _gauss_blur(blur, 1 << p)
    return img + blur * F32(0.35)
