"""ACES filmic tonemap + gamma, as JAX image ops.

TPU-native equivalent of the reference's fullscreen-triangle present shader
(reference behavior: /root/reference/src/rendering/d3d11Renderer.cpp:17-24,44-46 —
ACESFilm narkowicz curve + gamma 1/2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32


def aces_film(x):
    a, b, c, d, e = F32(2.51), F32(0.03), F32(2.43), F32(0.59), F32(0.14)
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


@jax.jit
def present(hdr):
    """[H, W, 3] linear HDR -> [H, W, 3] uint8 sRGB-ish (ACES + gamma 1/2.2)."""
    ldr = jnp.power(aces_film(jnp.asarray(hdr, F32)), F32(1.0 / 2.2))
    return (jnp.clip(ldr, 0.0, 1.0) * F32(255.0) + F32(0.5)).astype(jnp.uint8)
