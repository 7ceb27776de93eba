"""Denoiser: edge-avoiding à-trous wavelet filter with albedo/normal guides.

TPU-native replacement for the OptiX AOV denoiser (reference behavior:
/root/reference/src/rendering/optixRenderer.cpp:757-833,939-975 — HDR average-color
denoise with albedo+normal guide layers, optionally 2× upscaling).  No neural
denoiser runs on TPU here; instead the classic SVGF-style à-trous filter (Dammertz et
al.) uses the same guide AOVs the reference feeds OptiX.  Temporal accumulation —
the other half of the reference's convergence story — already lives in
tracer.accumulate.

Everything is 5-tap separable B3-spline convolutions + elementwise weights: pure
VPU/convolution work that XLA maps well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

F32 = jnp.float32

_B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _shift2(a, dy: int, dx: int):
    return jnp.roll(a, (dy, dx), axis=(0, 1))


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    color,
    albedo,
    normal,
    iterations: int = 4,
    sigma_color: float = 4.0,
    sigma_albedo: float = 0.25,
    sigma_normal: float = 0.35,
    nsamp=None,
):
    """[H, W, 3] HDR color + guides -> denoised color.

    Weights: w = B3(tap) * exp(-|Δcolor|²/σc²) * exp(-|Δalbedo|²/σa²) *
    exp(-|Δnormal|²/σn²), accumulated over the 5×5 à-trous pattern with stride 2^i.

    ``nsamp``: optional [H, W] per-pixel accumulated sample count (the temporal
    framebuffers track it).  The variance of an n-sample mean falls as 1/n, so the
    color-similarity sigma tightens as σc/√n (SVGF's variance guidance with the
    analytic estimator): converged pixels keep their detail while fresh
    disocclusions (n≈1) still blur over.  Streaming frames have wildly mixed n —
    reprojected history next to just-streamed chunks — which a fixed σc cannot
    serve at both ends.
    """
    # channels-planar [3, H, W]: the W axis lands on the VPU's 128 lanes; the
    # interleaved [H, W, 3] layout would put 3 there (1/42 utilization) because the
    # trailing-axis reductions/broadcasts pin the channel axis minor
    c = jnp.moveaxis(jnp.asarray(color, F32), -1, 0)
    alb = jnp.moveaxis(jnp.asarray(albedo, F32), -1, 0)
    nrm = jnp.moveaxis(jnp.asarray(normal, F32), -1, 0)
    if nsamp is not None:
        inv_sc2 = jnp.clip(jnp.asarray(nsamp, F32), 1.0, 64.0) / F32(sigma_color**2)
    else:
        inv_sc2 = F32(1.0 / sigma_color**2)

    def shiftp(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(1, 2))

    for it in range(iterations):
        stride = 1 << it
        acc = jnp.zeros_like(c)
        wsum = jnp.zeros(c.shape[1:], F32)
        for ty in range(-2, 3):
            for tx in range(-2, 3):
                k = F32(_B3[ty + 2] * _B3[tx + 2])
                dy, dx = ty * stride, tx * stride
                cs = shiftp(c, dy, dx)
                als = shiftp(alb, dy, dx)
                ns = shiftp(nrm, dy, dx)
                dc = jnp.sum((cs - c) ** 2, axis=0)
                da = jnp.sum((als - alb) ** 2, axis=0)
                dn = jnp.sum((ns - nrm) ** 2, axis=0)
                w = k * jnp.exp(
                    -dc * inv_sc2
                    - da / F32(sigma_albedo**2)
                    - dn / F32(sigma_normal**2)
                )
                acc = acc + cs * w[None]
                wsum = wsum + w
        c = acc / jnp.maximum(wsum, 1e-6)[None]
    return jnp.moveaxis(c, 0, -1)


def psnr(img, ref, peak: float | None = None) -> float:
    """PSNR (dB) of ``img`` against ``ref`` after ACES tonemapping to display
    space — convergence quality is a perceptual claim (the reference's "<1 s to
    a clean image", README.md:320), so it is measured on the presented image,
    not raw HDR radiance where the sun dominates the error budget."""
    import numpy as np

    from .tonemap import present

    a = np.asarray(present(img), np.float32) / 255.0
    b = np.asarray(present(ref), np.float32) / 255.0
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((peak or 1.0) ** 2 / mse))


@jax.jit
def upscale2x(img):
    """Bilinear 2× upscale — the reference's USE_UPSCALING present path
    (optixRenderer.cpp:462-466 renders at half res and denoise-upscales)."""
    img = jnp.asarray(img, F32)
    h, w, ch = img.shape
    out = jax.image.resize(img, (h * 2, w * 2, ch), method="bilinear")
    return out
