"""Deterministic integer hash + LCG random-engine primitives (vectorized, uint32).

World content in Mega Minecraft is a pure function of integer world coordinates and
hard-coded seed constants.  This module reproduces the reference's integer-mixing hash,
its thrust ``default_random_engine`` (minstd LCG, multiplier 48271 mod 2^31-1), and its
sin-dot float hashes, all with f32/u32 semantics so terrain decisions (feature placement,
random biome picks, block substitutions) are reproducible.

Reference behavior: /root/reference/src/util/rng.hpp:69-155 (hash, makeSeededRandomEngine,
rand*From* sin-dot hashes); thrust's minstd engine + uniform_real_distribution semantics.

All functions are shape-polymorphic: inputs are jnp arrays (any broadcastable shape),
outputs match.  Integer state is uint32; the LCG advance uses Schrage's algorithm so no
64-bit arithmetic is needed (TPU-friendly, works with jax_enable_x64=False).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32

# minstd_rand parameters (thrust::default_random_engine)
LCG_M = 2147483647  # 2^31 - 1
LCG_A = 48271
_LCG_Q = LCG_M // LCG_A  # 44488
_LCG_R = LCG_M % LCG_A  # 3399
# uniform_real_distribution maps engine output in [min=1, max=m-1] to [lo, hi] via
# (x - min) / (max - min); range = m - 2.
_LCG_RANGE = float(LCG_M - 2)  # 2147483645


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x).astype(U32)


def hash_u32(a) -> jnp.ndarray:
    """Integer mixer used for all engine seeding (rng.hpp:69-78)."""
    a = _u32(a)
    a = (a + U32(0x7ED55D16)) + (a << U32(12))
    a = (a ^ U32(0xC761C23C)) ^ (a >> U32(19))
    a = (a + U32(0x165667B1)) + (a << U32(5))
    a = (a + U32(0xD3A2646C)) ^ (a << U32(9))
    a = (a + U32(0xFD7046C5)) + (a << U32(3))
    a = (a ^ U32(0xB55A4F09)) ^ (a >> U32(16))
    return a


def seed_1(x) -> jnp.ndarray:
    """makeSeededRandomEngine(x) -> initial LCG state (rng.hpp:80-84)."""
    return _engine_init(hash_u32(_u32(x)))


def seed_3(x, y, z) -> jnp.ndarray:
    """makeSeededRandomEngine(x, y, z) -> initial LCG state (rng.hpp:86-90).

    h = hash((1 << 31) | (x << 22) | y) ^ hash(z), with int wrap == uint32 wrap.
    """
    h = hash_u32(U32(1 << 31) | (_u32(x) << U32(22)) | _u32(y)) ^ hash_u32(_u32(z))
    return _engine_init(h)


def seed_4(x, y, z, w) -> jnp.ndarray:
    """makeSeededRandomEngine(x, y, z, w) -> initial LCG state (rng.hpp:92-96)."""
    h = hash_u32(
        U32(1 << 31) | (_u32(x) << U32(22)) | (_u32(y) << U32(11)) | _u32(w)
    ) ^ hash_u32(_u32(z))
    return _engine_init(h)


def _engine_init(s) -> jnp.ndarray:
    """linear_congruential_engine seeding: state = s mod m, 0 -> 1."""
    s = _u32(s) % U32(LCG_M)
    return jnp.where(s == U32(0), U32(1), s)


def lcg_next(state) -> jnp.ndarray:
    """One minstd step: state' = (48271 * state) mod (2^31 - 1), via Schrage."""
    state = _u32(state)
    hi = state // U32(_LCG_Q)
    lo = state % U32(_LCG_Q)
    # a*lo <= 48271*44487 < 2^31 and r*hi < 2^28: both fit in uint32 (and int32).
    t_pos = U32(LCG_A) * lo
    t_neg = U32(_LCG_R) * hi
    return jnp.where(t_pos >= t_neg, t_pos - t_neg, t_pos + U32(LCG_M) - t_neg)


def lcg_u01(state):
    """Draw one uniform float in [0, 1] (thrust uniform_real_distribution<float>(0,1)).

    Returns (value, new_state).  value = (x - 1) / (m - 2) where x is the new state.
    """
    state = lcg_next(state)
    v = (state - U32(1)).astype(F32) / F32(_LCG_RANGE)
    return v, state


def lcg_uniform(state, lo: float, hi: float):
    """Draw one uniform float in [lo, hi]; returns (value, new_state)."""
    v, state = lcg_u01(state)
    return v * F32(hi - lo) + F32(lo), state


# ---------------------------------------------------------------------------
# LCG jumping: state after k steps is a^k·s0 mod m in closed form, so a long
# *sequential* draw stream whose per-consumer draw COUNTS are data-independent
# can be evaluated fully in parallel — each consumer gathers a^k from a host
# precomputed power table and does one modular multiply by s0.  This removes
# the serial scan that otherwise dominates (decorators: 256-column stream).
# ---------------------------------------------------------------------------


def lcg_pow_table(n: int):
    """[n] u32 numpy table: a^k mod m for k in [0, n)."""
    import numpy as np

    out = np.empty(n, np.uint64)
    v = 1
    for k in range(n):
        out[k] = v
        v = (v * LCG_A) % LCG_M
    return out.astype(np.uint32)


def lcg_mulmod(x, y) -> jnp.ndarray:
    """(x · y) mod (2^31 − 1) for u32 inputs < 2^31, in pure u32 arithmetic.

    16-bit splitting plus Mersenne folding (2^31 ≡ 1, 2^32 ≡ 2 mod m); no
    64-bit ops, TPU-friendly.
    """
    x = _u32(x)
    y = _u32(y)
    m = U32(LCG_M)
    xh, xl = x >> U32(16), x & U32(0xFFFF)
    yh, yl = y >> U32(16), y & U32(0xFFFF)

    def fold(v):  # v < 2^32 -> congruent value <= m + 1
        return (v & m) + (v >> U32(31))

    t1 = U32(2) * xh * yh  # xh·yh·2^32 ≡ 2·xh·yh; xh,yh < 2^15 so t1 < 2^31
    mid = xh * yl + xl * yh  # < 2^32
    t2 = ((mid & U32(0x7FFF)) << U32(16)) + (mid >> U32(15))  # mid·2^16 mod-folded
    t3 = xl * yl  # < 2^32
    s = fold(t1 + fold(t2))
    s = fold(s + fold(t3))
    return jnp.where(s >= m, s - m, s)


def lcg_value_at(state0, j, pow_table) -> jnp.ndarray:
    """The uniform-[0,1] value of 0-based draw ``j`` from initial state ``state0``
    (bit-equal to calling :func:`lcg_u01` j+1 times), via ``pow_table`` =
    jnp/np array from :func:`lcg_pow_table` with length > max(j) + 1."""
    a_k = jnp.asarray(pow_table)[jnp.asarray(j, I32) + I32(1)]
    state = lcg_mulmod(a_k, state0)
    return (state - U32(1)).astype(F32) / F32(_LCG_RANGE)


# ---------------------------------------------------------------------------
# sin-dot float hashes (rng.hpp:102-155).  f32 math throughout.
# ---------------------------------------------------------------------------


def _fract(x):
    return x - jnp.floor(x)


# --------------------------------------------------------------------------
# Correctly-rounded f32 sin for the sin-dot hashes (MMTPU_EXACT_SIN=1).
#
# The hash output is fract(sin(d) * 39021.426) with |d| up to ~1e7: ONE ulp of
# sin error perturbs the hash by ~ulp * 39021 ≈ 2-5e-3, jittering every Worley
# point / threshold decision downstream (measured: XLA's sin is bit-identical
# to glibc's sinf — the golden generator's — on only ~60% of hash arguments,
# which is the root of EVERY residual golden-test epsilon).  This double-single
# (pairs-of-f32) implementation computes sin to <~0.5 ulp using only exactly-
# rounded f32 add/sub/mul, so it runs unchanged on TPU (no f64 there):
#   1. quadrant k = rint(d/pi), with d/pi evaluated in double-single so k is
#      exactly the nearest integer,
#   2. Cody-Waite reduction r = d - k*pi with pi split into 3 f32 parts and
#      exact Dekker products (d - p1 is exact by Sterbenz cancellation),
#   3. odd Taylor polynomial through r^13 with the r, r^3, r^5 terms carried
#      in double-single, the r^7 tail in plain f32 (|tail| <= 0.0045: its
#      rounding error is < 0.05 ulp of the result).
# --------------------------------------------------------------------------

_SPLIT = F32(4097.0)  # Dekker split constant for f32 (2^12 + 1)


def _two_prod(a, b):
    """Exact product: a*b = p + e with p = fl(a*b) (Dekker, no FMA)."""
    p = a * b
    aa = a * _SPLIT
    ah = aa - (aa - a)
    al = a - ah
    bb = b * _SPLIT
    bh = bb - (bb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _two_sum(a, b):
    """Exact sum: a+b = s + e with s = fl(a+b) (Knuth)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


# pi and 1/pi split into f32 parts: each part is the f32 rounding of the
# EXACT residual after the previous parts (chained from 60-digit pi via
# Fraction, NOT from f64 pi — deriving from f64 pi bakes the pi - pi_f64
# ~1.2e-16 residual into the split, which costs k0 * 1.2e-16 ~ 0.2 ulp of
# reduction error at |d| ~ 1e9).  Residual after all three parts: 2.1e-23.
_PI_HI = F32(3.1415927410125732)
_PI_MED = F32(-8.742277657347586e-08)
_PI_LO = F32(-3.4302490200117637e-15)
_INVPI_HI = F32(0.31830987334251404)
_INVPI_LO = F32(1.2841276486597053e-08)


def _ds_mul(a_hi, a_lo, b_hi, b_lo):
    p, e = _two_prod(a_hi, b_hi)
    e = e + (a_hi * b_lo + a_lo * b_hi)
    s, t = _two_sum(p, e)
    return s, t


def _ds_add(a_hi, a_lo, b_hi, b_lo):
    s, e = _two_sum(a_hi, b_hi)
    e = e + a_lo + b_lo
    s2, t = _two_sum(s, e)
    return s2, t


#: sin Taylor coefficients c3..c15 as double-single pairs (c15 matters: the
#: r^15 truncation ~6.7e-10 at |r|=pi/2 misrounds ~0.06% of draws near |sin|=1)
_SIN_COEFF = (
    (F32(-7.647163609812713e-13), F32(-1.2200710471178288e-20)),
    (F32(1.6059044372074283e-10), F32(-5.352526511562726e-18)),
    (F32(-2.5052107943679403e-08), F32(-4.4176230446483665e-16)),
    (F32(2.7557318844628753e-06), F32(3.793571224297229e-14)),
    (F32(-0.00019841270113829523), F32(2.725596874933456e-12)),
    (F32(0.008333333767950535), F32(-4.34617203337595e-10)),
    (F32(-0.1666666716337204), F32(4.967053879312289e-09)),
)


def _sin_cr(d):
    """sin(d) correctly rounded to f32 (<~0.5 ulp) via double-single arithmetic.

    Valid for |d| <= ~2^40.  The quadrant integer k = round(d/pi) exceeds f32's
    24-bit integer range once |d| > ~2^23*pi, so it is carried as an EXACT pair
    (k0, k1): k0 = round(fl(d*invpi_hi)) inherits q_hi's coarse ulp (a multiple
    of a power of two, hence exactly representable), k1 = the small correction
    integer (|k1| <= ~0.5*ulp(q_hi) + |d|*invpi_lo <= a few hundred at 2^33).
    Feature-placement hashes need this: isFeaturePos seeds reach
    feature*518721*640.88 ~ 6.6e9 (chunk.cu:999-1008,1134), where the previous
    single-f32 k collapsed and the reduction landed in the wrong quadrant."""
    d = jnp.asarray(d, F32)
    # quadrant: k = nearest integer to d/pi, computed from the DS value of d/pi
    # (collapsing to one f32 first loses the fraction at large |d|)
    q_hi, q_e = _two_prod(d, _INVPI_HI)
    q_lo = q_e + d * _INVPI_LO
    k0 = jnp.round(q_hi)
    k1 = jnp.round((q_hi - k0) + q_lo)  # q_hi - k0 exact (Sterbenz); k1 small
    # r = d - (k0 + k1)*pi in double-single (Cody-Waite, 3-part pi, exact
    # products of EACH k part; k0+k1 would not be exact in one f32)
    p1, e1 = _two_prod(k0, _PI_HI)
    s1 = d - p1  # exact: |d - p1| << |d| (Sterbenz)
    t_hi, t_lo = _two_sum(s1, -e1)
    p1b, e1b = _two_prod(k1, _PI_HI)
    t_hi, t2 = _two_sum(t_hi, -p1b)
    t_lo = t_lo + t2 - e1b
    p2, e2 = _two_prod(k0, _PI_MED)
    u_hi, u_lo = _two_sum(t_hi, -p2)
    k = k0 + k1  # fine in f32 from here: only feeds O(1e-5) correction terms
    r_hi, r_lo = _two_sum(u_hi, u_lo + t_lo - (e2 + k1 * _PI_MED + k * _PI_LO))
    # sin(r) = r + r^3 * P(r^2), |r| <= pi/2 + eps, full double-single Horner
    r2_hi, r2_lo = _ds_mul(r_hi, r_lo, r_hi, r_lo)
    p_hi, p_lo = _SIN_COEFF[0]
    p_hi = jnp.broadcast_to(p_hi, r_hi.shape)
    p_lo = jnp.broadcast_to(p_lo, r_hi.shape)
    for c_hi, c_lo in _SIN_COEFF[1:]:
        p_hi, p_lo = _ds_mul(p_hi, p_lo, r2_hi, r2_lo)
        p_hi, p_lo = _ds_add(p_hi, p_lo, jnp.broadcast_to(c_hi, r_hi.shape), jnp.broadcast_to(c_lo, r_hi.shape))
    r3_hi, r3_lo = _ds_mul(r2_hi, r2_lo, r_hi, r_lo)
    t_hi2, t_lo2 = _ds_mul(r3_hi, r3_lo, p_hi, p_lo)
    s_hi, s_lo = _ds_add(r_hi, r_lo, t_hi2, t_lo2)
    sin_r = s_hi + s_lo
    # parity: sin(d) = (-1)^(k0+k1) sin(r).  k0+k1 is inexact in one f32 at
    # large |d|, so XOR the parts' parities (each exact: k0's halving is a
    # power-of-two scale, k1 is small).
    odd0 = k0 - F32(2.0) * jnp.floor(k0 * F32(0.5)) != F32(0.0)
    odd1 = k1 - F32(2.0) * jnp.floor(k1 * F32(0.5)) != F32(0.0)
    return jnp.where(odd0 ^ odd1, -sin_r, sin_r)


import os as _os  # noqa: E402

#: exact-sin mode: hash sin matches the golden generator's glibc sinf on ~98%
#: of arguments instead of ~60%.  Priority: MMTPU_EXACT_SIN env var (read at
#: import, wins so tests can force it per-process) > set_exact_sin() (e.g. from
#: config.terrain.exact_sin at engine init) > off.
EXACT_SIN = _os.environ.get("MMTPU_EXACT_SIN", "0") == "1"


def set_exact_sin(on: bool) -> None:
    """Flip the hash-sin mode.  Must be called BEFORE the first trace of any
    jitted program that hashes (already-compiled programs keep their mode);
    the MMTPU_EXACT_SIN env var takes precedence when set."""
    global EXACT_SIN
    if "MMTPU_EXACT_SIN" in _os.environ:
        return
    EXACT_SIN = bool(on)


import contextlib as _contextlib  # noqa: E402


@_contextlib.contextmanager
def exact_scope(on: bool):
    """Force the hash-sin mode within a ``with`` block, OVERRIDING the
    MMTPU_EXACT_SIN env var (unlike :func:`set_exact_sin`).

    The mode is read at TRACE time, so the scope must be active while the
    consuming program traces.  Two standing uses:

    * the render path wraps its trace in ``exact_scope(False)`` — exact
      arithmetic exists to make *terrain decisions* bit-exact vs the golden
      generator; the tracer's texture-variant hash gains nothing from it, and
      scoping it out makes every render program IDENTICAL under either ambient
      mode (one compile, one cache entry, no 2x render-program tax).
    * bench.py measures the other generation mode in the same process by
      flipping the scope + ``jax.clear_caches()`` (already-traced inner jits
      hold the old mode's jaxpr — clearing is mandatory, see
      tools/exact_sin_cost.py).
    """
    global EXACT_SIN
    prev = EXACT_SIN
    EXACT_SIN = bool(on)
    try:
        yield
    finally:
        EXACT_SIN = prev


def _sinhash(d):
    s = _sin_cr(d) if EXACT_SIN else jnp.sin(d)
    return _fract(s * F32(39021.426))


# --------------------------------------------------------------------------
# Correctly-rounded f32 divide / sqrt (exact mode).  The TPU VPU's divide and
# sqrt are Newton-refined approximations, correctly rounded on only ~65% /
# ~57% of inputs (measured on v5e) — every worley distance and cave ratio then
# drifts 1 ulp from the golden generator's IEEE ops, flipping threshold
# decisions (cave-layer boundaries ±1 block, round-4's last block-grid
# residual).  One exact-residual correction step (Dekker two_prod gives the
# exact remainder in f32) lands the approximation on the correctly-rounded
# value: the correction term is the residual scaled by the approximate
# reciprocal — O(ulp), so its own rounding cannot push the sum past a second
# boundary.  Verified bit-equal to IEEE over 10^6 random draws per range in
# tools/sin_twin_check-style probes; pinned by tests/test_ops.py.
# --------------------------------------------------------------------------


def div_cr(a, b):
    """a / b correctly rounded to f32 (exact mode), plain divide otherwise."""
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    q = a / b
    if not EXACT_SIN:
        return q
    p, e = _two_prod(q, b)
    r = (a - p) - e  # exact residual a - q*b (|r| <= ulp(a))
    # guard: when b == 0 (degenerate worley distance) or q*b overflows, the
    # Dekker product is NaN — keep the IEEE quotient (inf) instead of
    # propagating NaN through the correction (plain mode and the golden
    # generator both return inf there)
    return jnp.where(jnp.isfinite(q) & (b != F32(0.0)), q + r / b, q)


def sqrt_cr(x):
    """sqrt(x) correctly rounded to f32 (exact mode), plain sqrt otherwise."""
    x = jnp.asarray(x, F32)
    s = jnp.sqrt(x)
    if not EXACT_SIN:
        return s
    p, e = _two_prod(s, s)
    r = (x - p) - e  # exact residual x - s*s
    fix = r / (s + s)
    return jnp.where(x > F32(0.0), s + fix, s)


def strict_sum(*terms):
    """Left-associated sum with each term pinned behind an optimization
    barrier: XLA's algebraic simplifier rewrites a·C + b·C (+ c·C) into
    (a + b (+ c))·C — one rounding instead of per-term roundings — which
    breaks bit-equality with the golden generator's strict IEEE evaluation
    (measured: ~50% of simplex3 skew sums differ 1 ulp).  Used at the
    same-constant dot sites in ops/noise.py's 3-D simplex.  Plain (fast) mode
    keeps the bare sum — the factored rewrite is XLA's win there."""
    if not EXACT_SIN:
        acc = jnp.asarray(terms[0], F32)
        for t in terms[1:]:
            acc = acc + jnp.asarray(t, F32)
        return acc
    acc = jax.lax.optimization_barrier(jnp.asarray(terms[0], F32))
    for t in terms[1:]:
        acc = acc + jax.lax.optimization_barrier(jnp.asarray(t, F32))
    return acc


def rand1_from1(v):
    return _sinhash(jnp.asarray(v, F32) * F32(238.68))


def rand1_from2(vx, vy):
    d = jnp.asarray(vx, F32) * F32(238.68) + jnp.asarray(vy, F32) * F32(491.28)
    return _sinhash(d)


def rand1_from3(vx, vy, vz):
    d = (
        jnp.asarray(vx, F32) * F32(238.68)
        + jnp.asarray(vy, F32) * F32(491.28)
        + jnp.asarray(vz, F32) * F32(640.88)
    )
    return _sinhash(d)


def rand2_from2(vx, vy):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28)
    d1 = vx * F32(654.37) + vy * F32(560.45)
    return _sinhash(d0), _sinhash(d1)


def rand2_from3(vx, vy, vz):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    vz = jnp.asarray(vz, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28) + vz * F32(640.88)
    d1 = vx * F32(654.37) + vy * F32(560.45) + vz * F32(151.81)
    return _sinhash(d0), _sinhash(d1)


def rand3_from2(vx, vy):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28)
    d1 = vx * F32(654.37) + vy * F32(560.45)
    d2 = vx * F32(640.88) + vy * F32(151.81)
    return _sinhash(d0), _sinhash(d1), _sinhash(d2)


def rand3_from3(vx, vy, vz):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    vz = jnp.asarray(vz, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28) + vz * F32(402.98)
    d1 = vx * F32(654.37) + vy * F32(560.45) + vz * F32(747.42)
    d2 = vx * F32(640.88) + vy * F32(151.81) + vz * F32(674.81)
    return _sinhash(d0), _sinhash(d1), _sinhash(d2)


# TEA hash (OptiX-side per-pixel RNG, src/shaders/random_number_generators.h:37-76).
def tea(val0, val1, rounds: int = 16):
    v0 = _u32(val0)
    v1 = _u32(val1)
    s0 = U32(0)
    for _ in range(rounds):
        s0 = s0 + U32(0x9E3779B9)
        v0 = v0 + (((v1 << U32(4)) + U32(0xA341316C)) ^ (v1 + s0) ^ ((v1 >> U32(5)) + U32(0xC8013EA4)))
        v1 = v1 + (((v0 << U32(4)) + U32(0xAD90777D)) ^ (v0 + s0) ^ ((v0 >> U32(5)) + U32(0x7E95761E)))
    return v0


def lcg_render(state):
    """Renderer-side quick LCG (random_number_generators.h): state' = 1664525*state + 1013904223."""
    state = _u32(state) * U32(1664525) + U32(1013904223)
    return state


def rnd(state):
    """Renderer-side uniform in [0,1): low 24 bits / 2^24; returns (value, new_state)."""
    state = lcg_render(state)
    v = (state & U32(0x00FFFFFF)).astype(F32) / F32(float(0x01000000))
    return v, state
