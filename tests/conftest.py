"""Test harness config.

Two backends are used in one process:
- Most tests run on the default backend — the attached TPU when present (XLA:CPU's
  pass pipeline blows up superlinearly on this package's large stage graphs: a
  75k-op program compiles in ~1 min on TPU vs >10 min on CPU), CPU otherwise.
- Multi-chip sharding tests (test_parallel.py) always build their Mesh from 8
  virtual CPU devices, which the XLA_FLAGS below provide regardless of the default
  platform.  Must run before jax initializes its backends.
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
_existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _existing:
    os.environ["XLA_FLAGS"] = (_existing + " " + _flag).strip()

# Opt-in override for machines where the TPU plugin exists but is unusable:
# MMTPU_TEST_PLATFORM=cpu forces everything onto the virtual-CPU backend.
_force = os.environ.get("MMTPU_TEST_PLATFORM")
if _force:
    import jax

    jax.config.update("jax_platforms", _force)

# Persistent XLA compile cache: stage programs are large; repeat suite runs reuse
# compiled binaries instead of paying minutes of XLA time again.
import jax as _jax  # noqa: E402

# Exact hash sin (ops.hashes._sin_cr) on the TPU backend: golden tests then
# match the reference's glibc-built generator on ~98.5% of sin-hash draws
# (worst-chunk cave-mask agreement 95.6% -> 99.94%).  NOT enabled on CPU-only
# boxes — the double-single sin inflates XLA:CPU compile times severely.
if _jax.default_backend() != "cpu":
    os.environ.setdefault("MMTPU_EXACT_SIN", "1")

_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MMTPU_XLA_CACHE_DIR", "/tmp/mmtpu_xla_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="also run the compile-heavy slow tier (default tier targets <10 min cold)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --run-slow (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
