"""Test harness config: run all tests on CPU with 8 virtual devices.

Multi-chip sharding (shard_map over a Mesh) is validated without a TPU pod via JAX's
host-platform device-count override; the real-TPU path is exercised by bench.py and the
driver's dryrun_multichip.  Must run before jax is imported anywhere.
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
_existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _existing:
    os.environ["XLA_FLAGS"] = (_existing + " " + _flag).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Some environments (e.g. the axon PJRT plugin) force a TPU platform via a
# sitecustomize hook that overrides the env var; the config update wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
