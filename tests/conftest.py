"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8); real-TPU paths are exercised by
bench.py / __graft_entry__.py outside the test suite.
"""

import os

# FANCYREC_TEST_TPU=1 keeps the session's real platform so the TPU-gated
# kernel tests (tests/test_pallas_kernels.py) run on hardware; default is
# the virtual CPU mesh.
_USE_TPU = os.environ.get("FANCYREC_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session presets axon/TPU
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
# offline: never let transformers/HF touch the network in tests
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The axon TPU plugin ignores the JAX_PLATFORMS env var; only the config
# knob actually forces CPU. Must happen before any backend initialization.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
