"""Test harness config: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4.6 — the
"fake backend" answer).  Must be set before jax is imported anywhere.

Hardware-gated tests (tests/test_tpu.py): run
``EMSPEC_TPU_TESTS=1 pytest tests/test_tpu.py`` to keep the real TPU
backend — everything else skips itself on TPU and the TPU module skips
itself on CPU, so each file runs exactly where it's meant to.
"""

import os

_TPU_MODE = os.environ.get("EMSPEC_TPU_TESTS") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    # The environment may pre-register an experimental remote-TPU platform
    # and force jax_platforms at interpreter start; backend init is lazy, so
    # pinning the config here (before any op runs) reliably lands on CPU.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # production path is float32
