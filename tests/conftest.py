"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform and splitting it into 8 virtual devices (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).

NOTE: this image ships a ``sitecustomize`` that registers a remote-TPU
("axon") PJRT backend and sets ``jax_platforms='axon,cpu'`` at interpreter
start — env vars alone cannot override it, so we force the platform via
``jax.config`` after import (safe: backends initialize lazily on first use).
"""

import os

# GMPI_TPU_TESTS=1 keeps the real accelerator visible for the on-chip tier
# (``pytest -m tpu -n 0``, see tests/test_tpu_full_scale.py); everything else
# runs on the virtual CPU mesh.
_ON_CHIP = os.environ.get("GMPI_TPU_TESTS") == "1"
if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
