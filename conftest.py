"""Pytest root conftest: force JAX onto a virtual 8-device CPU platform.

Must run before any jax import (pytest loads conftest first). This mirrors
the reference's strategy of a GPU-free CI backend (SURVEY.md §4: CPU kernel
backend + naive_distributed give a GPU-free e2e engine); here a host-CPU
8-device mesh exercises the same SPMD shardings the TPU pod path uses.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
