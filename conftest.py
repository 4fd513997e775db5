"""Pytest root conftest: force JAX onto a virtual 8-device CPU platform.

This mirrors the reference's strategy of a GPU-free CI backend (SURVEY.md §4:
CPU kernel backend + naive_distributed give a GPU-free e2e engine); here a
host-CPU 8-device mesh exercises the same SPMD shardings the TPU pod path
uses.

Note: the environment's sitecustomize registers the remote-TPU ("axon")
backend before pytest starts, so mutating JAX_PLATFORMS here is too late.
`jax.config.update` still wins because the backend is only initialized on
first use — tests must never contend for the single real TPU chip (bench.py
owns it).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
