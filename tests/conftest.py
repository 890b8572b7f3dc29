"""Test harness: force CPU jax with 8 virtual devices.

This is the standard JAX way to test multi-device SPMD without hardware
(SURVEY.md §4): `--xla_force_host_platform_device_count=8` gives the
data-parallel tests an 8-device mesh on CPU.

Subtlety: this environment's sitecustomize force-registers a remote-TPU
("axon") PJRT plugin at interpreter startup with jax_platforms="axon,cpu",
which would route every op through a high-latency tunnel. CPU remains
registered as a secondary backend, so we flip the default platform to cpu
before any backend is used. Set PPN_TESTS_ON_TPU=1 to run the suite on the
real chip instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

if os.environ.get("PPN_TESTS_ON_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
