"""Test env: run everything on CPU with 8 virtual devices so mesh/pjit logic
is exercised without a TPU pod (SURVEY.md §4 implication).

Note: this environment injects a TPU PJRT plugin (axon) via sitecustomize
that overrides the JAX_PLATFORMS env var, so we must force the platform via
jax.config *after* import.  Set LOONGX_TEST_TPU=1 to run the suite on the
real chip instead.
"""

import os

if "LOONGX_TEST_TPU" not in os.environ:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if "LOONGX_TEST_TPU" not in os.environ:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
