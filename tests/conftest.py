"""Test env: run everything on CPU with 8 virtual devices so mesh/pjit logic
is exercised without a TPU pod (SURVEY.md §4 implication).

Note: this environment injects a TPU PJRT plugin (axon) via sitecustomize
that overrides the JAX_PLATFORMS env var, so we must force the platform via
jax.config *after* import.  Set LOONGX_TEST_TPU=1 to run the suite on the
real chip instead.
"""

import os

# CLI entry points under test call utils.compile_cache.enable_compilation_
# cache(), which would flip the PROCESS-WIDE on-disk executable cache on for
# every later test: big fp32 compiles (e.g. the full-size CS3 train step)
# then pay serialization/zstd on the write path — observed to segfault the
# whole suite under host memory pressure.  Tests never benefit from warm
# starts across runs; keep the cache off.
os.environ.setdefault("LOONGX_COMPILE_CACHE", "0")

if "LOONGX_TEST_TPU" not in os.environ:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

if "LOONGX_TEST_TPU" not in os.environ:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_between_modules():
    """Free jit caches (compiled XLA executables + their host constants)
    after every test module.

    The full suite performs several hundred compiles; without this the
    process accumulates every executable it ever built and, near the end of
    the run, allocation failures inside XLA/zstd surface as SIGSEGV rather
    than MemoryError (observed twice at >85% suite progress, in
    backend_compile_and_load and the compile-cache zstd writer — both green
    when their module runs alone).  Cross-module warm jits are rare (tests
    build fresh pipelines/lambdas), so this costs little time and caps the
    high-water mark."""
    yield
    jax.clear_caches()
    gc.collect()
