"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world "fake backend" for testing DP sharding without a real
slice (see SURVEY.md section 4).

NOTE: this image's sitecustomize imports jax at interpreter start and pins
``JAX_PLATFORMS=axon`` (the remote-TPU tunnel), so plain env-var overrides
are ignored — we must go through ``jax.config.update`` after import.  The
XLA_FLAGS host-device count is still honored because no backend has been
initialized yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Deterministic f32 math for numerical oracles (TPU-style bf16 matmul
# defaults would blur the pose-math tests).
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() >= 8, "tests expect an 8-device virtual CPU mesh"
