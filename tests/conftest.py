import os

# Run tests on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware (the driver separately dry-runs the multichip path).
# NOTE: this sandbox pins JAX_PLATFORMS=axon through a sitecustomize hook, so
# the env var alone is not enough — jax.config must be updated post-import.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# LOCITYPER_TEST_TPU=1 keeps the real backend (runs the TPU-marked tests,
# e.g. the Pallas solver dynamics); default is the virtual 8-device CPU mesh.
if not os.environ.get("LOCITYPER_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

from locityper_tpu.utils.malloc import tune_host_allocator  # noqa: E402

tune_host_allocator()
