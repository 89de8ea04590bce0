import os

# Force CPU with 8 virtual devices so multi-chip sharding tests run anywhere.
# Note: this image's sitecustomize registers an `axon` TPU PJRT backend and
# forces jax_platforms="axon,cpu"; overriding the env var is not enough — we
# must update the jax config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
