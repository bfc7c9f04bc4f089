"""Test configuration: force CPU with 8 virtual devices, enable x64.

Multi-"robot" tests simulate the robot mesh axis on virtual CPU devices
(the same pattern the driver uses for dryrun_multichip). Must run before
jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may carry JAX_PLATFORMS=axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU PJRT plugin registers itself at interpreter startup
# (sitecustomize) and wins the default-backend choice even when
# JAX_PLATFORMS=cpu is in the environment — force the config too, or
# every eager test op round-trips through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Most of the suite's wall time is XLA:CPU compilation of the larger
# solver programs; persist compiled executables across runs (works for
# the CPU backend too — same mechanism as the TPU path in bench.py).
from d2slam_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(min_compile_secs=0.2)
