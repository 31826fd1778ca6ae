"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run without a TPU pod (the standard JAX substitute for a real pod).

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU plugin), so JAX_PLATFORMS in os.environ is read before we
run; `jax.config.update` still works because backends initialize lazily.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite is compile-bound on CPU; repeat
# runs become fast
from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.expanduser("~/.cache/hmnffb_test_xla_cache"))

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
