"""Root conftest: force the host-CPU backend with 8 virtual devices.

The axon TPU plugin registers itself via sitecustomize at interpreter start
(whenever PALLAS_AXON_POOL_IPS is set) and pins jax_platforms, so plain env
vars are not enough. Setting XLA_FLAGS before the first backend init plus an
explicit jax.config.update overrides it — tests then exercise the SPMD mesh
paths on a virtual 8-device mesh (the CI coverage the reference lacks,
SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fast tier is XLA-compile-bound (the
# heaviest tests are 60-80 s of pure compile), so repeat runs hit the disk
# cache and the tier drops to minutes. Same mechanism the driver's
# dryrun_multichip uses (__graft_entry__.py).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
