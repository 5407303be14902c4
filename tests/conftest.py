"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated the detectron2 way (tiny real
multi-device runs) but on a virtual CPU mesh, per SURVEY.md §4. Must run
before jax initializes its backends.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the quick tier is compile-dominated (~9 min
# cold); cached recompiles bring warm runs under the pytest.ini budget. The
# cache key includes compiler version + flags, so it is safe across upgrades.
_cache_dir = os.environ.get(
    "DAD_TEST_COMPILE_CACHE", os.path.expanduser("~/.cache/dad_xla_test_cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
