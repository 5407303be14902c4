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

# repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
