"""Multi-process / multi-host coordination.

The TPU-native equivalent of the reference's detectron2 launch/comm surface
(detectron2/engine/launch.py:27-123, utils/comm.py:21-238): JAX process
initialization over the TPU fabric instead of torch.multiprocessing + NCCL,
``process_allgather`` instead of pickled Gloo all_gather, and
``broadcast_one_to_all`` for the shared random seed. Every helper degrades
to single-process semantics when distributed is uninitialized — the same
contract that lets the reference's code run on one device
(comm.py:21-34).
"""
from __future__ import annotations

import logging

import jax
import numpy as np

logger = logging.getLogger("distill_any_depth_tpu.launch")

__all__ = [
    "initialize_distributed",
    "process_index",
    "process_count",
    "is_main_process",
    "all_gather_array",
    "shared_random_seed",
    "synchronize",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when multi-process coordinates are given
    (explicitly or via the standard JAX env vars); no-op single-process
    otherwise. Returns True when a multi-process runtime is active."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif num_processes is not None and num_processes > 1:
            jax.distributed.initialize()
    except Exception:
        logger.exception("jax.distributed.initialize failed; single-process")
        return False
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_array(x) -> np.ndarray:
    """Gather a host-local array from every process -> stacked on axis 0
    (comm.all_gather equivalent). Identity-stack single-process."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def shared_random_seed(seed: int | None = None) -> int:
    """One seed agreed on by all processes (comm.shared_random_seed:195)."""
    local = np.uint32(seed if seed is not None else np.random.randint(2**31))
    if jax.process_count() == 1:
        return int(local)
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(local))


def synchronize() -> None:
    """Cross-process barrier (comm.synchronize:106)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("distill_any_depth_tpu.barrier")
