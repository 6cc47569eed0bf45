"""Multi-host helpers (the reference dist_utils, TPU-native).

The reference's NCCL plumbing (reference src/lavis/common/dist_utils.py:
init_distributed_mode :57-90, rank helpers, main_process decorator :107-114,
download-then-barrier :117-137) maps onto JAX's multi-host runtime: process
identity comes from ``jax.process_index()``, collectives live inside jitted
programs, and host-level sync uses ``multihost_utils``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def main_process(func: Callable) -> Callable:
    """Run only on host 0 (reference :107-114)."""

    @functools.wraps(func)
    def wrapper(*args: Any, **kwargs: Any):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def barrier() -> None:
    """Cross-host sync (replaces dist.barrier)."""
    if not is_dist_avail_and_initialized():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("sprc_tpu_barrier")


def broadcast_from_main(tree):
    """Host-0 value everywhere (replaces the rank0-download+barrier pattern,
    reference :117-137)."""
    if not is_dist_avail_and_initialized():
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def main_process_first(func: Callable) -> Callable:
    """Host 0 runs first (e.g. writes a cache), others follow after a sync."""

    @functools.wraps(func)
    def wrapper(*args: Any, **kwargs: Any):
        if is_main_process():
            result = func(*args, **kwargs)
            barrier()
            return result
        barrier()
        return func(*args, **kwargs)

    return wrapper
