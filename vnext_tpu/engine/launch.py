"""Multi-host launch (capability parity with detectron2/engine/launch.py:27
launch / _distributed_worker).

The reference spawns one process per GPU and runs NCCL rendezvous over a TCP
store. On TPU the runtime already starts one process per host and JAX's
single-controller SPMD drives every local chip from that process, so "launch"
reduces to: initialize jax.distributed when running multi-host (coordinator
discovery comes from the TPU environment or explicit args), then call the
entrypoint once. No mp.spawn, no port picking, no local process groups — the
mesh + pjit replace all of it (SURVEY.md §2d).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional, Sequence

logger = logging.getLogger("vnext_tpu")


def launch(
    main_func: Callable,
    num_gpus_per_machine: int = 0,   # accepted for CLI parity; devices come from JAX
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args: Sequence[Any] = (),
) -> Any:
    """Run ``main_func(*args)`` with distributed JAX initialized when needed.

    - single host: call straight through (the common case — all local chips are
      already visible to jax.devices()).
    - multi host: ``jax.distributed.initialize`` with the coordinator from
      ``dist_url`` (host:port) or auto-detected from the TPU environment.
    """
    if num_machines > 1:
        import jax

        kwargs = {}
        if dist_url and dist_url != "auto":
            kwargs = dict(
                coordinator_address=dist_url.replace("tcp://", ""),
                num_processes=num_machines,
                process_id=machine_rank,
            )
        jax.distributed.initialize(**kwargs)
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local devices",
            jax.process_index(), jax.process_count(), jax.local_device_count(),
        )
    return main_func(*args)
