"""Multi-process (multi-slice / multi-host) support.

The reference is strictly single-process, single-GPU (`-d` selects one
device, cudabrot.cu:155). On TPU pods, devices beyond one host/slice are
only reachable as a *multi-process* program: every process owns a subset
of chips, `jax.distributed.initialize` wires them into one global mesh,
and jitted computations run collectively (SPMD over ICI within a slice,
DCN across slices). This workload is ideal for that topology: the hot
loop has zero cross-device communication — per-chip samplers fold their
own RNG streams — and histograms merge only at checkpoint/readback time,
so DCN latency never touches throughput.

Launch contract (one process per host/slice):

    CUDABROT_COORDINATOR=host0:1234 \
    CUDABROT_NUM_PROCESSES=2 CUDABROT_PROCESS_ID=0 cudabrot ... &
    CUDABROT_COORDINATOR=host0:1234 \
    CUDABROT_NUM_PROCESSES=2 CUDABROT_PROCESS_ID=1 cudabrot ... &

(Standard JAX cluster auto-detection — SLURM, GKE, Cloud TPU metadata —
also works: if `jax.distributed.initialize()` can configure itself with
no arguments, set CUDABROT_DISTRIBUTED=auto.)

Process-0 is the *primary*: it owns all file output (checkpoint, image,
stats) and the render-loop control decisions (time box, SIGINT), which it
broadcasts so every process executes the same number of collective
passes. Non-primary processes run silently.
"""

from __future__ import annotations

import os
from typing import Callable


def initialize_from_env(log: Callable[[str], None] = print) -> bool:
    """Initialize jax.distributed if the launch env requests it.

    Must run before any JAX backend initialization. Returns True when a
    multi-process runtime was set up.
    """
    import jax

    auto = os.environ.get("CUDABROT_DISTRIBUTED", "") == "auto"
    coord = os.environ.get("CUDABROT_COORDINATOR")
    if not coord and not auto:
        return False
    if auto:
        jax.distributed.initialize()
    else:
        num = int(os.environ["CUDABROT_NUM_PROCESSES"])
        pid = int(os.environ["CUDABROT_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=num, process_id=pid
        )
    if is_primary():
        log(
            f"Distributed runtime: {jax.process_count()} processes, "
            f"{len(jax.devices())} devices total."
        )
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def any_flag(value: bool) -> bool:
    """OR-reduce a local stop request across all processes.

    Used for SIGINT: a ctrl+C delivered to *any* process (each may run in
    its own terminal/job slot) must stop the whole distributed render, and
    every process must observe the decision on the same pass. The
    primary's contribution also carries the time-box / pass-count verdict
    (those stay on the primary's clock to avoid divergent local clocks)."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return value
    out = multihost_utils.process_allgather(
        np.asarray([value], dtype=np.bool_)
    )
    return bool(np.asarray(out).any())


def broadcast_flag(value: bool) -> bool:
    """Broadcast a control decision from the primary to every process.

    Used by the render loop so the time-box / SIGINT stop decision is
    taken once (on the primary's clock) and every process leaves the
    collective pass loop on the same pass — divergent local clocks would
    otherwise deadlock the SPMD program.
    """
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return value
    out = multihost_utils.broadcast_one_to_all(
        np.asarray(value, dtype=np.bool_)
    )
    return bool(out)
