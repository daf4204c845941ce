"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np


def make_mesh(
    num_devices: int | None = None, base: int = 0
) -> jax.sharding.Mesh:
    """A 1-D mesh over the sampling ("data") axis.

    The workload is embarrassingly parallel over samples (SURVEY.md §2:
    the reference's only parallelism is SIMT over samples,
    cudabrot.cu:381-390), so a single mesh axis suffices; every chip runs
    an identical sampler with an independent RNG fold and histograms are
    merged once at readback time over ICI.

    ``base`` is the first device index to use — the multi-device
    generalization of the reference's ``-d`` device selection
    (cudabrot.cu:155): ``-d 1 --devices 2`` runs on devices 1-2.
    """
    devices = jax.devices()
    if base:
        if base >= len(devices):
            raise ValueError(
                f"Base device {base} not available "
                f"({len(devices)} devices present)."
            )
        devices = devices[base:]
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices starting at device "
                f"{base} but only {len(devices)} are available there."
            )
        devices = devices[:num_devices]
    return jax.sharding.Mesh(np.array(devices), ("devices",))
