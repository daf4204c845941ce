"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np


def make_mesh(num_devices: int | None = None) -> jax.sharding.Mesh:
    """A 1-D mesh over the sampling ("data") axis.

    The workload is embarrassingly parallel over samples (SURVEY.md §2:
    the reference's only parallelism is SIMT over samples,
    cudabrot.cu:381-390), so a single mesh axis suffices; every chip runs
    an identical sampler with an independent RNG fold and histograms are
    merged once at readback time over ICI.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices but only "
                f"{len(devices)} are available."
            )
        devices = devices[:num_devices]
    return jax.sharding.Mesh(np.array(devices), ("devices",))
