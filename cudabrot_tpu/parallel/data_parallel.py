"""Generic data-parallel engine wrapper (shard_map over a device mesh).

The reference has no multi-device story at all — `-d` merely *selects* one
GPU (cudabrot.cu:155, 667-671). The TPU-native scaling model (SURVEY.md §2
parallelism table): every chip runs the same per-device pass with a
distinct RNG fold (`fold_in(seed, axis_index)` replaces cuRAND per-thread
sequences), each chip accumulates into its own full histogram replica, and
the replicas are summed once at save/checkpoint time. Communication is
O(image) per *render*, not per pass, so throughput scales linearly with
chips and ICI/DCN latency is irrelevant to the hot loop.

The wrapper is engine-agnostic: it shards any engine exposing
``core(state, pass_index, ordinal)`` by stacking its state along a leading
"devices" axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cudabrot_tpu.config import RenderConfig
from cudabrot_tpu.parallel.mesh import make_mesh


class DataParallelEngine:
    """Runs an inner single-device engine on every device of a mesh."""

    def __init__(self, cfg: RenderConfig, inner):
        self.cfg = cfg
        self.inner = inner
        self.name = f"dp({inner.name})"
        self.mesh = make_mesh(cfg.options.num_devices)
        self.num_devices = self.mesh.devices.size
        self.steps_per_pass = inner.steps_per_pass * self.num_devices

        def per_device(state, pass_index):
            ordinal = jax.lax.axis_index("devices").astype(jnp.uint32)
            local = jax.tree.map(lambda x: x[0], state)
            local = inner.core(local, pass_index, ordinal)
            return jax.tree.map(lambda x: x[None], local)

        sharded = jax.shard_map(
            per_device,
            mesh=self.mesh,
            in_specs=(P("devices"), P()),
            out_specs=P("devices"),
            # The per-device pass has no internal collectives; loop carries
            # initialized from constants trip the varying-axes checker.
            check_vma=False,
        )
        self._pass_fn = jax.jit(sharded, donate_argnums=0)

    def init_state(self, hist0: np.ndarray | None):
        local = self.inner.init_state(None)
        d = self.num_devices

        def stack(x):
            x = jnp.asarray(x)
            return jnp.zeros((d,) + x.shape, x.dtype) + x[None]

        state = jax.tree.map(stack, local)
        if hist0 is not None:
            # Resume: the loaded histogram becomes device 0's replica; the
            # final sum over replicas reconstructs the total.
            hist = jnp.zeros((d,) + self.cfg.canvas.shape, jnp.uint32)
            hist = hist.at[0].set(jnp.asarray(hist0, jnp.uint32))
            state["hist"] = hist
        sharding = NamedSharding(self.mesh, P("devices"))
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding), state
        )

    def run_pass(self, state, pass_index: int):
        return self._pass_fn(state, pass_index)

    def histogram(self, state) -> np.ndarray:
        # The single cross-device histogram reduction (psum over ICI under
        # the hood); uint32 adds are exact.
        merged = jax.jit(lambda h: jnp.sum(h, axis=0, dtype=jnp.uint32))(
            state["hist"]
        )
        return np.asarray(jax.device_get(merged), dtype=np.uint32)

    def stats(self, state) -> dict:
        totals: dict[str, int] = {}
        # Stat counters are (lo, hi) uint32 pairs stacked per device; sum
        # exactly on the host.
        local_states = [
            jax.tree.map(lambda x, i=i: x[i], state)
            for i in range(self.num_devices)
        ]
        extras: dict = {}
        for local in local_states:
            for k, v in self.inner.stats(local).items():
                if isinstance(v, str):
                    extras[k] = v
                else:
                    totals[k] = totals.get(k, 0) + v
        return {**totals, **extras}
