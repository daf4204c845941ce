"""Row-sharded histogram engine — the "shard the big thing" axis.

The reference can't render beyond one GPU's memory (README.md:74-76 warns
a 20000^2 image needs >= 3 GB); the replicated data-parallel wrapper
(data_parallel.py) inherits that per-chip. This engine shards the
histogram's *rows* across the mesh so canvas memory scales with the
number of chips, and — just as importantly on TPU — the scatter work
(the measured throughput wall, benchmarks/PERF_NOTES.md) splits D ways:

  1. every device runs its own persistent classify kernel (distinct RNG
     fold), exactly as in the replicated wrapper;
  2. the compacted in-band emissions — a few hundred KB — are
     all-gathered over ICI, so every device sees every in-band sample;
  3. every device replays the *full* gathered batch but bins only the
     orbit points that land in its own row range. Replay arithmetic is
     duplicated D times (it is a tiny fraction of classify work at the
     bands where sharding matters), while the expensive scatter runs
     concurrently on D disjoint shards.

The result is *bitwise identical* to the replicated wrapper's histogram
for the same seeds: row ranges partition the canvas, so every point is
counted exactly once globally (a property the test suite checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cudabrot_tpu.config import RenderConfig
from cudabrot_tpu.engines import pallas_engine as pe
from cudabrot_tpu.ops import binning
from cudabrot_tpu.parallel.mesh import make_mesh
from cudabrot_tpu.utils import counters


class ShardedHistogramEngine:
    """Data-parallel sampling with a row-sharded histogram."""

    def __init__(self, cfg: RenderConfig, inner: pe.PallasEngine):
        self.cfg = cfg
        self.inner = inner
        self.name = "sharded(pallas)"
        self.mesh = make_mesh(cfg.options.num_devices, cfg.device_index)
        self.num_devices = int(self.mesh.devices.size)
        self.steps_per_pass = inner.steps_per_pass * self.num_devices
        h = cfg.canvas.height
        self.rows_per_shard = -(-h // self.num_devices)  # ceil
        self.padded_rows = self.rows_per_shard * self.num_devices

        tn = inner.tuning

        def per_device(state, pass_index):
            ordinal = jax.lax.axis_index("devices").astype(jnp.uint32)
            local = jax.tree.map(lambda x: x[0], state)
            hist_local = local.pop("hist_shard")

            new_local, (cr, ci, it, _, _) = inner._classify_and_compact(
                local, pass_index, ordinal
            )
            # Count this device's own orbit points before the gather so
            # the global stat isn't D-duplicated. Exact u64 pair: one
            # interior-mode pass can replay > 2^32 points.
            pts = counters.u64_sum_i32(jnp.where(it >= 0, it + 1, 0))
            new_local["points"] = counters.u64_add_pair(local["points"], pts)

            # Tiny all-gather: every device replays every in-band sample.
            cr_g = jax.lax.all_gather(cr, "devices", tiled=True)
            ci_g = jax.lax.all_gather(ci, "devices", tiled=True)
            it_g = jax.lax.all_gather(it, "devices", tiled=True)

            row_start = (
                jax.lax.axis_index("devices").astype(jnp.int32)
                * self.rows_per_shard
            )
            if inner.extended:
                # Extended emissions are 24-bit sample-grid indices; the
                # df32 replay reconstructs c and bins via the df-aware
                # sharded quantizer (same local-row windowing).
                bin_fn = functools.partial(
                    binning.points_to_bin_ids_df_sharded,
                    cfg.canvas,
                    row_count=self.rows_per_shard,
                )
                hist_flat, dhits = pe._blocked_replay_ext(
                    hist_local.reshape(-1),
                    cr_g,
                    ci_g,
                    it_g,
                    fractal=inner.fractal,
                    canvas=cfg.canvas,
                    chunk=tn.replay_chunk,
                    block=tn.replay_block,
                    backend=inner.scatter_backend,
                    interpret=inner.interpret,
                    dfc=new_local["dfc"],
                    step_r=inner._df_step[0],
                    step_i=inner._df_step[1],
                    bin_fn=lambda reh, rel, imh, iml, ok, mr, mi: bin_fn(
                        reh, rel, imh, iml, ok, mr, mi,
                        row_start=row_start,
                    ),
                )
            else:
                bin_fn = functools.partial(
                    binning.points_to_bin_ids_sharded,
                    cfg.canvas,
                    row_count=self.rows_per_shard,
                )
                hist_flat, dhits = pe._blocked_replay(
                    hist_local.reshape(-1),
                    cr_g,
                    ci_g,
                    it_g,
                    fractal=inner.fractal,
                    canvas=cfg.canvas,
                    chunk=tn.replay_chunk,
                    block=tn.replay_block,
                    backend=inner.scatter_backend,
                    interpret=inner.interpret,
                    bin_fn=lambda re, im, ok: bin_fn(re, im, ok,
                                                     row_start=row_start),
                )
            new_local["hist_shard"] = hist_flat.reshape(
                self.rows_per_shard, cfg.canvas.width
            )
            # Each device deposits only its own rows, so per-device hit
            # counters sum to the global on-canvas total exactly once.
            new_local["dev_hits"] = counters.u64_add_pair(
                new_local["dev_hits"], dhits
            )
            return jax.tree.map(lambda x: x[None], new_local)

        self._pass_fn = jax.jit(
            jax.shard_map(
                per_device,
                mesh=self.mesh,
                in_specs=(P("devices"), P()),
                out_specs=P("devices"),
                check_vma=False,
            ),
            donate_argnums=0,
        )

    def init_state(self, hist0: np.ndarray | None):
        d = self.num_devices
        local = self.inner.init_state(None)
        local.pop("hist")

        def stack(x):
            x = jnp.asarray(x)
            return jnp.zeros((d,) + x.shape, x.dtype) + x[None]

        state = jax.tree.map(stack, local)
        shards = jnp.zeros(
            (d, self.rows_per_shard, self.cfg.canvas.width), jnp.uint32
        )
        if hist0 is not None:
            padded = np.zeros(
                (self.padded_rows, self.cfg.canvas.width), np.uint32
            )
            padded[: self.cfg.canvas.height] = np.asarray(hist0, np.uint32)
            shards = jnp.asarray(
                padded.reshape(d, self.rows_per_shard, self.cfg.canvas.width)
            )
        state["hist_shard"] = shards
        sharding = NamedSharding(self.mesh, P("devices"))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), state)

    def run_pass(self, state, pass_index: int):
        return self._pass_fn(state, pass_index)

    def histogram(self, state) -> np.ndarray:
        shards = np.asarray(jax.device_get(state["hist_shard"]), np.uint32)
        full = shards.reshape(self.padded_rows, self.cfg.canvas.width)
        return full[: self.cfg.canvas.height]

    def stats(self, state) -> dict:
        totals: dict = {}
        extras: dict = {}
        for i in range(self.num_devices):
            local = jax.tree.map(lambda x, i=i: x[i], state)
            local.pop("hist_shard")
            for k, v in self.inner.stats(local).items():
                if isinstance(v, str):
                    extras[k] = v
                else:
                    totals[k] = totals.get(k, 0) + v
        extras["histogram_sharding"] = "rows"
        return {**totals, **extras}
