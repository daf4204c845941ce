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
        self.mesh = make_mesh(cfg.options.num_devices, cfg.device_index)
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
        self._mh_tail_fn = None

    def _flush_mh_tails(self, state) -> None:
        """MH device engines: deposit every device's in-flight tenure
        mass (PallasEngine.mh_tail_core, per device under shard_map)
        and reset the retention counters. Works in multi-process runs —
        each device flushes its own addressable chain state; no
        cross-process reads exist."""
        inner = self.inner
        if not getattr(inner, "mh", False):
            return
        if getattr(inner, "_worker", None) is not None:
            inner._flush_mh_tails(state)
            return
        if self._mh_tail_fn is None:
            def per_device(s):
                local = jax.tree.map(lambda x: x[0], s)
                local = inner.mh_tail_core(local)
                return jax.tree.map(lambda x: x[None], local)

            self._mh_tail_fn = jax.jit(
                jax.shard_map(
                    per_device,
                    mesh=self.mesh,
                    in_specs=(P("devices"),),
                    out_specs=P("devices"),
                    check_vma=False,
                )
            )
        state.update(self._mh_tail_fn(state))

    def init_state(self, hist0: np.ndarray | None):
        local = self.inner.init_state(None)
        d = self.num_devices
        sharding = NamedSharding(self.mesh, P("devices"))

        if jax.process_count() > 1:
            # Multi-process: build global arrays shard-by-shard (every
            # process provides exactly its addressable slabs; device_put
            # of host-local arrays onto a cross-process sharding is not).
            local_np = jax.tree.map(np.asarray, local)
            hist0_np = (
                None if hist0 is None else np.asarray(hist0, np.uint32)
            )

            def build(x, inject0=None):
                gshape = (d,) + x.shape

                def cb(index):
                    sl = index[0]
                    lo = sl.start or 0
                    hi = sl.stop if sl.stop is not None else d
                    slab = np.broadcast_to(x, (hi - lo,) + x.shape).copy()
                    if inject0 is not None and lo == 0:
                        slab[0] = inject0
                    return slab

                return jax.make_array_from_callback(gshape, sharding, cb)

            state = jax.tree.map(build, local_np)
            if hist0_np is not None:
                # Resume: the loaded histogram becomes device 0's replica;
                # the final sum over replicas reconstructs the total.
                state["hist"] = build(
                    np.zeros(self.cfg.canvas.shape, np.uint32),
                    inject0=hist0_np,
                )
            return state

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
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding), state
        )

    def run_pass(self, state, pass_index: int):
        return self._pass_fn(state, pass_index)

    def histogram(self, state) -> np.ndarray:
        self._flush_mh_tails(state)
        # The single cross-device histogram reduction (psum over ICI /
        # DCN under the hood); uint32 adds are exact. The replicated
        # output sharding makes the result addressable on every process.
        merged = jax.jit(
            lambda h: jnp.sum(h, axis=0, dtype=jnp.uint32),
            out_shardings=NamedSharding(self.mesh, P()),
        )(state["hist"])
        return np.asarray(jax.device_get(merged), dtype=np.uint32)

    def warmup(self, state) -> None:
        clone = jax.tree.map(jnp.copy, state)
        jax.block_until_ready(self._pass_fn(clone, 0))

    def stats(self, state) -> dict:
        totals: dict[str, int] = {}
        # Stat counters are (lo, hi) uint32 pairs stacked per device; sum
        # exactly on the host. In multi-process runs the per-device
        # counter columns live on remote processes, so first replicate
        # the (tiny) counter leaves to every process via a jitted
        # identity with a replicated output sharding.
        counter_keys = [
            k for k in state if k not in ("hist", "hist_shard", "lanes")
        ]
        if jax.process_count() > 1 and counter_keys:
            fetch = jax.jit(
                lambda s: {k: s[k] for k in counter_keys},
                out_shardings=NamedSharding(self.mesh, P()),
            )
            fetched = jax.device_get(fetch(state))
        else:
            fetched = {k: state[k] for k in counter_keys}
        big = {k: v for k, v in state.items() if k not in counter_keys}
        local_states = [
            {
                **jax.tree.map(lambda x, i=i: x[i], fetched),
                **{k: None for k in big},
            }
            for i in range(self.num_devices)
        ]
        extras: dict = {}
        # counter_stats (when available) excludes shared host-worker
        # tallies, which must not be summed once per device.
        stat_fn = getattr(self.inner, "counter_stats", self.inner.stats)
        for local in local_states:
            for k, v in stat_fn(local).items():
                if isinstance(v, str):
                    extras[k] = v
                else:
                    totals[k] = totals.get(k, 0) + v
        if hasattr(self.inner, "counter_stats"):
            extras.setdefault("replay", "device")
        dev_hits = totals.pop("_device_on_canvas", 0)
        if getattr(self.inner, "_worker", None) is None:
            if getattr(self.inner, "mh", False):
                # Device-path MH: deposited mass is a summed device
                # counter (PallasEngine.core); mirror the single-device
                # stat surface.
                extras["on_canvas_points"] = totals.get("mh_deposited", 0)
                extras["weight_scale"] = self.inner.weight_scale
                extras["mh_lost_weight"] = 0
            else:
                extras["on_canvas_points"] = dev_hits
        else:
            # Host-replay subclass: fold the device share's deposits in
            # with the worker tally (DataParallelHostReplayEngine.stats).
            extras["_device_on_canvas"] = dev_hits
        return {**totals, **extras}


class DataParallelHostReplayEngine(DataParallelEngine):
    """Multi-device classification with host-side orbit replay.

    Every chip runs its own persistent classify kernel (distinct RNG
    ordinal) under shard_map; the per-chip emission payloads come back
    stacked along the device axis and stream to the native host replay
    worker, exactly like the single-device host mode. This keeps every
    device-second on classification — the measured XLA scatter path
    contributes ~250x less useful work per second than classify
    (benchmarks/PERF_NOTES.md) — so multi-chip scaling applies to the
    fast path, not the fallback. In multi-process runs every process
    feeds its own native worker from its *addressable* payload shards
    (emissions never cross process boundaries) and the host histograms
    merge once at readback via a process allgather — O(image) per
    readback, zero per-pass cross-process traffic, same as the
    single-process design.
    """

    def __init__(self, cfg: RenderConfig, inner):
        if inner._worker is None:
            raise ValueError("inner engine must be in host-replay mode")
        self.cfg = cfg
        self.inner = inner
        self.name = f"dp-host({inner.name})"
        self.mesh = make_mesh(cfg.options.num_devices, cfg.device_index)
        self.num_devices = self.mesh.devices.size
        self.steps_per_pass = inner.steps_per_pass * self.num_devices

        def per_device(state, pass_index):
            ordinal = jax.lax.axis_index("devices").astype(jnp.uint32)
            local = jax.tree.map(lambda x: x[0], state)
            local, n_valid, payload = inner.host_pass(
                local, pass_index, ordinal
            )
            return (
                jax.tree.map(lambda x: x[None], local),
                n_valid[None],
                payload[None],
            )

        sharded = jax.shard_map(
            per_device,
            mesh=self.mesh,
            in_specs=(P("devices"), P()),
            out_specs=(P("devices"), P("devices"), P("devices")),
            check_vma=False,
        )
        self._pass_fn = jax.jit(sharded, donate_argnums=0)

    def init_state(self, hist0: np.ndarray | None):
        # super() re-inits the inner engine (which zeroes the worker
        # accumulator), so the resumed mass must be injected afterwards.
        state = super().init_state(None)
        if hist0 is not None and jax.process_index() == 0:
            # Resumed mass lives in the worker accumulator (host mode);
            # only the primary's worker holds it, so the cross-process
            # merge counts it exactly once.
            self.inner._worker.add_resumed(hist0)
        return state

    @staticmethod
    def _local_shards(global_array):
        return [s.data for s in global_array.addressable_shards]

    def warmup(self, state) -> None:
        clone = jax.tree.map(jnp.copy, state)
        out = self._pass_fn(clone, 0)
        jax.block_until_ready(out)
        _, n_valid, payload = out
        if jax.process_count() > 1:
            for a in (*self._local_shards(n_valid),
                      *self._local_shards(payload)):
                np.asarray(a)  # warm the per-shard D2H signatures
        else:
            np.asarray(n_valid)  # warm the D2H transfer signatures
            np.asarray(payload)

    def run_pass(self, state, pass_index: int):
        state, n_valid, payload = self._pass_fn(state, pass_index)
        if (
            getattr(self.inner, "mh", False)
            and pass_index < self.cfg.options.mh_burnin_passes
        ):
            # MH chain burn-in: advance every device's chains, discard
            # the emissions, and zero the retention counters on the
            # last burn-in pass so in-flight tenure mass cannot leak
            # (PallasEngine.run_pass does the same).
            if pass_index == self.cfg.options.mh_burnin_passes - 1:
                self.inner._reset_mh_reps(state)
            return state
        if jax.process_count() > 1:
            # Only this process's shards are addressable; each process
            # replays its own devices' emissions on its own worker.
            nv = self._local_shards(n_valid)
            pl = self._local_shards(payload)
            for a in (*nv, *pl):
                a.copy_to_host_async()
            self.inner._worker.submit(nv, pl)
        else:
            n_valid.copy_to_host_async()
            payload.copy_to_host_async()
            self.inner._worker.submit(n_valid, payload)
        return state

    def histogram(self, state) -> np.ndarray:
        # The worker accumulator holds the host-replayed mass. With a
        # hybrid split (split_threshold > 0 — the big-canvas auto share)
        # each device's histogram also carries its device-replayed
        # short-orbit mass and must be folded in; in pure host mode the
        # device replicas provably stay zero and the (potentially
        # multi-GB) fetch is skipped. In multi-process runs each process
        # holds a partial accumulator (worker + its addressable device
        # shards); merge with one allgather (collective — every process
        # must call this, mirroring DataParallelEngine.histogram).
        if getattr(self.inner, "mh", False):
            # Deposit the in-flight MH tenure mass across every device's
            # stacked chain state (single-process only; make_engine
            # rejects multi-process MH).
            self.inner._flush_mh_tails(state)
        self.inner._worker.drain()
        local = self.inner._worker.hist
        if self.inner.split_threshold > 0:
            if jax.process_count() > 1:
                shards = [
                    np.asarray(s, dtype=np.uint32)
                    for s in self._local_shards(state["hist"])
                ]
            else:
                shards = [
                    np.asarray(jax.device_get(state["hist"]), np.uint32)
                ]
            dev = np.zeros(local.shape, np.uint32)
            for s in shards:
                # Per-device replicas are stacked on a leading axis.
                dev += s.reshape((-1,) + local.shape).sum(
                    axis=0, dtype=np.uint32
                )
            local = local + dev
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered = np.asarray(multihost_utils.process_allgather(local))
            return gathered.sum(axis=0, dtype=np.uint32)
        return local.copy()

    def stats(self, state) -> dict:
        out = super().stats(state)
        # Device-share deposits are per-device jit counters; in
        # multi-process runs each process only sums its addressable
        # shards, so the device tally rides the same allgather as the
        # worker's.
        dev_hits = int(out.pop("_device_on_canvas", 0))
        w = self.inner._worker
        w.drain()
        points, hits = int(w.points), int(w.hits)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            tallies = np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([points, hits, dev_hits], dtype=np.uint64)
                ),
                dtype=np.uint64,
            ).reshape(-1, 3)
            points = int(tallies[:, 0].sum())
            hits = int(tallies[:, 1].sum())
            dev_hits = int(tallies[:, 2].sum())
        out["orbit_points"] = out.get("orbit_points", 0) + points
        out["on_canvas_points"] = hits + dev_hits
        out["replay"] = (
            "hybrid" if self.inner.split_threshold > 0
            else "host"
        )
        return out
