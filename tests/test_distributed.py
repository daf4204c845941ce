"""Multi-process (multi-slice analog) rendering: two coordinated
processes with 4 virtual CPU devices each must produce exactly the same
render as one process with all 8 devices — the histogram merge, RNG
ordinal folds, and control-flow broadcasts are topology-independent."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', int(sys.argv[1]))
from cudabrot_tpu.cli import main
sys.exit(main(sys.argv[2:]))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _render_args(out_dir: str) -> list[str]:
    return [
        "-w", "40", "-h", "40", "-m", "60", "-c", "5",
        "--passes", "2", "-t", "-1", "--engine", "oracle",
        "--devices", "all",
        "-o", os.path.join(out_dir, "out.pgm"),
        "-s", os.path.join(out_dir, "state.ckpt"),
    ]


def _run(args, env, timeout=600):
    return subprocess.run(
        [sys.executable, "-c", CHILD, *args],
        env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_two_processes_match_single_process(tmp_path):
    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get(
        "PYTHONPATH", ""
    )
    base_env.pop("CUDABROT_COORDINATOR", None)

    # Reference: one process, 8 devices.
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    res = _run(["8", *_render_args(str(single_dir))], base_env)
    assert res.returncode == 0, res.stderr[-2000:]

    # Two coordinated processes, 4 devices each.
    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["CUDABROT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CUDABROT_NUM_PROCESSES"] = "2"
        env["CUDABROT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, "4",
                 *_render_args(str(multi_dir))],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-2000:])

    # Primary printed the banner; non-primary emitted no render output
    # (transport libraries may still chatter on stdout).
    assert "Buddhabrot passes took" in outs[0][0]
    assert "Buddhabrot passes took" not in outs[1][0]
    assert "Saving image" not in outs[1][0]

    # Bitwise-identical render state.
    from cudabrot_tpu.config import Canvas, IterationBand, RenderConfig
    from cudabrot_tpu.io import checkpoint as ckpt

    cfg = RenderConfig(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=60,
                           min_escape_iterations=5),
    )
    h_single, m_single = ckpt.load(str(single_dir / "state.ckpt"), cfg)
    h_multi, m_multi = ckpt.load(str(multi_dir / "state.ckpt"), cfg)
    assert m_single["passes"] == m_multi["passes"] == 2
    assert h_single.sum() > 0
    np.testing.assert_array_equal(h_multi, h_single)

    # And the images match byte-for-byte.
    assert (single_dir / "out.pgm").read_bytes() == (
        multi_dir / "out.pgm"
    ).read_bytes()


def test_two_processes_host_replay_match_single_process(tmp_path):
    """Multi-process HOST replay: every process feeds its own native
    worker from its addressable payload shards; the merged histogram must
    be bitwise identical to a single-process host-replay run (same
    emission streams — RNG ordinals are mesh-global — and exact u32
    accumulation)."""
    from cudabrot_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")

    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get(
        "PYTHONPATH", ""
    )
    base_env.pop("CUDABROT_COORDINATOR", None)

    args = [
        "-w", "32", "-h", "32", "-m", "48", "-c", "4",
        "--passes", "2", "-t", "-1",
        "--engine", "pallas", "--replay", "host",
        "--lane-rows", "8", "--steps-per-pass", "128",
        "--devices", "all",
    ]

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    res = _run(
        ["8", *args, "-s", str(single_dir / "state.ckpt"),
         "-o", str(single_dir / "out.pgm")],
        base_env,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["CUDABROT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CUDABROT_NUM_PROCESSES"] = "2"
        env["CUDABROT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, "4", *args,
                 "-s", str(multi_dir / "state.ckpt"),
                 "-o", str(multi_dir / "out.pgm")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-2000:])

    from cudabrot_tpu.config import Canvas, IterationBand, RenderConfig
    from cudabrot_tpu.io import checkpoint as ckpt

    cfg = RenderConfig(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=48,
                           min_escape_iterations=4),
    )
    h_single, _ = ckpt.load(str(single_dir / "state.ckpt"), cfg)
    h_multi, _ = ckpt.load(str(multi_dir / "state.ckpt"), cfg)
    assert h_single.sum() > 0
    np.testing.assert_array_equal(h_multi, h_single)


def test_two_processes_mh_match_single_process(tmp_path):
    """Multi-process Metropolis-Hastings: chains run per-device, deposits
    are on-device scatters of kernel-recorded visit bins, and histogram()
    flushes each process's addressable tenure tails — so a 2-process run
    must be bitwise identical to the single-process 8-device run, and no
    mass may be lost anywhere (mh_lost_weight == 0, deposited mass ==
    histogram sum)."""
    import json

    def args(out_dir: str) -> list[str]:
        return [
            "--sampler", "mh", "--center", "-0.7436,0.1319",
            "--span", "6e-3",
            "-w", "32", "-h", "32", "-m", "300", "-c", "20",
            "--passes", "2", "-t", "-1", "--mh-burnin", "1",
            "--engine", "pallas",
            "--lane-rows", "8", "--steps-per-pass", "2048",
            "--steps-per-flush", "64", "--inner-unroll", "4",
            "--devices", "all",
            "-o", os.path.join(out_dir, "out.pgm"),
            "-s", os.path.join(out_dir, "state.ckpt"),
            "--stats-json", os.path.join(out_dir, "stats.json"),
        ]

    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get(
        "PYTHONPATH", ""
    )
    base_env.pop("CUDABROT_COORDINATOR", None)

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    res = _run(["8", *args(str(single_dir))], base_env)
    assert res.returncode == 0, res.stderr[-2000:]

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["CUDABROT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CUDABROT_NUM_PROCESSES"] = "2"
        env["CUDABROT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, "4",
                 *args(str(multi_dir))],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-2000:])

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.io import checkpoint as ckpt

    cx, cy, half = -0.7436, 0.1319, 6e-3 / 2
    cfg = RenderConfig(
        canvas=Canvas(width=32, height=32,
                      min_real=cx - half, max_real=cx + half,
                      min_imag=cy - half, max_imag=cy + half),
        band=IterationBand(max_escape_iterations=300,
                           min_escape_iterations=20),
        sample_domain=(cx - 4 * 6e-3, cx + 4 * 6e-3,
                       cy - 4 * 6e-3, cy + 4 * 6e-3),
        options=EngineOptions(sampler="mh"),
    )
    h_single, _ = ckpt.load(str(single_dir / "state.ckpt"), cfg)
    h_multi, _ = ckpt.load(str(multi_dir / "state.ckpt"), cfg)
    assert h_single.sum() > 0
    np.testing.assert_array_equal(h_multi, h_single)

    # Mass conservation on both topologies: every unit of chain mass the
    # kernel emitted is on the canvas, none forfeited in flight.
    for d in (single_dir, multi_dir):
        st = json.loads((d / "stats.json").read_text())
        assert st["mh_lost_weight"] == 0
        assert st["on_canvas_points"] == int(h_single.sum())


def test_sigint_on_nonprimary_stops_distributed_render(tmp_path):
    """A SIGINT delivered to a NON-primary process must stop the whole
    distributed render (driver or-reduces local stop requests across
    processes); without the reduction the render would run its -t -1
    loop forever and this test would time out."""
    import signal as _signal
    import time as _time

    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get(
        "PYTHONPATH", ""
    )
    base_env.pop("CUDABROT_COORDINATOR", None)

    args = [
        "-w", "32", "-h", "32", "-m", "40", "-c", "4",
        "-t", "-1", "--engine", "oracle", "--devices", "all",
        "-o", os.path.join(str(tmp_path), "out.pgm"),
    ]
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["CUDABROT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CUDABROT_NUM_PROCESSES"] = "2"
        env["CUDABROT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, "4", *args],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    # Give the render time to reach the pass loop, then interrupt the
    # NON-primary. (If the signal lands during warmup the flag is still
    # honored at the first loop check — either way both must exit.)
    _time.sleep(20)
    procs[1].send_signal(_signal.SIGINT)
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-2000:])
    assert "Buddhabrot passes took" in outs[0][0]


def test_two_processes_extended_match_single_process(tmp_path):
    """Extended-precision (df32) multi-process rendering: the 16-array
    ext lane state and the runtime df32 constant vector must build and
    shard across processes exactly like the f32 state (bitwise equality
    with the single-process run)."""
    cx, cy = -0.75, 0.055
    win = f"{cx-5e-7!r},{cx+5e-7!r},{cy-5e-7!r},{cy+5e-7!r}"

    def args(out_dir: str) -> list[str]:
        return [
            "-w", "32", "-h", "32", "-m", "400", "-c", "20",
            "--passes", "2", "-t", "-1",
            "--engine", "pallas", "--precision", "extended",
            "--replay", "device",
            "--sample-domain", win,
            "--lane-rows", "8", "--steps-per-pass", "256",
            "--replay-capacity", "4096",
            "--devices", "all",
            "-o", os.path.join(out_dir, "out.pgm"),
            "-s", os.path.join(out_dir, "state.ckpt"),
        ]

    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get(
        "PYTHONPATH", ""
    )
    base_env.pop("CUDABROT_COORDINATOR", None)

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    res = _run(["8", *args(str(single_dir))], base_env)
    assert res.returncode == 0, res.stderr[-2000:]

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["CUDABROT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CUDABROT_NUM_PROCESSES"] = "2"
        env["CUDABROT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, "4",
                 *args(str(multi_dir))],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-2000:])

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.io import checkpoint as ckpt

    cfg = RenderConfig(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=400,
                           min_escape_iterations=20),
        sample_domain=(cx - 5e-7, cx + 5e-7, cy - 5e-7, cy + 5e-7),
        options=EngineOptions(precision="extended"),
    )
    h_single, _ = ckpt.load(str(single_dir / "state.ckpt"), cfg)
    h_multi, _ = ckpt.load(str(multi_dir / "state.ckpt"), cfg)
    assert h_single.sum() > 0
    np.testing.assert_array_equal(h_multi, h_single)
