"""End-to-end CLI tests through a real subprocess (the user's actual
surface), on the CPU backend."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BOOT = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "from cudabrot_tpu.cli import main; import sys; "
    "sys.exit(main(sys.argv[1:]))"
)


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", BOOT, *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_render_to_pgm_and_stats(tmp_path):
    res = run_cli(
        [
            "-w", "48", "-h", "40", "-m", "60", "-c", "5",
            "--passes", "1", "-t", "-1", "--engine", "oracle",
            "-o", "out.pgm", "--stats-json", "stats.json",
        ],
        str(tmp_path),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Creating 48x40 image, 60 max iterations." in res.stdout
    assert "Buddhabrot passes took" in res.stdout
    assert "Done! Output image saved: out.pgm" in res.stdout

    from cudabrot_tpu.io import pgm

    img = pgm.read_pgm(str(tmp_path / "out.pgm"))
    assert img.shape == (40, 48)
    stats = json.loads((tmp_path / "stats.json").read_text())
    assert stats["passes"] == 1
    assert stats["samples"] > 0


def test_unknown_flag_prints_usage(tmp_path):
    res = run_cli(["--frobnicate"], str(tmp_path))
    assert res.returncode == 0  # reference parity: PrintUsage exits 0
    assert "Invalid argument: --frobnicate" in res.stdout
    assert "Usage:" in res.stdout


def test_help(tmp_path):
    res = run_cli(["--help"], str(tmp_path))
    assert res.returncode == 0
    assert "-h <height>" in res.stdout


@pytest.mark.parametrize("engine", ["oracle", "pallas"])
def test_both_engines_render(tmp_path, engine):
    res = run_cli(
        [
            "-w", "32", "-h", "32", "-m", "40", "-c", "3",
            "--passes", "1", "-t", "-1", "--engine", engine,
            "--lane-rows", "8", "--steps-per-pass", "128",
            "-o", f"{engine}.pgm",
        ],
        str(tmp_path),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    from cudabrot_tpu.io import pgm

    img = pgm.read_pgm(str(tmp_path / f"{engine}.pgm"))
    assert img.max() > 0


def test_precision_float64_pallas_refuses(tmp_path):
    """--precision float64 with the pallas engine must be a clean
    ConfigError, not a silent f32 no-op (VERDICT r1: a flag that lies is
    worse than one that refuses)."""
    res = run_cli(
        ["-w", "16", "-h", "16", "--passes", "1", "-t", "-1",
         "--engine", "pallas", "--precision", "float64", "-o", "x.pgm"],
        str(tmp_path),
    )
    assert res.returncode == 1
    assert "float64" in res.stdout and "oracle" in res.stdout
    assert "Traceback" not in res.stderr


def test_precision_float64_oracle_really_runs_f64(tmp_path):
    """The oracle engine with --precision float64 must enable x64 and
    iterate in real double precision (subprocess: x64 is process-global)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "from cudabrot_tpu.config import (Canvas, EngineOptions,"
        " IterationBand, RenderConfig)\n"
        "from cudabrot_tpu import engines\n"
        "cfg = RenderConfig(canvas=Canvas(width=24, height=24),\n"
        "    band=IterationBand(max_escape_iterations=50,"
        " min_escape_iterations=4),\n"
        "    options=EngineOptions(engine='oracle',"
        " oracle_samples_per_pass=2048, precision='float64'))\n"
        "eng = engines.make_engine(cfg)\n"
        "assert jax.config.read('jax_enable_x64')\n"
        "from cudabrot_tpu.ops import oracle\n"
        "import jax.numpy as jnp\n"
        "cr, ci = oracle.draw_samples(jax.random.key(0), 8,"
        " jnp.dtype('float64'))\n"
        "assert cr.dtype == jnp.float64, cr.dtype\n"
        "state = eng.init_state(None)\n"
        "state = eng.run_pass(state, 0)\n"
        "import numpy as np\n"
        "assert eng.histogram(state).sum() > 0\n"
        "print('F64OK')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    assert "F64OK" in res.stdout
