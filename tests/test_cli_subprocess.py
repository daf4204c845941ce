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
