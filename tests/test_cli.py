import pytest

from cudabrot_tpu import cli


def test_defaults_match_reference():
    cfg, extras = cli.parse_args([])
    assert cfg.canvas.width == 1000 and cfg.canvas.height == 1000
    assert cfg.band.max_escape_iterations == 100
    assert cfg.band.min_escape_iterations == 20
    assert cfg.gamma == 1.0
    assert cfg.seconds_to_run == 10.0
    assert cfg.output_image == "output.pgm"
    assert cfg.inprogress_file is None
    assert cfg.device_index == 0
    assert not extras.save_png


def test_all_reference_flags():
    cfg, _ = cli.parse_args(
        [
            "-d", "1",
            "-o", "img.pgm",
            "-s", "state.bin",
            "-m", "20000",
            "-c", "2000",
            "-w", "200",
            "-h", "100",
            "-g", "1.8",
            "-t", "-1",
            "--min-real", "0.0",
            "--max-real", "1.0",
            "--min-imag", "0.0",
            "--max-imag", "0.5",
        ]
    )
    assert cfg.device_index == 1
    assert cfg.output_image == "img.pgm"
    assert cfg.inprogress_file == "state.bin"
    assert cfg.band.max_escape_iterations == 20000
    assert cfg.band.min_escape_iterations == 2000
    assert cfg.canvas.width == 200 and cfg.canvas.height == 100
    assert cfg.gamma == 1.8
    assert cfg.seconds_to_run == -1.0
    assert cfg.canvas.min_real == 0.0 and cfg.canvas.max_real == 1.0
    assert cfg.canvas.min_imag == 0.0 and cfg.canvas.max_imag == 0.5


def test_h_is_height_not_help():
    cfg, _ = cli.parse_args(["-h", "77"])
    assert cfg.canvas.height == 77


def test_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as e:
        cli.parse_args(["--help"])
    assert e.value.code == 0
    assert "Usage:" in capsys.readouterr().out


@pytest.mark.parametrize(
    "argv",
    [
        ["-m"],  # missing value (cudabrot.cu:628-631)
        ["-m", "12x"],  # trailing garbage (cudabrot.cu:635-639)
        ["-m", ""],
        ["-w", "abc"],
        ["-g", "1.0.0"],
        ["--frobnicate"],  # unknown flag (cudabrot.cu:750-752)
        ["-w", "0"],  # invalid canvas
        ["--min-real", "2.0", "--max-real", "-2.0"],
    ],
)
def test_bad_args_raise(argv):
    with pytest.raises(cli.CliError):
        cli.parse_args(argv)


def test_int_flag_rejects_float():
    with pytest.raises(cli.CliError):
        cli.parse_args(["-m", "10.5"])


def test_extension_flags():
    cfg, extras = cli.parse_args(
        [
            "--fractal", "burning-ship",
            "--engine", "oracle",
            "--scatter", "xla",
            "--seed", "42",
            "--passes", "3",
            "--checkpoint-interval", "10",
            "--png",
            "--stats-json", "s.json",
            "--devices", "2",
            "--replay-threads", "4",
            "--replay-device-share", "0.25",
            "--refill-rng", "hardware_rw",
            "--replay-block", "4096",
            "--replay-chunk", "32",
        ]
    )
    assert cfg.fractal == "burning-ship"
    assert cfg.options.engine == "oracle"
    assert cfg.options.scatter == "xla"
    assert cfg.seed == 42
    assert cfg.max_passes == 3
    assert cfg.checkpoint_interval == 10
    assert cfg.options.num_devices == 2
    assert cfg.options.replay_threads == 4
    assert cfg.options.replay_device_share == 0.25
    assert cfg.options.refill_rng == "hardware_rw"
    assert cfg.options.replay_block == 4096
    assert cfg.options.replay_chunk == 32
    assert extras.save_png
    assert extras.stats_json == "s.json"


def test_devices_all():
    cfg, _ = cli.parse_args(["--devices", "all"])
    assert cfg.options.num_devices is None


def test_flag_order_revalidation():
    """Setting a crop before its matching extent must not fail if the final
    state is valid (reference recomputes deltas per flag but only fails on
    invalid intermediate states — mirror its exact behavior)."""
    cfg, _ = cli.parse_args(
        ["--max-real", "3.0", "--min-real", "2.5"]
    )
    assert cfg.canvas.min_real == 2.5
    assert cfg.canvas.max_real == 3.0
    # And an intermediate-invalid order errors like the reference:
    with pytest.raises(cli.CliError):
        cli.parse_args(["--min-real", "2.5", "--max-real", "3.0"])


def test_devices_garbage_is_clean_cli_error():
    """--devices with a non-integer must raise CliError (clean usage
    message), not an uncaught ValueError traceback."""
    with pytest.raises(cli.CliError):
        cli.parse_args(["--devices", "2x"])


def test_render_color_cli_error_is_clean(capsys):
    """A CliError from the render-color subcommand must be caught by main
    (message + nonzero exit), not propagate as a traceback."""
    rc = cli.main(["render-color", "--band"])
    assert rc == 1
    out = capsys.readouterr().out
    assert "Traceback" not in out


def test_image_save_failure_is_nonfatal(tmp_path):
    """A failing image write after a render must print-and-continue like
    the reference's SaveImage (cudabrot.cu:553-556); the checkpoint stays
    intact and the exit code is still 0."""
    ckpt = tmp_path / "state.ckpt"
    bad_image = tmp_path / "no_such_dir" / "out.pgm"
    lines = []
    cfg, extras = cli.parse_args(
        ["-w", "32", "-h", "32", "-m", "60", "-c", "5",
         "--passes", "2", "-t", "-1", "--engine", "oracle",
         "-s", str(ckpt), "-o", str(bad_image)]
    )
    rc = cli.run(cfg, extras, log=lines.append)
    assert rc == 0
    assert ckpt.exists()
    assert any("Failed saving image" in ln for ln in lines)
    assert not any("Done!" in ln for ln in lines)


def test_unknown_fractal_is_clean_cli_error(capsys):
    """--fractal with an unknown name must print a clean error (no
    traceback), like every other invalid-argument path."""
    from cudabrot_tpu import cli

    rc = cli.main(["--fractal", "mandelbox", "-t", "1"])
    out = capsys.readouterr().out
    assert rc == 0  # parity: argument errors print usage and exit 0
    assert "Unknown fractal" in out
    assert "Usage:" in out


def test_center_span_zoom_shorthand():
    cfg, _ = cli.parse_args(
        ["-w", "400", "-h", "300", "--center", "-0.5,0.25",
         "--span", "0.02"]
    )
    assert cfg.canvas.min_real == -0.51 and cfg.canvas.max_real == -0.49
    # Imag extent scales by the 300/400 pixel aspect.
    assert abs(cfg.canvas.max_imag - cfg.canvas.min_imag - 0.015) < 1e-12
    assert abs((cfg.canvas.max_imag + cfg.canvas.min_imag) / 2 - 0.25) < 1e-12
    assert cfg.sample_domain == (
        cfg.canvas.min_real, cfg.canvas.max_real,
        cfg.canvas.min_imag, cfg.canvas.max_imag,
    )


def test_center_requires_span():
    import pytest

    with pytest.raises(cli.CliError, match="together"):
        cli.parse_args(["--center", "0,0"])
    with pytest.raises(cli.CliError, match="together"):
        cli.parse_args(["--span", "0.1"])
    with pytest.raises(cli.CliError, match="center"):
        cli.parse_args(["--center", "1.0", "--span", "0.1"])
    with pytest.raises(cli.CliError, match="positive"):
        cli.parse_args(["--center", "0,0", "--span", "-1"])
