"""Regenerate the examples/ gallery (the reference's README example
images, README.md:130-158, re-rendered by this engine).

Run on a TPU host: python tools/generate_examples.py [seconds_scale]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def main() -> int:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    os.makedirs(EXAMPLES, exist_ok=True)

    import jax
    import numpy as np

    from cudabrot_tpu import cli, color, driver
    from cudabrot_tpu.io import png as png_io
    from cudabrot_tpu.ops import tonemap as tonemap_op

    def render(name: str, argv: list[str]) -> None:
        print(f"=== {name}: {' '.join(argv)}")
        cfg, _ = cli.parse_args(argv)
        res = driver.run_render(cfg)
        mapped = tonemap_op.tonemap(jax.numpy.asarray(res.histogram),
                                    cfg.gamma)
        img = np.asarray(jax.device_get(mapped.image))
        png_io.write_png(os.path.join(EXAMPLES, name + ".png"), img)

    base = ["-w", "200", "-h", "200"]
    t = lambda s: ["-t", str(s * scale)]

    # Gamma sweep (README.md:132-134)
    for g in ("1.0", "1.5", "2.2"):
        render(f"gamma_{g.replace('.', '_')}",
               base + ["-m", "10000", "-c", "8000", "-g", g] + t(30))
    # Max-iteration sweep (README.md:143-145)
    for m in ("100", "1000", "20000"):
        render(f"max_{m}", base + ["-m", m, "-c", "20"] + t(10))
    # Cutoff sweep (README.md:155-157)
    for c in ("20", "2000", "10000"):
        render(f"cutoff_{c}",
               base + ["-m", "20000", "-c", c, "-g", "1.8"] + t(30))
    # Canvas crop (README.md:89-96)
    render("cropped", [
        "-w", "200", "-h", "100",
        "--min-real", "0.0", "--max-real", "1.0",
        "--min-imag", "0.0", "--max-imag", "0.5",
        "-m", "2000", "-c", "100", "-g", "1.5",
    ] + t(20))
    # Restricted sample window (--sample-domain, no reference
    # equivalent): same seahorse-valley crop rendered as an A/B pair —
    # full-domain sampling vs all sampling effort concentrated on
    # locally-seeded orbits (measured 3.7x the on-canvas points at
    # equal time; benchmarks/PERF_NOTES.md "Sample-domain windowing").
    crop = [
        "-w", "1200", "-h", "1200",
        "--min-real", "-0.78", "--max-real", "-0.72",
        "--min-imag", "0.07", "--max-imag", "0.13",
        "-m", "5000", "-c", "500", "-g", "1.6",
    ]
    render("sample_domain_full", crop + t(90))
    render("sample_domain_windowed", crop + [
        "--sample-domain", "-0.84,-0.66,0.01,0.19",
    ] + t(90))
    # Burning ship (the compile-time switch, cudabrot.cu:15-17)
    render("burning_ship", base + [
        "--fractal", "burning-ship", "-m", "1000", "-c", "20", "-g", "1.8",
    ] + t(15))
    # Anti-Buddhabrot (interior orbits — no reference equivalent)
    render("anti_buddhabrot", base + [
        "--fractal", "anti-buddhabrot", "-m", "500", "-g", "2.0",
    ] + t(15))

    # RGB color composite (README.md:177-184)
    print("=== color_rgb")
    rc = color.main([
        "--mode", "rgb", "-w", "200", "-h", "200",
        "-o", os.path.join(EXAMPLES, "color_rgb.png"),
        "--band", f"blue:100:20:2.0:{20 * scale}",
        "--band", f"lime:2000:600:2.0:{20 * scale}",
        "--band", f"red:10000:9000:2.5:{40 * scale}",
    ])
    if rc != 0:
        return rc
    # HSL composite (generate_hires_color_image.sh)
    print("=== color_hsl")
    return color.main([
        "--mode", "hsl", "-w", "200", "-h", "200", "--normalize",
        "-o", os.path.join(EXAMPLES, "color_hsl.png"),
        "--adjust-hue", "0.3",
        "--band", f"H:8000:1000:-1:{20 * scale}",
        "--band", f"S:500:20:-1:{10 * scale}",
        "--band", f"L:60000:45000:-1:{40 * scale}",
    ])


if __name__ == "__main__":
    sys.exit(main())
