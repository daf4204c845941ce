"""Assemble the north-star demonstration record (BENCH-style JSON).

Reads the run logs/stats (runA = fresh render, runB = checkpoint resume,
runC = final short leg with image outputs) plus the final checkpoint,
computes mass/max anchors, and writes NORTHSTAR.json at the repo root.

Usage: python tools/northstar_record.py /root/northstar
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    d = sys.argv[1] if len(sys.argv) > 1 else "/root/northstar"
    out: dict = {
        "config": {
            "canvas": [20000, 20000],
            "band": [2000, 20000],
            "flags": "-w 20000 -h 20000 -m 20000 -c 2000 -s <ckpt>",
            "note": "BASELINE.json configs[4] / north-star render",
        },
        "runs": {},
    }
    total_iters = 0
    total_seconds = 0.0
    for leg in ("runA", "runB", "runC"):
        path = os.path.join(d, f"{leg}_stats.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            st = json.load(f)
        iters = st["classify_iters"] + st["orbit_points"]
        total_iters += iters
        total_seconds += st["elapsed_seconds"]
        out["runs"][leg] = {
            "passes": st["passes"],
            "elapsed_seconds": round(st["elapsed_seconds"], 1),
            "complex_iters": iters,
            "iters_per_sec": round(iters / st["elapsed_seconds"], 1),
            "samples": st["samples"],
            "in_band": st["in_band"],
            "replay_dropped": st["replay_dropped"],
            "max_count": st["max_count"],
            "replay": st["replay"],
        }
    out["total_complex_iters"] = total_iters
    out["total_render_seconds"] = round(total_seconds, 1)
    out["iters_per_sec_overall"] = round(total_iters / total_seconds, 1)

    from cudabrot_tpu.io import checkpoint as ckpt
    from cudabrot_tpu.config import Canvas, IterationBand, RenderConfig

    cfg = RenderConfig(
        canvas=Canvas(width=20000, height=20000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        inprogress_file=os.path.join(d, "northstar.ckpt"),
    )
    loaded = ckpt.load(cfg.inprogress_file, cfg)
    assert loaded is not None
    hist, meta = loaded
    out["checkpoint"] = {
        "passes": int(meta.get("passes", 0)),
        "bytes": os.path.getsize(cfg.inprogress_file),
        "mass": int(hist.sum(dtype=np.uint64)),
        "max_count": int(hist.max()),
        "nonzero_pixels": int((hist > 0).sum()),
    }
    # Full-size statistical anchor: on-canvas orbit points per drawn
    # sample must match the same band at ANY canvas resolution covering
    # the same domain (the histogram grid only changes binning, not
    # on-canvas membership). bench.py's 1000^2 headline record is the
    # cross-check.
    samples = sum(r["samples"] for r in out["runs"].values())
    out["anchors"] = {
        "on_canvas_points_per_sample": round(
            out["checkpoint"]["mass"] / samples, 6
        ),
        "in_band_per_sample": round(
            sum(r["in_band"] for r in out["runs"].values()) / samples, 9
        ),
    }
    for img in ("northstar_runA.pgm", "northstar_runC.pgm",
                "northstar_runC.png"):
        p = os.path.join(d, img)
        if os.path.exists(p):
            out.setdefault("artifacts", {})[img] = os.path.getsize(p)

    with open("NORTHSTAR.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
