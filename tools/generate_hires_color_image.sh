#!/bin/bash
# Production high-resolution HSL color render — the in-process equivalent
# of the reference's generate_hires_color_image.sh (same bands, budgets,
# canvas, and hue adjustment; no ImageMagick or external combiner needed).
#
# Renders three iteration bands at 20000x15000 over re in [-2,2],
# im in [-1.5,1.5]: fine (m=60000 c=45000, 12h), medium (m=8000 c=1000,
# 4h), coarse (m=500 c=20, 2h), normalizes each (the -normalize step), and
# merges them as H=medium, S=coarse, L=fine with a +0.3 hue rotation.

set -e
cd "$(dirname "$0")/.."

python -m cudabrot_tpu.cli render-color \
    --mode hsl \
    -w 20000 -h 15000 \
    --min-real -2.0 --max-real 2.0 \
    --min-imag -1.5 --max-imag 1.5 \
    --normalize \
    --adjust-hue 0.3 \
    --band "H:8000:1000:-1:$((60 * 60 * 4))" \
    --band "S:500:20:-1:$((60 * 60 * 2))" \
    --band "L:60000:45000:-1:$((60 * 60 * 12))" \
    -o combined.png \
    "$@"
