#!/usr/bin/env bash
# Build the native ball renderer (.so) ahead of time.
# (viz/render.py also auto-builds on first use; this mirrors the
# reference's scripts/build.sh workflow.)
set -euo pipefail
cd "$(dirname "$0")/../pointcloudattack_tpu/viz"
g++ -O3 -shared -fPIC -o render_balls.bin render_balls.cpp
echo "built $(pwd)/render_balls.bin"
