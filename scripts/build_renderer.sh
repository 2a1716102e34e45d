#!/usr/bin/env bash
# Build the native ball renderer (.so) ahead of time.
# (viz/render.py also auto-builds on first use; this mirrors the
# reference's scripts/build.sh workflow.)
set -euo pipefail
cd "$(dirname "$0")/../pointcloudattack_tpu/viz"
g++ -O3 -shared -fPIC -o librender_balls.so render_balls.cpp
echo "built $(pwd)/librender_balls.so"
