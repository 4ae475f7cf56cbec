#!/usr/bin/env bash
# Build the native host-ops library (auto-built on first import too).
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -o native/libloongx_host.so native/host_ops.cc
echo "built native/libloongx_host.so"
