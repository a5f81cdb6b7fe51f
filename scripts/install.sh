#!/usr/bin/env bash
# Install diskrag_tpu + build the native IO library
# (counterpart of the reference's scripts/install.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pip install -e .
python -m diskrag_tpu.native.build
python -m diskrag_tpu.tools.verify_installation
