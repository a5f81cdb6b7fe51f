#!/usr/bin/env bash
# Offline end-to-end demo: process -> index -> search on examples/faq_data.csv
# (counterpart of the reference's scripts/demo.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m diskrag_tpu.cli --config examples/config.yaml process examples/faq_data.csv -c demo --questions
python -m diskrag_tpu.cli --config examples/config.yaml index demo
python -m diskrag_tpu.cli --config examples/config.yaml search demo "如何建立索引?"
