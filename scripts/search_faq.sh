#!/usr/bin/env bash
# FAQ search helper (counterpart of the reference's scripts/search_faq.sh).
# Usage: ./scripts/search_faq.sh <collection_name> <query> [top_k]
set -euo pipefail

if [ $# -lt 2 ]; then
    echo "usage: $0 <collection_name> <query> [top_k]" >&2
    exit 1
fi

COLLECTION="$1"
QUERY="$2"
TOP_K="${3:-5}"

CONFIG_ARGS=()
if [ -f "config.yaml" ]; then
    CONFIG_ARGS+=(--config config.yaml)
fi

python -m diskrag_tpu.cli "${CONFIG_ARGS[@]}" search "$COLLECTION" "$QUERY" \
    -k "$TOP_K" --faq
