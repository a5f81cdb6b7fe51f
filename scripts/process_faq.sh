#!/usr/bin/env bash
# FAQ ingest helper (counterpart of the reference's scripts/process_faq.sh):
# process a FAQ CSV into a collection and build its index in one go.
# Usage: ./scripts/process_faq.sh <collection_name> <csv_file> [--questions]
set -euo pipefail

if [ $# -lt 2 ] || [ $# -gt 3 ]; then
    echo "usage: $0 <collection_name> <csv_file> [--questions]" >&2
    echo "" >&2
    echo "  collection_name  target collection" >&2
    echo "  csv_file         FAQ CSV (question,answer[,id,source_*] columns)" >&2
    echo "  --questions      also generate similar questions via LLM" >&2
    exit 1
fi

COLLECTION="$1"
CSV_FILE="$2"
EXTRA=()
if [ "${3:-}" = "--questions" ]; then
    EXTRA+=(--questions)
fi

if [ ! -f "$CSV_FILE" ]; then
    echo "error: CSV file not found: $CSV_FILE" >&2
    exit 1
fi
if ! head -n 1 "$CSV_FILE" | grep -qi "question" || \
   ! head -n 1 "$CSV_FILE" | grep -qi "answer"; then
    echo "warning: header lacks question/answer columns; continuing" >&2
fi

bash "$(dirname "$0")/check_env.sh"

CONFIG_ARGS=()
if [ -f "config.yaml" ]; then
    CONFIG_ARGS+=(--config config.yaml)
fi

python -m diskrag_tpu.cli "${CONFIG_ARGS[@]}" process "$CSV_FILE" \
    -c "$COLLECTION" "${EXTRA[@]}"
python -m diskrag_tpu.cli "${CONFIG_ARGS[@]}" index "$COLLECTION"
echo "done: collection '$COLLECTION' processed and indexed"
