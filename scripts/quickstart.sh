#!/usr/bin/env bash
# Create a sample FAQ CSV and run the full pipeline on it
# (counterpart of the reference's scripts/quickstart.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p quickstart_data
cat > quickstart_data/sample_faq.csv <<'CSV'
id,question,answer
q1,如何重設密碼？,請至設定頁面點選「重設密碼」。
q2,支援哪些瀏覽器？,支援 Chrome、Firefox 與 Safari 最新版。
q3,如何聯絡客服？,請來信 support@example.com。
CSV
python -m diskrag_tpu.cli --config examples/config.yaml process quickstart_data/sample_faq.csv -c quickstart
python -m diskrag_tpu.cli --config examples/config.yaml index quickstart
python -m diskrag_tpu.cli --config examples/config.yaml search quickstart "怎麼改密碼"
