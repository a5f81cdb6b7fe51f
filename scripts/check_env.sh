#!/usr/bin/env bash
# Environment check (counterpart of the reference's scripts/check_env.sh)
python -m diskrag_tpu.tools.verify_installation
