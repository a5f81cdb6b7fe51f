"""Build the native IO library: python -m diskrag_tpu.native.build"""

import sys

from diskrag_tpu.native import build_native

if __name__ == "__main__":
    ok = build_native(force="--force" in sys.argv)
    print("native build:", "ok" if ok else "FAILED")
    sys.exit(0 if ok else 1)
