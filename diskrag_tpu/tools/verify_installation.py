"""Environment report — counterpart of the reference's
`scripts/verify_installation.py`: JSON report of python/deps/devices/
native-lib/env-key status.

Run: python -m diskrag_tpu.tools.verify_installation
"""

from __future__ import annotations

import importlib
import json
import os
import sys


def verify_installation() -> dict:
    report: dict = {
        "python": sys.version.split()[0],
        "packages": {},
        "devices": None,
        "native_io": False,
        "openai_api_key": bool(os.environ.get("OPENAI_API_KEY")),
    }
    for mod in ("jax", "numpy", "pandas", "pyarrow", "yaml", "pydantic",
                "httpx", "aiohttp"):
        try:
            m = importlib.import_module(mod)
            report["packages"][mod] = getattr(m, "__version__", "ok")
        except ImportError:
            report["packages"][mod] = None
    try:
        import jax

        report["devices"] = [str(d) for d in jax.devices()]
        report["default_backend"] = jax.default_backend()
    except Exception as e:  # noqa: BLE001
        report["devices"] = f"error: {e}"
    try:
        from diskrag_tpu.native import native_available

        report["native_io"] = native_available()
    except Exception:  # noqa: BLE001
        pass
    try:
        import diskrag_tpu

        report["diskrag_tpu"] = diskrag_tpu.__version__
    except Exception as e:  # noqa: BLE001
        report["diskrag_tpu"] = f"error: {e}"
    return report


if __name__ == "__main__":
    print(json.dumps(verify_installation(), indent=2))
