"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/yckg_spark.zip`` containing the ``yckg_spark`` and
``fixtures`` packages, so the cluster launch is:

    spark-submit --py-files dist/yckg_spark.zip yckg_spark/cli.py build ...

Executors unpack the zip onto their PYTHONPATH; the driver script itself is
shipped separately by spark-submit.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGES = ["yckg_spark", "fixtures"]


def build_zip(out: str | os.PathLike | None = None) -> Path:
    out = Path(out) if out else REPO / "dist" / "yckg_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for pkg in PACKAGES:
            for py in sorted((REPO / pkg).rglob("*.py")):
                zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build_zip())
