"""Build dist/fakepilot_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = REPO / "dist" / "fakepilot_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "fakepilot_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
