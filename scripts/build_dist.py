"""Build dist/fakepilot_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = REPO / "dist" / "fakepilot_spark.zip"
    out.parent.mkdir(exist_ok=True)
    # Deterministic archive: fixed per-entry timestamps so rebuilding from
    # unchanged sources is byte-identical (the packaging test rebuilds on
    # every run; mtime-bearing entries would dirty the committed artifact).
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "fakepilot_spark").rglob("*.py")):
            info = zipfile.ZipInfo(
                str(py.relative_to(REPO)), date_time=(2020, 1, 1, 0, 0, 0)
            )
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, py.read_bytes())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
