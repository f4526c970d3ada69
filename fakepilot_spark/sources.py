"""Sources: the Common-Crawl-style ``pages`` corpus and the fixture loader.

The engine's primary input is an Iceberg-style table with the exact shape
mandated by ``BASELINE.json:15``: ``(url string, warc_ts timestamp,
html binary, text string, lang string)``. In this sandbox Iceberg jars are
absent, so tables are partitioned Parquet behind the same schema (SURVEY.md
§8); on a real cluster the reader swaps to ``spark.read.table`` untouched.
"""

from __future__ import annotations

import datetime as _dt
import io
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .extract.schemas import PAGE_SCHEMA

__all__ = ["fixture_pages_df", "read_pages", "write_pages", "FIXTURE_ZIP"]

FIXTURE_ZIP = Path(__file__).resolve().parent.parent / "tests" / "data" / "text_files.zip"

# Deterministic timestamps: fixture era encoded in the filename suffix.
_ERA_2023 = _dt.datetime(2023, 12, 15, 0, 0, 0)
_ERA_2025 = _dt.datetime(2025, 5, 20, 0, 0, 0)


def fixture_url(filename: str) -> str:
    """Stable URL for a fixture page, derived from its filename."""
    slug = filename.removesuffix(".txt")
    return f"https://www.trustpilot.com/review/{slug}"


def fixture_pages_df(spark: SparkSession, zip_path: Path | None = None) -> DataFrame:
    """The 17 real fixture pages as a ``pages`` DataFrame (byte-identity gate
    input; fixtures listed in SURVEY.md §5.1)."""
    rows = []
    with zipfile.ZipFile(zip_path or FIXTURE_ZIP) as zf:
        for info in sorted(zf.infolist(), key=lambda i: i.filename):
            raw = zf.read(info.filename)
            era = _ERA_2025 if "_2025" in info.filename or info.filename.startswith("sumeria") else _ERA_2023
            rows.append(
                (
                    fixture_url(info.filename),
                    era,
                    raw,
                    None,  # text rendering not needed for the gate
                    None,
                )
            )
    return spark.createDataFrame(rows, PAGE_SCHEMA)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan a pages table. Column pruning matters here: ``html`` is the fat
    column — always ``select`` before shuffling."""
    return spark.read.schema(PAGE_SCHEMA).parquet(path)


def write_pages(df: DataFrame, path: str, partitions: int | None = None) -> None:
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Scan a WARC-export-style JSONL pages table (one JSON object per line:
    url, warc_ts ISO-8601, html base64, text, lang) into the canonical
    PAGE_SCHEMA shape.

    JSON cannot carry raw bytes, so ``html`` rides base64 — decoded
    JVM-side (``unbase64``), never in Python. Schema is explicit: a schema
    inference pass over 100 TB of JSONL is a full extra scan.
    """
    import pyspark.sql.functions as F

    raw_schema = (
        "url string, warc_ts string, html string, text string, lang string"
    )
    raw = spark.read.schema(raw_schema).json(path)
    return raw.select(
        F.col("url"),
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.unbase64("html").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def write_pages_jsonl(df: DataFrame, path: str) -> None:
    """Inverse of :func:`read_pages_jsonl` (html → base64, warc_ts → ISO)."""
    import pyspark.sql.functions as F

    df.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("warc_ts"),
        F.base64("html").alias("html"),
        "text",
        "lang",
    ).write.mode("overwrite").json(path)
