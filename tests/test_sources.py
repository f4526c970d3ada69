"""Source-format coverage: the JSONL pages round-trip must preserve the
canonical PAGE_SCHEMA content bit-for-bit (html bytes through base64,
timestamps through ISO strings) and extraction over a JSONL-scanned corpus
must equal extraction over the parquet scan.
"""

from __future__ import annotations


def test_jsonl_pages_roundtrip(spark, tmp_path):
    from fakepilot_spark.corpus import synth_pages
    from fakepilot_spark.sources import read_pages_jsonl, write_pages_jsonl

    pages = synth_pages(spark, 30, partitions=2, hosts=3, reviews_per_page=1)
    canonical = pages.select("url", "warc_ts", "html", "text", "lang")
    d = str(tmp_path / "pages_jsonl")
    write_pages_jsonl(canonical, d)
    back = read_pages_jsonl(spark, d)
    want = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in canonical.collect()
    }
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in back.collect()
    }
    assert got == want
    assert len(got) == 30
