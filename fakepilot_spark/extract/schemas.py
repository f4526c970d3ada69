"""Spark schemas for the extraction outputs and the pages corpus.

Types follow SURVEY.md §1.1 (derived from the reference's dict shapes at
/root/reference/src/fakepilot/xray.py:202-213,326-339) and the input hint in
BASELINE.json:15.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

COMPANY_STRUCT = StructType(
    [
        StructField("name", StringType(), True),
        StructField("company_url", StringType(), True),
        StructField("nreviews", IntegerType(), True),
        StructField("score", DoubleType(), True),
        StructField("categories", ArrayType(StringType(), True), True),
        StructField("email", StringType(), True),
        StructField("phone", StringType(), True),
        StructField("address", StringType(), True),
        StructField("is_claimed", BooleanType(), True),
        StructField(
            "rating_distribution",
            MapType(IntegerType(), DoubleType(), True),
            True,
        ),
    ]
)

REVIEW_STRUCT = StructType(
    [
        StructField("author_name", StringType(), True),
        StructField("author_id", StringType(), True),
        StructField("is_verified", BooleanType(), True),
        StructField("star_rating", DoubleType(), True),
        StructField("date", TimestampType(), True),
        StructField("title", StringType(), True),
        StructField("content", StringType(), True),
        StructField("nreviews", IntegerType(), True),
        StructField("country", StringType(), True),
        StructField("date_experience", TimestampType(), True),
    ]
)

# Full-page extraction payload: company fields + reviews + parse error slot.
PAGE_EXTRACT_STRUCT = StructType(
    [
        StructField("company", COMPANY_STRUCT, True),
        StructField("reviews", ArrayType(REVIEW_STRUCT, True), True),
        StructField("links", ArrayType(StringType(), True), True),
        StructField("error", StringType(), True),
    ]
)
