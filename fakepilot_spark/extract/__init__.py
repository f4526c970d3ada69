"""Extraction layer: pure-Python field semantics + vectorized Spark UDFs."""

from .fields import (  # noqa: F401
    COMPANY_FIELD_ORDER,
    REVIEW_FIELD_ORDER,
    company_record,
    extract_page,
    link_hrefs,
    review_records,
)
