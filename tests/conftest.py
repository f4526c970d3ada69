"""Shared fixtures: golden data loading + a session-scoped SparkSession."""

from __future__ import annotations

import datetime
import io
import json
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA_DIR = Path(__file__).resolve().parent / "data"


def load_goldens() -> dict:
    """valid_data.json with the same post-processing the reference suite
    applies (/root/reference/tests/test_xray.py:44-70): int-keyed
    rating_distribution, parsed review datetimes, default is_verified=False.
    """
    with open(DATA_DIR / "valid_data.json", encoding="utf-8") as f:
        data = json.load(f)
    for company in data.values():
        if "rating_distribution" in company:
            company["rating_distribution"] = {
                int(k): v for k, v in company["rating_distribution"].items()
            }
        for review in company.get("reviews", ()):
            review["date"] = datetime.datetime.strptime(
                review["date"], "%Y-%m-%dT%H:%M:%S.%fZ"
            )
            if "date_experience" in review:
                review["date_experience"] = datetime.datetime.strptime(
                    review["date_experience"], "%B %d, %Y"
                )
            review.setdefault("is_verified", False)
    return data


def load_fixture_pages() -> dict:
    """filename -> utf-8 html str for all 17 fixture pages."""
    pages = {}
    with zipfile.ZipFile(DATA_DIR / "text_files.zip") as zf:
        for info in zf.infolist():
            with zf.open(info) as f:
                pages[info.filename] = io.TextIOWrapper(f, encoding="utf-8").read()
    return pages


@pytest.fixture(scope="session")
def goldens():
    return load_goldens()


@pytest.fixture(scope="session")
def fixture_pages():
    return load_fixture_pages()


@pytest.fixture(scope="session")
def spark():
    from fakepilot_spark.session import get_spark

    s = get_spark(app_name="fakepilot-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
