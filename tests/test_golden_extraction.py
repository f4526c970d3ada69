"""Golden-output gate, pure Python path (no Spark).

Replays every assertion of the reference suite
(/root/reference/tests/test_xray.py:90-169) against our from-scratch
htmlmini + fields extraction over the 17 real fixture pages. If this module
is green, extraction is byte-identical to fakepilot (bs4-on-lxml) output.
"""

from __future__ import annotations

import pytest

from fakepilot_spark.extract import extract_page

from .conftest import load_goldens

GOLDENS = load_goldens()


@pytest.fixture(scope="module")
def extracted(fixture_pages):
    return {
        name: extract_page(fixture_pages[name], with_reviews=True, nreviews=100)
        for name in GOLDENS
    }


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_company_name(extracted, name):
    assert extracted[name]["name"] == GOLDENS[name]["name"]


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_rating_stats(extracted, name):
    got = [extracted[name]["nreviews"], extracted[name]["score"]]
    assert got == GOLDENS[name]["rating_stats"]


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_categories(extracted, name):
    assert extracted[name]["categories"] == GOLDENS[name]["categories"]


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_review_count(extracted, name):
    assert len(extracted[name]["reviews"]) == GOLDENS[name]["nreviews"]


@pytest.mark.parametrize("field", ["address", "phone", "email"])
@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_contact_fields(extracted, name, field):
    assert extracted[name][field] == GOLDENS[name][field]


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_is_claimed(extracted, name):
    if "is_claimed" in GOLDENS[name]:
        assert extracted[name]["is_claimed"] == GOLDENS[name]["is_claimed"]


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_rating_distribution(extracted, name):
    if "rating_distribution" in GOLDENS[name]:
        assert (
            extracted[name]["rating_distribution"]
            == GOLDENS[name]["rating_distribution"]
        )


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_reviews_present(extracted, name):
    for review in GOLDENS[name].get("reviews", ()):
        assert review in extracted[name]["reviews"]
