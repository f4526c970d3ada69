"""Property tests for the URL-seen sketches (hypothesis).

The crawl correctness contract: sketches may report false positives (those
fall through to the exact anti-join) but NEVER false negatives — a false
negative would re-enqueue a seen URL and break crawl-order equivalence.
Merge must be associative/commutative over disjoint key sets (treeAggregate
precondition).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fakepilot_spark.crawl.sketches import BloomFilter, CuckooFilter

hashes = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=0, max_size=300
)


def _arr(xs):
    return np.array(xs, dtype=np.uint64)


@given(hashes)
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(xs):
    bf = BloomFilter.for_capacity(max(len(xs), 10), fpp=0.01)
    if xs:
        bf.add_many(_arr(xs))
        assert bf.contains_many(_arr(xs)).all()


@given(hashes, hashes)
@settings(max_examples=30, deadline=None)
def test_bloom_merge_is_union(xs, ys):
    a = BloomFilter(4096, 4)
    b = BloomFilter(4096, 4)
    if xs:
        a.add_many(_arr(xs))
    if ys:
        b.add_many(_arr(ys))
    ab = BloomFilter.from_bytes(a.to_bytes()).merge(b)
    ba = BloomFilter.from_bytes(b.to_bytes()).merge(a)
    assert (ab.bits == ba.bits).all()  # commutative
    both = xs + ys
    if both:
        assert ab.contains_many(_arr(both)).all()


def test_bloom_fpp_bound():
    rng = np.random.default_rng(7)
    items = rng.integers(0, 1 << 63, size=20_000, dtype=np.uint64)
    probes = rng.integers(0, 1 << 63, size=20_000, dtype=np.uint64)
    bf = BloomFilter.for_capacity(20_000, fpp=0.01)
    bf.add_many(items)
    fp = bf.contains_many(np.setdiff1d(probes, items)).mean()
    assert fp < 0.03  # 3x headroom over the design point


@given(hashes)
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives(xs):
    cf = CuckooFilter.for_capacity(max(len(xs), 16))
    if xs:
        cf.add_many(_arr(xs))
        assert cf.contains_many(_arr(xs)).all()


@given(hashes)
@settings(max_examples=30, deadline=None)
def test_cuckoo_roundtrip_serialization(xs):
    cf = CuckooFilter.for_capacity(max(len(xs), 16))
    if xs:
        cf.add_many(_arr(xs))
    back = CuckooFilter.from_bytes(cf.to_bytes())
    assert (back.table == cf.table).all()
    if xs:
        assert back.contains_many(_arr(xs)).all()


@given(hashes)
@settings(max_examples=30, deadline=None)
def test_cuckoo_delete_removes(xs):
    xs = list(dict.fromkeys(xs))
    cf = CuckooFilter.for_capacity(max(len(xs), 16))
    if not xs:
        return
    cf.add_many(_arr(xs))
    half = xs[: len(xs) // 2]
    cf.delete_many(_arr(half))
    # remaining keys still present (no false negatives for survivors)
    rest = xs[len(xs) // 2 :]
    if rest:
        assert cf.contains_many(_arr(rest)).all()


@given(hashes, hashes)
@settings(max_examples=30, deadline=None)
def test_cuckoo_merge_union(xs, ys):
    cap = max(len(xs) + len(ys), 32) * 2
    a = CuckooFilter.for_capacity(cap)
    b = CuckooFilter(a.n_buckets)  # identical geometry
    if xs:
        a.add_many(_arr(xs))
    if ys:
        b.add_many(_arr(ys))
    merged = CuckooFilter.from_bytes(a.to_bytes()).merge(b)
    both = xs + ys
    if both:
        assert merged.contains_many(_arr(both)).all()


def test_cuckoo_fpp_reasonable():
    rng = np.random.default_rng(11)
    items = rng.integers(0, 1 << 63, size=30_000, dtype=np.uint64)
    probes = rng.integers(0, 1 << 63, size=30_000, dtype=np.uint64)
    cf = CuckooFilter.for_capacity(30_000)
    cf.add_many(items)
    fp = cf.contains_many(np.setdiff1d(probes, items)).mean()
    assert fp < 0.01  # 16-bit fingerprints → ~2^-13 theoretical
