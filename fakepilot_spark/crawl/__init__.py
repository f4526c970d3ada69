"""Crawl engine: frontier, politeness, URL-seen sketches, epoch scheduler.

Implements the north rule (BASELINE.json:6,14): a salted host-prefix-
partitioned priority-queue frontier over Iceberg-style tables, drained in
micro-batches with bloom/cuckoo URL-seen enforcement, broadcast robots +
politeness dimensions, and resumable per-partition lineage checkpoints.
"""
