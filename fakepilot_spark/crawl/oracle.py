"""Single-threaded crawl oracle.

Replays the exact scheduling semantics of :class:`CrawlEngine` in plain
Python over an in-memory corpus — the "reference crawler" the Spark engine
must match per the north rule ("reproducing the same crawl ordering and
URL-seen set as the reference under an identical seed list and politeness
budget", BASELINE.json:6). Everything is computed from the same pure
functions: score = round(1000/(1+depth), 6), admission order
(score desc, url asc), per-host budget, ordered global batch.
"""

from __future__ import annotations

from urllib.parse import urlparse

__all__ = ["oracle_crawl"]


def _score(depth: int) -> float:
    return round(1000.0 / (1.0 + depth), 6)


def oracle_crawl(
    corpus: dict,
    seeds: list,
    max_epochs: int,
    global_batch: int,
    default_budget: int,
    host_budgets: dict | None = None,
    robots_rules: dict | None = None,
    epoch_seconds: float = 60.0,
) -> dict:
    """corpus: url -> list of outgoing absolute links.

    Returns {"fetched_per_epoch": [sorted url lists], "seen": set,
    "batches": [ordered url lists]}.
    """
    host_budgets = host_budgets or {}
    robots_rules = robots_rules or {}

    seen = set(seeds)
    pending = {url: 0 for url in seeds}  # url -> depth
    fetched_per_epoch = []
    batches = []

    for _ in range(max_epochs):
        if not pending:
            break
        # robots filter
        def allowed(url: str) -> bool:
            parts = urlparse(url)
            rules = robots_rules.get(parts.hostname)
            if not rules:
                return True
            disallow, _delay = rules
            return not any(parts.path.startswith(p) for p in disallow)

        candidates = [
            (url, depth) for url, depth in pending.items() if allowed(url)
        ]
        # per-host admission: top budget by (score desc, url asc)
        by_host: dict = {}
        for url, depth in candidates:
            by_host.setdefault(urlparse(url).hostname, []).append((url, depth))
        admitted = []
        for host, urls in by_host.items():
            budget = host_budgets.get(host, default_budget)
            rules = robots_rules.get(host)
            if rules and rules[1] and rules[1] > 0:
                # robots crawl-delay caps fetches per (virtual) epoch
                budget = min(budget, int(epoch_seconds // rules[1]))
            urls.sort(key=lambda t: (-_score(t[1]), t[0]))
            admitted.extend(urls[:budget])
        # global micro-batch
        admitted.sort(key=lambda t: (-_score(t[1]), t[0]))
        batch = admitted[:global_batch]
        if not batch:
            break
        batches.append([u for u, _ in batch])

        fetched = [(u, d) for u, d in batch if u in corpus]
        fetched_per_epoch.append(sorted(u for u, _ in fetched))

        # expand: min-depth dedupe within the epoch, then seen-set rejection
        discovered: dict = {}
        for url, depth in fetched:
            for link in corpus[url]:
                if not link.startswith("http"):
                    continue
                nd = depth + 1
                if link not in discovered or nd < discovered[link]:
                    discovered[link] = nd
        for url, _ in batch:
            pending.pop(url, None)
        for link, depth in discovered.items():
            if link not in seen:
                seen.add(link)
                pending[link] = depth

    return {
        "fetched_per_epoch": fetched_per_epoch,
        "batches": batches,
        "seen": seen,
    }
