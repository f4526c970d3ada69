"""Structured Streaming operators (micro-batch file sources).

The crawl's frontier drain is an explicit epoch loop (SURVEY.md §1.2) — these
operators cover the *streaming* slice of the taxonomy: watermarked event-time
windows for late data, and a custom stateful operator via
``applyInPandasWithState``. Sources are file streams (the sandbox has no
Kafka); on a cluster only ``readStream.format(...)`` changes.
"""

from .ops import (  # noqa: F401
    stream_events_hourly,
    stream_user_running_stats,
)
