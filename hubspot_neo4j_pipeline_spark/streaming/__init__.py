"""Structured-streaming variants of the event analytics."""

from .event_analytics import (
    read_event_stream,
    sessionize,
    windowed_event_counts,
)
from .gram_store import (
    gram_store_compact,
    gram_store_update_batch,
    read_gram_store,
    score_batch_against_store,
    stream_gram_store,
)
from .hash_store import (
    dedup_batch_against_store,
    hash_store_compact,
    hash_store_update_batch,
    read_hash_store,
    stream_hash_store,
)
from .incremental import (
    read_current,
    read_history,
    scd2_store_compact,
    stream_dedup,
    stream_into_store,
    upsert_batch,
)
from .sketches import (
    cms_update_batch,
    kmv_update_batch,
    stream_cms_into_store,
    stream_kmv_into_store,
)
from .stateful import running_user_stats, running_user_stats_batch

__all__ = [
    "cms_update_batch",
    "gram_store_compact",
    "gram_store_update_batch",
    "read_gram_store",
    "score_batch_against_store",
    "stream_gram_store",
    "kmv_update_batch",
    "stream_cms_into_store",
    "stream_kmv_into_store",
    "read_event_stream",
    "windowed_event_counts",
    "sessionize",
    "dedup_batch_against_store",
    "hash_store_compact",
    "hash_store_update_batch",
    "read_hash_store",
    "stream_hash_store",
    "read_current",
    "read_history",
    "scd2_store_compact",
    "stream_dedup",
    "stream_into_store",
    "upsert_batch",
    "running_user_stats",
    "running_user_stats_batch",
]
