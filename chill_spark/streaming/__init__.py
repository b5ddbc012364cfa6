from .stream import (
    CORRUPT_COL,
    drain,
    run_stream,
    split_quarantine,
    stream_csv_source,
    streaming_rollup,
)

__all__ = [
    "CORRUPT_COL",
    "drain",
    "run_stream",
    "split_quarantine",
    "stream_csv_source",
    "streaming_rollup",
]

from .stateful import SESSION_SCHEMA, sessionize_stream  # noqa: E402

__all__ += ["SESSION_SCHEMA", "sessionize_stream"]

from .dedup_stream import (  # noqa: E402
    run_dedup_stream,
    run_embedding_dedup_stream,
)

__all__ += ["run_dedup_stream", "run_embedding_dedup_stream"]

from .pq_stream import run_pq_stream  # noqa: E402

__all__ += ["run_pq_stream"]
