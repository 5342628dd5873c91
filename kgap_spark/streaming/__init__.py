from kgap_spark.streaming.changelog import (  # noqa: F401
    ChangelogCursor,
    ChangelogExpiredError,
)
from kgap_spark.streaming.ingest import (  # noqa: F401
    stateful_first_seen,
    stream_pages_to_triples,
    windowed_event_counts,
)
