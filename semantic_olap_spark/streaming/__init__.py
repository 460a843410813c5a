from semantic_olap_spark.streaming.stateful import (  # noqa: F401
    running_user_stats,
    streaming_funnel,
)
from semantic_olap_spark.streaming.materialized import (  # noqa: F401
    fold_batch,
    maintain_agg_state,
    maintain_quantile_state,
    read_agg_state,
)
from semantic_olap_spark.streaming.semantic import (  # noqa: F401
    read_documents_stream,
    run_stream_to_table,
    sem_filter_stream,
    sem_map_stream,
)
from semantic_olap_spark.streaming.spans import (  # noqa: F401
    compact_span_index,
    fold_span_batch,
    maintain_span_dedup,
    read_clean_output,
    read_span_index,
    replace_index_with_compacted,
)
from semantic_olap_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    session_agg,
    stream_dedup,
    stream_interval_join,
    windowed_agg,
)
