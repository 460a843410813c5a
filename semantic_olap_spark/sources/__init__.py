from semantic_olap_spark.sources.loaders import (  # noqa: F401
    TABLES,
    load_csv,
    load_json_flat,
    load_jsonl,
    load_table,
    load_tables,
    with_olap_id,
)
from semantic_olap_spark.sources.bucketing import (  # noqa: F401
    read_table,
    write_bucketed,
)
from semantic_olap_spark.sources.sinks import (  # noqa: F401
    compact,
    write_partitioned,
    write_shards,
    write_stream_parquet,
)
from semantic_olap_spark.sources.layout import (  # noqa: F401
    write_zordered,
    zorder_key,
)
