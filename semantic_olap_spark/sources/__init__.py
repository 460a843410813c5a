from semantic_olap_spark.sources.loaders import (  # noqa: F401
    TABLES,
    load_json_flat,
    load_table,
    load_tables,
    with_olap_id,
)
