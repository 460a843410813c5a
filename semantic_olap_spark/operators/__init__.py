from semantic_olap_spark.operators.deterministic import (  # noqa: F401
    count_op,
    keyword_filter,
    keyword_filter_cond,
    num_filter,
    num_filter_cond,
    num_reduce,
    num_topk,
    topk_per_group,
)
from semantic_olap_spark.operators.logic import (  # noqa: F401
    compile_logic,
    logic_leaves,
    normalize_logic,
)
from semantic_olap_spark.operators.relational import (  # noqa: F401
    asof_join,
    range_join,
)
from semantic_olap_spark.operators.fuzzy import (  # noqa: F401
    fuzzy_join,
    fuzzy_pairs,
)
from semantic_olap_spark.operators.reshape import (  # noqa: F401
    cube_agg,
    grouping_sets_agg,
    pivot_agg,
    rollup_agg,
)
from semantic_olap_spark.operators.semantic import (  # noqa: F401
    filter_enum_llm,
    filter_pattern,
    fit_cluster_taxonomy,
    load_taxonomy,
    induce_taxonomy,
    sem_filter,
    sem_filter_cond,
    sem_dedup_pairs,
    sem_join,
    sem_join_cond,
    sem_group,
    sem_group_cluster,
    save_taxonomy,
    sem_group_cluster_apply,
    sem_group_sequential,
    sem_map,
    sem_reduce,
    sem_topk,
)
