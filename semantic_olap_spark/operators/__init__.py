from semantic_olap_spark.operators.deterministic import (  # noqa: F401
    count_op,
    keyword_filter,
    keyword_filter_cond,
    num_filter,
    num_filter_cond,
    num_reduce,
    num_topk,
)
from semantic_olap_spark.operators.logic import (  # noqa: F401
    compile_logic,
    normalize_logic,
)
