from semantic_olap_spark.plans.executor import (  # noqa: F401
    PRIORITY_MAP,
    PlanExecutor,
    run_filter,
)
from semantic_olap_spark.plans.memory import (  # noqa: F401
    CubeMemory,
    CubeNode,
    GranularityView,
    llm_relation_classifier,
)
from semantic_olap_spark.plans.planner import (  # noqa: F401
    dice_plan,
    flatten_plan,
    plan_nl_filter,
    run_nl_filter,
    slice_plan,
    topk_dispatch,
    understand_topk,
)
from semantic_olap_spark.plans.rollup import drill_down, roll_up  # noqa: F401
