from semantic_olap_spark.plans.executor import (  # noqa: F401
    PRIORITY_MAP,
    PlanExecutor,
    run_filter,
)
from semantic_olap_spark.plans.memory import CubeMemory, CubeNode  # noqa: F401
