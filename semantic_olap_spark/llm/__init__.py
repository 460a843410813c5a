from semantic_olap_spark.llm.client import (  # noqa: F401
    LLM,
    BudgetLLM,
    CachingLLM,
    ConcurrentLLM,
    CountingLLM,
    LLMBudgetExceeded,
    LLMCostStats,
    StubLLM,
    default_llm_factory,
    wrap_cost_tracking,
)
from semantic_olap_spark.llm.http_client import (  # noqa: F401
    HttpLLM,
    LLMTransportError,
    TokenBucket,
    http_llm_factory,
)
