from semantic_olap_spark.llm.client import (  # noqa: F401
    LLM,
    CachingLLM,
    StubLLM,
    default_llm_factory,
)
