from searchengine_spark.plans.ast import (  # noqa: F401
    IopNode,
    SopNode,
    TermNode,
    optimize,
)
from searchengine_spark.plans.parser import parse_query  # noqa: F401
