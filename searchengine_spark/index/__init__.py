from searchengine_spark.index.build import (  # noqa: F401
    InvertedIndex,
    build_index,
    read_index,
    write_index,
)
