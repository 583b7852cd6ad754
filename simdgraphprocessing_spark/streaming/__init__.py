from simdgraphprocessing_spark.streaming.edges import (  # noqa: F401
    materialize_stream,
    read_edge_stream,
    windowed_degree_counts,
    streaming_triangle_candidates,
    running_degree,
)
