from simdgraphprocessing_spark.functions.reorder import (  # noqa: F401
    reorder_by_degree,
    reorder_by_rev_degree,
    reorder_strong_run,
    reorder_random,
    reorder_by_shingles,
    reorder_bfs,
    reorder_by_the_game,
)
