from simdgraphprocessing_spark.operators.triangles import (  # noqa: F401
    triangle_count,
    triangles_from_adjacency,
    triangles_per_edge,
)
from simdgraphprocessing_spark.operators.neighbors import (  # noqa: F401
    common_neighbors,
    similar_nodes,
    symbiosity,
    jaccard_pairs,
)
from simdgraphprocessing_spark.operators.paths import bfs_levels, n_path_length  # noqa: F401
from simdgraphprocessing_spark.operators.cliques import clique_count  # noqa: F401
from simdgraphprocessing_spark.operators.stats import (  # noqa: F401
    degree_stats,
    degree_stats_full,
    max_degree_vertex,
)
from simdgraphprocessing_spark.operators.motifs import lollipop_count  # noqa: F401
