from simdgraphprocessing_spark.sources.edgelist import (  # noqa: F401
    read_edge_list_text,
    read_edge_list_parquet,
    write_adjacency_parquet,
)
from simdgraphprocessing_spark.sources.binary import (  # noqa: F401
    read_binary_adjacency,
)
from simdgraphprocessing_spark.sources.testdata_graphs import (  # noqa: F401
    parts_cooccurrence_edges,
    sparse_parts_edges,
    supplier_copurchase_edges,
    follow_edges,
    follow_edges_attributed,
)
