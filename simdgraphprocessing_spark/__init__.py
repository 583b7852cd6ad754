"""simdgraphprocessing_spark — a PySpark-native link-graph analytics engine.

Built from scratch with the query capabilities of the reference
chrisaberger/SIMDGraphProcessing (an EmptyHeaded-lineage single-node C++
SIMD set-intersection engine), re-expressed Spark-first:

* edge tables are DataFrames; adjacency is degree-ordered and
  orientation-filtered exactly as the reference does at load
  (``MutableGraph.hpp:517-599``, ``:268-285``);
* pattern queries (triangles, k-cliques, common-neighbors, Jaccard,
  motifs) are declarative DataFrame/SQL plans optimized by Catalyst,
  with an optional Arrow-vectorized CSR kernel path mirroring the
  reference's sorted-set intersections (``src/set/ops/intersection.hpp``);
* iterative algorithms (PageRank, connected components, label
  propagation, BFS) run on a superstep driver with per-superstep
  checkpoint/resume, generalizing the reference's frontier loop
  (``apps/n_path.cpp:58-83``).

All code here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

from simdgraphprocessing_spark.session import get_spark  # noqa: F401
from simdgraphprocessing_spark.graph import Graph  # noqa: F401

__version__ = "0.1.0"
