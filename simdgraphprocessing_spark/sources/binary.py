"""Reader for the reference's length-prefixed binary adjacency
checkpoints (``MutableGraph.hpp:316-360`` ``undirectedFromBinary``,
``:658-716`` ``directedFromBinary``) — the format its own goldens
(``test/data/facebook.bin`` / ``dfacebook.bin``) ship in.

Layout (little-endian, size_t = 8 bytes):

* undirected: ``u64 num_nodes``; then per node ``u64 external_id``,
  ``u64 row_size``, ``u32[row_size]`` neighbor *internal indices*.
* directed: same, but each node carries TWO lists — out-neighbors then
  in-neighbors (``u64 col_size``, ``u32[col_size]``). The in-lists are
  the transpose of the out-lists, so we read only the out-lists.

Scale note: this format is sequential (length-prefixed, not
splittable) — it exists here ONLY to load the reference's test
fixtures for golden parity. At-scale checkpoints are parquet
(:func:`simdgraphprocessing_spark.sources.edgelist.write_adjacency_parquet`),
which is columnar, splittable, and predicate-pushdown-able. Parsing
happens once on the driver with numpy (the fixtures are ~1 MB); the
resulting edge table is a regular distributed DataFrame.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _parse_adjacency_binary(buf: bytes, directed: bool) -> tuple[np.ndarray, np.ndarray]:
    """→ (src, dst) int64 arrays in EXTERNAL ids, one row per stored
    (node, out-neighbor) pair."""
    off = 0
    num_nodes = int(np.frombuffer(buf, np.uint64, 1, off)[0])
    off += 8
    ext_ids = np.empty(num_nodes, dtype=np.int64)
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    for i in range(num_nodes):
        ext_ids[i] = int(np.frombuffer(buf, np.uint64, 1, off)[0])
        off += 8
        row_size = int(np.frombuffer(buf, np.uint64, 1, off)[0])
        off += 8
        row = np.frombuffer(buf, np.uint32, row_size, off)
        off += 4 * row_size
        srcs.append(np.full(row_size, i, dtype=np.int64))
        dsts.append(row.astype(np.int64))
        if directed:  # skip the redundant in-neighbor list
            col_size = int(np.frombuffer(buf, np.uint64, 1, off)[0])
            off += 8 + 4 * col_size
    if off != len(buf):
        raise ValueError(
            f"binary adjacency parse consumed {off} of {len(buf)} bytes — "
            "wrong format or directed flag"
        )
    src = ext_ids[np.concatenate(srcs)] if srcs else np.empty(0, np.int64)
    dst = ext_ids[np.concatenate(dsts)] if dsts else np.empty(0, np.int64)
    return src, dst


def read_binary_adjacency(
    spark: SparkSession, path: str, directed: bool = False
) -> DataFrame:
    """Load a reference ``.bin`` adjacency file → DataFrame(src, dst)
    in external ids. Undirected files already store both directions
    (``writeUndirectedToBinary`` writes the symmetrized rows), so the
    result is directly a canonical symmetric edge table; directed files
    yield the out-edge table."""
    import pandas as pd

    with open(path, "rb") as fh:
        buf = fh.read()
    src, dst = _parse_adjacency_binary(buf, directed)
    return spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
