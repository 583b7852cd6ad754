"""Cluster job entrypoint — PageRank over a corpus-derived link graph.

Submit (multi-executor cluster):

    cd /root/repo && zip -r /tmp/sgp.zip simdgraphprocessing_spark
    spark-submit --py-files /tmp/sgp.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<2x total cores> \\
        scripts/run_pagerank.py \\
        --corpus /path/to/repos_table_parquet \\
        --checkpoint-dir /path/to/ckpt --iterations 20 --tol 1e-8

Local smoke:

    python scripts/run_pagerank.py --n-files 50000 --iterations 5

Resumable: re-running with the same --checkpoint-dir continues from
the last complete superstep (iteration.run_supersteps contract).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", help="parquet path of repos(repo,path,commit,lang,content)")
    p.add_argument("--n-files", type=int, default=0, help="synthesize a corpus of this size instead")
    p.add_argument("--edges", help="pre-extracted edge parquet (skips ETL)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--output", default=None, help="parquet path for final (id, rank)")
    args = p.parse_args()

    # Under spark-submit the session already exists; standalone we build one.
    spark = SparkSession.builder.appName("sgp-pagerank").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from simdgraphprocessing_spark import corpus as corpus_mod
    from simdgraphprocessing_spark.algorithms import pagerank
    from simdgraphprocessing_spark.graph import Graph

    if args.edges:
        edges = spark.read.parquet(args.edges)
    else:
        if args.corpus:
            repos = spark.read.parquet(args.corpus)
        elif args.n_files:
            repos = corpus_mod.make_corpus(spark, n_files=args.n_files, seed=42)
        else:
            p.error("one of --corpus / --n-files / --edges required")
        raw = corpus_mod.extract_edges(repos)
        assert corpus_mod.verify_content_sha(raw, repos) == 0, "sha256 row invariant violated"
        edges = Graph.from_edge_list_degree_ordered(raw).edges

    res = pagerank(
        edges,
        max_iterations=args.iterations,
        tol=args.tol,
        checkpoint_dir=args.checkpoint_dir,
    )
    if args.output:
        res.state.write.mode("overwrite").parquet(args.output)
    top = res.state.orderBy("rank", ascending=False).limit(5).collect()
    print(
        json.dumps(
            {
                "iterations": res.iterations,
                "resumed_from": res.resumed_from,
                "last_metrics": res.metrics[-1] if res.metrics else None,
                "top5": [(r["id"], r["rank"]) for r in top],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
