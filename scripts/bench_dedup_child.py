"""Child process for the scaling benchmark: run the full dedup pipeline
at a fixed parallelism over a pre-generated corpus parquet.

Usage: python scripts/bench_dedup_child.py <corpus_path> <cpus>
Prints one JSON line: {"wall": seconds, "files": n, "clusters": n}
(wall covers the pipeline only, not session startup — the quantity that
scales with executors on a real cluster).
"""

import json
import os
import sys
import time

try:  # normally provided by spark-submit --py-files
    import datasketches_rust_spark  # noqa: F401
except ImportError:  # plain-python fallback for local debugging
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datasketches_rust_spark.config import PipelineConfig
from datasketches_rust_spark.plans.pipeline import DedupPipeline
from datasketches_rust_spark.plans.session import get_spark


def main(corpus_path: str, cpus: int) -> None:
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
        app_name=f"bench-dedup-{cpus}",
        extra_conf={
            # size input splits so the scan parallelizes across all cores
            # even for a bench-sized corpus (on a 100TB table the defaults
            # already yield thousands of splits)
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
            # cache blocking: ~2-4MB of text per Arrow batch keeps the
            # signature kernel's arrays L2/L3-resident — 2x faster single
            # core and it stops saturating DRAM bandwidth across workers
            "spark.sql.execution.arrow.maxRecordsPerBatch": "384",
        },
    )
    corpus = spark.read.parquet(corpus_path)
    n_files = corpus.count()  # warm the input outside the timed window
    # spawn the Python worker pool before timing: a real long job amortizes
    # interpreter startup to nothing; at bench scale it would skew the ratio
    corpus.select("repo").mapInPandas(lambda it: it, "repo string").count()

    t0 = time.monotonic()
    pipe = DedupPipeline(spark, PipelineConfig())
    clusters = pipe.run(corpus)
    n_rows = clusters.count()
    wall = time.monotonic() - t0
    n_clusters = clusters.select("cluster_id").distinct().count()

    print(
        json.dumps(
            {"wall": wall, "files": n_files, "rows": n_rows, "clusters": n_clusters}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
