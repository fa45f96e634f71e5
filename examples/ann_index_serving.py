"""ANN index serving, production shape: fit + encode OFFLINE into an
on-disk artifact, probe online reading only the probed cells.

The pattern the r12 index module exists for (the FAISS serving split,
re-expressed as Spark storage layout): ``build_ivfpq_index`` writes the
PQ code table as parquet directory-partitioned by coarse cell plus a
fingerprinted models file; ``ivfpq_index_topk`` then serves a query
batch by scanning ONLY the probed cells' directories (partition
pruning — check the printed plan for ``PartitionFilters``), ADC-scoring
the codes against a broadcast per-query LUT, and exact-cosine
re-ranking the shortlist from the original corpus table. At 100 TB the
code table is ~corpus/256 and a probe reads nprobe/n_cells of it.

Run::

    python examples/ann_index_serving.py [sf_dir] [index_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faust_spark.catalog import load_table  # noqa: E402
from faust_spark.operators.similarity import (  # noqa: E402
    append_ann_index,
    build_ivfpq_index,
    ivfpq_index_topk,
    load_ann_index,
)
from faust_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir: str, index_dir: str):
    """Offline index build + one online query batch; returns
    (meta, top DataFrame) so the smoke test can assert the contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    # --- offline: one fit + encode per index build -----------------------
    # daily-ingest shape (r13): build once, then append_ann_index each new
    # batch (one pass over the BATCH, frozen quantizer), tombstone
    # takedowns with delete_from_ann_index, and compact_ann_index on a
    # cadence — here the last 10% arrives as an append so the example
    # exercises the maintenance path the artifact exists for
    meta = build_ivfpq_index(
        emb.filter(F.col("vec_id") % 10 != 3), index_dir,
        n_cells=16, m=4, ksub=16,
    )
    meta = append_ann_index(
        spark, index_dir, emb.filter(F.col("vec_id") % 10 == 3)
    )
    # --- online: per query batch = probe + pruned ADC + re-rank ----------
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top = ivfpq_index_topk(
        spark, index_dir, emb, queries,
        k=3, nprobe=4, shortlist=max(50, meta["n"] // 10),
    )
    return meta, top


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.mkdtemp(prefix="ann_index_"), "ivfpq")
    )
    spark = get_spark("ann-index-serving")
    meta, top = build(spark, sf_dir, index_dir)
    print(
        f"built ivfpq index at {index_dir}: n={meta['n']} dim={meta['dim']} "
        f"n_cells={meta['n_cells']} m={meta['m']} ksub={meta['ksub']}"
    )
    top.show(15, truncate=False)
    top.explain()  # the codes scan shows PartitionFilters on `cell`
    # staleness contract: the stored fingerprint detects regenerated data
    print("fingerprint:", load_ann_index(spark, index_dir)["fingerprint"])


if __name__ == "__main__":
    main()
