"""End-to-end training-corpus preparation pipeline.

The composition a data-curation team actually runs, built from the
operator layer (each stage is individually oracle-checked by the gate):

    quality filter -> boilerplate filter -> exact dedup -> duplicated-
    span gate (ExactSubstr) -> incremental near-dup vs existing corpus
    -> perplexity tiers (CCNet: drop the tail) -> exact-mixture
    stratified sample -> leakage-proof split -> training-order shuffle
    -> context-window chunking -> tokenizer (vocab build + apply)

Run::

    python examples/corpus_prep.py [sf_dir]

Every stage is declarative DataFrame ops — filters push into the scan,
dedup joins are shingle-bucketed (never all-pairs), the split is a pure
hash function (no doc can migrate between train and test across reruns),
and the shuffle is per-shard parallel sorts (no global ORDER BY). The
same plan that runs here on fixture parquet runs unchanged on a
1000-executor cluster over 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from faust_spark.catalog import load_table
from faust_spark.operators.dedup import exact_dedup, incremental_dedup
from faust_spark.operators.sampling import (
    assign_splits,
    shuffle_shards,
    stratified_sample,
)
from faust_spark.operators.text import (
    boilerplate_chunks,
    chunk_tokens,
    quality_score,
)
from faust_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep")
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate: cheap column math, pushes into the scan.
    #    quality_score projects scores only, so semi-join the ids back
    #    (fresh scan lineage to keep the self-join unambiguous)
    good = quality_score(docs).filter(F.col("quality_ok") == 1).select(
        "doc_id"
    )
    kept = (
        load_table(spark, sf_dir, "documents")
        .join(good, "doc_id", "left_semi")
        .select("doc_id", "text", "lang")
    )
    print(f"quality gate: {docs.count()} -> {kept.count()}")

    # 1b. boilerplate gate: drop docs that are mostly chunks shared
    #     with other docs (headers/footers/licence blocks); only chunk
    #     digests shuffle
    bp = boilerplate_chunks(kept, size=3)
    clean = kept.join(
        bp.filter(F.col("n_shared") * 2 < F.col("n_chunks")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"boilerplate:  -> {clean.count()}")
    kept = clean

    # 2. exact dedup within the batch (hash-groupBy; text never shuffles
    #    — only the md5 does); keep the keeper rows
    keepers = exact_dedup(kept).select(F.col("keeper_id").alias("doc_id"))
    uniq = kept.join(keepers, "doc_id", "left_semi")
    print(f"exact dedup:  -> {uniq.count()}")

    # 2b. duplicated-span gate (ExactSubstr, Lee et al. 2022): drop docs
    #     where more than half the sampled windows are verbatim-shared
    #     with another doc — catches mirrored spans exact dedup misses.
    #     Only (hash, id) digests shuffle.
    from faust_spark.operators.dedup import substring_dup_spans

    spans = substring_dup_spans(uniq, window=40, stride=10)
    uniq = uniq.join(
        spans.filter(F.col("dup_ratio") <= 0.5).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"span gate:    -> {uniq.count()}")

    # 3. incremental near-dup: drop docs already in the "existing corpus"
    #    (here: the odd-id half plays the corpus)
    new = uniq.filter(F.col("doc_id") % 2 == 0)
    corpus = uniq.filter(F.col("doc_id") % 2 != 0)
    admitted = incremental_dedup(new, corpus, threshold=0.5)
    print(f"incremental:  {new.count()} new -> {admitted.count()} admitted")

    # 3a. CCNet fluency tiers: score every doc against the corpus
    #     unigram LM, drop the worst third — no global sort (banded
    #     cumulative histogram)
    from faust_spark.operators.text import perplexity_buckets

    tiers = perplexity_buckets(admitted.select("doc_id", "text"))
    admitted = admitted.join(
        tiers.filter(F.col("tier") != "tail").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"ppl tiers:    -> {admitted.count()} (head+middle kept)")

    # 3b. exact-mixture control: exactly ceil(0.9 * n_lang) docs per
    #     language (hash-ranked, one shuffle) — binomial-free mixture
    admitted = stratified_sample(admitted, "lang", "doc_id", 0.9)
    print(f"mixture:      -> {admitted.count()}")

    # 4. leakage-proof split: split = f(md5(doc_id)), stable forever
    split = assign_splits(
        admitted, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 5. reproducible training order for the train split
    train = shuffle_shards(
        split.filter(F.col("split") == "train"), "doc_id", n_shards=8
    )

    # 6. context-window chunking (overlapping 20-token windows)
    chunks = chunk_tokens(train, size=20, stride=15)
    print(
        "train chunks:",
        chunks.count(),
        "from",
        train.count(),
        "docs across 8 shards",
    )

    # 7. tokenizer: corpus-derived vocab (freq-banded deterministic
    #    ids), then broadcast-apply -> per-doc token-id arrays
    from faust_spark.operators.text import build_vocab, tokenize_with_vocab

    vocab = build_vocab(train, min_freq=2)
    ids = tokenize_with_vocab(train, vocab)
    stats = ids.agg(
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_oov").alias("oov"),
    ).collect()[0]
    print(
        f"tokenized:    {stats['tokens']} tokens "
        f"({stats['oov']} OOV) over a {vocab.count()}-term vocab"
    )
    spark.stop()


if __name__ == "__main__":
    main()
