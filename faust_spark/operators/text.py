"""Text analysis operators for document tables.

Everything is built from JVM-side ``pyspark.sql.functions`` — no Python in
the hot path — so the whole stage stays inside whole-stage codegen and
scales linearly with a parquet scan. Token model: the fixture corpus is
single-space separated; ``tokenize`` splits on a literal space so the
DuckDB oracle (``string_split(text, ' ')``) agrees byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from faust_spark.operators.mat import local_rows, materialize

# Tiny per-language marker lists for the n-gram/stopword language-ID
# heuristic. Real corpora would load larger lists; the mechanism (score =
# marker hits / tokens, argmax with deterministic tie-break) is what scales.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
    "zh": ("de5", "shi4", "le5"),  # pinyin-ish placeholders
}

STOPWORDS = LANG_MARKERS["en"]


def _qcol(name: str) -> str:
    """Backtick-quote a column name for interpolation into ``F.expr``
    SQL text. Without this a name containing a space, dash, dot, or a
    SQL keyword parses as arbitrary SQL rather than a column reference
    (the usual SQL-identifier-injection footgun)."""
    return "`" + name.replace("`", "``") + "`"


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate.

    ``n_subwords`` approximates BPE token count as ceil(chars/4) per word
    summed — the standard rough heuristic — entirely in codegen.
    """
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_calc"),
        F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("bigint"),
        ).alias("n_subwords"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality scoring: length / punctuation / stopword ratios + a flag.

    Mirrors the C4/Gopher-style filters (length bounds, symbol ratio,
    stopword presence) as pure column expressions.
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(*STOPWORDS))
    )
    # null/empty text yields null ratios and quality_ok=0 — real corpora
    # contain both, and a divide-by-zero here would kill the whole stage
    mean_word_len = (n_chars - (n_tokens - 1)).cast("double") / F.nullif(
        n_tokens, F.lit(0)
    )
    stop_ratio = stop_hits.cast("double") / F.nullif(n_tokens, F.lit(0))
    alpha_ratio = n_alpha.cast("double") / F.nullif(n_chars, F.lit(0))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        F.coalesce(
            (
                (n_tokens >= 10)
                & (mean_word_len >= 2.0)
                & (mean_word_len <= 12.0)
                & (stop_ratio >= 0.01)
            ).cast("int"),
            F.lit(0),
        ).alias("quality_ok"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: per-language marker-hit counts, argmax with
    alphabetical tie-break. Deterministic and fully vectorized (a struct
    ``greatest``-style reduction, no UDF)."""
    toks = F.split(F.col(text_col), " ")

    def _hits(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda w: w.isin(*markers)))

    scores = [
        _hits(markers).alias(lang)
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("__has_text"),
        *scores,
    )
    # argmax via greatest over (score, reversed-lang) structs: ties resolve
    # to the alphabetically-first language.
    langs = sorted(LANG_MARKERS)
    pairs = [
        F.struct(
            F.col(lang).alias("s"),
            # invert lang so that struct-max picks alphabetically-first on tie
            F.lit(-i).alias("o"),
            F.lit(lang).alias("l"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    # null text → null prediction (not a spurious tie-break winner)
    has_text = F.col("__has_text")
    return scored.select(
        F.col(id_col),
        F.when(has_text, best["l"]).alias("pred_lang"),
        F.when(has_text, best["s"]).alias("marker_hits"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprint: md5 over the normalized text (lowercased,
    whitespace-collapsed) — the cheap content-identity key used upstream
    of exact dedup and CDC-style diffing."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp"),
        F.length(norm).alias("norm_chars"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters: top-word fraction, duplicate-word
    fraction, duplicate-bigram fraction per document.

    Scale path: explode to (doc, term) cells and aggregate twice — Spark's
    partial (map-side) aggregation makes each pass one linear shuffle keyed
    by (doc, term), so cost is O(corpus tokens) regardless of document
    length.  The alternative (per-row higher-order functions counting each
    distinct word's occurrences) is O(len * distinct) per document — fine
    for short docs, quadratic for long ones; this form survives 100 TB.

    Reference anchor: quality-filter stage of LLM data pipelines (Gopher
    /C4 repetition rules); same table contract as ``quality_score``.
    """
    words = F.split(F.col(text_col), " ")
    toks = df.select(F.col(id_col), F.explode(words).alias("w"))
    wstats = (
        toks.groupBy(id_col, "w")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.max("count").alias("top_cnt"),
        )
    )
    # non-distinct bigrams: zip the token array with its own tail — O(len)
    # per doc (an index+slice build would copy O(len) per position);
    # slice handles short docs (empty zip → no rows)
    tail = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    head = F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0)))
    bg = df.select(
        F.col(id_col),
        F.explode(
            F.zip_with(head, tail, lambda a, b: F.concat_ws(" ", a, b))
        ).alias("b"),
    )
    bstats = (
        bg.groupBy(id_col, "b")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
        )
    )
    return (
        wstats.join(bstats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias(
                "top_word_frac"
            ),
            (
                (F.col("n_tokens") - F.col("n_distinct_words")).cast("double")
                / F.col("n_tokens")
            ).alias("dup_word_frac"),
            F.coalesce(
                (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast(
                    "double"
                )
                / F.col("n_bigrams"),
                F.lit(0.0),
            ).alias("dup_bigram_frac"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word ``n``-grams appear anywhere in the benchmark set.

    The standard contamination check run before training (n-gram overlap
    against eval sets).  Plan shape: benchmark n-grams are deduplicated and
    broadcast (eval sets are small relative to the corpus), so the corpus
    is scanned once with a broadcast semi-side join — no corpus shuffle.

    Returns (id, n_shingles, n_hits); callers threshold
    ``n_hits / n_shingles`` to drop contaminated documents.
    """
    from faust_spark.operators.dedup import shingles

    d_sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    b_sh = (
        shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    # r13 (guide §2.4): ONE corpus shingle pass — the previous shape
    # computed d_sh twice (hit counts and totals, two exploded subtrees
    # with no shared exchange) and joined the two aggregates; a LEFT
    # broadcast join + non-null count folds both into a single explode
    # + single agg with identical rows (b_sh is distinct, so the left
    # join never multiplies; count(__hit) counts exactly the matches).
    return (
        d_sh.join(
            F.broadcast(b_sh.withColumn("__hit", F.lit(1))),
            "shingle",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_hits"),
        )
    )


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain corpus composition: document counts, language spread,
    size totals.  The first report run over any crawl — one partial-agg
    shuffle keyed by domain."""
    return df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        (
            F.sum("n_chars").cast("double") / F.count(F.lit(1))
        ).alias("avg_chars"),
    )


def chunk_tokens(
    df: DataFrame,
    size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window chunking: split each document into overlapping chunks
    of ``size`` whitespace tokens every ``stride`` tokens — the
    context-window prep step before tokenization proper (stride < size
    gives overlap so no boundary context is lost).

    One row in, ceil(n_tokens/stride) rows out, entirely in codegen:
    ``sequence`` builds the start offsets, ``explode`` fans out,
    ``slice`` cuts the window — no UDF, no shuffle; the expansion
    happens after any pushed-down filters, so at 100 TB you chunk only
    the documents that survive filtering. Emits (id, start, n_tokens,
    chunk_hash) with the md5 of the re-joined window so chunk CONTENT
    (not just counts) is verifiable.
    """
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be >= 1")
    ws = F.split(F.col(text_col), r"\s+")
    # guard the empty doc: sequence(1, 0) counts DOWN in Spark
    starts = F.when(
        F.size(ws) >= 1, F.sequence(F.lit(1), F.size(ws), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    out = df.select(
        F.col(id_col), ws.alias("__ws"), F.explode(starts).alias("start")
    )
    window = F.slice(F.col("__ws"), F.col("start"), size)
    return out.select(
        id_col,
        "start",
        F.size(window).alias("n_tokens"),
        F.md5(F.concat_ws(" ", window)).alias("chunk_hash"),
    )


def build_vocab(
    df: DataFrame,
    min_freq: int = 2,
    text_col: str = "text",
    max_vocab: int = 262_144,
) -> DataFrame:
    """Frequency-cutoff vocabulary with deterministic token ids — the
    tokenizer-prep step before training.

    One partial-agg shuffle keyed by term produces corpus frequencies;
    terms below ``min_freq`` drop; ids assign by (freq DESC, term) rank
    so the same corpus always yields the same vocab on any engine or
    partitioning.

    Scale guard: ``min_freq`` alone does NOT bound the vocabulary — a
    100 TB corpus has billions of terms above any small absolute cutoff,
    and the id-assign rank would become an unbounded single-partition
    window.  ``max_vocab`` makes the bound explicit (the standard
    tokenizer contract: keep the top-N terms).  The cap is applied
    BEFORE the rank window using only model-sized state:

    1. a (freq → n_terms) histogram — distinct frequency values are
       O(√total_tokens) by Zipf's law, driver-safe metadata like a
       k-means model — locates the cutoff frequency ``f*`` and how many
       tie terms to keep at ``f*``;
    2. terms with freq > f* pass; the freq == f* band is trimmed to the
       remaining quota by ``sort(term).limit(k)``, which Spark executes
       as a distributed TakeOrderedAndProject, not a global sort.

    The final rank window therefore sees at most ``max_vocab`` rows —
    provably model-sized at any corpus scale — and is PARTITIONED by
    frequency band: the histogram already tells us how many terms
    precede each band in (freq DESC, term) order, so ids assign as
    ``band_offset + rank-within-band(term)``, a per-freq window plus a
    broadcast join of the model-sized (freq, offset) table instead of
    one global single-partition window.
    """
    # The candidate set feeds TWO consumers — the histogram job below
    # and the returned plan (whose broadcast build re-executes lineage
    # in callers like tokenize_with_vocab) — so persist it: the corpus
    # token aggregation runs once, not once per consumer.  Size is the
    # distinct above-cutoff terms (vocab-candidate-sized, spills to disk
    # if a 100 TB corpus's tail makes it large).
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    # localCheckpoint (not persist): same one-computation guarantee, but
    # the materialized blocks are released by the context cleaner when
    # the DataFrame is garbage-collected — an explicit persist would pin
    # them in the cache manager forever unless some caller remembered to
    # unpersist, which leaks across repeated vocab builds in a
    # long-lived session.  (Checkpoint blocks use a disk-backed level,
    # so a 100 TB corpus tail spills instead of evicting.)  LAZY: the
    # histogram collect right below is the first action and materializes
    # the blocks itself — eager=True was one whole extra pass-shaped job
    # per vocab consumer (r14, guide §1.2).
    counts = materialize(counts)
    # model-sized frequency histogram → cutoff frequency + tie quota
    hist = sorted(
        (
            (r["freq"], r["n"])
            for r in counts.groupBy("freq")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ),
        key=lambda t: -t[0],
    )
    kept = 0
    f_star, quota = None, 0
    offsets: list[tuple[int, int]] = []  # (freq, #terms before the band)
    for freq, n in hist:
        if kept + n > max_vocab:
            f_star, quota = freq, max_vocab - kept
            offsets.append((freq, kept))
            break
        offsets.append((freq, kept))
        kept += n
    if f_star is not None:
        head = counts.filter(F.col("freq") > f_star)
        tie = (
            counts.filter(F.col("freq") == f_star)
            .sort("term")
            .limit(quota)
        )
        counts = head.unionByName(tie)
    if not offsets:
        return counts.select(
            "term", "freq", F.lit(0).cast("int").alias("token_id")
        ).limit(0)
    spark = df.sparkSession
    # local_rows (guide §4): LocalTableScan, no Python re-eval per action
    off = F.broadcast(
        local_rows(spark, offsets, "freq bigint, __off bigint")
    )
    w = W.partitionBy("freq").orderBy("term")
    return (
        counts.join(off, "freq")
        .select(
            "term",
            "freq",
            (F.col("__off") + F.row_number().over(w) - 1)
            .cast("int")
            .alias("token_id"),
        )
    )


def boilerplate_chunks(
    df: DataFrame,
    size: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-chunk (boilerplate) profile per document.

    The CCNet/RefinedWeb line-dedup idea generalized to token windows:
    split every document into NON-overlapping ``size``-token chunks,
    hash each, and count — per document — how many of its chunks also
    appear in at least one other document.  Headers, footers, cookie
    banners, and licence blocks surface as high ``shared_frac``;
    downstream filters drop those chunks (or whole documents) before
    training.

    Scale shape: one explode to (doc, chunk_hash) cells, then the
    cross-doc count and the per-doc rollup share ONE hash(chunk_hash)
    exchange (``repartition`` before both aggs); only 32-byte digests
    shuffle — never text.  Chunk hashing reuses :func:`chunk_tokens`
    (stride = size → non-overlapping).

    Returns (id, n_chunks, n_shared) — integers, so the result is
    exactly comparable across engines.
    """
    ch = chunk_tokens(
        df, size=size, stride=size, text_col=text_col, id_col=id_col
    ).repartition("chunk_hash")
    counts = ch.groupBy("chunk_hash").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    return (
        ch.join(counts, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("n_docs") >= 2).cast("bigint")).alias("n_shared"),
        )
    )


def tokenize_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ids_as_string: bool = False,
) -> DataFrame:
    """Apply a built vocabulary to documents → ordered token-id arrays —
    the "tokenizer apply" step that turns a cleaned corpus into model
    input (the consumer of :func:`build_vocab`).

    ``vocab`` is ``(term, token_id)`` (extra columns ignored).  The
    vocabulary is model-sized by construction, so the term lookup is a
    **broadcast** hash join against the exploded token stream — the corpus
    is never shuffled by term.  The only exchange is the ``groupBy(id)``
    that reassembles per-document arrays, keyed by the id the documents
    already carry.  Out-of-vocabulary terms are counted (``n_oov``) and
    dropped from the id sequence, the usual min-frequency-tokenizer
    behavior.

    ``ids_as_string=True`` emits ``token_ids`` as the space-joined
    canonical string instead of ``array<int>`` — for comparison harnesses
    whose canonicalizers can't sort list-valued cells (same information,
    scalar-typed).

    Reference parity: faust expresses this as a per-event agent with a
    table lookup per token (faust/agents/agent.py processing loop); here
    the lookup is one joined columnar pass.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("term", "token_id")), "term", "left"
    )
    out = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("bigint")).alias("n_oov"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("token_id").isNotNull(),
                        F.struct(F.col("pos"), F.col("token_id")),
                    )
                )
            ),
            lambda s: s["token_id"],
        ).alias("token_ids"),
    )
    if ids_as_string:
        out = out.withColumn(
            "token_ids",
            F.array_join(
                F.transform("token_ids", lambda x: x.cast("string")), " "
            ),
        )
    return out


def remove_boilerplate(
    df: DataFrame,
    size: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate REMOVAL: strip repeated chunks and
    return per-document cleaned-content evidence.

    :func:`boilerplate_chunks` only *profiles* shared chunks; this is the
    cleaning transform a prep pipeline actually runs — CCNet/RefinedWeb
    line-dedup generalized to non-overlapping ``size``-token chunks.  A
    chunk is boilerplate when it appears in ``>= min_docs`` distinct
    documents; surviving chunks are reassembled in order.

    Scale shape: the boilerplate-hash set is built from a digest-only
    aggregation (only 32-byte hashes shuffle); chunks are then marked by
    a LEFT equi-join on the digest that AQE converts to a broadcast join
    whenever the boilerplate set is small (its usual shape —
    headers/footers/banners ≪ corpus), and marked + unmarked rows ride
    ONE ``groupBy(id)`` that computes totals, kept counts, and the
    surviving-content hash together — two corpus chunk passes total,
    never three.  That exchange's payload is exactly the surviving text —
    the same bytes any reshard of the cleaned corpus would move.

    Returns ``(id, n_chunks, n_kept, clean_hash)`` where ``clean_hash`` =
    md5 of the space-joined surviving chunks ('' → md5 of empty string
    when everything was boilerplate) so full reconstructed CONTENT — not
    just counts — is verifiable against the oracle.
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    ws = F.split(F.col(text_col), " ")
    starts = F.when(
        F.size(ws) >= 1, F.sequence(F.lit(1), F.size(ws), F.lit(size))
    ).otherwise(F.array().cast("array<int>"))
    ch = (
        df.select(F.col(id_col), ws.alias("__ws"), F.explode(starts).alias("start"))
        .select(
            id_col,
            "start",
            F.concat_ws(" ", F.slice(F.col("__ws"), F.col("start"), size)).alias(
                "chunk"
            ),
        )
        .withColumn("h", F.md5(F.col("chunk")))
    )
    boiler = (
        ch.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
        .withColumn("__b", F.lit(1))
    )
    # r13 (guide §2.4): TWO corpus chunk passes, not three — the old
    # shape read ch for the boiler agg, the anti-join left side, AND a
    # separate totals agg (the chunk explode carries full text, so each
    # extra consumer is a full corpus pass). boiler is distinct on h,
    # so a LEFT join marks boilerplate without multiplying rows, and
    # totals + per_doc fold into ONE groupBy(id) with conditional
    # aggregates: n_kept counts unmarked rows, clean_hash hashes only
    # unmarked chunks (collect_list skips the NULL structs), and the
    # all-boilerplate edge lands on md5('') exactly as the old outer
    # join's coalesce did.
    flagged = ch.join(boiler, "h", "left")
    kept_struct = F.when(
        F.col("__b").isNull(), F.struct(F.col("start"), F.col("chunk"))
    )
    n_kept = F.count(F.when(F.col("__b").isNull(), F.lit(1)))
    empty_hash = F.md5(F.lit(""))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        n_kept.alias("n_kept"),
        F.coalesce(
            F.when(
                n_kept > 0,
                F.md5(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s["chunk"],
                        ),
                    )
                ),
            ),
            empty_hash,
        ).alias("clean_hash"),
    )


def zipf_stats(
    df: DataFrame,
    min_freq: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope and
    intercept of ``ln(freq) ~ ln(rank)`` — the canonical one-number
    health check of a text corpus (natural language ≈ -1; templated or
    synthetic spam drifts far off).

    Determinism across engines: double sums are partition-order
    dependent, so each regression term is rounded to 9 decimals and
    accumulated as an exact ``decimal(28,9)``; the closed-form OLS
    ratio is then evaluated once on exact operands cast to double.
    Same corpus → bit-identical slope on any engine or partitioning.

    Scale shape: corpus frequencies are one partial-agg shuffle
    (:func:`build_vocab`); the regression runs over the model-sized
    vocabulary, and the decimal sums reduce it to a single row.
    """
    v = build_vocab(df, min_freq=min_freq, text_col=text_col)
    x = F.round(F.ln(F.col("token_id") + F.lit(1.0)), 9)
    y = F.round(F.ln(F.col("freq").cast("double")), 9)
    d = "decimal(28,9)"
    terms = v.select(
        x.cast(d).alias("x"),
        y.cast(d).alias("y"),
        F.round(x * y, 9).cast(d).alias("xy"),
        F.round(x * x, 9).cast(d).alias("xx"),
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    # The sums are exact decimals (identical on every engine); convert each
    # ONCE to double and evaluate the closed form in pure IEEE arithmetic —
    # decimal multiplication would hit engine-specific precision-loss rules.
    nd = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    intercept = (sy - slope * sx) / nd
    return s.select(
        F.col("n_terms"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def classifier_score(
    df: DataFrame,
    weights: dict[str, float],
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality filter APPLY — the fastText-classifier-at-scale
    step (CCNet/LLaMA-style: a tiny trained model scores every document;
    the corpus keeps the positive class).

    The model is driver-sized (a handful of floats), so the weights bake
    into ONE codegen expression as literals: the apply costs exactly one
    corpus scan — no UDF, no shuffle, no model serving.  Features are the
    engineered text ratios (ln-token-count, mean word length, stopword
    ratio, alpha ratio); ``weights`` maps feature name → coefficient.

    Determinism: the only transcendental (ln) is rounded to 9 decimals
    at the source; everything else is rational arithmetic on exact
    integer counts, and the dot product accumulates in declaration order
    — bit-identical logits on any engine or partitioning.

    Returns (id, logit, keep); emitting the score (not just the flag)
    keeps the filter auditable and re-thresholdable downstream.
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    feats = {
        "ln_tokens": F.round(F.log(F.lit(1.0) + n_tokens), 9),
        "mean_word_len": (n_chars - (n_tokens - 1)).cast("double")
        / F.nullif(n_tokens, F.lit(0)),
        "stop_ratio": stop_hits.cast("double") / F.nullif(n_tokens, F.lit(0)),
        "alpha_ratio": n_alpha.cast("double") / F.nullif(n_chars, F.lit(0)),
    }
    unknown = set(weights) - set(feats)
    if unknown:
        raise ValueError(f"unknown features: {sorted(unknown)}")
    logit = F.lit(float(bias))
    for name, w in weights.items():
        logit = logit + F.lit(float(w)) * feats[name]
    return df.select(
        F.col(id_col),
        logit.alias("logit"),
        F.coalesce(logit > 0, F.lit(False)).alias("keep"),
    )


# PII surface patterns (email / North-American phone / IPv4).  Kept to
# the regex subset Java and RE2 evaluate identically (no lookarounds, no
# backreferences) so the DuckDB oracle states the same patterns verbatim.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII detection + redaction — the privacy-scrub pass every
    training-data pipeline runs before release (C4/FineWeb style).

    Pure codegen: per pattern, ``regexp_extract_all`` counts matches and
    ``regexp_replace`` masks them with a typed placeholder; the chained
    replaces apply in PII_PATTERNS order (email first, so phone/IP
    patterns never see address-local digits).  One corpus scan, no UDF,
    no shuffle — the redacted text streams straight to the cleaned-corpus
    writer.  Returns (id, n_email, n_phone, n_ipv4, text_redacted).

    Reference parity: faust would express this as a per-event agent
    processor (faust/agents/agent.py); here it is a narrow map fused
    into the scan.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, rx, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, rx, mask in PII_PATTERNS:
        red = F.regexp_replace(red, rx, mask)
    return df.select(F.col(id_col), *counts, red.alias("text_redacted"))


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram-LM perplexity scoring: fit a unigram language model on the
    corpus itself and score every document by mean negative log-likelihood
    — the classic cheap fluency/quality signal (KenLM-style filtering's
    first rung: word-salad and boilerplate score high-NLL against an
    in-domain LM).

    Scale shape: the LM is (term, freq) — one term-keyed partial-agg
    shuffle builds it; scoring joins the exploded token stream back to it
    (posting-list-shaped equi-join; term keys shuffle, text never does)
    and one id-keyed agg reassembles per-document scores.

    Determinism: each distinct term's NLL ``-ln(freq/total)`` is computed
    once and rounded to 9 decimals at the source, then summed EXACTLY as
    decimals (order-independent) — the zipf_stats/classifier_score
    pattern — so engines agree bit-for-bit; the final mean is one double
    division of identical operands.

    Returns (id, n_tokens, avg_nll).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    lm = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    total = lm.agg(F.sum("freq").alias("total"))
    nll = (
        lm.crossJoin(F.broadcast(total))
        .select(
            "term",
            F.round(
                -F.log(F.col("freq").cast("double") / F.col("total")), 9
            )
            .cast("decimal(28,9)")
            .alias("nll"),
        )
    )
    return (
        toks.join(nll, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("nll").alias("__nll_sum"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            (
                F.col("__nll_sum").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("avg_nll"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated bigram-LM scoring — the next rung after
    :func:`unigram_logprob` (Jelinek-Mercer smoothing, the standard
    n-gram construction):

        p(w | v) = lam * c(v,w)/c(v,·)  +  (1 - lam) * c(w)/T

    Each document scores the mean NLL of its bigram transitions; word
    salad that passes unigram filtering (right words, wrong order)
    scores high here.

    Scale shape: the bigram LM is (v, w, count) — one (v,w)-keyed
    partial-agg shuffle; context totals derive from it by a v-keyed
    re-agg (no second corpus pass); scoring joins the exploded bigram
    stream back on (v, w) — posting-list-shaped, text never shuffles.
    Determinism: per distinct (v, w) the NLL double is one fixed
    operand-order expression of integer counts, rounded to 9 decimals
    at source and summed exactly as decimals (the unigram_logprob
    pattern), so engines agree bit-for-bit.

    Returns (id, n_bigrams, avg_nll); single-token docs have 0 bigrams
    and NULL avg_nll.
    """
    ws = F.split(F.col(text_col), " ")
    qt = _qcol(text_col)
    pairs = F.when(
        F.size(ws) >= 2,
        F.expr(
            f"transform(sequence(2, size(split({qt}, ' '))), i ->"
            f" named_struct("
            f"  'v', element_at(split({qt}, ' '), i - 1),"
            f"  'w', element_at(split({qt}, ' '), i)))"
        ),
    )
    big = df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.v", "p.w"
    )
    # r13 NOTE (guide §1.1 empirical loop): a per-(doc, v, w) count
    # relation materialized once (the dsir_logratio shape) was built
    # and REJECTED here — interleaved same-session A/B at sf0.1 showed
    # 1.04× (and 1.16× for the KN variant): the "duplicate" subtrees
    # below already share their exchanges (ReuseExchange), the (v,w)
    # partial agg pre-combines map-side, while the (doc,v,w) relation
    # barely pre-combines and pays a checkpoint barrier. Kept as-is.
    bg = big.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw"))
    ctx = bg.groupBy("v").agg(F.sum("cvw").alias("cv"))
    toks = df.select(F.explode(ws).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = uni.agg(F.sum("cw").alias("t"))
    nll = (
        bg.join(ctx, "v")
        .join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "w",
            F.round(
                -F.log(
                    F.lit(lam)
                    * (F.col("cvw").cast("double") / F.col("cv"))
                    + F.lit(1.0 - lam)
                    * (F.col("cw").cast("double") / F.col("t"))
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("nll"),
        )
    )
    per = (
        big.join(nll, ["v", "w"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll").alias("__s"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (
                F.col("__s").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("avg_nll"),
        )
    )


def kn_bigram_logprob(
    df: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the KenLM/CCNet-standard
    smoothing (Kneser & Ney 1995; Chen & Goodman 1998), completing the
    LM-tier ladder above :func:`bigram_logprob`'s Jelinek-Mercer:

        p(w | v) = max(c(v,w) - D, 0) / c(v)
                 + D * N1+(v,·)/c(v) * N1+(·,w)/N1+(·,·)

    Absolute discounting frees mass proportional to the context's
    DISTINCT continuation count, and the unigram backoff is the
    continuation probability (in how many contexts does ``w`` appear),
    not raw frequency — the correction that scores "San Francisco"
    boilerplate correctly where JM overweights bare "Francisco".

    Scale shape: everything derives from the (v, w, count) bigram
    relation — c(v) and N1+(v,·) by one v-keyed re-agg, N1+(·,w) by one
    w-keyed re-agg, N1+(·,·) as a one-row broadcast — no second corpus
    pass; scoring joins the exploded bigram stream back on (v, w).
    Determinism: per distinct (v, w) the NLL is ONE fixed operand-order
    double expression of integer counts, rounded to 9 decimals at
    source and summed exactly as decimals, so engines agree
    bit-for-bit. Returns (id, n_bigrams, avg_nll).
    """
    ws = F.split(F.col(text_col), " ")
    qt = _qcol(text_col)
    pairs = F.when(
        F.size(ws) >= 2,
        F.expr(
            f"transform(sequence(2, size(split({qt}, ' '))), i ->"
            f" named_struct("
            f"  'v', element_at(split({qt}, ' '), i - 1),"
            f"  'w', element_at(split({qt}, ' '), i)))"
        ),
    )
    big = df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.v", "p.w"
    )
    bg = big.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw"))
    # bg rows ARE the distinct (v,w) types: count(*) per v is N1+(v,·),
    # per w is N1+(·,w), and the relation size is N1+(·,·)
    ctx = bg.groupBy("v").agg(
        F.sum("cvw").alias("cv"), F.count(F.lit(1)).alias("n1f")
    )
    cont = bg.groupBy("w").agg(F.count(F.lit(1)).alias("n1b"))
    types = bg.agg(F.count(F.lit(1)).alias("t"))
    d = F.lit(discount)
    nll = (
        bg.join(ctx, "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(types))
        .select(
            "v",
            "w",
            F.round(
                -F.log(
                    F.greatest(F.col("cvw") - d, F.lit(0.0))
                    / F.col("cv")
                    + d * F.col("n1f") / F.col("cv") * F.col("n1b")
                    / F.col("t")
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("nll"),
        )
    )
    per = (
        big.join(nll, ["v", "w"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll").alias("__s"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (
                F.col("__s").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("avg_nll"),
        )
    )


def dsir_logratio(
    df: DataFrame,
    target_col: str = "is_target",
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection scoring (Xie et al., "Data Selection
    for Language Models via Importance Resampling", NeurIPS 2023):
    represent documents by hashed n-gram features (unigrams + bigrams
    bucketed by md5 into ``n_buckets``), fit Laplace-smoothed bucket
    distributions for the TARGET domain (rows where ``target_col``)
    and the raw SOURCE corpus, and score every document by its mean
    importance log-ratio

        mean_f  ln( p_target(bucket(f)) / p_source(bucket(f)) )

    High scores = looks like the target domain; feed the score into
    ``temperature_sample``/``hash_sample`` for the resampling step.

    Scale shape (r6, VERDICT r5 item 5): the n-gram expansion runs
    ONCE — features partial-aggregate straight into a per-(doc, bucket)
    count relation, which is bounded at ``docs × n_buckets`` rows
    whatever the document lengths, and is materialized (operators.mat).
    Source and target bucket distributions, their totals, and the
    per-document scoring sum are all derived from that relation — the
    previous shape re-exploded the corpus text four times (source fit,
    target fit, totals, scoring).  Corpus text never shuffles; every
    aggregate after the first is keyed by bucket (model-sized) or doc.
    Determinism: bucket = integer value of the md5 prefix
    (engine-portable); per-bucket log-ratio rounded to 9 decimals at
    source then decimal-summed (the unigram_logprob pattern) — the
    occurrence-sum Σw equals the grouped Σ c·w exactly in decimal
    arithmetic, so results are bit-identical to the unfused form.

    Returns (id, n_feats, dsir_logratio).
    """
    ws = f"split({_qcol(text_col)}, ' ')"
    allf = (
        f"concat({ws}, if(size({ws}) < 2, array(),"
        f" transform(sequence(2, size({ws})), i ->"
        f" concat_ws(' ', element_at({ws}, i - 1),"
        f" element_at({ws}, i)))))"
    )
    # bucket = md5-prefix value mod n_buckets, so the parameter actually
    # drives the feature space (and stays consistent with the Laplace
    # denominators below). For n_buckets <= 256 the 2-hex-char (one
    # byte) decode suffices and — at the default 256 — reduces to the
    # identity, keeping the oracle's 2-char replica bit-identical;
    # larger spaces decode 8 chars (32 bits) before the mod.
    n_chars = 2 if n_buckets <= 256 else 8
    fb = df.select(
        F.col(id_col),
        F.col(target_col).alias("__t"),
        F.explode(F.expr(allf)).alias("f"),
    ).select(
        id_col,
        "__t",
        F.pmod(
            F.conv(F.substring(F.md5("f"), 1, n_chars), 16, 10).cast(
                "bigint"
            ),
            F.lit(n_buckets),
        )
        .cast("int")
        .alias("b"),
    )
    # the single expansion pass: per-(doc, bucket) occurrence counts —
    # bounded at docs × n_buckets rows, materialized once; every
    # downstream aggregate derives from this relation
    db = materialize(
        fb.groupBy(id_col, "__t", "b").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    bcounts = db.groupBy("b").agg(
        F.sum("c").alias("cs"),
        F.sum(F.when(F.col("__t"), F.col("c")).otherwise(0)).alias("ct"),
    )
    tot = bcounts.agg(
        F.sum("cs").alias("ts"), F.sum("ct").alias("tt")
    )
    w = (
        bcounts.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.col("ct") + 1)
                        / (F.col("tt") + n_buckets).cast("double")
                    )
                    / (
                        (F.col("cs") + 1)
                        / (F.col("ts") + n_buckets).cast("double")
                    )
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("w"),
        )
    )
    return (
        db.join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            # c as decimal(9,0): the product stays decimal(38,9) — a
            # long multiplicand would overflow precision 38 and trigger
            # Spark's scale-reducing rounding, breaking bit-parity with
            # the occurrence-sum Σw
            F.sum(
                F.col("c").cast("decimal(9,0)") * F.col("w")
            ).alias("__s"),
        )
        .select(
            F.col(id_col),
            "n_feats",
            (
                F.col("__s").cast("double")
                / F.col("n_feats").cast("double")
            ).alias("dsir_logratio"),
        )
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule battery (Rae et al. 2021 §A1.1) — the standard
    heuristic gate a corpus passes before any model-based filtering.

    Every rule is an integer-count ratio over the one tokenized scan:
    word-count bounds, mean-word-length band, symbol-to-word ratio
    ('#'/'...'), alphabetic-word fraction, stopword floor.  All codegen —
    one pass, no UDF, no shuffle; the per-rule booleans are emitted
    alongside the final ``keep`` so downstream audits can see WHICH gate
    dropped a document (the same reason the reference's agents emit
    per-stage streams rather than one opaque filter).

    Determinism: counts are integers and the ratio comparisons are exact
    rational-vs-literal in IEEE double — no transcendentals, engine-safe.
    """
    toks = F.split(F.col(text_col), " ")
    n_words = F.size(toks)
    n_chars = F.length(text_col)
    mean_wl = (n_chars - (n_words - 1)).cast("double") / F.nullif(
        n_words, F.lit(0)
    )
    sym_hits = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), F.lit(0))
    )
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    rules = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": sym_hits.cast("double")
        / F.nullif(n_words, F.lit(0))
        < max_symbol_ratio,
        "ok_alpha_words": alpha_words.cast("double")
        / F.nullif(n_words, F.lit(0))
        > min_alpha_word_ratio,
        "ok_stopwords": stop_hits >= min_stop_hits,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        *[
            F.coalesce(expr, F.lit(False)).alias(name)
            for name, expr in rules.items()
        ],
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def winnow_fingerprint(
    df: DataFrame,
    k: int = 8,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram,
    slide a window of ``w`` consecutive k-gram hashes, record each
    window's minimum; the DISTINCT selected hashes are the document's
    fingerprint set.  Guarantee: any substring shared between two
    documents of length >= ``k + w - 1`` contributes at least one
    common fingerprint — position-robust near-dup evidence that plain
    stride sampling cannot give.

    Scale shape: the whole algorithm is per-document, so it runs as ONE
    codegen projection — k-gram hashes via ``transform``, the sliding
    minimum via ``transform(..., j -> array_min(slice(grams, j, w)))``,
    the fingerprint set via ``array_distinct`` — no explode, no window
    operator, no shuffle, no join.  A 100 TB corpus pays exactly one
    parquet scan; work per doc is O(len · w) inside whole-stage
    codegen.  (The naive alternative — explode grams + ``min() OVER
    (PARTITION BY doc)`` — shuffles and sorts ~len gram rows per doc;
    measured 3× slower at sf0.1 with an exchange the HOF form never
    has.)  Expected fingerprint density is 2/(w+1) per gram (the
    winnowing theorem).

    Returns (id, n_fp, fp_sig) where fp_sig = md5 over the sorted
    fingerprint set — equal signatures mean equal fingerprint sets.
    Docs shorter than ``k + w - 1`` (no full window) emit n_fp = 0 and
    NULL fp_sig.
    """
    qt = _qcol(text_col)
    grams = (
        f"transform(sequence(1, length({qt}) - {k} + 1),"
        f" p -> md5(substring({qt}, p, {k})))"
    )
    sel = (
        f"array_sort(array_distinct(transform("
        f"sequence(1, size(__g) - {w} + 1),"
        f" j -> array_min(slice(__g, j, {w})))))"
    )
    # one md5 per character position makes this compute-bound: ~len
    # hash calls per len-byte row, so spreading rows across every core
    # is worth one row-sized shuffle even when the source has few
    # splits (a lone fixture-sized parquet file is one split = one
    # task; at warehouse scale the exchange is still ~1x the scan).
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )
    return (
        df.withColumn(
            "__g",
            F.when(F.length(text_col) >= k + w - 1, F.expr(grams)),
        )
        .withColumn("__sel", F.expr(sel))
        .select(
            F.col(id_col),
            F.when(F.col("__sel").isNotNull(), F.size("__sel"))
            .otherwise(F.lit(0))
            .alias("n_fp"),
            F.when(
                F.col("__sel").isNotNull(),
                F.md5(F.concat_ws("", F.col("__sel"))),
            ).alias("fp_sig"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    LREC 2020): score every document with the corpus unigram LM
    (``unigram_logprob``) and split the corpus into ``n_buckets``
    equal-population fluency tiers — bucket 0 ("head", lowest NLL =
    most fluent) through bucket n-1 ("tail").  The standard move before
    mixing: keep head+middle, drop or down-weight tail.

    Scale shape — the naive ``ntile() OVER (ORDER BY score)`` is a
    single-partition global sort; instead the quantile assignment is a
    distributed cumulative histogram (the ``build_vocab`` banded-rank
    pattern):

    1. aggregate scores to a (score → count) histogram — one
       digest-only shuffle (production would round scores, e.g. to 4-6
       decimals, to bound the histogram; the correctness gate keeps the
       exact doubles, which are bit-identical across engines because
       avg_nll is one IEEE division of identical operands);
    2. integer score bands (``floor(score)``) give a model-sized
       (~tens of rows: NLL lives in single digits) band histogram whose
       running offsets are computed driver-side and broadcast back —
       exactly like a k-means model;
    3. within each band a window computes the running count; the global
       rank of a score is band_offset + within-band cumulative, so
       ``bucket = min(n-1, n * cum_before / N)`` — no global sort, no
       single-partition window anywhere.

    Ties (equal scores) land in the same bucket by
    construction, which makes the output engine- and
    partitioning-independent.  Returns (id, n_tokens, avg_nll, bucket,
    tier).
    """
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col),
        "n_tokens",
        "avg_nll",
        F.col("avg_nll").alias("__s"),
    )
    # three consumers read the (expensive) LM-scoring lineage: the band
    # collect below, the cumulative-histogram plan, and the final join —
    # materialize it once (localCheckpoint: blocks auto-release on GC,
    # unlike a pinned persist; same reasoning as build_vocab)
    scored = materialize(scored)  # lazy: band collect below materializes
    hist = (
        scored.groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__band", F.floor("__s"))
    )
    # model-sized band totals -> running offsets (driver-side, like the
    # vocab_build frequency histogram / k-means centroids)
    bands = sorted(
        (r["__band"], r["n"])
        for r in hist.groupBy("__band").agg(F.sum("__cnt").alias("n")).collect()
    )
    total = sum(n for _, n in bands)
    offsets, acc = [], 0
    for b, n in bands:
        offsets.append((b, acc))
        acc += n
    spark = df.sparkSession
    # local_rows (guide §4): LocalTableScan, no Python re-eval per action
    off = F.broadcast(
        local_rows(spark, offsets, "__band bigint, __off bigint")
    )
    wb = (
        W.partitionBy("__band")
        .orderBy("__s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = (
        hist.withColumn(
            "__before", F.coalesce(F.sum("__cnt").over(wb), F.lit(0))
        )
        .join(off, "__band")
        .select(
            "__s",
            (F.col("__off") + F.col("__before")).alias("__cum_before"),
        )
    )
    # label contract: bucket 0 = "head", bucket n-1 = "tail" (the
    # docstring's CCNet tiers) for ANY n_buckets — n=2 must yield
    # head/tail, not head/middle; intermediate buckets are "middle"
    # then "tier<i>"
    if n_buckets == 1:
        names = ["head"]
    elif n_buckets == 2:
        names = ["head", "tail"]
    else:
        names = (
            ["head", "middle"]
            + [f"tier{i}" for i in range(2, n_buckets - 1)]
            + ["tail"]
        )
    labels = F.array(*[F.lit(s) for s in names])
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.lit(n_buckets) * F.col("__cum_before") / F.lit(total)),
    ).cast("int")
    return (
        scored.join(cum, "__s")
        .select(
            F.col(id_col),
            "n_tokens",
            "avg_nll",
            bucket.alias("bucket"),
            F.element_at(labels, bucket + 1).alias("tier"),
        )
    )


__all__ = [
    "tokenize",
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "repetition_stats",
    "ngram_contamination",
    "domain_stats",
    "chunk_tokens",
    "build_vocab",
    "boilerplate_chunks",
    "tokenize_with_vocab",
    "remove_boilerplate",
    "zipf_stats",
    "classifier_score",
    "pii_scan",
    "unigram_logprob",
    "bigram_logprob",
    "dsir_logratio",
    "gopher_rules",
    "winnow_fingerprint",
    "perplexity_buckets",
    "PII_PATTERNS",
    "LANG_MARKERS",
    "STOPWORDS",
]
