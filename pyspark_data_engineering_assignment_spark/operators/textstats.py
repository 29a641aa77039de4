"""Text analysis: language-ID heuristic, quality scoring, token stats.

All built-in array/string expressions - per-document work is
embarrassingly parallel map work, no shuffle at all until a caller
aggregates. ANSI-mode safe (no overflow-prone arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.text import distinct_tokens, tokens

# Tiny function-word inventories for the n-gram/stopword language
# heuristic. Deliberately small: the operator's value is the *shape*
# (vectorized per-language hit counting + argmax), the dictionaries are
# swappable config.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "zu"],
}


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are function words of ``lang``."""
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(distinct_tokens(text), vocab))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language distinct-stopword hits,
    argmax with deterministic tie-break (language code order), 'und'
    when nothing hits."""
    out = docs
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", stopword_hits(F.col(text_col), lang))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("predicted_lang", pred)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: lengths, type-token ratio inputs,
    punctuation and whitespace counts, longest token. Integer-valued so
    thresholds compose without FP hazards."""
    t = F.col(text_col)
    toks = tokens(t)
    return docs.withColumns(
        {
            "q_chars": F.length(t),
            "q_tokens": F.size(toks),
            "q_distinct_tokens": F.size(F.array_distinct(toks)),
            "q_punct": F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", "")),
            "q_max_token_len": F.array_max(F.transform(toks, F.length)),
            # floor, not a bare cast: Spark's double->long cast truncates
            # but DuckDB's rounds, so the oracle pins floor() in both.
            "q_mean_token_len_x100": F.when(
                F.size(toks) > 0,
                F.floor(
                    (
                        F.aggregate(
                            F.transform(toks, F.length), F.lit(0), lambda a, v: a + v
                        )
                        * 100
                    )
                    / F.size(toks)
                ),
            ).cast("long"),
        }
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: word-bigram
    duplication (total vs distinct bigrams) and the most-frequent-token
    count. A high duplicate-bigram fraction or a single token dominating
    the document are the standard boilerplate/spam filters of a
    pretraining curation pipeline (Rae et al. 2021 §A1.1).

    Pure per-row array expressions - embarrassingly parallel map work,
    no shuffle, survives any scale-up untouched. The most-frequent-token
    count is the longest equal run of the SORTED token array - O(n log n)
    per row - computed as the max gap between run boundaries; the naive
    per-distinct-token count scan is O(distinct x len) and measured 8x
    slower at sf0.1 (6.5s vs 0.8s). Integer outputs only, so downstream
    thresholds compose without FP hazards and the DuckDB oracle
    hash-matches exactly.
    """
    # Each intermediate array is materialized at a projection boundary
    # before anything indexes into it per-element: a lambda that
    # references an unmaterialized array REBUILDS that subtree per
    # element (the doc_winnowing lesson - the inlined version of this
    # query was quadratic-per-row and ran minutes, not seconds).
    toks = F.col("_toks")
    n = F.size(toks)
    srt = F.col("_srt")
    # NULL text is missing data, not an empty document: it gets NO
    # stats row (pre-fix it emitted a half-NULL row - n_bigrams 0 but
    # top_token_count NULL - which no downstream threshold can use and
    # which diverged from the oracle's CASE-else zeros; round-9
    # corrupt-docs parity finding).
    staged = docs.filter(F.col(text_col).isNotNull()).select(
        id_col, tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_srt", F.array_sort(F.col("_toks")))
    # transform over sequence(1, n-1) makes the element the 1-based
    # index; guard n >= 2 because sequence(1, 0) would count DOWN.
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Longest run in the sorted array: positions where the value changes
    # (run starts), then max distance to the next start. F.get (0-based)
    # for the lookback: it nulls on index -1 where ANSI element_at(_, 0)
    # errors, and NULL != x is NULL, which OR-absorbs into the i == 1 arm.
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1) | (F.get(srt, i - 1) != F.get(srt, i - 2)),
    )
    staged = staged.withColumns(
        {"_bigrams": bigrams, "_bounds": F.concat(starts, F.array(n + 1))}
    )
    bounds = F.col("_bounds")
    top_token = F.array_max(
        F.transform(
            F.sequence(F.lit(1), F.size(bounds) - 1),
            lambda j: F.element_at(bounds, j + 1) - F.element_at(bounds, j),
        )
    )
    return staged.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(F.col("_bigrams")).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(F.col("_bigrams")))
        .cast("long")
        .alias("n_distinct_bigrams"),
        top_token.cast("long").alias("top_token_count"),
    )


def unigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Language-model quality scoring with a corpus unigram model - the
    CCNet/RedPajama "perplexity filter" shape with the KenLM n-gram
    model replaced by the unigram model the corpus itself induces:
    surprisal(doc) = sum over tokens of -ln(p(token)), high = unusual
    token mix (noise, boilerplate codes), low = stereotyped text.

    Two passes over the exploded token table: one groupBy(token) trains
    the model, one broadcast join + groupBy(doc) scores. The model
    table is vocab-bounded (always orders of magnitude below corpus
    rows), hence the broadcast; a vocabulary beyond broadcast size
    would drop the hint and shuffle on the token - same plan minus the
    broadcast. The 1-row token total rides a broadcast nested-loop
    join (the scalar-subquery pattern).

    Determinism contract: p = count/total is one IEEE double division,
    -ln(p) is floored to e6 fixed-point PER TOKEN, and only integers
    are summed - so the result hash-matches DuckDB exactly (ln()
    bit-parity over this corpus' frequency ratios verified empirically
    at all SFs; elementwise-then-floor keeps any future ulp divergence
    from compounding across a sum).
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    total = toks.agg(F.count("*").alias("_n"))
    model = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("_c"))
        .join(F.broadcast(total))
        .select(
            "tok",
            F.floor(
                -F.log(F.col("_c").cast("double") / F.col("_n")) * 1e6
            )
            .cast("long")
            .alias("_s_e6"),
        )
    )
    return (
        toks.join(F.broadcast(model), on="tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_s_e6").cast("long").alias("surprisal_e6"),
        )
    )


def chunk_tokens(
    df,
    text_col: str = "text",
    width: int = 32,
    stride: int = 24,
    keep_cols: tuple[str, ...] = ("doc_id",),
):
    """Sliding-window token chunking - the RAG/context-window splitter:
    each document becomes ceil(max(n-width,0)/stride)+1 overlapping
    chunks of up to ``width`` tokens starting every ``stride`` tokens,
    the standard overlap-chunking used to index corpora for retrieval
    (the last chunk is the tail remainder; every token is covered, and
    consecutive chunks share ``width - stride`` tokens of context).

    Emits one row per chunk: ``keep_cols + (chunk_idx, n_chunk_tokens,
    chunk_hash)``, where chunk_hash is md5 of the space-joined chunk -
    the CAS key downstream chunk-level dedup groups on.

    Scale: pure per-row array expressions (split once at a projection
    boundary, then an explode whose fan-out is n/stride ~ a small
    constant per document); no shuffle at all until a consumer
    aggregates. At 100 TB this is the map-side of the chunk pipeline -
    embarrassingly parallel, output partitioning inherited from the
    scan.
    """
    from pyspark_data_engineering_assignment_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    staged = df.select(*keep_cols, toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    # integer ceil-div: last chunk index = floor((max(n-w,0)+s-1)/s)
    last_idx = F.floor(
        (F.greatest(n - width, F.lit(0)) + (stride - 1)) / F.lit(stride)
    ).cast("long")
    chunked = staged.select(
        *keep_cols,
        "_toks",
        F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("_toks"), (F.col("chunk_idx") * stride + 1).cast("int"), width
    )
    return chunked.select(
        *keep_cols,
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    )
