"""Text-analysis operators for large-scale training-data pipelines.

All pure Spark SQL expressions (JVM-side, whole-stage codegen) — no Python
UDFs: language-ID and quality scoring over 100 TB of documents stay as fast
as any other columnar scan. Each operator has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tokenization: whitespace runs. Matches the oracle's string_split_regex.
TOKEN_SPLIT = r"\s+"

#: Punctuation class shared verbatim with the DuckDB oracle (explicit list —
#: engine-specific POSIX classes differ).
PUNCT_CLASS = r"[.,;:!?]"

#: Stopword regexes per language for the n-gram language-ID heuristic.
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|for)\b",
    "es": r"\b(el|la|de|los|las|una|que)\b",
    "de": r"\b(der|die|das|und|ist|von|mit)\b",
    "fr": r"\b(le|la|les|des|est|une|dans)\b",
}


def tokens(text: Column) -> Column:
    return F.split(text, TOKEN_SPLIT)


def token_count(text: Column) -> Column:
    """Whitespace token count, BIGINT (matches oracle len())."""
    return F.size(tokens(text)).cast("bigint")


#: GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
#: symbol runs (each optionally space-prefixed), trailing whitespace runs.
#: Shared verbatim with the DuckDB oracle (lowercased input, so no case
#: classes).
BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """Subword-ish token count: the GPT-2 pre-tokenization regex over
    lowercased text. Counts pre-merge pieces — the budget estimate a
    data pipeline uses before running a real BPE vocabulary, linear and
    JVM-side where true BPE would need a Python merge loop."""
    # group 0 = whole match (Spark defaults to group 1 and errors on
    # patterns without a capture group; DuckDB defaults to 0)
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_RE), 0)
    ).cast("bigint")


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation and
    stopword ratios. The canonical pre-training quality filter inputs."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    n_tok = token_count(t)
    no_punct = F.regexp_replace(t, PUNCT_CLASS, "")
    n_punct = (F.length(t) - F.length(no_punct)).cast("bigint")
    n_stop = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(LANG_STOPWORDS["en"]))
    ).cast("bigint")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(n_chars / n_tok, 4).alias("chars_per_token"),
        n_punct.alias("n_punct"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        n_stop.alias("n_stopwords"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID (n-gram heuristic, SURVEY extension).

    Scores each language by stopword matches; deterministic tie-break by
    the fixed language order en > es > de > fr.
    """
    lowered = F.lower(F.col(text_col))
    hits = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(pat))).cast("bigint")
        for lang, pat in LANG_STOPWORDS.items()
    }
    guess = (
        F.when(
            (hits["en"] >= hits["es"])
            & (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["fr"]),
            F.lit("en"),
        )
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"]), F.lit("es"))
        .when(hits["de"] >= hits["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["de"].alias("de_hits"),
        hits["fr"].alias("fr_hits"),
        guess.alias("lang_guess"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization fingerprint: md5 of lowercase, whitespace-collapsed
    text — the exact-dedup key that survives formatting noise."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    rolling hash over token k-grams, keep the minimum hash of every
    ``window`` consecutive k-grams (leftmost on ties), dedup selections.

    The selection guarantee — every run of ``window`` k-grams
    contributes at least one fingerprint — makes shared substrings of
    length >= k + window - 1 tokens detectable from the fingerprint
    sets alone, at ~2/(window+1) of the full shingle volume. All
    JVM-side: posexplode + lead for the k-grams, xxhash64 as the rolling
    hash, one bounded-frame window min for selection. Output: (doc,
    pos, fp) — pos is the k-gram offset the fingerprint was taken at.
    """
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    w_lead = W.partitionBy("doc").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(w_lead) for j in range(1, k)
    ]
    grams = (
        toks.withColumn("_last", parts[-1])
        .withColumn("gram", F.concat_ws(" ", *parts))
        .filter(F.col("_last").isNotNull())
        .select("doc", "pos", F.xxhash64("gram").alias("h"))
    )
    # min (hash, then leftmost pos) over each window of `window` k-grams
    w_sel = W.partitionBy("doc").orderBy("pos").rowsBetween(0, window - 1)
    sel = grams.withColumn(
        "_pick", F.min(F.struct("h", "pos")).over(w_sel)
    )
    return (
        sel.select(
            "doc",
            F.col("_pick.pos").alias("pos"),
            F.col("_pick.h").alias("fp"),
        )
        .dropDuplicates()
    )


def shingles_from_tokens(token_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* token-array
    column. Documents with fewer than ``n`` tokens yield an empty array.

    PERF: the tokens must be a bound column, not an inline ``split(...)``
    expression — inside transform lambdas Catalyst does not CSE repeated
    subtrees, so inlining the split re-tokenizes the text once per
    element_at (O(tokens^2) per row; measured 20s vs <2s on 5k docs).
    """
    w = F.col(token_col)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc, shingles) with the token array materialized in its own
    projection step (see shingles_from_tokens PERF note)."""
    return docs.select(
        F.col(id_col).alias("doc"),
        tokens(F.lower(F.col(text_col))).alias("_w"),
    ).select("doc", shingles_from_tokens("_w", n).alias("shingles"))


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Adjacent-symbol pair frequencies over BPE pre-tokens — the inner
    statistic of one BPE-training iteration (symbols = characters here,
    i.e. the first merge round; the full vocabulary loop reruns this on
    progressively merged symbols).

    Plan: regexp pre-tokenize (the shared GPT-2-style pattern), explode
    pre-tokens, explode each token's adjacent character pairs via a
    sequence over its length, then ONE groupBy(pair) count with
    map-side partial aggregation — at 100 TB the shuffle carries only
    the distinct-pair partial counts, never the corpus.

    Output: (pair, n) for pairs seen at least ``min_count`` times.
    """
    pretoks = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(BPE_PRETOKEN_RE), 0
            )
        ).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = pretoks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition quality signals per document: the filters (after the
    Gopher ruleset) that catch boilerplate and degenerate generations —
    distinct-token ratio, most-frequent-token share, duplicate 2-gram
    and 3-gram fractions.

    Plan: the n-gram fractions come from one array projection per doc
    (tokens materialized in their own select — see the
    ``shingles_from_tokens`` PERF note); the top-token share needs a
    within-doc mode, done relationally (explode -> two groupBys on
    ``doc_id``) and joined back — both sides shuffle on the same key.
    All arithmetic is integer counts + one rounded double division, so
    both engines produce bit-identical results.
    """
    w = F.col("_w")

    def grams(n: int):
        # F.sequence defaults to step -1 when stop < start, so a doc with
        # fewer than n tokens would yield [0, -1] and element_at(w, 0)
        # aborts the whole query; DuckDB's GENERATE_SERIES returns empty
        # there. Guard like shingles_from_tokens to match.
        idx = F.sequence(F.lit(0), F.size(w) - n)
        made = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)],
            ),
        )
        return F.when(F.size(w) >= n, made).otherwise(
            F.array().cast("array<string>")
        )

    n_tok = F.size(w).cast("bigint")
    base = (
        docs.select(
            F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_w")
        )
        .select(
            id_col,
            n_tok.alias("n_tokens"),
            F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct"),
            (n_tok - 1).alias("n_2grams"),
            F.size(F.array_distinct(grams(2))).cast("bigint").alias("d2"),
            (n_tok - 2).alias("n_3grams"),
            F.size(F.array_distinct(grams(3))).cast("bigint").alias("d3"),
        )
    )
    top = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_cnt"))
    )

    def frac(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den, 6)
        ).otherwise(F.lit(0.0))

    return base.join(top, id_col).select(
        id_col,
        "n_tokens",
        frac(F.col("n_distinct"), F.col("n_tokens")).alias("distinct_ratio"),
        frac(F.col("top_cnt"), F.col("n_tokens")).alias("top_token_frac"),
        F.when(
            F.col("n_2grams") > 0,
            F.round(
                1 - F.col("d2").cast("double") / F.col("n_2grams"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
        F.when(
            F.col("n_3grams") > 0,
            F.round(
                1 - F.col("d3").cast("double") / F.col("n_3grams"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf rank.

    Scoring uses reciprocal document frequency in exact integer space —
    ``score_ppm = (tf * 1_000_000) div df`` — instead of the float
    ``tf·log(N/df)``: within one document the idf factor is any
    monotonically decreasing function of df, and integer arithmetic
    makes the *ranking* bit-identical across engines (a log-based score
    can flip near-ties in the last ulp). Ties broken by term ascending.

    Plan: explode tokens once; tf = groupBy(doc, term), df = groupBy
    (term) over the distinct (doc, term) pairs of the SAME exploded
    child (exchange-reusable); df joins back on term; one window
    row_number per doc picks the top k.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    # integer DIV end-to-end (the oracle mirrors with DuckDB's //):
    # a float floor(a/b) path agrees only while tf*1e6 stays under 2^53
    scored = tf.join(df_, "term").withColumn(
        "score_ppm", F.expr("tf * 1000000L DIV df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "score_ppm")
    )
