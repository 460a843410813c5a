"""Text analysis for training-data pipelines — pure Catalyst exprs.

Beyond-reference operators (SURVEY.md §7.1 M7; BASELINE.json north
star): language-ID, quality scoring, token counting, document
fingerprinting.  Everything here is built from ``pyspark.sql.
functions`` only — no Python UDFs — so at 100 TB these run inside
whole-stage codegen at scan speed, and each has an exact ANSI-SQL
mirror for the DuckDB oracle.

Semantics are deliberately simple, deterministic heuristics (n-gram /
stopword / ratio features), the standard cheap first-pass filters of
large corpus pipelines; model-based scoring would slot in as a
pandas_udf behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small frozen stopword sets per language. Order of LANGS is the
# deterministic tiebreak priority.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "los", "las", "y", "es", "uno", "una", "en", "para", "por"),
}
LANGS = tuple(LANG_STOPWORDS)

_WS = r"\s+"
_BPE_ISH = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def _ws_tokens(col: Column) -> Column:
    """Whitespace-split with empty tokens dropped.

    ``trim`` removes ASCII spaces only, so text leading with ``\\t``/
    ``\\n`` used to survive into ``split`` and emit a bogus empty
    first token (found by the hypothesis suite via ``'\\x85'``);
    filtering empties is robust to every leading/trailing
    whitespace form and makes whitespace-only text tokenize to [].
    """
    return F.filter(F.split(col, _WS), lambda t: t != "")


def _tokens(col: Column) -> Column:
    return _ws_tokens(F.lower(col))


def zip_ngram_fold(toks: Column, n: int) -> Column:
    """Space-joined token n-grams via a ``zip_with`` fold.

    One lambda invocation per output gram (the per-index
    ``transform``+``slice`` construction is quadratic under
    interpreted lambda evaluation — SCALE.md "Global posture").
    Assumes ``size(toks) >= n``; callers guard the short case with
    their own semantics (clamp to whole text, or empty).  Shared by
    every n-gram producer in the package (cleaning, dedup shingles,
    winnowing, corpus counts).
    """
    m = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, m)
    for i in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, 1 + i, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return acc


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    return F.size(_ws_tokens(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation.

    A cheap, deterministic proxy for subword tokenizer counts —
    the usual budget estimator in corpus pipelines.
    """
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_ISH), 0))


def _stop_hits(col: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(_tokens(col), lambda t: t.isin(*words)))


def lang_id(col: Column) -> Column:
    """Stopword-count language ID with deterministic tiebreak.

    Picks the language with the most stopword hits; ties resolve in
    LANGS order; zero hits everywhere → 'unknown'.
    """
    hits = {lang: _stop_hits(col, lang) for lang in LANGS}
    expr = F.lit("unknown")
    # build the CASE back-to-front so earlier langs win ties
    for lang in reversed(LANGS):
        cond = hits[lang] > 0
        for other in LANGS:
            if LANGS.index(other) < LANGS.index(lang):
                cond = cond & (hits[lang] > hits[other])
            elif LANGS.index(other) > LANGS.index(lang):
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic, truncated to 4 decimals.

    0.4 · stopword-ratio (EN) + 0.3 · min(1, tokens/50) +
    0.3 · alpha-ratio.  Length-, punctuation- and stopword-based
    scoring — the classic cheap quality gate.

    Truncation (``floor(x·10⁴)/10⁴``), not ``round``: both engines
    compute the identical IEEE double, but their ROUND tie rules
    differ at decimal half-boundaries (Spark rounds the shortest
    decimal repr HALF_UP; DuckDB rounds the binary value), which the
    r6 sf1 replay hit on real data ("0.3158" vs "0.3157").  floor of
    the identical double is engine-stable at every value.
    """
    n_tok = token_count(col).cast("double")
    stop_ratio = F.when(n_tok > 0, _stop_hits(col, "en") / n_tok).otherwise(0.0)
    n_chars = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, "[^a-zA-Z]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(0.0)
    raw = (
        0.4 * stop_ratio
        + 0.3 * F.least(F.lit(1.0), n_tok / 50.0)
        + 0.3 * alpha_ratio
    )
    return F.floor(raw * F.lit(10000.0)) / F.lit(10000.0)


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of normalized text.

    Normalization: lowercase + whitespace collapsed to single spaces
    + trimmed.  Exact-dup detection key; near-dup uses the MinHash
    machinery in ``dedup``.
    """
    norm = F.trim(F.regexp_replace(F.lower(col), _WS, " "))
    return F.md5(norm.cast("binary"))


def winnow_fingerprints(
    col: Column, k: int = 5, window: int = 4, exact_hash: bool = False
) -> Column:
    """Winnowing fingerprints: rolling-hash document signatures.

    The standard local-fingerprinting scheme (Schleimer/Wilkerson/
    Aiken winnowing): hash every ``k``-gram of tokens (the rolling
    hash — here xxhash64 of the joined window, equivalent selection
    behavior), then keep the MINIMUM hash of every ``window``
    consecutive k-gram hashes.  Guarantees any shared substring of ≥
    ``window + k - 1`` tokens contributes a common fingerprint, so
    overlap of fingerprint sets detects partial-copy near-dups that
    whole-document hashing misses.  Pure Catalyst array expressions;
    output is the sorted distinct fingerprint array.

    ``exact_hash=True`` hashes k-grams with md5 hex strings instead
    of xxhash64 (window min = lexicographic min) so the selection is
    reproducible in the DuckDB oracle; oracle/driver use only.
    """
    toks = _tokens(col)
    # k-gram texts (zip_ngram_fold), clamped to the whole text for
    # docs shorter than k tokens — then hashed elementwise
    gram_texts = F.when(
        F.size(toks) < k, F.array(F.array_join(toks, " "))
    ).otherwise(zip_ngram_fold(toks, k))
    grams = F.transform(
        gram_texts,
        (lambda g: F.md5(g.cast("binary")))
        if exact_hash
        else (lambda g: F.xxhash64(g)),
    )
    # sliding-window minimum as a least() fold over shifted slices of
    # the gram-hash array — same linearization
    w = F.size(grams) - (window - 1)
    macc = F.slice(grams, 1, w)
    for i in range(1, window):
        macc = F.zip_with(
            macc, F.slice(grams, 1 + i, w), lambda a, b: F.least(a, b)
        )
    mins = F.when(
        F.size(grams) < window, F.array(F.array_min(grams))
    ).otherwise(macc)
    return F.sort_array(F.array_distinct(mins))


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-level token n-gram frequencies: ``(gram, count)``.

    The classic corpus-statistics aggregation (vocabulary / bigram
    tables for LM analysis).  Occurrences count multiply within a
    document; documents shorter than ``n`` tokens contribute nothing
    (no clamped partial grams — they would pollute the table).

    100 TB posture: explode is map-side; the single shuffle is the
    ``groupBy(gram)`` with automatic partial (map-side combine)
    aggregation, so shuffle volume is the number of *distinct* grams
    per partition, not total tokens.  ``min_count`` prunes the long
    tail after the combine.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = _tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(zip_ngram_fold(toks, n))
    out = (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= int(min_count))
    return out


def ngram_lm_score(
    df: DataFrame,
    stats_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    score_col: str = "lm_score",
) -> DataFrame:
    """Unigram-LM log-likelihood quality score per document.

    The corpus-statistics quality signal (CCNet-style LM filtering,
    with a unigram model standing in for the 5-gram KenLM): score =
    mean over token occurrences of ``ln p(token)`` under additive
    smoothing — ``p = (count + s) / (total + s·vocab)`` — so
    documents full of rare/garbage tokens score low.  ``stats_df``
    is a ``(gram, count)`` table (:func:`ngram_counts` output),
    typically trained once on a reference corpus and reused; when
    ``None`` the model is trained on ``df`` itself (no OOV).  OOV
    tokens get the smoothed zero-count probability.

    100 TB posture: the stats table is vocabulary-sized and
    broadcasts; the token explode is map-side; the one big shuffle
    is the per-document mean.  Output: ``df`` + ``score_col``
    (NULL for documents the tokenizer leaves empty).
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    stats = stats_df if stats_df is not None else ngram_counts(df, 1, text_col)
    tot = stats.agg(
        F.sum("count").cast("double").alias("_tot"),
        F.count(F.lit(1)).cast("double").alias("_vocab"),
    )
    toks = df.select(id_col, F.explode(_tokens(F.col(text_col))).alias("gram"))
    s = float(smoothing)
    logp = F.log(
        (F.coalesce(F.col("count"), F.lit(0)).cast("double") + F.lit(s))
        / (F.col("_tot") + F.lit(s) * F.col("_vocab"))
    )
    scores = (
        toks.join(F.broadcast(stats), "gram", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.round(F.avg(logp), 4).alias(score_col))
    )
    return df.join(scores, id_col, "left")


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_col: str = "bm25",
    tiebreak: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 against a tokenized query.

    The standard lexical-retrieval scorer (Okapi BM25) as one lazy
    plan: corpus statistics (N, average document length, per-term
    document frequency) come from a single 1-row aggregation that
    broadcasts; each document's score is then a pure Catalyst
    expression — per-term tf from the token array, idf =
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``, the usual k1/b length
    normalization — summed in fixed query-term order (bit-stable
    across engines).  Final selection is ``orderBy(limit k)`` →
    TakeOrderedAndProject, so only k rows per partition reach the
    driver merge.  Complements the embedding ANN paths
    (`similarity.py`) with exact sparse retrieval.
    """
    terms = [t for t in query.lower().split() if t]
    if not terms:
        raise ValueError("query must contain at least one token")
    toks = _tokens(F.col(text_col))
    dl = token_count(F.col(text_col)).cast("double")
    stats = df.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg(token_count(F.col(text_col))).alias("_avgdl"),
        *[
            F.sum(
                F.when(F.array_contains(_tokens(F.col(text_col)), t), 1)
                .otherwise(0)
            ).cast("double").alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    def _tf(term: str) -> Column:
        # NB: F.filter treats a 2-arg lambda as (element, index), so
        # the term must be closed over via this helper, not a
        # default argument
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = _tf(t)
        idf = F.log(
            1.0
            + (F.col("_n_docs") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
        )
        norm = tf + F.lit(float(k1)) * (
            1.0 - float(b) + F.lit(float(b)) * dl / F.col("_avgdl")
        )
        score = score + idf * (tf * (float(k1) + 1.0)) / norm
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(score_col, F.round(score, 4))
        .drop("_n_docs", "_avgdl", *[f"_df_{i}" for i in range(len(terms))])
        .orderBy(F.col(score_col).desc(), F.col(tiebreak).asc())
        .limit(int(k))
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns at once (single scan)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_tokens_bpe", token_count_bpe(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", doc_fingerprint(c))
    )


def hash_embed(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    normalize: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Hashing-trick text vectorizer: text → dense ``dim``-float vector.

    The feature-hashing construction (Weinberger et al., ICML 2009):
    each token lands in bucket ``md5(token) % dim`` with a ±1 sign
    from an independent md5 bit, bucket values are signed counts,
    and the vector is optionally L2-normalized.  This is the bridge
    from raw text to every embedding operator in the package
    (cosine/LSH/IVF top-k, quantization, embedding dedup) without an
    external model — and, being md5-derived, it is a pure function
    of the text: stable across partitioning, engines, and corpus
    growth (the sampling-ops determinism contract).

    Plan shape: explode tokens map-side, ``groupBy(id, bucket)``
    partial-agg (shuffle rows = nonzero buckets, not tokens), one
    ``groupBy(id)`` to collect the sparse map, then a JVM-side
    ``transform(sequence(dim))`` densify (``dim`` lambda steps per
    row — bounded, not data-sized).  No Python UDFs.  Blank/NULL
    text yields the zero vector.
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.explode(
            F.when(token_count(F.col(text_col)) > 0, toks).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("_t"),
    )
    h = F.md5(F.col("_t"))
    pos = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim
    sgn = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    sparse = (
        base.select(F.col(id_col), pos.alias("_pos"), sgn.alias("_sgn"))
        .groupBy(id_col, "_pos")
        .agg(F.sum("_sgn").alias("_v"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_pos"), F.col("_v")))
            ).alias("_m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(dim) - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)),
    )
    out = sparse.withColumn("_d", dense)
    if normalize:
        n = F.sqrt(
            F.aggregate(F.col("_d"), F.lit(0.0), lambda a, x: a + x * x)
        )
        vec = F.when(
            n > 0,
            F.transform(F.col("_d"), lambda x: F.round(x / n, round_to)),
        ).otherwise(F.col("_d"))
    else:
        vec = F.col("_d")
    # left join back: blank/NULL-text rows produced no tokens and
    # fall out of the aggregate — restore them with the zero vector
    zeros = F.array_repeat(F.lit(0.0), int(dim))
    return (
        df.join(out.withColumn(out_col, vec).select(id_col, out_col),
                id_col, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), zeros))
    )


# Small frozen valence lexicon (deliberately tiny, like
# LANG_STOPWORDS): a deterministic AFINN-style wordlist.  A
# model-based scorer would slot in as a pandas_udf behind the same
# column contract.
SENTIMENT_POS: tuple[str, ...] = (
    "good", "great", "excellent", "fast", "best", "easy", "love",
    "helpful", "efficient", "reliable", "clean", "simple", "improved",
    "useful", "correct",
)
SENTIMENT_NEG: tuple[str, ...] = (
    "bad", "slow", "worst", "error", "errors", "fail", "failed",
    "broken", "hate", "hard", "confusing", "wrong", "crash", "leak",
    "deprecated",
)


def sentiment_score(col: Column) -> Column:
    """Lexicon sentiment in [-1, 1]: (pos − neg hits) / tokens.

    The cheap first-pass polarity feature (SURVEY §7.1 M7 "text
    analysis: sentiment").  Pure Catalyst — one ``filter`` pass per
    valence over the token array — rounded to 6 so values are
    bit-stable across engines.  Blank text scores 0.
    """
    toks = _tokens(col)
    pos = F.size(F.filter(toks, lambda t: t.isin(*SENTIMENT_POS)))
    neg = F.size(F.filter(toks, lambda t: t.isin(*SENTIMENT_NEG)))
    n = token_count(col)
    return F.round(
        F.when(n > 0, (pos - neg).cast("double") / n).otherwise(0.0), 6
    )


# Pattern NER: (entity_type, Java-regex ∩ RE2 pattern).  Ordered —
# extraction is per-type and a span may legitimately match several
# types (a date inside a URL); downstream consumers filter by type.
ENTITY_PATTERNS: tuple[tuple[str, str], ...] = (
    ("date", r"\b\d{4}-\d{2}-\d{2}\b"),
    ("money", r"\$\d+(?:\.\d+)?"),
    ("url", r"https?://[^\s]+"),
    ("proper", r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b"),
)


def extract_entities(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Regex NER: one output row per extracted span.

    Output: ``(id_col, entity_type, entity)`` — duplicates kept (a
    span appearing twice is two mentions; ``distinct()`` downstream
    if only the vocabulary matters).  Pattern-based NER is the
    deterministic tier of the M7 text-analysis family: dates, money,
    URLs, and capitalized multi-word runs as the proper-noun proxy.
    Scan-side ``regexp_extract_all`` + one explode — no shuffle, no
    Python — and the patterns live in the Java-regex ∩ RE2 subset so
    the DuckDB oracle runs the identical strings.
    """
    if types is None:
        wanted = ENTITY_PATTERNS
    else:
        known = {t for t, _ in ENTITY_PATTERNS}
        unknown = set(types) - known
        if unknown:
            raise ValueError(
                f"unknown entity types {sorted(unknown)}; "
                f"known: {sorted(known)}"
            )
        wanted = tuple((t, p) for t, p in ENTITY_PATTERNS if t in set(types))
        if not wanted:
            raise ValueError("types must name at least one entity type")
    c = F.col(text_col)

    def _tag(typ: str):
        # NB: a default-arg lambda would have arity 2, which
        # F.transform interprets as (element, index) — same gotcha
        # as bm25_topk's term filter
        return lambda e: F.struct(
            F.lit(typ).alias("entity_type"), e.alias("entity")
        )

    per_type = [
        F.transform(F.regexp_extract_all(c, F.lit(pat), 0), _tag(typ))
        for typ, pat in wanted
    ]
    spans = per_type[0] if len(per_type) == 1 else F.concat(*per_type)
    return (
        df.select(F.col(id_col), F.explode(spans).alias("_e"))
        .select(id_col, "_e.entity_type", "_e.entity")
    )
