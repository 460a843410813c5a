"""Corpus cleaning for training-data pipelines — pure Catalyst exprs.

Beyond-reference operators (SURVEY.md §7.1 M7): the standard cheap
first-pass gates of a large-corpus pipeline that `text.py`'s profile
doesn't cover —

- :func:`redact_pii`        — regex redaction of emails / URLs /
  IPv4s / phone numbers, with per-kind hit counts.
- :func:`repetition_profile` — repetition + shape metrics (top-token
  fraction, duplicate-bigram fraction, mean token length, symbol
  ratio): the Gopher-rules family of repetition heuristics.
- :func:`heuristic_filter`  — threshold gate over those metrics.
- :func:`decontaminate`     — drop documents sharing any token
  ``n``-gram with a benchmark/eval set (benchmark decontamination).
- :func:`take_token_budget` — greedy highest-score prefix under a
  global token budget (corpus curation to a target size).

Everything except the prefix sum is a per-row ``pyspark.sql.functions``
expression — no Python UDFs, no shuffle, whole-stage codegen at scan
speed — and each op has an exact ANSI-SQL mirror for the DuckDB
oracle.  The 100 TB postures:

- ``redact_pii`` / ``repetition_profile`` / ``heuristic_filter``:
  scan-side, embarrassingly parallel.
- ``decontaminate``: the benchmark side is small by definition (an
  eval set), so its distinct n-gram set broadcasts; the corpus side
  explodes its n-grams map-side and hits are a broadcast semi-join —
  no shuffle of the corpus.
- ``take_token_budget``: an exact global prefix sum — the textbook
  single-partition-window trap.  Delegates to the shared two-phase
  range-partition + per-partition-offset construction
  (``sources.loaders.running_totals``, also used by
  ``pack_documents``): one bounded driver row per partition, full
  parallelism otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "cap_per_group",
    "contamination_report",
    "decontaminate",
    "heuristic_filter",
    "normalize_text",
    "redact_pii",
    "repetition_profile",
    "take_token_budget",
]


# Ordered: URL first so an email/IP *inside* a URL is swallowed by
# <URL> rather than double-redacted; each later pattern sees the
# already-redacted text.  Patterns stay inside the Java-regex ∩ RE2
# common subset (no backrefs, no lookaround) so the DuckDB oracle
# applies literally the same strings.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{6,}\d", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: Sequence[str] | None = None,
) -> DataFrame:
    """Redact PII spans; count hits per kind.

    Adds ``{out_col}`` (redacted text, default overwrites
    ``text_col``) and one ``n_{kind}`` column per redacted kind.
    Counts are taken on the progressively-redacted text in pattern
    order, so a hit never counts under two kinds (an IP inside a URL
    is one URL, zero IPs).
    """
    out_col = out_col or text_col
    wanted = set(kinds) if kinds is not None else {k for k, _, _ in PII_PATTERNS}
    unknown = wanted - {k for k, _, _ in PII_PATTERNS}
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    cur: Column = F.col(text_col)
    counts: list[tuple[str, Column]] = []
    for kind, pat, token in PII_PATTERNS:
        if kind not in wanted:
            continue
        counts.append((kind, F.size(F.regexp_extract_all(cur, F.lit(pat), 0))))
        cur = F.regexp_replace(cur, pat, token)
    # counts FIRST: they are rooted at the original text column, and
    # when out_col == text_col the redacted projection would otherwise
    # shadow it, making every count zero
    out = df
    for kind, c in counts:
        out = out.withColumn(f"n_{kind}", c)
    return out.withColumn(out_col, cur)


# C0/C1 controls minus \t\n\r (which are whitespace, handled by the
# collapse step) plus zero-width space/joiners and the BOM.  C1
# (U+0080–U+009F) matters for mis-decoded latin-1/cp1252 crawl text
# (NEL, CSI…) and is NOT \s in Java or RE2.  The \x{hhhh} form is
# the Java-regex ∩ RE2 common spelling, so the DuckDB oracle uses
# the identical string.
_CTRL_ZW = (
    r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F"
    r"\x{0080}-\x{009F}"
    r"\x{200B}\x{200C}\x{200D}\x{FEFF}]"
)

# \s in the Java-regex ∩ RE2 subset is ASCII-only; unicode spaces
# (NBSP, ogham, en/em/thin spaces, line/para separators, narrow
# NBSP, math space, ideographic space) must be listed explicitly or
# they survive normalization (found by the hypothesis suite)
_WS_UNI = (
    r"[\s\x{00A0}\x{1680}\x{2000}-\x{200A}"
    r"\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+"
)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Canonicalize text: strip controls, collapse whitespace, case.

    The standard pre-dedup normalization pass — exact dedup and
    n-gram fingerprints should see one canonical form, not
    whitespace/case variants:

    1. control characters (C0/C1 except ``\\t \\n \\r``) and
       zero-width/BOM code points removed,
    2. every whitespace run collapsed to one space, ends trimmed,
    3. optionally lowercased.

    Pure scan-side ``regexp_replace`` chain — no shuffle, no Python —
    and every pattern stays in the Java-regex ∩ RE2 subset with
    explicit code points, so the DuckDB oracle runs literally the
    same strings.  NULL text stays NULL.
    """
    out_col = out_col or text_col
    c: Column = F.col(text_col)
    c = F.regexp_replace(c, _CTRL_ZW, "")
    c = F.trim(F.regexp_replace(c, _WS_UNI, " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, c)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` best rows per group (domain/source quota).

    The anti-domination pass of corpus curation: no single domain,
    source, or crawl bucket may contribute more than ``cap``
    documents, and within a group the best ``order_col`` rows win
    (``id_col`` ascending breaks ties deterministically).  One
    ``row_number`` window partitioned by ``group_col`` — state per
    task is one counter per group, parallelism = #groups; a corpus
    with a single degenerate group should be pre-split upstream
    (same caveat class as the dedup bucket caps, SCALE.md).
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if descending
        else [F.col(order_col).asc(), F.col(id_col).asc()]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(cap))
        .drop("_rn")
    )


def _toks(col: Column) -> Column:
    # the package's canonical lowercase whitespace tokenization —
    # one definition, shared with every other n-gram producer
    from semantic_olap_spark.functions.text import _tokens

    return _tokens(col)


def _repetition_counts():
    """Arrow-batched integer counts for the two repetition metrics.

    Returns a pandas UDF ``array<string> tokens → struct<top: bigint,
    d2: bigint>`` where ``top`` is the max token multiplicity and
    ``d2`` the distinct-bigram count.  r13 optimization (guide §4.2):
    the former pure-Catalyst constructions — a sort + run-length
    struct fold for ``top``, a zip_with fold + ``array_distinct`` for
    the bigrams — are higher-order functions, which execute as
    interpreted per-element lambdas outside whole-stage codegen;
    a hash-map pass in the Python worker is ~5× cheaper per core
    (0.13 s vs ~1.2 s single-core over the sf0.1 corpus).

    Bit-exactness by construction: the UDF consumes the token array
    Catalyst already produced (no tokenizer twin to keep in parity)
    and emits ONLY integers — every division and rounding stays in
    Catalyst, so the metric doubles are the same IEEE values as
    before and the SQL oracle is unchanged (a max-multiplicity and a
    distinct count have exactly one value).

    Runtime dependency note: this path (and therefore
    ``repetition_profile`` / ``heuristic_filter`` / the
    ``training_pipeline`` quality gate) needs pandas+pyarrow Python
    workers on the executors — it is no longer pure Catalyst.
    """
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "repetition metrics need pandas/pyarrow Python workers "
            "(Arrow-batched UDF); install pandas on the executors or "
            "pin the pure-Catalyst construction from r12"
        ) from e

    def counts(tok_series):
        from collections import Counter

        tops: list[int | None] = []
        d2s: list[int | None] = []
        for toks in tok_series:
            if toks is None:
                tops.append(None)
                d2s.append(None)
                continue
            t = list(toks)
            if not t:
                tops.append(0)
                d2s.append(0)
                continue
            tops.append(max(Counter(t).values()))
            d2s.append(len(set(zip(t, t[1:]))) if len(t) > 1 else 0)
        return pd.DataFrame({"top": tops, "d2": d2s})

    # the module's `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's type-hint inference rejects —
    # attach real objects instead
    counts.__annotations__ = {"tok_series": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(counts, "struct<top: long, d2: long>")


def repetition_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach repetition/shape metrics (one scan, no shuffle).

    - ``top_token_frac``:  occurrences of the most frequent token /
      total tokens (high → degenerate repetition).
    - ``dup_2gram_frac``:  1 − distinct bigrams / total bigrams.
    - ``mean_token_len``:  mean characters per token.
    - ``symbol_ratio``:    non-alphanumeric-non-space chars / chars.

    All rounded to 6 decimals so the values are bit-stable across
    engines.  The two counting metrics (max token multiplicity,
    distinct bigrams) come from one Arrow-batched integer UDF
    (:func:`_repetition_counts` — ~5× cheaper per core than the
    interpreted higher-order-function folds they replace); the token
    array, every ratio, and every rounding stay in Catalyst, so the
    values are bit-identical to the pure-expression form and the SQL
    oracle is unchanged.
    """
    c = F.col(text_col)
    toks = _toks(c)
    n = F.size(toks).cast("double")
    cnt = _repetition_counts()(toks)
    top = cnt["top"].cast("double")
    # denominator: a size-m token array has m-1 bigrams (the fold the
    # d2 count replaces emitted exactly size-1 grams); guarded by the
    # WHEN so the size<2 branch never evaluates it
    dup2 = F.when(
        F.size(toks) < 2, F.lit(0.0)
    ).otherwise(
        1.0
        - cnt["d2"].cast("double")
        / (F.size(toks) - 1).cast("double")
    )
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double")
    n_chars = F.length(c).cast("double")
    sym = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")).cast("double")
    blank = F.trim(c) == ""
    return (
        df.withColumn(
            "top_token_frac",
            F.round(F.when(blank, 0.0).otherwise(top / n), 6),
        )
        .withColumn("dup_2gram_frac", F.round(F.when(blank, 0.0).otherwise(dup2), 6))
        .withColumn(
            "mean_token_len",
            F.round(F.when(blank, 0.0).otherwise(tok_chars / n), 6),
        )
        .withColumn(
            "symbol_ratio",
            F.round(F.when(n_chars > 0, sym / n_chars).otherwise(0.0), 6),
        )
    )


def heuristic_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_top_token_frac: float = 0.2,
    max_dup_2gram_frac: float = 0.3,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    max_symbol_ratio: float = 0.2,
) -> DataFrame:
    """Gopher-style threshold gate over the repetition profile.

    Keeps rows passing ALL bounds; drops the metric columns again so
    the output schema equals the input schema (use
    :func:`repetition_profile` directly to keep the metrics).
    """
    from semantic_olap_spark.functions.text import token_count

    metrics = (
        "top_token_frac", "dup_2gram_frac", "mean_token_len", "symbol_ratio",
    )
    clash = [c for c in metrics if c in df.columns]
    if clash:
        raise ValueError(
            f"heuristic_filter would overwrite and then drop input "
            f"columns {clash}; rename them, or call repetition_profile "
            f"and filter explicitly"
        )
    prof = repetition_profile(df, text_col)
    keep = (
        (token_count(F.col(text_col)) >= int(min_tokens))
        & (F.col("top_token_frac") <= float(max_top_token_frac))
        & (F.col("dup_2gram_frac") <= float(max_dup_2gram_frac))
        & (F.col("mean_token_len") >= float(min_mean_token_len))
        & (F.col("mean_token_len") <= float(max_mean_token_len))
        & (F.col("symbol_ratio") <= float(max_symbol_ratio))
    )
    return prof.filter(keep).drop(
        "top_token_frac", "dup_2gram_frac", "mean_token_len", "symbol_ratio"
    )


def _ngrams(col: Column, n: int) -> Column:
    from semantic_olap_spark.functions.text import zip_ngram_fold

    toks = _toks(col)
    # documents shorter than n contribute their whole text as the
    # single clamped "n-gram" (consistent with the SQL oracle's
    # clamped list slices)
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.array_join(toks, " ")))
        .otherwise(zip_ngram_fold(toks, n))
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop rows sharing ANY token ``n``-gram with the benchmark set.

    Benchmark decontamination: training documents that contain a
    verbatim ``n``-token span of an eval set leak the benchmark.
    The benchmark's distinct n-gram set is small by definition and
    broadcasts; the corpus explodes its n-grams map-side, a broadcast
    inner join marks contaminated ids, and an anti-join removes them
    — the corpus itself is never shuffled.

    A document shorter than ``n`` tokens contributes its whole text
    as its only "n-gram" (clamped slice) — consistent on both sides,
    so short exact matches still count as contamination.
    """
    bench_text_col = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(_ngrams(F.col(bench_text_col), n)).alias("_gram")
        ).distinct()
    )
    hits = (
        df.select(id_col, F.explode(_ngrams(F.col(text_col), n)).alias("_gram"))
        .join(F.broadcast(bench_grams), "_gram")
        .select(id_col)
        .distinct()
    )
    return df.join(hits, id_col, "left_anti")


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate (don't drop) benchmark contamination per document.

    The audit companion of :func:`decontaminate`: adds
    ``n_contaminated_grams`` (distinct token ``n``-grams shared with
    the benchmark set) and ``contaminated``.  Same physical shape —
    benchmark grams broadcast, corpus grams explode map-side, one
    count per hit document — so the report costs what the drop
    costs, and a pipeline can gate on severity (e.g. drop only
    ``n_contaminated_grams >= 3``) instead of any-hit.
    """
    bench_text_col = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(_ngrams(F.col(bench_text_col), n)).alias("_gram")
        ).distinct()
    )
    hits = (
        df.select(id_col, F.explode(_ngrams(F.col(text_col), n)).alias("_gram"))
        .join(F.broadcast(bench_grams), "_gram")
        .groupBy(id_col)
        .agg(F.count_distinct("_gram").alias("n_contaminated_grams"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)),
        )
        .withColumn("contaminated", F.col("n_contaminated_grams") > 0)
    )


def take_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Greedy best-score prefix under a global token budget.

    Orders by (``score_col`` desc, ``id_col`` asc) and keeps rows
    while the running inclusive token total stays ≤ ``budget`` — the
    standard "curate the best N tokens" selection.  The prefix sum is
    the two-phase range-partition construction (see module docstring
    and functions/packing.py): no single-partition window, one
    bounded driver row per partition.

    Output: input columns + ``n_tokens`` (the row's token count).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if token_col is None:
        from semantic_olap_spark.functions.text import token_count

        toks: Column = token_count(F.col(text_col))
    else:
        toks = F.col(token_col).cast("long")
    # NULL text / token counts → 0 tokens, NOT NULL: the window sum
    # skips NULLs, so a NULL row would otherwise pass the budget
    # filter "for free" with an unusable n_tokens — pre-filter such
    # rows upstream if they shouldn't be selected at all
    toks = F.coalesce(toks.cast("long"), F.lit(0))
    with_tok = df.withColumn("n_tokens", toks)

    from semantic_olap_spark.sources.loaders import running_totals

    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    return (
        running_totals(with_tok, order, "n_tokens", "_cum", inclusive=True)
        .filter(F.col("_cum") <= int(budget))
        .drop("_cum")
    )
