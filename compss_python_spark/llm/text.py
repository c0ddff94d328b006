"""Text analysis operators for training-data pipelines.

Everything stays JVM-side (built-in string/array functions, whole-stage
codegen) — no Python UDFs in any hot path, so these scale linearly with
executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the n-gram/stopword language heuristic.
# Deterministic and dependency-free (no external model); coverage is the five
# langs present in the documents table.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "los", "las", "que", "de", "es", "un", "una", "por"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "人", "这"],
}


def tokens(col) -> Column:
    """Whitespace tokenization of a text column (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """Rough BPE-style token estimate: word-ish + digit + punctuation pieces.

    A deterministic regex proxy for tokenizer counts (the real tokenizer is
    out of scope): counts maximal runs of letters (split every 6 chars, the
    empirical chars-per-BPE-token), digits, and individual punctuation.
    """
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]{1,6}|[0-9]{1,3}|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-level statistics."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_calc": F.length(t),
            "n_tokens": token_count(text_col),
            "n_alpha": F.length(F.regexp_replace(t, r"[^A-Za-z]", "")),
            "n_digit": F.length(F.regexp_replace(t, r"[^0-9]", "")),
            "n_punct": F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")),
            "n_space": F.length(F.regexp_replace(t, r"[^\s]", "")),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text", lang_col: str | None = None) -> DataFrame:
    """Heuristic document-quality score in [0, 1].

    Components (all JVM-side):
    - length score: saturating ramp on token count (≥20 tokens → 1.0);
    - mean-token-length sanity: 1 inside [3, 12], else 0;
    - alpha ratio: alphabetic chars / non-space chars;
    - stopword hit ratio (if lang available): fraction of the language's
      marker words present in the doc.
    """
    t = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    mean_tok_len = non_space / F.greatest(n_tok, F.lit(1))

    length_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    tok_len_score = F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 1.0).otherwise(0.0)
    alpha_ratio = alpha / F.greatest(non_space, F.lit(1))

    out = df.withColumn(
        "quality",
        F.round((length_score + tok_len_score + alpha_ratio) / 3.0, 6),
    )
    if lang_col:
        markers = F.create_map(
            *[x for lang, words in _LANG_MARKERS.items() for x in (F.lit(lang), F.array(*[F.lit(w) for w in words]))]
        )
        hit = F.size(F.array_intersect(toks, markers[F.col(lang_col)]))
        out = out.withColumn("stopword_hits", hit)
    return out


def language_id(df: DataFrame, text_col: str = "text", alias: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-word hits.

    One pass, pure built-ins: tokenize once, count marker intersections per
    language, take the max (ties → lexicographic smallest language code so
    results are deterministic).
    """
    toks = F.transform(tokens(text_col), lambda x: F.lower(x))
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(_LANG_MARKERS.items())
        ]
    )
    # Deterministic tie-break: highest hits, then smallest lang code.
    best = F.reduce(
        scores,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"]) | ((s["hits"] == acc["hits"]) & (s["lang"] < acc["lang"])),
            s,
        ).otherwise(acc),
    )
    return df.withColumn(alias, best["lang"])


def ngrams(text_col, n: int = 2) -> Column:
    """Word n-grams of a text column as an array (NON-distinct — callers
    needing set semantics apply array_distinct).  Short docs (< n tokens)
    yield one gram = the whole text, so no document silently disappears.

    Built as a zip_with chain over n shifted slices of the token array —
    NOT element_at/slice lookups inside a transform lambda: an outer-scope
    array expression referenced inside a higher-order-function lambda is
    re-evaluated PER ELEMENT (the split runs O(tokens) times per row,
    quadratic in document length — measured 10× slower at sf0.1), while
    zip_with evaluates each slice once per row."""
    t = tokens(text_col)
    width = F.greatest(F.size(t) - (n - 1), F.lit(0))
    g = F.slice(t, 1, width)
    for j in range(1, n):
        g = F.zip_with(
            g, F.slice(t, j + 1, width), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(t) < n, F.array(F.concat_ws(" ", t))).otherwise(g)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram_n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021 §A1.1):

    - ``dup_token_frac``: 1 − distinct/total tokens (computed narrow, per row);
    - ``dup_ngram_frac``: 1 − distinct/total word n-grams;
    - ``top_ngram_frac``: occurrences of the most frequent n-gram / total.

    The n-gram frequency mode needs per-(doc, gram) counts, so the gram
    stats run distributed: explode → partial-aggregated groupBy(doc, gram)
    → groupBy(doc).  Two hash shuffles keyed on (doc, gram) then doc — both
    map-side combined, no skew (keys are per-document).  The per-row
    alternative (aggregate over array_distinct) is O(grams²) per doc and
    melts on long documents, so explode is the 100 TB shape.
    """
    toks = tokens(text_col)
    narrow = df.select(
        F.col(id_col),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
        ngrams(text_col, ngram_n).alias("_g"),
    )
    gcnt = (
        narrow.select(id_col, "dup_token_frac", F.explode("_g").alias("_gram"))
        .groupBy(id_col, "dup_token_frac", "_gram")
        .agg(F.count("*").alias("_c"))
    )
    return gcnt.groupBy(id_col, "dup_token_frac").agg(
        F.round(F.lit(1.0) - F.count("*") / F.sum("_c"), 6).alias("dup_ngram_frac"),
        F.round(F.max("_c") / F.sum("_c"), 6).alias("top_ngram_frac"),
    )


# PII patterns kept deliberately dialect-portable: valid and identical
# semantics under Java regex (Spark) and RE2 (DuckDB oracle) — no
# backreferences, no lookaround, no \b.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{7,15}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
}


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII match counts (one ``n_<kind>`` column per pattern).
    Pure regexp_count expressions — JVM-side, zero shuffle."""
    return df.withColumns(
        {
            f"n_{kind}": F.regexp_count(F.col(text_col), F.lit(pat))
            for kind, pat in PII_PATTERNS.items()
        }
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", alias: str = "redacted"
) -> DataFrame:
    """Replace every PII match with ``[<KIND>]`` placeholders.  Chained
    regexp_replace — order matters only across overlapping kinds (ipv4 runs
    after phone so a '+1.2.3.4'-style string is consumed once); all three
    patterns here are disjoint."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return df.withColumn(alias, out)


# The Gopher stopword-presence list (Rae et al. 2021 §A1.1): a document must
# contain at least `stop_hits` distinct words from this list to pass the
# "contains common English words" rule.
GOPHER_STOPWORDS: list[str] = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.80,
    max_bullet_frac: float = 0.90,
    max_ellipsis_frac: float = 0.30,
    stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, Appendix A1.1).

    Adds one boolean column per rule plus ``gopher_keep`` (AND of all):

    - ``r_word_count``: word count in [min_words, max_words];
    - ``r_mean_word_len``: mean word length in [min, max];
    - ``r_symbol_ratio``: ('#' + '...') occurrences / words ≤ max_symbol_ratio;
    - ``r_alpha_words``: fraction of words containing ≥1 alphabetic char
      ≥ min_alpha_word_frac;
    - ``r_bullets``: fraction of lines starting with a bullet marker
      (-, *, •) ≤ max_bullet_frac;
    - ``r_ellipsis``: fraction of lines ending with '...' or '…'
      ≤ max_ellipsis_frac;
    - ``r_stopwords``: ≥ stop_hits distinct words from GOPHER_STOPWORDS.

    Every rule is a narrow JVM expression over the tokenized text — zero
    shuffle, whole-stage codegen, embarrassingly parallel at 100 TB.  The
    thresholds are the paper's defaults; pipelines tune them per corpus.
    """
    t = F.col(text_col)
    toks = tokens(text_col)
    n_words = F.size(toks)
    n_words1 = F.greatest(n_words, F.lit(1))
    # mean word length over non-space characters
    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl = non_space / n_words1
    n_symbols = F.regexp_count(t, F.lit(r"#|\.\.\.")) + F.regexp_count(
        t, F.lit("…")
    )
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    lines = F.split(t, r"\n")
    n_lines1 = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    )
    stop_distinct = F.size(
        F.array_intersect(
            F.transform(toks, lambda w: F.lower(w)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "r_symbol_ratio": (n_symbols / n_words1) <= max_symbol_ratio,
        "r_alpha_words": (alpha_words / n_words1) >= min_alpha_word_frac,
        "r_bullets": (bullet_lines / n_lines1) <= max_bullet_frac,
        "r_ellipsis": (ellipsis_lines / n_lines1) <= max_ellipsis_frac,
        "r_stopwords": stop_distinct >= stop_hits,
    }
    out = df.withColumns(rules)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def zipf_fit(df: DataFrame, text_col: str = "text", top_n: int = 100) -> DataFrame:
    """Least-squares Zipf fit over the corpus token-frequency distribution.

    Token frequencies → rank by (count desc, term asc) → restrict to the
    top_n ranks → ordinary least squares of ln(count) on ln(rank).  A
    healthy natural-language corpus shows slope ≈ −1 (Zipf's law); heavily
    deduplicated or templated corpora drift away — a cheap corpus-health
    metric.

    Returns ONE row: (slope, intercept, r2, n_terms), rounded to 6 dp.
    Plan: one map-combined token count, one rank window over the top_n
    slice (bounded rows after the count pushes down via a count-desc
    ORDER/LIMIT), one scalar aggregate.  The only full-corpus work is the
    token count — everything after runs on ≤ top_n rows.
    """
    freq = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    top = freq.orderBy(F.desc("cnt"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    return ranked.agg(
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
        F.round(F.pow(F.corr("y", "x"), 2), 6).alias("r2"),
        F.count("*").cast("long").alias("n_terms"),
    )


def _pair_stream(df: DataFrame, text_col: str, keep_cols: list[str]) -> DataFrame:
    """Adjacent-token pair stream (keep_cols..., w1, w2) for the bigram
    LMs/PMI.  The token array is PROJECTED into a bound column before the
    pair transform: referencing the split expression itself inside the
    lambda re-evaluates it per element — O(tokens²) per document, measured
    15× slower at sf0.1 (same trap :func:`ngrams` documents)."""
    base = df.select(*keep_cols, tokens(text_col).alias("_t"))
    t = F.col("_t")
    return base.select(
        *keep_cols,
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("w1"),
                        F.element_at(t, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array()),
        ).alias("p"),
    ).select(*keep_cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Language-model quality scoring (the CCNet-style perplexity signal):
    train an add-α-smoothed bigram LM on the corpus itself and score each
    document by its per-token cross-entropy
    −mean ln P(w2|w1), P = (c(w1,w2)+α)/(c(w1)+α·V).
    Lower = more 'typical' text; boilerplate and word salad both stand
    out.  Returns (id_col, n_pairs, cross_entropy) for documents with ≥ 2
    tokens.

    Plan shape: two map-combined count aggregates (unigram, bigram — the
    LM 'training'), then the per-doc pair stream joins those counts on
    their natural keys and one final per-doc aggregate.  All shuffles are
    keyed on well-distributed grams.  At 100 TB, prune the bigram table to
    top-k per head word and let misses fall to the smoothing floor — the
    join shape is unchanged.
    """
    t = tokens(text_col)
    pairs = _pair_stream(df, text_col, [id_col])
    uni = (
        df.select(F.explode(t).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    v = uni.count()  # vocab size: one tiny blocking agg (scalar)
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .select(
            id_col,
            F.log(
                (F.col("c2") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * v)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(-F.avg("_lp"), 5).alias("cross_entropy"),
    )


def kneser_ney_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995; Chen
    & Goodman 1999 §2.7) — the standard n-gram smoothing, a sharper
    quality/perplexity signal than :func:`bigram_lm_score`'s add-α because
    probability mass reserved by the absolute discount D flows to words
    proportional to how many distinct CONTEXTS they follow (continuation
    counts), not raw frequency:

        P_KN(w2|w1) = max(c(w1w2) − D, 0)/cH(w1)
                      + D·N1+(w1·)/cH(w1) · N1+(·w2)/T

    with cH(w1) = Σ_w c(w1,w) (bigram head count), N1+(w1·) = distinct
    continuations of w1, N1+(·w2) = distinct predecessors of w2, T =
    distinct bigram types.  Scoring the training corpus itself (the CCNet
    self-scoring setup) every scored pair has c ≥ 1, so P_KN > 0 without a
    backoff chain.  Returns (id_col, n_pairs, cross_entropy) — per-token
    −mean ln P_KN, for documents with ≥ 2 tokens.

    Plan shape (identical scaling to :func:`bigram_lm_score`): ONE bigram
    count aggregate is the model; head totals, continuation counts and
    predecessor counts are three map-combined re-aggregations OF THAT
    TABLE (vocab-sized, not corpus-sized); the per-doc pair stream joins
    them on gram keys and one per-doc aggregate closes.  T is a scalar
    count of the bigram-type table — the same bounded blocking aggregate
    precedent as the sibling's vocab size.
    """
    pairs = _pair_stream(df, text_col, [id_col])
    # The vocab-sized bigram table is the model AND feeds four consumers
    # (type total, heads, continuations, the scoring join) — pinned once
    # so each does not re-run the corpus tokenize + pair explode (the
    # t_types count below materializes the checkpoint).
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .localCheckpoint(eager=False)
    )
    heads = bi.groupBy("w1").agg(
        F.sum("c2").alias("ch"), F.count("*").alias("n1_fwd")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("n1_bwd"))
    t_types = bi.count()  # distinct bigram types: one tiny blocking scalar
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("ch")
        + d * F.col("n1_fwd") / F.col("ch") * F.col("n1_bwd") / F.lit(float(t_types))
    )
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(heads, "w1")
        .join(cont, "w2")
        .select(id_col, F.log(p_kn).alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(-F.avg("_lp"), 5).alias("cross_entropy"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-embedding / pre-RAG chunking step.  Returns (id_col, chunk_idx,
    chunk_text, n_tokens): chunk c covers tokens [c·stride, c·stride +
    chunk_tokens) with stride = chunk_tokens − overlap; the last chunk may
    be short; a document shorter than one chunk yields exactly one chunk.

    Entirely narrow JVM expressions (tokenize → sequence explode → array
    slice → join) — no shuffle, no UDF; chunk count per doc is
    max(1, ceil((n − overlap) / stride)) in exact integer arithmetic, so
    a SQL oracle reproduces every chunk id and every chunk text."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    n_chunks = F.greatest(
        F.lit(1),
        (n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride),
    ).cast("long")
    out = df.select(
        F.col(id_col),
        t.alias("_t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice("_t", F.col("chunk_idx") * stride + 1, chunk_tokens)
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", alias: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of case/whitespace-normalized
    text.  Used as the exact-dedup key; md5 keeps the DuckDB oracle
    expressible (same function both engines)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(alias, F.md5(norm))


def top_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: top-k terms by
    tf · (ln((N+1)/(df+1)) + 1) (smoothed idf), tie-break term asc.
    Returns (id_col, term, score, kw_rank).

    Plan: one (doc, term) count, one term document-frequency count, the
    corpus size N as a broadcast 1-row aggregate (never a driver collect),
    and a per-doc top-k window that WindowGroupLimit prunes map-side.
    Shuffles are keyed on (doc, term) / term — high-cardinality, no skew.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("kw_rank", F.row_number().over(w)).filter(
        F.col("kw_rank") <= k
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent token
    pairs, PMI = ln(c_ab · T / (c_a· · c_·b)) with left/right marginals
    over the pair stream (T = total pairs).  Returns the ``top`` pairs
    with c_ab ≥ min_count by (PMI desc, w1, w2), with a rank column.

    Plan: ONE pair count feeds everything — marginals are two more
    map-combined aggregates OF THE PAIR TABLE (vocabulary-sized, not
    corpus-sized), T is a broadcast scalar, and the final top-N is
    TakeOrdered.  The corpus is scanned once.
    """
    pair_stream = _pair_stream(df, text_col, [])
    pairs = pair_stream.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    left = pairs.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    right = pairs.groupBy("w2").agg(F.sum("c_ab").alias("c_b"))
    total = pairs.agg(F.sum("c_ab").alias("_t"))
    from pyspark.sql import Window

    scored = (
        pairs.filter(F.col("c_ab") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("c_ab"),
            # cast BOTH products to double first: c_ab·T and c_a·c_b are
            # long×long and silently wrap past 2^63 at the corpus scales
            # this module targets (error under ANSI mode) — the oracle's
            # DuckDB arithmetic promotes to HUGEINT and never wraps
            F.round(
                F.log(
                    F.col("c_ab").cast("double") * F.col("_t")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    topn = scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(top)
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return topn.withColumn("pmi_rank", F.row_number().over(w))


def source_vocabulary_jaccard(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus slices (sources /
    domains / dumps) — the corpus-comparison companion to
    ``text_corpus_drift_kl``.  Returns (src_a, src_b, n_common, jaccard)
    for every unordered slice pair.

    Plan: one distinct (slice, term) projection, slice vocabulary sizes by
    map-combined count, intersections via a term-keyed self-join (fan-out
    per term is bounded by the SLICE count, not the corpus).  Designed for
    moderate slice cardinality (sources, languages, dumps — up to ~10³);
    for millions of slices switch to per-slice MinHash signatures and the
    set-similarity join (llm/dedup.py), which this function intentionally
    does not replicate."""
    vocab = (
        df.select(F.col(group_col).alias("_g"), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    sizes = vocab.groupBy("_g").agg(F.count("*").alias("_n"))
    a = vocab.select(F.col("_g").alias("src_a"), "term")
    b = vocab.select(F.col("_g").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("_g").alias("src_a"), F.col("_n").alias("_na"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_g").alias("src_b"), F.col("_n").alias("_nb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common") / (F.col("_na") + F.col("_nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    output_col: str = "text_norm",
    lowercase: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    normalize_quotes: bool = True,
    strip_zero_width: bool = True,
) -> DataFrame:
    """Canonical text normalization — the step before any hashing/dedup
    key so that cosmetic variants ("smart" quotes, NBSP, zero-width
    joiners, control chars, case, runs of whitespace) cannot split an
    exact-duplicate group.  Each rule is independently toggleable and all
    run as ONE chained JVM regexp/translate expression — zero shuffle,
    zero Python, linear in bytes.

    Rules (applied in order): strip C0/C1 control chars (keep \\t \\n),
    drop zero-width/J BOM codepoints, map typographic quotes/dashes and
    NBSP to ASCII, collapse [\\s]+ runs to one space + trim, lowercase.
    (Full NFKC needs ICU — out of stdlib/JVM-regex scope and documented
    as such; these rules cover the variants that dominate crawl text.)
    """
    c = F.col(text_col)
    if strip_control:
        c = F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", "")
    if strip_zero_width:
        c = F.regexp_replace(c, "[​‌‍⁠﻿]", "")
    if normalize_quotes:
        c = F.translate(
            c,
            "‘’‚“”„–— ",
            "''," + '"""' + "-- ",
        )
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(output_col, c)


def html_to_text(col) -> Column:
    """HTML → text extraction as ONE chained JVM regexp expression — the
    dependency-free Spark-expression analogue of the boilerplate-removal
    step every crawl pipeline runs before quality/dedup (CCNet, Dolma and
    FineWeb use trafilatura/resiliparse; those are C/Python codecs, out of
    scope here — this covers the deterministic tag/entity/whitespace
    layer, zero Python, linear in bytes, zero shuffle).

    Steps, in order: drop <script>/<style> elements with their content,
    drop comments, convert <br> and closing block tags to newlines, strip
    every remaining tag, decode the six dominant entities (&amp; LAST so
    double-encoded text degrades deterministically), collapse horizontal
    whitespace, collapse newline runs (absorbing surrounding spaces), trim.
    Every step is RE2-compatible (no backreferences), so a SQL oracle
    reproduces the extraction byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?i)<br[^>]*>", "\n")
    s = F.regexp_replace(s, r"(?i)</(p|div|h[1-6]|li|tr|table|blockquote|ul|ol)>", "\n")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, ch in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"[ \t\x0B\f\r]+", " ")
    s = F.regexp_replace(s, " ?\n[ \n]*", "\n")
    return F.trim(s)


# Query params that identify tracking, not content — the standard crawl
# canonicalization drop list (utm_* campaign tags, click ids, referrers).
_TRACKING_PARAM_RE = "^(utm_[^=&#]*|gclid|fbclid|msclkid|ref|referrer)(=|$)"


def canonicalize_url(col) -> Column:
    """Crawl-style URL canonicalization as ONE chained JVM expression — the
    prerequisite for URL-keyed dedup / frontier dedup (two spellings of the
    same page must collide BEFORE the Bloom/exact-dedup key is built).

    Rules, in order: strip the fragment; lowercase scheme and authority
    (host casing is insignificant per RFC 3986, path casing is NOT —
    preserved); drop default ports (:80 for http, :443 for https); resolve
    ``/./`` and up to FOUR levels of ``/../`` dot segments (fixed-depth
    chain — full RFC resolution is iterative; deeper nesting, vanishingly
    rare in crawl URLs, passes through unresolved and still canonicalizes
    consistently); empty path becomes ``/``; tracking params
    (utm_*/gclid/fbclid/msclkid/ref/referrer) are removed by an array
    filter over the split query string — order of surviving params is
    PRESERVED (sorting would merge semantically different URLs whose
    servers are order-sensitive); an emptied query drops its ``?``.

    Everything is RE2-compatible (no backreferences, fixed-count
    repetition), so a SQL oracle reproduces the canonical form
    byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.substring_index(c, "#", 1)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", "")).otherwise(auth)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    path = F.substring_index(rest, "?", 1)
    # Dot segments, lookahead-free so RE2 (the oracle engine) matches Java
    # byte-for-byte.  '/./' twice (a global pass doesn't rescan its own
    # replacements, so '/././' needs two), then a trailing '/.'.
    path = F.regexp_replace(path, r"/\./", "/")
    path = F.regexp_replace(path, r"/\./", "/")
    path = F.regexp_replace(path, r"/\.$", "/")
    # '/seg/../' resolution: four innermost-first passes, then a trailing
    # '/seg/..'.  Deeper nesting passes through; '..' itself can match as
    # the segment, so chains ABOVE the root ('/../../') may over-collapse —
    # deterministic in both engines, documented, and irrelevant to real
    # crawl URLs (servers reject above-root paths anyway).
    for _ in range(4):
        path = F.regexp_replace(path, r"/[^/]+/\.\./", "/")
    path = F.regexp_replace(path, r"/[^/]+/\.\.$", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.substring(rest, F.instr(rest, "?") + F.lit(1), F.length(rest))
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_PARAM_RE),
    )
    keep_qs = rest.contains("?") & (F.size(params) > 0)
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(keep_qs, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(
            F.lit("")
        ),
    )


def filter_boilerplate_lines(
    text_col,
    min_tokens: int = 3,
    max_punct_pct: int = 50,
) -> Column:
    """Line-level boilerplate removal — the CCNet-style pass AFTER tag
    stripping (:func:`html_to_text`): drop lines that read as navigation /
    chrome rather than prose.  A line survives iff it has at least
    ``min_tokens`` whitespace tokens AND its non-letter/digit/space
    character count is at most ``max_punct_pct`` percent of its length
    (menus, separators and cookie banners are short or punctuation-dense).
    The ratio test is INTEGER cross-multiplication (punct·100 ≤ pct·len) —
    no float division, so the SQL oracle is exact and empty lines can't
    divide by zero.  One HOF filter over the split lines, reassembled with
    array_join — zero Python, zero shuffle, linear in bytes."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def keep(ln):
        toks = F.size(F.split(F.trim(ln), r"\s+"))
        punct = F.length(F.regexp_replace(ln, r"[\p{L}\p{N}\s]", ""))
        return (toks >= F.lit(min_tokens)) & (
            punct * F.lit(100) <= F.lit(max_punct_pct) * F.length(ln)
        )

    return F.array_join(F.filter(F.split(c, "\n"), keep), "\n")


def skipgram_cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Skip-gram co-occurrence PMI over a ±``window`` token context — the
    word2vec/GloVe-style co-occurrence statistic, generalizing
    :func:`bigram_pmi` beyond adjacency.  Returns the ``top`` unordered
    pairs (w1 ≤ w2, w1 ≠ w2) with count ≥ ``min_count`` by (PMI desc,
    w1, w2), with a rank column.  PMI = ln(c_pair · T / (c_w1 · c_w2))
    over the pair distribution (T = total pairs; marginals are pair-table
    re-aggregations, so they sum consistently with T).

    Plan: pair generation is NARROW — for each offset d in 1..window one
    zip_with over shifted slices of the per-row token array (the
    projected-column form; never element_at into an outer expression —
    see :func:`ngrams`), so the fan-out is a bounded ×window explode.
    ONE groupBy(w1, w2) pair count feeds everything; marginals and T are
    aggregations OF THAT TABLE (vocabulary-sized); final top-N is
    TakeOrdered.  The corpus is scanned once.
    """
    base = df.select(tokens(text_col).alias("_t"))
    t = F.col("_t")
    pair_arrays = []
    for d in range(1, window + 1):
        width = F.greatest(F.size(t) - d, F.lit(0))
        pair_arrays.append(
            F.zip_with(
                F.slice(t, 1, width),
                F.slice(t, d + 1, width),
                lambda a, b: F.struct(
                    F.least(a, b).alias("w1"), F.greatest(a, b).alias("w2")
                ),
            )
        )
    stream = base.select(
        F.explode(F.concat(*pair_arrays)).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).filter(
        F.col("w1") != F.col("w2")
    )
    pairs = stream.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    left = pairs.select(F.col("w1").alias("w"), "c_pair").unionAll(
        pairs.select(F.col("w2").alias("w"), "c_pair")
    )
    marg = left.groupBy("w").agg(F.sum("c_pair").alias("c_w"))
    total = pairs.agg(F.sum("c_pair").alias("_t"))
    scored = (
        pairs.filter(F.col("c_pair") >= min_count)
        .join(marg.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(marg.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c_pair").cast("long").alias("c_pair"),
            # double-cast both products — long×long wraps past 2^63 at
            # target corpus scale (see bigram_pmi)
            F.round(
                F.log(
                    F.col("c_pair").cast("double") * F.col("_t")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    from pyspark.sql import Window

    topn = scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(top)
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return topn.withColumn("pmi_rank", F.row_number().over(w))
