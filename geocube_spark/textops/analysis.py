"""Text-analysis operators for large-scale training-data pipelines.

All functions build JVM-side Column expressions (whole-stage codegen,
no Python workers in the hot path): tokenization, quality scoring,
language-ID, token counting, and document fingerprinting. At 100 TB
these run as narrow maps over the scan — no shuffle, filters push
down, and only the referenced columns are read.

The shared 60-bit string hash ``h60`` (first 15 hex chars of md5) is
deliberately engine-portable: DuckDB/Trino/Spark all reproduce it,
which keeps every downstream operator (minhash, simhash, LSH) oracle-
checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
BPE_ISH_RE = r"\w+|[^\w\s]"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is")

# language marker words for the n-gram/marker heuristic (deterministic,
# ASCII-only so Java regex and RE2 agree)
LANG_MARKERS = {
    "de": ("der", "die", "und", "ist"),
    "en": ("the", "and", "is", "of"),
    "es": ("el", "los", "y", "es"),
    "fr": ("le", "la", "et", "est"),
}


def h60(col: Column) -> Column:
    """Portable 60-bit hash: int(md5(s)[0:15], 16). Fits signed int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (array<string>)."""
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


def token_counts(col: Column):
    """(whitespace token count, BPE-ish regex token count)."""
    n_ws = F.size(tokens(col))
    n_re = F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))
    return n_ws, n_re


def shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined), for Jaccard/MinHash."""
    toks = tokens(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - (k - 1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def char_fingerprint(col: Column, width: int = 8) -> Column:
    """Rolling-hash document fingerprint: lexicographic min of the md5
    of every ``width``-char window (winnowing with window = whole doc).
    Identical docs -> identical fingerprint; any window shared is
    evidence of overlap."""
    return F.array_min(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.lit(1), F.length(col) - (width - 1))
            ),
            lambda i: F.md5(F.substring(col, i, width)),
        )
    )


def quality_metrics(col: Column) -> dict:
    """Quality-scoring columns: token count, mean token length,
    punctuation ratio, stopword ratio, and a boolean keep flag.

    Mirrors the length/punct/stopword heuristics used by web-corpus
    cleaning pipelines; all ratios rounded to 6 dp so results hash
    identically across engines."""
    toks = tokens(col)
    n_tok = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    n_punct = F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    n_chars = F.length(col)
    mean_tok = F.round(sum_len / n_tok, 6)
    punct_ratio = F.round(n_punct.cast("double") / n_chars, 6)
    stop_ratio = F.round(n_stop.cast("double") / n_tok, 6)
    keep = (
        (n_tok >= 5)
        & (mean_tok >= 2.0)
        & (mean_tok <= 12.0)
        & (punct_ratio <= 0.2)
    ).cast("int")
    return {
        "n_tokens": n_tok,
        "mean_token_len": mean_tok,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "keep": keep,
    }


def lang_scores(col: Column) -> dict:
    """Marker-word counts per language (word-boundary regex)."""
    return {
        lang: F.size(
            F.regexp_extract_all(
                F.lower(col), F.lit(r"\b(" + "|".join(ws) + r")\b"), 0
            )
        )
        for lang, ws in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language by marker score; ties break alphabetically
    (deterministic); all-zero scores -> 'und'."""
    scores = lang_scores(col)
    best = None
    for lang in sorted(scores):  # alphabetical: first max wins ties
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            best = (
                F.when(s > best[0], s).otherwise(best[0]),
                F.when(s > best[0], F.lit(lang)).otherwise(best[1]),
            )
    return F.when(best[0] > 0, best[1]).otherwise(F.lit("und"))


def tfidf_top_terms(df, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5):
    """Top-k TF-IDF terms per document — the classic corpus keyword /
    ranking primitive a training-data pipeline runs for topic
    filtering and near-dup triage.

    tf = term count within the document (whitespace tokens, the same
    tokenizer as :func:`token_counts`); idf = ln(N / df) with N the
    corpus size and df the number of documents containing the term;
    rank = row_number by (score desc, term asc) per document —
    deterministic under score ties.

    Plan: explode tokens -> ONE (doc, term) hash aggregate (combines
    map-side) -> the term document-frequency table (tiny: one row per
    distinct term) joins back on the term key -> per-doc window. The
    only driver action is the corpus-count scalar; everything else is
    JVM codegen — no Python, no crossJoin (N ships as a literal).

    Returns (id_col, term, tf, score, rank), rank <= k."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_docs = df.count()
    if n_docs == 0:
        raise ValueError("empty corpus")
    term_rows = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col)))
                  .alias("term"))
        .where(F.col("term") != "")
    )
    tf = term_rows.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    scored = tf.join(dfreq, "term").select(
        id_col, "term", "tf",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("dfreq")))
        .alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(id_col, "rank")
    )


def repetition_metrics(col: Column) -> dict:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, table A1 — the public "repetition removal" filter family):

    - ``dup_line_frac``      fraction of non-blank lines that are
                             repeats of an earlier line
                             (1 - distinct/total)
    - ``dup_line_char_frac`` fraction of line characters contained in
                             lines that occur more than once
    - ``top_2gram_char_frac`` fraction of document characters covered
                             by the most frequent word 2-gram
                             (count x gram length / doc length)
    - ``rep_keep``           1 when the document passes the published
                             thresholds (dup_line_frac <= 0.30,
                             top_2gram_char_frac <= 0.20)

    All pure JVM array expressions — a narrow map, no shuffle, no
    Python workers. The per-distinct-value occurrence counts are
    O(distinct x total) array scans per document; lines and 2-grams
    number in the hundreds for web documents, so the constant is
    small, and the work is per-row (embarrassingly parallel) at any
    corpus scale. Ratios round to 6 dp so results hash identically
    across engines (same convention as :func:`quality_metrics`).
    """
    lines = F.filter(
        F.split(col, r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    n_lines = F.size(lines)
    dlines = F.array_distinct(lines)
    dup_line_frac = F.round(
        F.when(
            n_lines > 0, 1.0 - F.size(dlines) / n_lines
        ).otherwise(F.lit(0.0)),
        6,
    )
    line_chars = F.aggregate(
        F.transform(lines, lambda l: F.length(l).cast("double")),
        F.lit(0.0), lambda a, x: a + x,
    )
    dup_chars = F.aggregate(
        F.transform(
            dlines,
            lambda l: F.when(
                F.size(F.filter(lines, lambda x: x == l)) > 1,
                (F.size(F.filter(lines, lambda x: x == l))
                 * F.length(l)).cast("double"),
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0), lambda a, x: a + x,
    )
    dup_line_char_frac = F.round(
        dup_chars / F.greatest(line_chars, F.lit(1.0)), 6
    )
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    top_chars = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda g: (F.size(F.filter(grams, lambda x: x == g))
                       * F.length(g)).cast("double"),
        )
    )
    top_2gram_char_frac = F.round(
        top_chars / F.greatest(F.length(col), F.lit(1)), 6
    )
    keep = (
        (dup_line_frac <= 0.30) & (top_2gram_char_frac <= 0.20)
    ).cast("int")
    return {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "top_2gram_char_frac": top_2gram_char_frac,
        "rep_keep": keep,
    }


def chunk_documents(df, max_tokens: int, overlap: int = 0, *,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split documents into fixed-size token windows with overlap —
    the context-window packing step every training pipeline runs
    before tokenizer-level batching.

    Whitespace tokens (the shared ``TOKEN_SPLIT_RE`` every text op
    uses), chunk ``i`` covering tokens ``[i*step, i*step+max_tokens)``
    with ``step = max_tokens - overlap``; the final partial window is
    kept; an empty document yields ONE empty chunk (so no doc silently
    disappears). Output: ``(id, chunk_id, n_tokens, chunk)`` with the
    chunk re-joined by single spaces (whitespace-normalized, like the
    token stream itself).

    Pure Catalyst: split -> sequence -> explode -> slice/array_join,
    all inside whole-stage codegen — a narrow per-row map at any
    corpus scale (each row fans out to its own chunk count; no
    shuffle, no Python)."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    ts = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    nt = F.size(ts)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((nt - F.lit(overlap)) / F.lit(float(step))).cast("int"),
    )
    out = (
        df.select(
            F.col(id_col).alias("id"), ts.alias("__ts"),
            nt.alias("__nt"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
            .alias("chunk_id", "__ci"),
        )
        .select(
            "id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.greatest(
                F.lit(0),
                F.least(F.lit(max_tokens),
                        F.col("__nt") - F.col("chunk_id") * step),
            ).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__ts"),
                        F.col("chunk_id") * step + 1, max_tokens),
                " ",
            ).alias("chunk"),
        )
    )
    return out


def lm_perplexity(df, *, n: int = 3, alpha: float = 0.1,
                  id_col: str = "doc_id", text_col: str = "text",
                  ref=None):
    """Character n-gram language-model scoring — the CCNet-style
    quality signal ("CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data", Wenzek et al. 2020, which
    thresholds corpus perplexity under a reference LM; here the LM is
    an add-alpha-smoothed char n-gram model so the whole thing is a
    closed-form function of the corpus and replays in SQL).

    Model, over ``lower(text)``:

        P(c | ctx) = (count(ctx·c) + alpha) / (count(ctx) + alpha*V)

    with counts from the reference corpus (``ref``, default: the
    scored corpus itself), ``ctx`` the (n-1)-char context,
    ``count(ctx) = sum_c count(ctx·c)`` (derived from the n-gram
    table, so the model is properly normalized), and ``V`` the number
    of distinct continuation characters seen in the reference.

    Returns (id, n_windows, avg_logp, perplexity): ``avg_logp`` is
    the mean log10 probability over the doc's n-char windows (rounded
    6 dp), ``perplexity = 10^(-avg_logp)`` rounded 4 dp. Documents
    shorter than ``n`` chars have 0 windows, avg_logp 0, perplexity 1.

    Scale shape: the n-gram and context count tables are bounded by
    |charset|^n (a few hundred thousand rows for ASCII trigrams, ~KB
    to MB) — Spark broadcasts them, so scoring a 100 TB corpus is one
    map-side-combined count aggregate over the reference plus one
    broadcast-join scan over the corpus: no wide shuffle carries
    document text. Per-position Python never runs; everything is
    Catalyst (transform/sequence/substring + joins)."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if ref is None:
        ref = df
    norm = F.lower(F.col(text_col))
    # sequence(1, stop) DESCENDS when stop < 1, so docs shorter than
    # n chars must short-circuit to an empty window array.
    grams = F.when(
        F.length(norm) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: F.substring(norm, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    ref_grams = ref.select(F.explode(grams).alias("g"))
    ngram_counts = ref_grams.groupBy("g").agg(
        F.count(F.lit(1)).alias("cg"))
    ctx_counts = ngram_counts.groupBy(
        F.substring("g", 1, n - 1).alias("ctx")
    ).agg(F.sum("cg").alias("cctx"))
    vocab = ngram_counts.select(
        F.countDistinct(F.substring("g", n, 1)).alias("v"))

    occ = df.select(F.col(id_col).alias("id"),
                    F.explode(grams).alias("g"))
    scored = (
        occ.join(F.broadcast(ngram_counts), "g", "left")
        .withColumn("ctx", F.substring("g", 1, n - 1))
        .join(F.broadcast(ctx_counts), "ctx", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log10(
                (F.coalesce(F.col("cg"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("cctx"), F.lit(0))
                   + F.lit(alpha) * F.col("v"))
            ),
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_windows"),
             F.round(F.avg("logp"), 6).alias("avg_logp"))
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("avg_logp", F.lit(0.0)).alias("avg_logp"),
            F.round(
                F.pow(F.lit(10.0),
                      -F.coalesce("avg_logp", F.lit(0.0))), 4
            ).alias("perplexity"),
        )
    )


def char_entropy(df, *, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Shannon character entropy in bits/char — the cheap
    noise/boilerplate signal quality pipelines threshold alongside
    the Gopher rules (very low entropy = repeated filler or binary
    junk, very high = encrypted/garbled bytes): ``H = -sum_c p_c
    log2 p_c`` over the document's character frequencies.

    Arrow-batched numpy unique-count per document — ZERO shuffle (the
    whole corpus maps in place), unlike the explode+groupBy shape a
    SQL engine needs; the DuckDB oracle replays exactly that explode
    and the two agree at 6 dp (float-order differences only).

    Returns (id, n_chars, entropy); an empty document scores 0.0."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
    ])

    def _ent(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids, ns, hs = [], [], []
            for rid, text in zip(pdf["id"].values, pdf["t"].values):
                t = text or ""
                if not t:
                    ids.append(int(rid))
                    ns.append(0)
                    hs.append(0.0)
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                )
                _, cnt = np.unique(codes, return_counts=True)
                p = cnt / len(codes)
                ids.append(int(rid))
                ns.append(len(codes))
                hs.append(float(np.round(-(p * np.log2(p)).sum()
                                         + 1e-9, 6)))
            yield pd.DataFrame({"id": ids, "n_chars": ns,
                                "entropy": hs})

    base = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(text_col).alias("t"))
    return base.mapInPandas(_ent, schema=out_schema)


def token_ngram_counts(df, *, n: int = 2, min_count: int = 1,
                       id_col: str = "doc_id",
                       text_col: str = "text"):
    """Corpus token n-gram count table — the LM-training-data /
    contamination-analysis primitive (the token-level sibling of
    ``lm_perplexity``'s char tables): every n-token window of the
    shared whitespace token stream, with total occurrences and the
    document frequency. Returns (ngram, count, n_docs), filtered to
    ``count >= min_count``.

    Pure Catalyst: tokens -> sliding windows (transform over a
    sequence) -> explode -> ONE aggregate; the count combines
    map-side, the document frequency rides the same shuffle as a
    count(DISTINCT id) partial. Shuffle rows are (ngram, id) — never
    text bodies."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    ts = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    wins = F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1),
                                            F.size(ts) - (n - 1))),
            lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = df.select(
        F.col(id_col).alias("id"), F.explode(wins).alias("ngram")
    )
    out = occ.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("count"),
        F.countDistinct("id").alias("n_docs"),
    )
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out
