"""Text-analysis operators for training-data pipelines (driver mandate):
quality scoring, token counting (whitespace + BPE-ish regex), language-ID
heuristic, document fingerprinting. All built-in expressions except nothing —
zero UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cliner_spark.tokenization import tokens_col

STOPWORDS = ("the", "a", "and", "of", "to", "in", "was", "on", "with")

# BPE-ish pre-tokenization: letter runs, digit runs, or single non-space symbol
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    bpe_tokens = F.size(F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_REGEX), F.lit(0)))
    return df.select(
        F.col(id_col),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        bpe_tokens.cast("bigint").alias("n_bpe_tokens"),
        F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)).alias("stopword_ratio"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Global lowercase token frequencies (A3 vocab build)."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("tok"))
        .select(F.lower("tok").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def language_id(text: Column) -> Column:
    """Tiny n-gram/stopword language heuristic (en/es/de/fr fallback 'und').

    This is a real (if crude) detector for latin-script text; the synthetic
    corpus has uniform vocabulary so it is exercised by unit tests on
    hand-written multilingual samples rather than the oracle tables.
    """
    t = F.concat(F.lit(" "), F.lower(F.coalesce(text, F.lit(""))), F.lit(" "))

    def hits(words: list[str]) -> Column:
        c = F.lit(0)
        for w in words:
            c = c + F.when(t.contains(f" {w} "), 1).otherwise(0)
        return c

    en = hits(["the", "and", "of", "is", "was", "with"])
    es = hits(["el", "la", "los", "las", "que", "y"])
    de = hits(["der", "die", "das", "und", "ist", "nicht"])
    fr = hits(["le", "la", "les", "et", "est", "une"])
    best = F.greatest(en, es, de, fr)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def rolling_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 over normalized text plus a
    cheap 63-bit polynomial rolling hash of token lengths (both engines can
    reproduce the arithmetic exactly)."""
    toks = tokens_col(text_col)
    # modulus 2^31-1 keeps acc*1000003 < 2^52: no bigint overflow (ANSI mode)
    poly = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * F.lit(1000003) + x, F.lit(2**31 - 1)),
    )
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.concat_ws(" ", toks))).alias("fp"),
        poly.alias("len_hash"),
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    computed per document with ZERO shuffles and zero UDFs:

      dup2_frac  — fraction of bigram characters inside bigrams occurring
                   ≥2× in the doc (chars weighted by occurrence count)
      top2_frac  — character share of the single most frequent bigram
      max_run    — longest run of consecutive identical tokens

    Instead of explode + groupBy(doc, gram) — which shuffles corpus-sized
    n-gram rows — the bigram array is array_sort'ed per row and folded with
    one aggregate() pass (equal grams are adjacent after the sort), so the
    whole computation stays inside the row's whole-stage-codegen stage.
    That is the difference between a per-doc map pass and a corpus-wide
    shuffle at 100 TB.
    """
    toks = F.transform(tokens_col(text_col), lambda t: F.lower(t))
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = F.array_sort(grams)

    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("dup"),
        zero.alias("top"),
        zero.alias("tot"),
    )

    def merge(acc, x):
        is_same = x == acc["prev"]
        flush = acc["run"] * F.length(acc["prev"])  # chars of the ended run
        return F.struct(
            x.alias("prev"),
            F.when(is_same, acc["run"] + 1).otherwise(one).alias("run"),
            (
                acc["dup"]
                + F.when(~is_same & (acc["run"] >= 2), flush).otherwise(zero)
            ).alias("dup"),
            F.greatest(
                acc["top"], F.when(~is_same, flush).otherwise(zero)
            ).alias("top"),
            (acc["tot"] + F.length(x)).alias("tot"),
        )

    def finish(acc):
        flush = acc["run"] * F.length(acc["prev"])
        return F.struct(
            (
                acc["dup"] + F.when(acc["run"] >= 2, flush).otherwise(zero)
            ).alias("dup"),
            F.greatest(acc["top"], flush).alias("top"),
            acc["tot"].alias("tot"),
        )

    rep = F.aggregate(sg, init, merge, finish)

    init_r = F.struct(F.lit("").alias("prev"), zero.alias("run"), zero.alias("mx"))

    def merge_r(acc, x):
        newrun = F.when(x == acc["prev"], acc["run"] + 1).otherwise(one)
        return F.struct(
            x.alias("prev"), newrun.alias("run"), F.greatest(acc["mx"], newrun).alias("mx")
        )

    max_run = F.aggregate(toks, init_r, merge_r, lambda acc: acc["mx"])

    frac = lambda num: F.round(  # noqa: E731
        F.when(rep["tot"] > 0, num.cast("double") / rep["tot"]).otherwise(F.lit(0.0)), 6
    )
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        frac(rep["dup"]).alias("dup2_frac"),
        frac(rep["top"]).alias("top2_frac"),
        max_run.alias("max_run"),
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k terms per document by tf-idf (retrieval/feature-selection op).

    score = tf * ln((N + 1) / (df + 1)), rounded to 6 decimals so the value
    is reproducible bit-for-bit across engines and partition orders.
    Deterministic tie-break (score desc, term asc). Scale shape: tf is one
    shuffle on (doc, term) with map-side combine; df is an aggregation of
    the tf table (no second pass over text); N is a driver-free scalar
    carried via a 1-row crossJoin (broadcast — no collect); top-k is a
    row_number window partitioned by doc — no global sort.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("term")
    ).select(F.col(id_col), F.lower("term").alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1).cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "score", "rk")
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set (Robertson/Sparck
    Jones; the retrieval scorer a training-data search index runs).

      idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
      s(d, t)    = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
      score(d)   = sum over query terms, each term score rounded to 6
                   decimals and summed as DECIMAL so the total is exact and
                   partition-order independent.

    Scale shape: the query-term filter is applied BEFORE the tf shuffle
    (isin over a literal list — pushed into the scan stage), so only rows
    matching the query ever shuffle; df/avgdl/N are tiny aggregates carried
    by broadcast crossJoins; final top-k is one row_number window over the
    scored docs (cardinality <= docs containing any query term).
    """
    from pyspark.sql import Window

    qt = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("term")
    ).select(F.col(id_col), F.lower("term").alias("term"))
    # doc length BEFORE the query filter (BM25 norm uses full doc length)
    dl = df.select(
        F.col(id_col), F.size(tokens_col(text_col)).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qtoks = toks.filter(F.col("term").isin(*qt))
    tf = qtoks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    term_score = F.round(idf * F.col("tf") * (k1 + 1) / denom, 6)
    scored = (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("s", term_score.cast("decimal(38,6)"))
        .groupBy(id_col)
        .agg(F.sum("s").cast("double").alias("score"))
    )
    # top-k as orderBy+limit -> TakeOrderedAndProject (per-partition heap +
    # driver merge of k rows), NOT a row_number window that would shuffle
    # every scored doc into a single partition; the rank window then runs
    # over just the k survivors.
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        topk.withColumn("rk", F.row_number().over(w))
        .select(id_col, "score", "rk")
    )


def heavy_hitters(
    df: DataFrame,
    phi: float = 0.01,
    capacity: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Exact phi-heavy hitters (tokens with count > phi * total) via the
    two-pass sketch-then-verify pattern that survives 100 TB:

      pass 1 — per-partition Misra-Gries summaries (capacity = 2/phi) built
        inside one mapInPandas stage; batch counts merge via the mergeable-
        summaries rule (sum counts, subtract the (k+1)-th largest, drop <=0),
        so the per-partition error stays <= n_p/capacity. Any token with
        global count > phi*N has, in at least one partition, local count
        > phi*n_p > n_p/capacity, so the UNION of summaries is a superset of
        every true heavy hitter — no false negatives by construction.
      pass 2 — exact recount of ONLY the candidate set (broadcast semi-join
        on the exploded tokens) and the final threshold filter (the global
        token total is carried out of pass 1 as per-partition subtotal rows,
        so the denominator costs no extra scan), so the
        OUTPUT is exact and engine-deterministic even though the sketch is
        approximate. Candidates number <= partitions * capacity (tiny), vs a
        full vocab groupBy whose shuffle carries every distinct token.

    Returns (tok, n) for tokens with n > phi * total_tokens, lowercase.
    """
    import pandas as pd

    k = capacity or max(8, int(2.0 / phi))
    toks = df.select(F.explode(tokens_col(text_col)).alias("tok")).select(
        F.lower("tok").alias("tok")
    )

    def mg_partition(batches):
        summary = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            counts = pdf["tok"].value_counts()
            summary = summary.add(counts, fill_value=0).astype("int64")
            if len(summary) > k:
                # mergeable-summaries prune (Agarwal et al.): subtract the
                # (k+1)-th largest count from EVERY entry, keep > 0. The
                # subtraction (not a bare tail drop) is what bounds the total
                # undercount at n_p/(k+1), which the superset guarantee needs.
                cut = summary.nlargest(k + 1).iloc[-1]
                summary = summary - cut
                summary = summary[summary > 0]
        # the partition's token total rides along as a tok=NULL row, so the
        # global N needs no separate full scan (pass 1 produces both the
        # candidate superset AND the denominator)
        yield pd.DataFrame(
            {
                "tok": list(summary.index.astype(str)) + [None],
                "part_total": [0] * len(summary) + [n_part],
            }
        )

    sketch = toks.mapInPandas(
        mg_partition, schema="tok string, part_total bigint"
    ).localCheckpoint(eager=True)  # tiny (partitions x capacity); read twice
    candidates = sketch.filter(F.col("tok").isNotNull()).select("tok").distinct()
    total = sketch.agg(F.sum("part_total").alias("total"))
    return (
        toks.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n").cast("double") > F.lit(phi) * F.col("total").cast("double"))
        .select("tok", "n")
    )
