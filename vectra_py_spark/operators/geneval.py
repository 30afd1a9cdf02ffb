"""Generation-quality evaluation — BLEU and ROUGE over (candidate,
reference) text pairs, the generation counterpart of the retrieval
evaluator (`operators/evalmetrics.py`): a training-data pipeline that
mines parallel/caption/summary pairs (bitext mining, subtitle
alignment, image-text pairs — all in this repo) needs the standard
overlap metrics to grade those pairs and to evaluate models trained on
them, in the engine, at corpus scale. Conventions:

* BLEU — Papineni et al. 2002. Per-pair ("sentence") BLEU with
  modified n-gram precision (candidate counts clipped by reference
  counts), uniform 1/N weights up to ``max_n``, and the brevity
  penalty ``min(1, e^(1−r/c))``. Smoothing is Chen & Cherry (2014)
  method 1 applied from n ≥ 2: ``p_n = (clip_n + 1) / (total_n + 1)``
  — p₁ stays raw so a candidate with zero unigram overlap scores 0.
  ``bleu_corpus`` is TRUE corpus BLEU: counts and lengths aggregate
  over all pairs first, one formula at the end (not a mean of
  sentence scores).
* ROUGE-N — Lin 2004: n-gram overlap recall/precision/F1.
* ROUGE-L — Lin 2004: LCS-based recall/precision/F1. The LCS dynamic
  program is inherently per-pair sequential, the one genuinely
  non-relational step — it runs as an Arrow-batched ``mapInPandas``
  (never row-at-a-time Python), O(|c|·|r|) per pair, with a
  ``max_tokens`` truncation bound (default 1024 tokens a side) so a
  pathological document pair is a capped cost, not a straggler.

Tokenization matches the repo-wide text conventions
(`operators/text_analysis.py::words_col`): lowercase, split on
``\\s+``, with the empty/blank string mapping to ZERO tokens in both
engines (guarded identically in the SQL twins).

Scale shape (BLEU/ROUGE-N): one generator explode per side into
(id, n, gram) rows — ~``max_n``× token count — then one partial-
aggregated groupBy per side on (id, n, gram) and one equi-join on the
same key; the per-pair pivot is a second aggregate on the id key.
Text payloads never shuffle; only grams and counts do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bleu_pairs",
    "bleu_pairs_sql",
    "bleu_corpus",
    "rouge_n_pairs",
    "rouge_n_pairs_sql",
    "rouge_l_pairs",
    "chrf_pairs",
    "chrf_pairs_sql",
]

_DP = 6


def _words(col: Column) -> Column:
    """Lowercased whitespace tokens; blank → empty array (Spark's
    split('') would yield [''])."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(t), r"\s+")
    )


def _words_sql(expr: str) -> str:
    return (
        rf"CASE WHEN trim(coalesce({expr}, '')) = '' THEN []::VARCHAR[] "
        rf"ELSE string_split_regex(lower(trim({expr})), '\s+') END"
    )


def _tagged_grams(words: Column, max_n: int, min_n: int = 1) -> Column:
    """array<struct<n:int,gram:string>> — all min_n..max_n grams, with
    multiplicity (BLEU clips on counts, so duplicates matter)."""
    empty = F.array().cast("array<struct<n:int,gram:string>>")

    def gram_at(n: int):
        # one-arg lambda ONLY: a second arg would be read by transform
        # as the (element, index) signature and shadow n
        return lambda i: F.struct(
            F.lit(n).cast("int").alias("n"),
            F.concat_ws(" ", F.slice(words, i, n)).alias("gram"),
        )

    parts = [
        # sequence(1, 0) would DESCEND ([1, 0]); short texts need an
        # explicit empty-array branch
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - n + 1), gram_at(n)
            ),
        ).otherwise(empty)
        for n in range(min_n, max_n + 1)
    ]
    return F.flatten(F.array(*parts))


def _gram_counts(
    df: DataFrame, id_col: str, text_col: str, max_n: int, out: str,
    min_n: int = 1,
) -> DataFrame:
    """(id, n, gram, <out>) counts for one side."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                _tagged_grams(_words(F.col(text_col)), max_n, min_n)
            ).alias("_g"),
        )
        .groupBy("_id", F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).cast("bigint").alias(out))
    )


def _pair_tables(
    df: DataFrame, id_col: str, cand_col: str, ref_col: str, max_n: int
):
    """Shared scaffolding: per-pair lengths + per-(id, n) clipped/total
    candidate-gram sums."""
    lens = df.select(
        F.col(id_col).alias("_id"),
        F.size(_words(F.col(cand_col))).cast("bigint").alias("cand_len"),
        F.size(_words(F.col(ref_col))).cast("bigint").alias("ref_len"),
    )
    cc = _gram_counts(df, id_col, cand_col, max_n, "c")
    rc = _gram_counts(df, id_col, ref_col, max_n, "r")
    # both sides are corpus-sized (one row per distinct pair-gram);
    # broadcasting either is never right at scale, and size estimates
    # over synthesized/exotic inputs can fool the planner into it —
    # pin the shuffle join
    joined = cc.join(rc.hint("merge"), ["_id", "n", "gram"], "left").select(
        "_id", "n",
        F.col("c"),
        F.least(F.col("c"), F.coalesce(F.col("r"), F.lit(0))).alias("clip"),
    )
    per_n = joined.groupBy("_id", "n").agg(
        F.sum("clip").cast("bigint").alias("clip"),
        F.sum("c").cast("bigint").alias("total"),
    )
    return lens, per_n


def bleu_pairs(
    df: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    max_n: int = 4,
) -> DataFrame:
    """Per-pair sentence BLEU: (pair_id, cand_len, ref_len, p1..p<N>,
    brevity_penalty, bleu), all floats rounded to 6 dp. A candidate
    with no tokens or zero unigram overlap scores 0."""
    lens, per_n = _pair_tables(df, id_col, cand_col, ref_col, max_n)
    aggs = []
    for n in range(1, max_n + 1):
        aggs.append(
            F.sum(F.when(F.col("n") == n, F.col("clip")).otherwise(0))
            .alias(f"_clip{n}")
        )
        aggs.append(
            F.sum(F.when(F.col("n") == n, F.col("total")).otherwise(0))
            .alias(f"_tot{n}")
        )
    per_id = per_n.groupBy("_id").agg(*aggs)
    # per-pair cardinality on both sides — same no-broadcast rule
    out = lens.join(per_id.hint("merge"), "_id", "left")
    ps = []
    for n in range(1, max_n + 1):
        clip = F.coalesce(F.col(f"_clip{n}"), F.lit(0))
        tot = F.coalesce(F.col(f"_tot{n}"), F.lit(0))
        if n == 1:
            p = F.when(tot > 0, clip / tot).otherwise(F.lit(0.0))
        else:
            p = (clip + 1.0) / (tot + 1.0)
        ps.append(p.alias(f"_p{n}"))
    out = out.select("_id", "cand_len", "ref_len", *ps)
    bp = (
        F.when(F.col("cand_len") >= F.col("ref_len"), F.lit(1.0))
        .when(
            F.col("cand_len") > 0,
            F.exp(1.0 - F.col("ref_len") / F.col("cand_len")),
        )
        .otherwise(F.lit(0.0))
    )
    logsum = None
    for n in range(1, max_n + 1):
        term = F.log(F.col(f"_p{n}"))
        logsum = term if logsum is None else logsum + term
    bleu = F.when(
        (F.col("_p1") > 0) & (F.col("cand_len") > 0),
        bp * F.exp(logsum / float(max_n)),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        "cand_len",
        "ref_len",
        *[F.round(F.col(f"_p{n}"), _DP).alias(f"p{n}")
          for n in range(1, max_n + 1)],
        F.round(bp, _DP).alias("brevity_penalty"),
        F.round(bleu, _DP).alias("bleu"),
    )


def bleu_pairs_sql(
    table: str = "pairs",
    id_expr: str = "pair_id",
    cand_expr: str = "candidate",
    ref_expr: str = "reference",
    max_n: int = 4,
) -> str:
    """DuckDB twin of :func:`bleu_pairs` — same tokens, same clipping,
    same smoothing, same rounding."""
    cw, rw = _words_sql(cand_expr), _words_sql(ref_expr)

    def grams(words_sql: str, out: str) -> str:
        per_n = "\n            UNION ALL\n".join(
            f"            SELECT _id, {n} AS n,"
            f" array_to_string(w[i:i+{n - 1}], ' ') AS gram"
            f" FROM words, LATERAL unnest("
            f"range(1, greatest(len(w) - {n - 1}, 0) + 1)) AS t(i)"
            for n in range(1, max_n + 1)
        )
        return f"""
            SELECT _id, n, gram, count(*) AS {out} FROM (
{per_n}
            ) GROUP BY _id, n, gram"""

    p_cols = []
    for n in range(1, max_n + 1):
        clip = (f"coalesce(sum(CASE WHEN n = {n} THEN clip END), 0)")
        tot = (f"coalesce(sum(CASE WHEN n = {n} THEN total END), 0)")
        if n == 1:
            p_cols.append(
                f"CASE WHEN {tot} > 0 THEN {clip} * 1.0 / {tot}"
                f" ELSE 0.0 END AS _p{n}"
            )
        else:
            p_cols.append(f"({clip} + 1.0) / ({tot} + 1.0) AS _p{n}")
    log_sum = " + ".join(f"ln(_p{n})" for n in range(1, max_n + 1))
    p_out = ", ".join(
        f"round(_p{n}, {_DP}) + 0.0 AS p{n}" for n in range(1, max_n + 1)
    )
    return f"""
        WITH words AS (
            SELECT {id_expr} AS _id, {cw} AS w, {rw} AS rw FROM {table}
        ),
        lens AS (
            SELECT _id, CAST(len(w) AS BIGINT) AS cand_len,
                   CAST(len(rw) AS BIGINT) AS ref_len
            FROM words
        ),
        cc AS ({grams('w', 'c')}),
        rcw AS (SELECT _id, rw AS w FROM words),
        rc AS ({grams('w', 'r').replace('FROM words', 'FROM rcw')}),
        per_n AS (
            SELECT cc._id, cc.n,
                   sum(least(cc.c, coalesce(rc.r, 0))) AS clip,
                   sum(cc.c) AS total
            FROM cc LEFT JOIN rc
              ON cc._id = rc._id AND cc.n = rc.n AND cc.gram = rc.gram
            GROUP BY cc._id, cc.n
        ),
        per_id AS (
            SELECT _id, {', '.join(p_cols)}
            FROM per_n GROUP BY _id
        ),
        scored AS (
            SELECT l._id, l.cand_len, l.ref_len,
                   {', '.join(f'coalesce(p._p{n}, ' + ('0.0' if n == 1 else '1.0') + f') AS _p{n}' for n in range(1, max_n + 1))}
            FROM lens l LEFT JOIN per_id p ON l._id = p._id
        )
        SELECT _id AS {id_expr}, cand_len, ref_len, {p_out},
               round(CASE WHEN cand_len >= ref_len THEN 1.0
                          WHEN cand_len > 0
                            THEN exp(1.0 - ref_len * 1.0 / cand_len)
                          ELSE 0.0 END, {_DP}) + 0.0 AS brevity_penalty,
               round(CASE WHEN _p1 > 0 AND cand_len > 0
                          THEN (CASE WHEN cand_len >= ref_len THEN 1.0
                                     ELSE exp(1.0 - ref_len * 1.0 / cand_len)
                                END) * exp(({log_sum}) / {float(max_n)})
                          ELSE 0.0 END, {_DP}) + 0.0 AS bleu
        FROM scored
    """


def bleu_corpus(
    df: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    max_n: int = 4,
) -> DataFrame:
    """TRUE corpus BLEU — ONE row (n_pairs, cand_tokens, ref_tokens,
    p1..p<N>, brevity_penalty, bleu): clipped counts and lengths
    aggregate over the whole corpus before the formula (Papineni's
    definition; NOT a mean of sentence BLEUs). Integer count sums are
    order-free, so the result is engine- and partitioning-exact up to
    the final rounded formula."""
    lens, per_n = _pair_tables(df, id_col, cand_col, ref_col, max_n)
    tot_lens = lens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("cand_len").cast("bigint").alias("cand_tokens"),
        F.sum("ref_len").cast("bigint").alias("ref_tokens"),
    )
    aggs = []
    for n in range(1, max_n + 1):
        aggs.append(
            F.sum(F.when(F.col("n") == n, F.col("clip")).otherwise(0))
            .cast("bigint").alias(f"_clip{n}")
        )
        aggs.append(
            F.sum(F.when(F.col("n") == n, F.col("total")).otherwise(0))
            .cast("bigint").alias(f"_tot{n}")
        )
    counts = per_n.agg(*aggs)
    out = tot_lens.crossJoin(counts)  # two one-row frames
    ps = []
    for n in range(1, max_n + 1):
        clip, tot = F.col(f"_clip{n}"), F.col(f"_tot{n}")
        if n == 1:
            p = F.when(tot > 0, clip / tot).otherwise(F.lit(0.0))
        else:
            p = (clip + 1.0) / (tot + 1.0)
        ps.append(p.alias(f"_p{n}"))
    out = out.select(
        "n_pairs", "cand_tokens", "ref_tokens", *ps
    )
    bp = (
        F.when(F.col("cand_tokens") >= F.col("ref_tokens"), F.lit(1.0))
        .when(
            F.col("cand_tokens") > 0,
            F.exp(1.0 - F.col("ref_tokens") / F.col("cand_tokens")),
        )
        .otherwise(F.lit(0.0))
    )
    logsum = None
    for n in range(1, max_n + 1):
        term = F.log(F.col(f"_p{n}"))
        logsum = term if logsum is None else logsum + term
    bleu = F.when(
        (F.col("_p1") > 0) & (F.col("cand_tokens") > 0),
        bp * F.exp(logsum / float(max_n)),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_pairs", "cand_tokens", "ref_tokens",
        *[F.round(F.col(f"_p{n}"), _DP).alias(f"p{n}")
          for n in range(1, max_n + 1)],
        F.round(bp, _DP).alias("brevity_penalty"),
        F.round(bleu, _DP).alias("bleu"),
    )


def rouge_n_pairs(
    df: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    n: int = 1,
) -> DataFrame:
    """Per-pair ROUGE-N: (pair_id, overlap, cand_ngrams, ref_ngrams,
    precision, recall, f1) — clipped n-gram overlap; recall divides by
    the REFERENCE gram count (ROUGE's defining orientation)."""
    cc = _gram_counts(df, id_col, cand_col, n, "c", min_n=n)
    rc = _gram_counts(df, id_col, ref_col, n, "r", min_n=n)
    # corpus-sized both sides; pin the shuffle join (see bleu_pairs)
    j = cc.join(rc.hint("merge"), ["_id", "n", "gram"], "full").groupBy("_id").agg(
        F.sum(
            F.least(F.coalesce("c", F.lit(0)), F.coalesce("r", F.lit(0)))
        ).cast("bigint").alias("overlap"),
        F.sum(F.coalesce("c", F.lit(0))).cast("bigint").alias("cand_ngrams"),
        F.sum(F.coalesce("r", F.lit(0))).cast("bigint").alias("ref_ngrams"),
    )
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    out = ids.join(j.hint("merge"), "_id", "left").select(
        "_id",
        F.coalesce("overlap", F.lit(0)).alias("overlap"),
        F.coalesce("cand_ngrams", F.lit(0)).alias("cand_ngrams"),
        F.coalesce("ref_ngrams", F.lit(0)).alias("ref_ngrams"),
    )
    prec = F.when(
        F.col("cand_ngrams") > 0, F.col("overlap") / F.col("cand_ngrams")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("ref_ngrams") > 0, F.col("overlap") / F.col("ref_ngrams")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        "overlap", "cand_ngrams", "ref_ngrams",
        F.round(prec, _DP).alias("precision"),
        F.round(rec, _DP).alias("recall"),
        F.round(f1, _DP).alias("f1"),
    )


def rouge_n_pairs_sql(
    table: str = "pairs",
    id_expr: str = "pair_id",
    cand_expr: str = "candidate",
    ref_expr: str = "reference",
    n: int = 1,
) -> str:
    """DuckDB twin of :func:`rouge_n_pairs`."""
    cw, rw = _words_sql(cand_expr), _words_sql(ref_expr)

    def grams(src: str, out: str) -> str:
        return f"""
            SELECT _id, array_to_string(w[i:i+{n - 1}], ' ') AS gram,
                   count(*) AS {out}
            FROM {src}, LATERAL unnest(
                range(1, greatest(len(w) - {n - 1}, 0) + 1)) AS t(i)
            GROUP BY _id, gram"""

    return f"""
        WITH cwords AS (SELECT {id_expr} AS _id, {cw} AS w FROM {table}),
        rwords AS (SELECT {id_expr} AS _id, {rw} AS w FROM {table}),
        cc AS ({grams('cwords', 'c')}),
        rc AS ({grams('rwords', 'r')}),
        j AS (
            SELECT coalesce(cc._id, rc._id) AS _id,
                   sum(least(coalesce(cc.c, 0), coalesce(rc.r, 0)))
                       AS overlap,
                   sum(coalesce(cc.c, 0)) AS cand_ngrams,
                   sum(coalesce(rc.r, 0)) AS ref_ngrams
            FROM cc FULL OUTER JOIN rc
              ON cc._id = rc._id AND cc.gram = rc.gram
            GROUP BY coalesce(cc._id, rc._id)
        ),
        base AS (
            SELECT i._id,
                   CAST(coalesce(j.overlap, 0) AS BIGINT) AS overlap,
                   CAST(coalesce(j.cand_ngrams, 0) AS BIGINT)
                       AS cand_ngrams,
                   CAST(coalesce(j.ref_ngrams, 0) AS BIGINT) AS ref_ngrams
            FROM (SELECT DISTINCT {id_expr} AS _id FROM {table}) i
            LEFT JOIN j ON i._id = j._id
        )
        SELECT _id AS {id_expr}, overlap, cand_ngrams, ref_ngrams,
               round(CASE WHEN cand_ngrams > 0
                          THEN overlap * 1.0 / cand_ngrams ELSE 0.0 END,
                     {_DP}) + 0.0 AS precision,
               round(CASE WHEN ref_ngrams > 0
                          THEN overlap * 1.0 / ref_ngrams ELSE 0.0 END,
                     {_DP}) + 0.0 AS recall,
               round(CASE WHEN (CASE WHEN cand_ngrams > 0
                                     THEN overlap * 1.0 / cand_ngrams
                                     ELSE 0.0 END)
                        + (CASE WHEN ref_ngrams > 0
                                THEN overlap * 1.0 / ref_ngrams
                                ELSE 0.0 END) > 0
                          THEN 2.0 * (overlap * 1.0 / cand_ngrams)
                               * (overlap * 1.0 / ref_ngrams)
                               / ((overlap * 1.0 / cand_ngrams)
                                  + (overlap * 1.0 / ref_ngrams))
                          ELSE 0.0 END, {_DP}) + 0.0 AS f1
        FROM base
    """


def _char_grams(s: Column, max_n: int) -> Column:
    """array<struct<n:int,gram:string>> of character n-grams over a
    whitespace-stripped lowercase string (the chrF preprocessing)."""
    empty = F.array().cast("array<struct<n:int,gram:string>>")

    def gram_at(n: int):
        return lambda i: F.struct(
            F.lit(n).cast("int").alias("n"),
            s.substr(i, F.lit(n)).alias("gram"),
        )

    parts = [
        F.when(
            F.length(s) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(s) - n + 1), gram_at(n)
            ),
        ).otherwise(empty)
        for n in range(1, max_n + 1)
    ]
    return F.flatten(F.array(*parts))


def chrf_pairs(
    df: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    max_n: int = 6,
    beta: float = 2.0,
) -> DataFrame:
    """Per-pair chrF (Popović 2015): (pair_id, chr_p, chr_r, chrf) —
    clipped character n-gram precision/recall averaged over orders
    1..max_n (orders whose side has no grams are skipped, the
    reference implementation's convention), combined as
    F_β = (1+β²)·P·R / (β²·P + R) with β = 2 (recall-weighted, the
    published default). Preprocessing: lowercase, ALL whitespace
    stripped — so tokenization never matters, chrF's selling point.

    Same scale shape as BLEU: one char-gram explode per side (~max_n ×
    char count rows), two partial-aggregated groupBys, one
    (id, n, gram) equi-join pinned to shuffle."""
    strip = lambda c: F.regexp_replace(  # noqa: E731
        F.lower(F.coalesce(c, F.lit(""))), r"\s+", ""
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        strip(F.col(cand_col)).alias("_c"),
        strip(F.col(ref_col)).alias("_r"),
    )

    def counts(col: str, out: str) -> DataFrame:
        return (
            base.select(
                "_id", F.explode(_char_grams(F.col(col), max_n)).alias("_g")
            )
            .groupBy(
                "_id", F.col("_g.n").alias("n"),
                F.col("_g.gram").alias("gram"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    cc, rc = counts("_c", "c"), counts("_r", "r")
    per_n = (
        cc.join(rc.hint("merge"), ["_id", "n", "gram"], "full")
        .groupBy("_id", "n")
        .agg(
            F.sum(
                F.least(F.coalesce("c", F.lit(0)), F.coalesce("r", F.lit(0)))
            ).alias("clip"),
            F.sum(F.coalesce("c", F.lit(0))).alias("ct"),
            F.sum(F.coalesce("r", F.lit(0))).alias("rt"),
        )
    )
    per_id = per_n.groupBy("_id").agg(
        F.avg(F.when(F.col("ct") > 0, F.col("clip") / F.col("ct")))
        .alias("_p"),
        F.avg(F.when(F.col("rt") > 0, F.col("clip") / F.col("rt")))
        .alias("_r"),
    )
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    out = ids.join(per_id.hint("merge"), "_id", "left").select(
        "_id",
        F.coalesce("_p", F.lit(0.0)).alias("_p"),
        F.coalesce("_r", F.lit(0.0)).alias("_r"),
    )
    b2 = beta * beta
    chrf = F.when(
        (b2 * F.col("_p") + F.col("_r")) > 0,
        (1.0 + b2) * F.col("_p") * F.col("_r")
        / (b2 * F.col("_p") + F.col("_r")),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        F.round("_p", _DP).alias("chr_p"),
        F.round("_r", _DP).alias("chr_r"),
        F.round(chrf, _DP).alias("chrf"),
    )


def chrf_pairs_sql(
    table: str = "pairs",
    id_expr: str = "pair_id",
    cand_expr: str = "candidate",
    ref_expr: str = "reference",
    max_n: int = 6,
    beta: float = 2.0,
) -> str:
    """DuckDB twin of :func:`chrf_pairs` — same stripping, clipping,
    order-averaging, and β."""
    strip = (
        lambda e: rf"regexp_replace(lower(coalesce({e}, '')), '\s+', '', 'g')"
    )

    def grams(col: str, out: str) -> str:
        per_n = "\n            UNION ALL\n".join(
            f"            SELECT _id, {n} AS n, substring({col}, i, {n})"
            f" AS gram FROM strs, LATERAL unnest("
            f"range(1, greatest(length({col}) - {n - 1}, 0) + 1)) AS t(i)"
            for n in range(1, max_n + 1)
        )
        return f"""
            SELECT _id, n, gram, count(*) AS {out} FROM (
{per_n}
            ) GROUP BY _id, n, gram"""

    b2 = beta * beta
    return f"""
        WITH strs AS (
            SELECT {id_expr} AS _id,
                   {strip(cand_expr)} AS c,
                   {strip(ref_expr)} AS r
            FROM {table}
        ),
        cc AS ({grams('c', 'c')}),
        rc AS ({grams('r', 'r')}),
        per_n AS (
            SELECT coalesce(cc._id, rc._id) AS _id,
                   coalesce(cc.n, rc.n) AS n,
                   sum(least(coalesce(cc.c, 0), coalesce(rc.r, 0)))
                       AS clip,
                   sum(coalesce(cc.c, 0)) AS ct,
                   sum(coalesce(rc.r, 0)) AS rt
            FROM cc FULL OUTER JOIN rc
              ON cc._id = rc._id AND cc.n = rc.n AND cc.gram = rc.gram
            GROUP BY 1, 2
        ),
        per_id AS (
            SELECT _id,
                   avg(CASE WHEN ct > 0 THEN clip * 1.0 / ct END) AS p,
                   avg(CASE WHEN rt > 0 THEN clip * 1.0 / rt END) AS r
            FROM per_n GROUP BY _id
        ),
        scored AS (
            SELECT i._id, coalesce(p.p, 0.0) AS p, coalesce(p.r, 0.0) AS r
            FROM (SELECT DISTINCT {id_expr} AS _id FROM {table}) i
            LEFT JOIN per_id p ON i._id = p._id
        )
        SELECT _id AS {id_expr},
               round(p, {_DP}) + 0.0 AS chr_p,
               round(r, {_DP}) + 0.0 AS chr_r,
               round(CASE WHEN {b2} * p + r > 0
                          THEN (1.0 + {b2}) * p * r / ({b2} * p + r)
                          ELSE 0.0 END, {_DP}) + 0.0 AS chrf
        FROM scored
    """


def rouge_l_pairs(
    df: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    max_tokens: int = 1024,
) -> DataFrame:
    """Per-pair ROUGE-L: (pair_id, cand_len, ref_len, lcs_len,
    precision, recall, f1). Token-level LCS via the classic DP —
    Arrow-batched ``mapInPandas`` (the one inherently sequential step;
    see module docstring), both sides truncated to ``max_tokens`` so
    per-pair cost is bounded by ``max_tokens²`` regardless of document
    size. Lengths reported are the TRUNCATED lengths the metric was
    computed over."""
    import re

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    sel = df.select(id_col, cand_col, ref_col)

    def gen(batches):
        ws = re.compile(r"\s+", re.ASCII)

        def toks(t):
            t = "" if t is None else str(t).strip()
            return ws.split(t.lower())[:max_tokens] if t else []

        def lcs(a, b):
            if not a or not b:
                return 0
            # one-row rolling DP
            prev = [0] * (len(b) + 1)
            for x in a:
                cur = [0] * (len(b) + 1)
                for j, y in enumerate(b, 1):
                    cur[j] = (
                        prev[j - 1] + 1 if x == y
                        else max(prev[j], cur[j - 1])
                    )
                prev = cur
            return prev[-1]

        for pdf in batches:
            ids, cl, rl, ll = [], [], [], []
            for i, c, r in zip(pdf[id_col], pdf[cand_col], pdf[ref_col]):
                a, b = toks(c), toks(r)
                ids.append(i)
                cl.append(len(a))
                rl.append(len(b))
                ll.append(lcs(a, b))
            yield pd.DataFrame(
                {"_id": ids, "cand_len": cl, "ref_len": rl, "lcs_len": ll}
            )

    out = sel.mapInPandas(
        gen,
        schema=(
            f"_id {id_type}, cand_len long, ref_len long, lcs_len long"
        ),
    )
    prec = F.when(
        F.col("cand_len") > 0, F.col("lcs_len") / F.col("cand_len")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("ref_len") > 0, F.col("lcs_len") / F.col("ref_len")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        "cand_len", "ref_len", "lcs_len",
        F.round(prec, _DP).alias("precision"),
        F.round(rec, _DP).alias("recall"),
        F.round(f1, _DP).alias("f1"),
    )
