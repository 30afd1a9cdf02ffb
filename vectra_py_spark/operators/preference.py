"""Preference-pair (RLHF / reward-model) data operators — the other
half of post-training data after SFT conversations (`operators/
chat.py`): validate (prompt, chosen, rejected) pairs the way a reward
trainer must (a pair whose sides are identical, blank, duplicated, or
CONTRADICTED by its mirror is noise or leakage), aggregate pairwise
win matrices, and fit Bradley–Terry strengths with the MM algorithm
(Hunter 2004, "MM algorithms for generalized Bradley–Terry models") —
the model underneath every Chatbot-Arena-style leaderboard and the
standard way to turn noisy pairwise judgments into a consistent
ranking for data selection. Reference tie-in: the reference ranks by
a single cosine score (`local_document_index.py` top-k); preference
data has no scores, only comparisons — this layer derives the scores.

Bradley–Terry MM update (all DataFrame joins, no driver-side math):

    W_i  = #comparisons i won                      (constant frame)
    D_i  = Σ_j n_ij / (w_i + w_j)                  (games between i,j)
    w_i' = W_i / D_i

Each iteration is two broadcast-or-shuffle joins (strengths onto the
directed games frame, keyed by either endpoint) and one aggregate on
the item key. Items that never won converge to strength 0 — the MLE
boundary case; a disconnected comparison graph fixes only relative
strengths within components (both documented MLE properties, not
engine artifacts). Lineage is truncated with ``localCheckpoint`` per
iteration — the HITS/pagerank discipline (`operators/linkgraph.py`),
without which Catalyst re-analyzes a plan that doubles per iteration.

Scale shape: validation is one window over the normalized-triple
digest plus one self-join on the mirrored digest (both on 16-byte md5
keys — payload text never shuffles twice); the fit shuffles the
directed GAMES frame (bounded by distinct compared pairs, far smaller
than raw comparisons) per iteration, with the strengths side
broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "validate_preference_pairs",
    "pairwise_wins",
    "win_rates",
    "bradley_terry_fit",
]

_DP = 6


def _norm(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def validate_preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """Input plus (empty_side, identical_sides, n_copies,
    is_canonical, conflicting, valid) — row-level hygiene for reward
    training sets.

    * ``empty_side`` — either response NULL/blank;
    * ``identical_sides`` — chosen == rejected after whitespace/case
      normalization (a no-signal pair);
    * ``n_copies``/``is_canonical`` — duplicate normalized triples;
      the canonical row is the first by input order key (window on the
      triple digest);
    * ``conflicting`` — the MIRRORED triple (same prompt, sides
      swapped) also exists somewhere in the set: annotator
      disagreement, the rows a reward trainer must down-weight or drop;
    * ``valid`` — no flag and canonical.
    """
    p, c, r = (F.col(prompt_col), F.col(chosen_col), F.col(rejected_col))
    norm = df.select(
        "*",
        _norm(F.coalesce(p, F.lit(""))).alias("_np"),
        _norm(F.coalesce(c, F.lit(""))).alias("_nc"),
        _norm(F.coalesce(r, F.lit(""))).alias("_nr"),
    ).select(
        "*",
        F.md5(F.concat_ws("\x1f", "_np", "_nc", "_nr")).alias("_key"),
        F.md5(F.concat_ws("\x1f", "_np", "_nr", "_nc")).alias("_mirror"),
    )
    w = Window.partitionBy("_key")
    flagged = norm.select(
        "*",
        ((c.isNull() | (F.col("_nc") == ""))
         | (r.isNull() | (F.col("_nr") == ""))).alias("empty_side"),
        (F.col("_nc") == F.col("_nr")).alias("identical_sides"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_copies"),
        # canonical pick is deterministic: first by RAW triple bytes
        # (copies differing only in whitespace/case tie-break stably)
        (F.row_number().over(w.orderBy(
            F.concat_ws("\x1f", F.coalesce(p, F.lit("")),
                        F.coalesce(c, F.lit("")), F.coalesce(r, F.lit("")))
        )) == 1).alias("is_canonical"),
    )
    mirrors = norm.select(F.col("_key").alias("_mk")).distinct()
    # distinct triples are corpus-sized — pin the shuffle join so a
    # size misestimate can't broadcast them
    out = flagged.join(
        mirrors.hint("merge"), flagged["_mirror"] == mirrors["_mk"], "left"
    ).select(
        *[col for col in flagged.columns if not col.startswith("_n")
          or col in ("_key",)],
        # identical-sided pairs are their own mirror (_mirror == _key);
        # that is the no-signal flag, not annotator disagreement
        (F.col("_mk").isNotNull() & ~F.col("identical_sides"))
        .alias("conflicting"),
    )
    return out.withColumn(
        "valid",
        ~F.col("empty_side") & ~F.col("identical_sides")
        & ~F.col("conflicting") & F.col("is_canonical"),
    ).drop("_key", "_mirror", "_mk")


def pairwise_wins(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """(item_a, item_b, wins_a, wins_b, n_games) for item_a < item_b —
    the aggregated win matrix (one shuffle on the unordered pair key).
    Feed charts, agreement stats, or :func:`bradley_terry_fit` (which
    derives its directed frame internally from the same aggregate)."""
    wcol, lcol = F.col(winner_col), F.col(loser_col)
    a = F.least(wcol, lcol)
    b = F.greatest(wcol, lcol)
    return (
        comparisons.select(
            a.alias("item_a"), b.alias("item_b"),
            (wcol == a).cast("long").alias("_a_won"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("_a_won").alias("wins_a"),
            (F.count(F.lit(1)) - F.sum("_a_won")).alias("wins_b"),
            F.count(F.lit(1)).alias("n_games"),
        )
    )


def win_rates(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    z: float = 1.959963984540054,  # 97.5th normal quantile (95% CI)
) -> DataFrame:
    """(item, wins, n_games, win_rate, wilson_low, wilson_high) — per-
    item win rate with the Wilson score interval (Wilson 1927, the
    interval leaderboards should quote instead of ±Wald, which
    collapses at 0/1 rates and small n). Closed form per item:

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·sqrt(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    One shuffle (the item-keyed aggregate); rates/bounds rounded to
    6 dp. Complements :func:`bradley_terry_fit`: the rate is
    opponent-blind, the BT strength is opponent-adjusted — a gap
    between their rankings means uneven matchup graphs."""
    wcol, lcol = F.col(winner_col), F.col(loser_col)
    per = (
        comparisons.select(wcol.alias("item"), F.lit(1).alias("_w"))
        .unionByName(
            comparisons.select(lcol.alias("item"), F.lit(0).alias("_w"))
        )
        .groupBy("item")
        .agg(
            F.sum("_w").cast("bigint").alias("wins"),
            F.count(F.lit(1)).cast("bigint").alias("n_games"),
        )
    )
    n = F.col("n_games").cast("double")
    p = F.col("wins") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        / denom
    )
    return per.select(
        "item", "wins", "n_games",
        F.round(p, _DP).alias("win_rate"),
        F.round(F.greatest(center - half, F.lit(0.0)), _DP)
        .alias("wilson_low"),
        F.round(F.least(center + half, F.lit(1.0)), _DP)
        .alias("wilson_high"),
    )


def bradley_terry_fit(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 5,
    checkpoint_interval: int = 1,
    broadcast_strengths: bool = True,
) -> DataFrame:
    """(item, wins, n_games, strength, strength_norm) — Bradley–Terry
    strengths after ``iterations`` MM rounds from the flat-start
    w ≡ 1; ``strength_norm`` sums to 1 over items (the arena-score
    convention). Rounded to 6 dp on output only — intermediates stay
    full-precision doubles so the unrolled-CTE oracle twin
    (`plans/entry_queries.py::preference_fit`) reproduces them term
    for term.

    ``broadcast_strengths`` hints the per-iteration joins (item
    vocabularies — models, prompts, sources — are usually tiny next to
    the comparison log; pass False when items outnumber executors'
    broadcast budget and the joins fall back to shuffles on the item
    key).
    """
    wcol, lcol = F.col(winner_col), F.col(loser_col)
    # directed games frame: (a, b, n_ab) = games a played against b,
    # both orientations present; wins per item
    pairs = comparisons.select(wcol.alias("a"), lcol.alias("b"))
    directed = (
        pairs.unionByName(pairs.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .localCheckpoint()
    )
    base = (
        directed.groupBy("a")
        .agg(F.sum("n_ab").cast("bigint").alias("n_games"))
        .join(
            pairs.groupBy("a").agg(F.count(F.lit(1)).cast("bigint")
                                   .alias("wins")),
            "a", "left",
        )
        .select("a", F.coalesce("wins", F.lit(0)).alias("wins"), "n_games")
        .localCheckpoint()
    )
    strengths = base.select("a", F.lit(1.0).alias("w"))
    # large item vocabularies must shuffle-join, not rely on planner
    # size estimates (broadcast_strengths=False is the scale path)
    hint = (
        F.broadcast if broadcast_strengths
        else (lambda d: d.hint("merge"))
    )
    for i in range(iterations):
        wa = hint(strengths.select(F.col("a").alias("_ia"),
                                   F.col("w").alias("_wa")))
        wb = hint(strengths.select(F.col("a").alias("_ib"),
                                   F.col("w").alias("_wb")))
        denom = (
            directed.join(wa, directed["a"] == wa["_ia"])
            .join(wb, directed["b"] == wb["_ib"])
            .groupBy("a")
            .agg(F.sum(F.col("n_ab") / (F.col("_wa") + F.col("_wb")))
                 .alias("d"))
        )
        strengths = (
            base.join(denom, "a")
            .select("a", (F.col("wins") / F.col("d")).alias("w"))
        )
        if checkpoint_interval and (i + 1) % checkpoint_interval == 0:
            strengths = strengths.localCheckpoint()
    total = strengths.agg(F.sum("w").alias("_t"))
    return (
        base.join(strengths, "a")
        .crossJoin(F.broadcast(total))  # one-row total, broadcast
        .select(
            F.col("a").alias("item"),
            "wins",
            "n_games",
            F.round("w", _DP).alias("strength"),
            F.round(F.col("w") / F.col("_t"), _DP).alias("strength_norm"),
        )
    )
