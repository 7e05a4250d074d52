"""fastText-style linear quality classifier — the canonical "looks like
reference text vs crawl noise" filter of LLM data pipelines (public
method: Joulin et al. 2016 fastText linear bag-of-ngrams classification;
the quality-filter usage is the CCNet / LLaMA-1 "wikipedia-like page"
classifier). The reference repo has no analog; this belongs to the graft
mandate's training-data suite next to the Gopher/C4 rules and the
bigram-LM scorer.

Model: logistic regression over HASHED unigram + bigram features
(D-bucket md5 hashing — the engine's existing cross-engine-exact
`hash_bucket` formula: int(md5_hex[:8], 16) % D, identical in Spark
`conv(substring(md5(x),1,8),16,10)` and DuckDB
`('0x' || substring(md5(x),1,8))::BIGINT`), trained DETERMINISTICALLY by
scripts/train_quality_clf.py on the fixed authored corpus (positives)
against three seeded corruption families (word-shuffle, char soup, token
repetition) and committed as integer micro-weights
(quality_clf_weights.py, retrain-equality pinned like bpe_merges.py).

Cross-engine exactness, same discipline as functions/lm.py: scoring sums
INTEGER micro-weights (exact, order-independent in both engines); the
final score is a fixed sequence of IEEE divisions on identical operands,
so the DuckDB oracle matches bit-for-bit.

Scale shape: tokenization/bigram/hash are JVM expressions on the scan;
the model is ONE broadcast table (<= D rows); the only corpus shuffle
carries (id, int) rows into a uniform-keyed groupBy.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import LM_TOKEN_PATTERN, bigram_array_sql

__all__ = [
    "CLF_DIM",
    "hash_feature",
    "quality_clf_score",
    "quality_clf_oracle_sql",
    "train_quality_clf",
]

CLF_DIM = 4096
_TOKEN_RE = re.compile(LM_TOKEN_PATTERN)


def _features(text: str) -> list[str]:
    toks = _TOKEN_RE.findall(text.lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def hash_feature(f: str, d: int = CLF_DIM) -> int:
    """Python twin of the JVM/DuckDB md5-prefix bucket (sampling.
    hash_bucket): int over the first 8 hex chars mod d."""
    return int(hashlib.md5(f.encode("utf-8")).hexdigest()[:8], 16) % d


def train_quality_clf(pos: list[str], neg: list[str], d: int = CLF_DIM,
                      iters: int = 300, lr: float = 0.5,
                      l2: float = 1e-3) -> tuple[list[float], float]:
    """Full-batch logistic-regression GD over hashed feature COUNTS —
    pure python arithmetic (no BLAS reductions), so a retrain reproduces
    the committed weights exactly. Returns (weights[d], bias). Features
    are mean-pooled per example (the fastText formulation), which keeps
    long and short examples comparable."""
    examples = []
    for y, texts in ((1.0, pos), (0.0, neg)):
        for t in texts:
            feats = _features(t)
            if not feats:
                continue
            counts: dict[int, float] = {}
            inv = 1.0 / len(feats)
            for f in feats:
                h = hash_feature(f, d)
                counts[h] = counts.get(h, 0.0) + inv
            examples.append((y, sorted(counts.items())))
    w = [0.0] * d
    b = 0.0
    n = float(len(examples))
    for _ in range(iters):
        gw: dict[int, float] = {}
        gb = 0.0
        for y, counts in examples:
            z = b + sum(w[h] * c for h, c in counts)
            p = 1.0 / (1.0 + math.exp(-z))
            err = p - y
            gb += err
            for h, c in counts:
                gw[h] = gw.get(h, 0.0) + err * c
        b -= lr * gb / n
        for h, g in sorted(gw.items()):
            w[h] -= lr * (g / n + l2 * w[h])
    return w, b


def _load_weights() -> tuple[dict[int, int], int, int]:
    from .quality_clf_weights import BIAS_MICRO, DIM, W_MICRO

    return dict(W_MICRO), BIAS_MICRO, DIM


def quality_clf_score(df: DataFrame, id_col: str, text_col: str,
                      keep_threshold: float = 0.0) -> DataFrame:
    """Per-document classifier score: (id, n_feats, sum_w_micro, score,
    keep). score = bias + mean(weight over feature OCCURRENCES) in nats
    of log-odds (sigmoid is monotone, so thresholding the logit IS the
    probability filter without the libm exp). Zero-feature docs score
    NULL and keep=false."""
    w_micro, bias_micro, d = _load_weights()
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(w_micro.items()), "h long, w bigint")

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), F.lit(0))
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    feats = F.expr("concat(t, " + bigram_array_sql(
        "concat(t[i-2], ' ', t[i-1])", "string") + ")")
    exploded = base.select("id", F.explode_outer(feats).alias("f"))
    hashed = exploded.withColumn(
        "h", F.when(F.col("f").isNotNull(), F.pmod(
            F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("long"),
            F.lit(d))))
    scored = (
        hashed.join(F.broadcast(wdf), ["h"], "left")
        .groupBy("id")
        .agg(F.count("f").alias("n_feats"),
             F.sum(F.when(F.col("f").isNotNull(),
                          F.coalesce("w", F.lit(0)))).alias("sum_w_micro"))
    )
    score = (F.col("sum_w_micro").cast("double")
             / F.col("n_feats").cast("double")
             / F.lit(1000000.0)
             + F.lit(bias_micro).cast("double") / F.lit(1000000.0))
    return scored.select(
        "id",
        F.col("n_feats").cast("bigint").alias("n_feats"),
        "sum_w_micro",
        F.when(F.col("n_feats") > 0, score).alias("score"),
        F.coalesce(F.when(F.col("n_feats") > 0, score)
                   >= F.lit(keep_threshold), F.lit(False)).alias("keep"),
    )


def quality_clf_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text",
                           keep_threshold: float = 0.0) -> str:
    """DuckDB twin: identical tokenization/bigrams/md5-bucket hashing,
    identical integer micro-weight sums, identical division sequence.
    ASCII scope filter matches the caller's."""
    w_micro, bias_micro, d = _load_weights()
    w_rows = ",".join(f"({h},{w})" for h, w in sorted(w_micro.items()))
    pat = "'" + LM_TOKEN_PATTERN.replace("'", "''") + "'"
    return rf"""
WITH w(h, wt) AS (VALUES {w_rows}),
docs AS (
  SELECT {id_col} AS id, regexp_extract_all(lower({text_col}), {pat}) AS t
  FROM {table} WHERE regexp_matches({text_col}, '^[ -~]*\z')
),
feats AS (
  SELECT id, t[i] AS f FROM
    (SELECT id, t, unnest(generate_series(1, len(t))) AS i FROM docs)
  UNION ALL
  SELECT id, t[i - 1] || ' ' || t[i] AS f FROM
    (SELECT id, t, unnest(generate_series(2, len(t))) AS i FROM docs)
),
hashed AS (
  SELECT id, f,
         (('0x' || substring(md5(f), 1, 8))::BIGINT) % {d} AS h
  FROM feats
),
scored AS (
  SELECT id, count(f) AS n_feats,
         CAST(sum(coalesce(w.wt, 0)) AS BIGINT) AS sum_w_micro
  FROM hashed LEFT JOIN w ON w.h = hashed.h
  GROUP BY id
)
SELECT d.id,
       CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       s.sum_w_micro,
       CASE WHEN coalesce(s.n_feats, 0) > 0 THEN
         CAST(s.sum_w_micro AS DOUBLE) / CAST(s.n_feats AS DOUBLE)
         / CAST(1000000 AS DOUBLE)
         + CAST({bias_micro} AS DOUBLE) / CAST(1000000 AS DOUBLE)
       END AS score,
       coalesce(
         CASE WHEN coalesce(s.n_feats, 0) > 0 THEN
           CAST(s.sum_w_micro AS DOUBLE) / CAST(s.n_feats AS DOUBLE)
           / CAST(1000000 AS DOUBLE)
           + CAST({bias_micro} AS DOUBLE) / CAST(1000000 AS DOUBLE)
           >= CAST({keep_threshold} AS DOUBLE)
         END, false) AS keep
FROM docs d LEFT JOIN scored s ON s.id = d.id
"""
