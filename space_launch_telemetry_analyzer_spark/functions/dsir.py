r"""DSIR-style importance resampling for training-data selection (public
method: Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — hashed n-gram bag features, a target/raw likelihood-ratio
weight per document, then top-weight resampling). The reference repo has no
analog; this sits in the graft mandate's LLM-data-pipeline suite next to
the CCNet bigram LM (functions/lm.py) and the quality classifier.

Model
- Features: unigrams ('u:' + tok) and adjacent bigrams ('b:' + w1 + ' ' +
  w2) over the shared LM lexer (lm.LM_TOKEN_PATTERN), hashed into
  N_BUCKETS md5 buckets — the same engine-independent md5 bucket formula
  as sampling.hash_sample (first 8 hex chars mod N, runs identically in
  Spark, Python, and DuckDB).
- Two bucket multinomials with Laplace smoothing over the feature space:
  a TARGET distribution fit on the quality corpus (bpe.TRAINING_CORPUS)
  and a RAW reference distribution fit on an authored web-chrome corpus
  (RAW_REFERENCE_CORPUS below). log importance weight of a document =
  sum over its feature occurrences of ln p_target(b) - ln p_raw(b).
- Selection: top-k by weight with the deterministic (weight DESC, id)
  tie-break — the resampling step with temperature -> 0; the
  hash-seeded-Gumbel variant stays out of the oracle path by design.

Cross-engine exactness (the lm.py discipline): per-bucket deltas are
computed in Python ONCE as INTEGER MICRO-NATS (round(1e6 * ln ratio)) and
shipped to both engines as a VALUES table — no libm call ever happens in
Spark or DuckDB, integer sums are order-independent, and the top-k
tie-break is total, so the oracle matches bit-for-bit.

Corpus-adaptive raw fit: `fit_raw_bucket_counts` recomputes the raw
distribution on the LIVE corpus distributedly (explode -> one
N_BUCKETS-key groupBy) and collects exactly N_BUCKETS scalar rows — a
bounded driver materialization independent of corpus size, same budget as
the k-means centroid pull. `dsir_delta_table(raw_counts=...)` then builds
the delta table from it. The registered driver query uses the fixed
reference tables (compile-time constant => closed-form oracle); the
adaptive path is pinned by tests/test_dsir.py instead.

Scale shape: tokenization, feature building, and bucketing are JVM
expressions on the scan; the delta table (<= N_BUCKETS rows) is a
broadcast join; the only corpus shuffle carries (id, int) rows into a
uniform-keyed groupBy; selection is TakeOrderedAndProject (k rows to one
partition, never a full sort).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lm import LM_TOKEN_PATTERN, _TOKEN_RE, bigram_array_sql

__all__ = [
    "N_BUCKETS",
    "RAW_REFERENCE_CORPUS",
    "dsir_delta_table",
    "dsir_oracle_sql",
    "dsir_topk",
    "dsir_weights",
    "feature_bucket",
    "fit_bucket_counts",
    "fit_raw_bucket_counts",
]

N_BUCKETS = 1024

# The raw-side reference: web chrome, consent boilerplate, SEO spam,
# clickbait — the stuff a crawl is full of and a training mix is not.
# Frozen: changing it changes every shipped delta (tests pin a weight).
RAW_REFERENCE_CORPUS = """
Click here to subscribe now and never miss an update from our site.
We use cookies to improve your experience; accept all cookies or manage
settings in the privacy preference center before you continue reading.
Sign up free today limited offer ends soon exclusive deal just for you.
Top ten shocking tricks doctors hate number seven will amaze you click.
Follow us on social media like share comment subscribe hit the bell.
Advertisement sponsored content continues below scroll to keep reading.
Enter your email address to join our newsletter and win big prizes now.
Terms of service privacy policy all rights reserved copyright contact.
Buy now best price discount sale free shipping order today only hurry.
Related articles you may also like trending popular most read stories.
"""


def feature_bucket(feature: str, n_buckets: int = N_BUCKETS) -> int:
    """Python twin of the engine bucket formula: first 8 hex chars of
    md5(feature) mod n (sampling.hash_sample's bucket, applied to the
    feature string instead of an id)."""
    return int(hashlib.md5(feature.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _features(text: str) -> list:
    toks = _TOKEN_RE.findall(text.lower())
    return (["u:" + t for t in toks]
            + ["b:" + a + " " + b for a, b in zip(toks, toks[1:])])


def fit_bucket_counts(corpus: str, n_buckets: int = N_BUCKETS) -> Counter:
    """Hashed-feature bucket counts of one reference corpus (Python-side
    fit; both shipped models are a few hundred occupied buckets)."""
    c: Counter = Counter()
    for f in _features(corpus):
        c[feature_bucket(f, n_buckets)] += 1
    return c


def _micro(num: int, den: int) -> int:
    return round(math.log(num / den) * 1_000_000)


@lru_cache(maxsize=4)
def dsir_delta_table(raw_counts: tuple | None = None,
                     n_buckets: int = N_BUCKETS) -> tuple[dict, int]:
    """(delta_micro, default_micro): per-bucket integer micro-nat
    ln(p_target/p_raw) under Laplace smoothing over the bucket space —
    delta[b] = micro(t_b+1, T+n) - micro(r_b+1, R+n); buckets unseen by
    both sides share the constant default. `raw_counts` (a sorted tuple of
    (bucket, count), hashable for the cache) swaps in a corpus-adaptive
    raw fit from `fit_raw_bucket_counts`; None uses the frozen
    RAW_REFERENCE_CORPUS."""
    from .bpe import TRAINING_CORPUS

    t = fit_bucket_counts(TRAINING_CORPUS, n_buckets)
    r = (Counter(dict(raw_counts)) if raw_counts is not None
         else fit_bucket_counts(RAW_REFERENCE_CORPUS, n_buckets))
    tn = sum(t.values()) + n_buckets
    rn = sum(r.values()) + n_buckets
    default = _micro(1, tn) - _micro(1, rn)
    delta = {
        b: _micro(t[b] + 1, tn) - _micro(r[b] + 1, rn)
        for b in sorted(set(t) | set(r))
    }
    return delta, default


def _bucket_col(feature_col, n_buckets: int):
    return (F.conv(F.substring(F.md5(feature_col), 1, 8), 16, 10)
            .cast("bigint") % n_buckets)


def fit_raw_bucket_counts(df: DataFrame, text_col: str = "text",
                          n_buckets: int = N_BUCKETS) -> tuple:
    """Corpus-adaptive raw fit: hashed-feature bucket counts over the live
    corpus. Distributed explode -> groupBy(bucket) (uniform keys, at most
    n_buckets groups); the collect is exactly <= n_buckets scalar rows
    regardless of corpus size. Returns the sorted (bucket, count) tuple
    `dsir_delta_table` expects."""
    rows = (
        _feature_frame(df, F.monotonically_increasing_id(), text_col,
                       n_buckets)
        .where(F.col("b").isNotNull())
        .groupBy("b").count()
        .collect()
    )
    return tuple(sorted((r["b"], r["count"]) for r in rows))


def _feature_frame(df: DataFrame, id_col, text_col: str,
                   n_buckets: int) -> DataFrame:
    """(id, b): one row per feature occurrence, b = md5 bucket (null for
    documents with zero tokens — explode_outer keeps them countable)."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), F.lit(0))
    bigrams = F.expr(bigram_array_sql(
        "concat('b:', t[i-2], ' ', t[i-1])", "string"))
    feats = F.concat(
        F.transform(F.col("t"), lambda x: F.concat(F.lit("u:"), x)),
        bigrams,
    )
    return (
        df.select(idc.alias("id"), toks.alias("t"))
        .select("id", F.explode_outer(feats).alias("f"))
        .select("id", F.when(F.col("f").isNotNull(),
                             _bucket_col(F.col("f"), n_buckets)).alias("b"))
    )


def dsir_weights(df: DataFrame, id_col: str, text_col: str,
                 raw_counts: tuple | None = None,
                 n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-document DSIR log-importance weight:
    (id, n_feats, weight_micro). weight_micro is the integer micro-nat
    sum of per-bucket deltas over the document's feature occurrences;
    documents with zero tokens get n_feats = 0, weight_micro NULL."""
    spark = df.sparkSession
    delta, default = dsir_delta_table(raw_counts, n_buckets)
    dt = spark.createDataFrame(
        sorted(delta.items()), "b bigint, d bigint")
    return (
        _feature_frame(df, id_col, text_col, n_buckets)
        .join(F.broadcast(dt), ["b"], "left")
        .withColumn("d_final", F.when(
            F.col("b").isNull(), F.lit(None).cast("bigint")
        ).otherwise(F.coalesce("d", F.lit(default))))
        .groupBy("id")
        .agg(F.count("b").alias("n_feats"),
             F.sum("d_final").alias("weight_micro"))
        .select(F.col("id"),
                F.col("n_feats").cast("bigint").alias("n_feats"),
                "weight_micro")
    )


def dsir_topk(weights: DataFrame, k: int) -> DataFrame:
    """The resampling step at temperature -> 0: global top-k by
    (weight_micro DESC NULLS LAST, id) — a total order, so the selected
    set is unique. orderBy().limit(k) compiles to TakeOrderedAndProject
    (per-partition heaps, k rows to the driver-side reduce — no global
    sort shuffle); the rank window runs on the k survivors only."""
    top = weights.orderBy(
        F.col("weight_micro").desc_nulls_last(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("weight_micro").desc_nulls_last(), F.col("id"))
    return top.select(
        "id", "n_feats", "weight_micro",
        F.row_number().over(w).cast("int").alias("rank"))


def dsir_oracle_sql(k: int, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = N_BUCKETS) -> str:
    r"""DuckDB twin: identical lexer, identical md5 bucket formula,
    identical embedded integer delta table, identical total-order top-k.
    The ASCII row filter matches the registered caller's."""
    from .bpe import _sql_quote as _q

    delta, default = dsir_delta_table(None, n_buckets)
    rows = ",".join(f"({b},{d})" for b, d in sorted(delta.items()))
    pat = _q(LM_TOKEN_PATTERN)
    return rf"""
WITH delta(b, d) AS (VALUES {rows}),
docs AS (
  SELECT {id_col} AS id, regexp_extract_all(lower({text_col}), {pat}) AS t
  FROM {table} WHERE regexp_matches({text_col}, '^[ -~]*\z')
),
feats AS (
  SELECT id, 'u:' || t[i] AS f
  FROM (SELECT id, t, unnest(generate_series(1, len(t))) AS i FROM docs)
  UNION ALL
  SELECT id, 'b:' || t[i - 1] || ' ' || t[i] AS f
  FROM (SELECT id, t, unnest(generate_series(2, len(t))) AS i FROM docs)
),
bucketed AS (
  SELECT id, (('0x' || substring(md5(f), 1, 8))::BIGINT) % {n_buckets} AS b
  FROM feats
),
scored AS (
  SELECT x.id, count(*) AS n_feats,
         CAST(sum(coalesce(delta.d, {default})) AS BIGINT) AS weight_micro
  FROM bucketed x LEFT JOIN delta ON delta.b = x.b
  GROUP BY x.id
),
alldocs AS (
  SELECT d.id, CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         s.weight_micro
  FROM docs d LEFT JOIN scored s ON s.id = d.id
)
SELECT id AS {id_col}, n_feats, weight_micro,
       CAST(row_number() OVER (ORDER BY weight_micro DESC NULLS LAST, id)
            AS INT) AS rank
FROM alldocs
ORDER BY weight_micro DESC NULLS LAST, id
LIMIT {k}
"""
