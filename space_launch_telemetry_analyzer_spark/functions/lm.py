"""Bigram language-model quality scoring — the CCNet-style perplexity
filter (public method: Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data" scores crawl text with a small
LM and keeps the low-perplexity band; the reference repo has no analog —
this is part of the graft mandate's LLM-data-pipeline suite, next to the
Gopher/C4 rule sets in operators/text_analysis.py).

Model: word-bigram LM with Laplace (add-one) smoothing, trained on the
same fixed authored corpus as the BPE table (functions/bpe.py
TRAINING_CORPUS) — deterministic counting, no committed artifact needed.

Cross-engine exactness (the whole design): log-probabilities are
pre-computed in Python ONCE and shipped as INTEGER MICRO-NATS
(round(ln(p) * 1e6)). Integer sums are exact and order-independent in
both Spark and DuckDB — no float accumulation ever happens in either
engine — and the final average is the identical two-division IEEE
sequence on identical operands, so the oracle matches bit-for-bit without
any rounding fudge (the bm25 ln/avg lessons, BENCH.md r5).

Scale shape: tokenization and bigram construction are JVM expressions on
the scan; the model ships as TWO broadcast tables (seen bigrams + per-w1
unseen fallback, a few thousand rows); the only corpus shuffle carries
(id, int) rows into a uniform-keyed groupBy.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LM_TOKEN_PATTERN",
    "bigram_array_sql",
    "bigram_lm_score",
    "bigram_lm_oracle_sql",
    "bigram_lm_tables",
]

# Token lexer shared verbatim with the DuckDB oracle (RE2-safe: no
# lookahead). ASCII scope is enforced by the caller's row filter, so
# lower() agrees across engines by construction.
LM_TOKEN_PATTERN = r"[a-z0-9']+"
_TOKEN_RE = re.compile(LM_TOKEN_PATTERN)


@lru_cache(maxsize=1)
def bigram_lm_tables() -> tuple[dict, dict, int]:
    """Train the LM (deterministic counting) and return
    (bigram_micro, w1_unseen_micro, oov_micro):

    - bigram_micro[(w1, w2)]  = round(1e6 * ln((c12 + 1) / (c1 + V + 1)))
      for every SEEN bigram;
    - w1_unseen_micro[w1]     = round(1e6 * ln(      1   / (c1 + V + 1)))
      — the probability Laplace assigns any unseen/unknown w2 after a
      known w1;
    - oov_micro               = round(1e6 * ln(1 / (V + 1)))
      — both words unknown (c1 = 0).

    V + 1 counts the vocabulary plus the <unk> outcome, so the
    conditional distribution sums to <= 1 with mass reserved for unseen
    continuations."""
    from .bpe import TRAINING_CORPUS

    toks = _TOKEN_RE.findall(TRAINING_CORPUS.lower())
    uni = Counter(toks)
    big = Counter(zip(toks, toks[1:]))
    v1 = len(uni) + 1

    def micro(num: int, den: int) -> int:
        return round(math.log(num / den) * 1_000_000)

    bigram_micro = {
        (w1, w2): micro(c12 + 1, uni[w1] + v1) for (w1, w2), c12 in big.items()
    }
    w1_unseen_micro = {w1: micro(1, c1 + v1) for w1, c1 in uni.items()}
    return bigram_micro, w1_unseen_micro, micro(1, v1)


def bigram_array_sql(elem: str, elem_type: str) -> str:
    """SQL fragment building the adjacent-bigram array over a token array
    column `t` (0-based Spark indexing; the DuckDB twins walk 1-based).
    Shared by the LM scorer and the quality classifier so their size
    guard and pair construction can never drift apart (review-caught
    duplication). `elem` is the per-pair expression over t[i-2]/t[i-1];
    `elem_type` types the empty array for the size<2 branch."""
    return (f"CASE WHEN size(t) < 2 THEN CAST(array() AS array<{elem_type}>) "
            f"ELSE transform(sequence(2, size(t), 1), i -> {elem}) END")


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str,
                    keep_threshold: float = -6.0) -> DataFrame:
    """Per-document LM score: (id, n_bigrams, sum_lp_micro, avg_logprob,
    keep). avg_logprob is mean ln-probability per bigram (higher = more
    natural-language-like; CCNet's perplexity = exp(-avg) is monotone in
    it, so thresholding here IS the perplexity filter without the libm
    exp). Documents with < 2 tokens score NULL and keep=false (no
    evidence is not good evidence)."""
    spark = df.sparkSession
    bigram_micro, w1_unseen_micro, oov_micro = bigram_lm_tables()
    bg = spark.createDataFrame(
        [(w1, w2, lp) for (w1, w2), lp in sorted(bigram_micro.items())],
        "w1 string, w2 string, lp bigint")
    ug = spark.createDataFrame(
        sorted(w1_unseen_micro.items()), "w1 string, lpu bigint")

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), F.lit(0))
    # adjacent pairs as one JVM expression over the token array; Spark
    # arrays are 0-based here, DuckDB's are 1-based in the twin — both
    # walk i = 2..len and take (elem i-1, elem i) in their own indexing
    pairs = F.expr(bigram_array_sql(
        "struct(t[i-2] AS w1, t[i-1] AS w2)",
        "struct<w1:string,w2:string>"))
    exploded = (
        df.select(F.col(id_col).alias("id"), toks.alias("t"))
        .select("id", F.explode_outer(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    scored = (
        exploded
        .join(F.broadcast(bg), ["w1", "w2"], "left")
        .join(F.broadcast(ug), ["w1"], "left")
        .withColumn("lp_final", F.when(
            F.col("w1").isNull(), F.lit(None).cast("bigint")
        ).otherwise(F.coalesce("lp", "lpu", F.lit(oov_micro))))
        .groupBy("id")
        .agg(F.count("w1").alias("n_bigrams"),
             F.sum("lp_final").alias("sum_lp_micro"))
    )
    avg = (F.col("sum_lp_micro").cast("double")
           / F.col("n_bigrams").cast("double")
           / F.lit(1000000.0))
    return scored.select(
        "id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        "sum_lp_micro",
        F.when(F.col("n_bigrams") > 0, avg).alias("avg_logprob"),
        F.coalesce(
            F.when(F.col("n_bigrams") > 0, avg) >= F.lit(keep_threshold),
            F.lit(False)).alias("keep"),
    )


def bigram_lm_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text",
                         keep_threshold: float = -6.0) -> str:
    r"""DuckDB twin: identical tokenization (shared RE2-safe pattern),
    identical integer micro-nat tables (embedded as VALUES from the same
    Python training pass), identical two-division average. ASCII scope
    filter matches the caller's."""
    from .bpe import _sql_quote as _q

    bigram_micro, w1_unseen_micro, oov_micro = bigram_lm_tables()
    bg_rows = ",".join(f"({_q(a)},{_q(b)},{lp})"
                       for (a, b), lp in sorted(bigram_micro.items()))
    ug_rows = ",".join(f"({_q(a)},{lp})"
                       for a, lp in sorted(w1_unseen_micro.items()))
    pat = _q(LM_TOKEN_PATTERN)
    return rf"""
WITH bg(w1, w2, lp) AS (VALUES {bg_rows}),
ug(w1, lpu) AS (VALUES {ug_rows}),
docs AS (
  SELECT {id_col} AS id, regexp_extract_all(lower({text_col}), {pat}) AS t
  FROM {table} WHERE regexp_matches({text_col}, '^[ -~]*\z')
),
pairs AS (
  SELECT id, t[i - 1] AS w1, t[i] AS w2
  FROM (SELECT id, t, unnest(generate_series(2, len(t))) AS i FROM docs)
),
scored AS (
  SELECT p.id,
         count(p.w1) AS n_bigrams,
         -- DuckDB sum(BIGINT) widens to HUGEINT (decimal128(38,0) in
         -- Arrow); cast back to match Spark's int64 at the hash layer
         CAST(sum(coalesce(bg.lp, ug.lpu, {oov_micro})) AS BIGINT)
           AS sum_lp_micro
  FROM pairs p
  LEFT JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
  LEFT JOIN ug ON ug.w1 = p.w1
  GROUP BY p.id
)
SELECT d.id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.sum_lp_micro,
       CASE WHEN coalesce(s.n_bigrams, 0) > 0 THEN
         CAST(s.sum_lp_micro AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
         / CAST(1000000 AS DOUBLE)
       END AS avg_logprob,
       coalesce(
         CASE WHEN coalesce(s.n_bigrams, 0) > 0 THEN
           CAST(s.sum_lp_micro AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
           / CAST(1000000 AS DOUBLE) >= CAST({keep_threshold} AS DOUBLE)
         END, false) AS keep
FROM docs d LEFT JOIN scored s ON s.id = d.id
"""


def perplexity_buckets(df: DataFrame, id_col: str, text_col: str,
                       keep_threshold: float = -6.0) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting high quality monolingual datasets from web crawl data"):
    rank every scoreable document by LM quality (avg_logprob DESC — higher
    is more natural, monotone in -perplexity — with id as the
    deterministic tie-break) and cut the ranking into the paper's three
    equal corpus thirds: 'head' (rank*3 <= n), 'middle' (rank*3 <= 2n),
    'tail'. Documents with < 2 tokens cannot be scored and land in a
    fourth explicit 'unscored' bucket with NULL rank — keeping NULLs out
    of the ordering entirely (engines disagree on null placement; an
    explicit bucket is exact everywhere). Integer comparisons (rank*3 vs
    n) avoid any division.

    Scale shape: the global rank is NOT a single-reducer window — it is
    the shared distributed prefix-sum scaffold (operators/prefix.py:
    range partition + per-partition window + tiny offset window +
    broadcast join, eager-checkpointed against the spark_partition_id
    rematerialization race). The scored frame itself is ALSO
    eager-checkpointed: it feeds both the ranked branch and the
    unscored filter, and without it the corpus scan + bigram explode +
    groupBy would run twice. Both checkpoints hold a few scalars/doc;
    the corpus text never shuffles (the LM score is a broadcast-table
    lookup + groupBy on (id))."""
    from ..operators.prefix import attach_global_prefix

    scored = bigram_lm_score(df, id_col, text_col, keep_threshold) \
        .localCheckpoint(eager=True)
    cols = ["id", "n_bigrams", "sum_lp_micro", "avg_logprob"]
    s = scored.where(F.col("avg_logprob").isNotNull()).select(*cols)
    # total_col: n comes from the scaffold's #partitions-row totals frame,
    # not a second corpus-length pass over the scored frame
    ranked = attach_global_prefix(
        s, [F.col("avg_logprob").desc(), F.col("id")], out_col="_before",
        total_col="_n_scored")

    rank = (F.col("_before") + 1).alias("rank")
    n = F.col("_n_scored")
    bucketed = ranked.select(
        *cols, rank,
        F.when((F.col("_before") + 1) * 3 <= n, F.lit("head"))
        .when((F.col("_before") + 1) * 3 <= n * 2, F.lit("middle"))
        .otherwise(F.lit("tail")).alias("bucket"),
    )
    unscored = scored.where(F.col("avg_logprob").isNull()).select(
        *cols,
        F.lit(None).cast("long").alias("rank"),
        F.lit("unscored").alias("bucket"),
    )
    return bucketed.unionByName(unscored)


def perplexity_buckets_oracle_sql(table: str = "documents",
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> str:
    """DuckDB twin of perplexity_buckets: the bigram_lm_oracle_sql scoring
    CTEs verbatim, then row_number over (avg_logprob DESC, id) against
    the scored count with the same integer cut comparisons."""
    from .bpe import _sql_quote as _q

    bigram_micro, w1_unseen_micro, oov_micro = bigram_lm_tables()
    bg_rows = ",".join(f"({_q(a)},{_q(b)},{lp})"
                       for (a, b), lp in sorted(bigram_micro.items()))
    ug_rows = ",".join(f"({_q(a)},{lp})"
                       for a, lp in sorted(w1_unseen_micro.items()))
    pat = _q(LM_TOKEN_PATTERN)
    return rf"""
WITH bg(w1, w2, lp) AS (VALUES {bg_rows}),
ug(w1, lpu) AS (VALUES {ug_rows}),
docs AS (
  SELECT {id_col} AS id, regexp_extract_all(lower({text_col}), {pat}) AS t
  FROM {table} WHERE regexp_matches({text_col}, '^[ -~]*\z')
),
pairs AS (
  SELECT id, t[i - 1] AS w1, t[i] AS w2
  FROM (SELECT id, t, unnest(generate_series(2, len(t))) AS i FROM docs)
),
scored AS (
  SELECT p.id,
         count(p.w1) AS n_bigrams,
         CAST(sum(coalesce(bg.lp, ug.lpu, {oov_micro})) AS BIGINT)
           AS sum_lp_micro
  FROM pairs p
  LEFT JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
  LEFT JOIN ug ON ug.w1 = p.w1
  GROUP BY p.id
),
base AS (
  SELECT d.id,
         CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         s.sum_lp_micro,
         CASE WHEN coalesce(s.n_bigrams, 0) > 0 THEN
           CAST(s.sum_lp_micro AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
           / CAST(1000000 AS DOUBLE)
         END AS avg_logprob
  FROM docs d LEFT JOIN scored s ON s.id = d.id
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY avg_logprob DESC, id) AS rank,
         count(*) OVER () AS n
  FROM base WHERE avg_logprob IS NOT NULL
)
SELECT id, n_bigrams, sum_lp_micro, avg_logprob,
       CAST(rank AS BIGINT) AS rank,
       CASE WHEN rank * 3 <= n THEN 'head'
            WHEN rank * 3 <= n * 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
UNION ALL
SELECT id, n_bigrams, sum_lp_micro, avg_logprob,
       CAST(NULL AS BIGINT) AS rank, 'unscored' AS bucket
FROM base WHERE avg_logprob IS NULL
"""


def ccnet_paragraph_filter(df: DataFrame, id_col: str, text_col: str,
                           drop: tuple = ("tail",),
                           pos_cap: int = 1 << 20) -> DataFrame:
    """CCNet's actual cleaning granularity (Wenzek et al. 2020 §4.3 run
    the LM per PARAGRAPH and drop the worst bucket): split each document
    on blank lines, bucket every paragraph corpus-wide with
    perplexity_buckets (same LM, same distributed rank, same exact
    thirds), DROP the `drop` buckets (default: tail; 'unscored'
    paragraphs — < 2 tokens — are kept: no evidence is not bad
    evidence), and rebuild each document from its kept paragraphs in
    positional order. Output: (id, text_clean, n_paras, n_kept) for
    EVERY input document (a fully-dropped document keeps its row with
    text_clean = '').

    The composite paragraph key is id * pos_cap + position, so ids must
    be nonnegative and < 2^63 / pos_cap (2^43 at the default cap — ample
    for 10^12 docs) with < pos_cap paragraphs per document. Scale shape:
    only (doc, pos) scalars flow out of the bucket stage — the rebuild
    joins a per-doc sorted position array back to the ORIGINAL text and
    re-splits it, so paragraph TEXT never shuffles."""
    doc = F.col(id_col).cast("long")
    paras = df.select(
        doc.alias("doc"),
        F.posexplode(F.split(F.col(text_col), r"\n\n")).alias("pos", "para"),
    ).select((F.col("doc") * pos_cap + F.col("pos")).alias("pk"), "para",
             "doc", "pos")
    # enforce the composite-key preconditions (ADVICE r6): a negative id
    # or >= pos_cap paragraphs would silently MIX paragraphs across
    # documents in the rebuild — raise instead of corrupting. The assert
    # lives in a filter condition (always evaluated, never pruned);
    # assert_true returns NULL on success so isNull() keeps every row.
    paras = paras.where(
        F.assert_true(
            (F.col("doc") >= 0) & (F.col("pos") < F.lit(int(pos_cap))),
            F.concat(F.lit(f"ccnet_paragraph_filter: id must be >= 0 and "
                           f"paragraphs/doc < {int(pos_cap)}; got id="),
                     F.col("doc"), F.lit(" pos="), F.col("pos")),
        ).isNull()
    ).select("pk", "para")
    b = perplexity_buckets(paras, "pk", "para")
    kept = b.where(~F.col("bucket").isin(list(drop))).select(
        F.expr(f"id div {int(pos_cap)}").alias("doc"),
        F.pmod(F.col("id"), F.lit(int(pos_cap))).cast("int").alias("pos"),
    )
    kept_arr = kept.groupBy("doc").agg(
        F.sort_array(F.collect_list("pos")).alias("kp"))
    pa = F.split(F.col(text_col), r"\n\n")
    return (
        df.select(F.col(id_col), doc.alias("doc"), pa.alias("pa"))
        .join(kept_arr, "doc", "left")
        .select(
            id_col,
            F.coalesce(
                F.array_join(
                    F.transform(F.col("kp"), lambda p: F.col("pa")[p]),
                    "\n\n"),
                F.lit("")).alias("text_clean"),
            F.size("pa").alias("n_paras"),
            F.coalesce(F.size("kp"), F.lit(0)).alias("n_kept"),
        )
    )


def ccnet_paragraph_oracle_sql(table: str = "documents",
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               pos_cap: int = 1 << 20) -> str:
    """DuckDB twin of ccnet_paragraph_filter (drop=('tail',)): paragraph
    explode with ordinality, the LM scoring CTEs on the composite key,
    row_number rank over scored paragraphs, tail cut at rank*3 > 2n,
    positional rebuild via list_transform over the kept-position list."""
    from .bpe import _sql_quote as _q

    bigram_micro, w1_unseen_micro, oov_micro = bigram_lm_tables()
    bg_rows = ",".join(f"({_q(a)},{_q(b)},{lp})"
                       for (a, b), lp in sorted(bigram_micro.items()))
    ug_rows = ",".join(f"({_q(a)},{lp})"
                       for a, lp in sorted(w1_unseen_micro.items()))
    pat = _q(LM_TOKEN_PATTERN)
    cap = int(pos_cap)
    return rf"""
WITH bg(w1, w2, lp) AS (VALUES {bg_rows}),
ug(w1, lpu) AS (VALUES {ug_rows}),
arrs AS (
  SELECT {id_col} AS doc, regexp_split_to_array({text_col}, '\n\n') AS pa
  FROM {table} WHERE regexp_matches({text_col}, '^[ -~]*\z')
),
paras AS (
  SELECT doc * {cap} + (i - 1) AS pk, pa[i] AS para
  FROM (SELECT doc, pa, unnest(generate_series(1, len(pa))) AS i FROM arrs)
),
ptoks AS (
  SELECT pk, regexp_extract_all(lower(para), {pat}) AS t FROM paras
),
ppairs AS (
  SELECT pk, t[i - 1] AS w1, t[i] AS w2
  FROM (SELECT pk, t, unnest(generate_series(2, len(t))) AS i FROM ptoks)
),
psc AS (
  SELECT p.pk, count(p.w1) AS n_bigrams,
         CAST(sum(coalesce(bg.lp, ug.lpu, {oov_micro})) AS BIGINT) AS slp
  FROM ppairs p
  LEFT JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
  LEFT JOIN ug ON ug.w1 = p.w1
  GROUP BY p.pk
),
base AS (
  SELECT t.pk,
         CASE WHEN coalesce(s.n_bigrams, 0) > 0 THEN
           CAST(s.slp AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
           / CAST(1000000 AS DOUBLE)
         END AS avg_lp
  FROM ptoks t LEFT JOIN psc s ON s.pk = t.pk
),
ranked AS (
  SELECT pk,
         row_number() OVER (ORDER BY avg_lp DESC, pk) AS rank,
         count(*) OVER () AS n
  FROM base WHERE avg_lp IS NOT NULL
),
kept AS (
  SELECT b.pk // {cap} AS doc, CAST(b.pk % {cap} AS INT) AS pos
  FROM base b LEFT JOIN ranked r ON r.pk = b.pk
  WHERE r.rank IS NULL OR r.rank * 3 <= r.n * 2
),
ka AS (SELECT doc, list_sort(list(pos)) AS kp FROM kept GROUP BY doc)
SELECT a.doc AS {id_col},
       coalesce(array_to_string(
         list_transform(ka.kp, p -> a.pa[p + 1]),
         chr(10) || chr(10)), '') AS text_clean,
       CAST(len(a.pa) AS INT) AS n_paras,
       CAST(coalesce(len(ka.kp), 0) AS INT) AS n_kept
FROM arrs a LEFT JOIN ka ON ka.doc = a.doc
"""
