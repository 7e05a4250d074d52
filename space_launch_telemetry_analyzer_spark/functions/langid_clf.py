"""Trained character-n-gram language classifier — the fastText-style
lang-id that is CCNet's FIRST pipeline stage (public method: Joulin et al.
2016 "Bag of Tricks for Efficient Text Classification"; Wenzek et al. 2020
run exactly this as the language router before the LM filter). Upgrades the
engine's scan-speed marker heuristic (`text_analysis.lang_id`) with a
trained model; the two coexist — heuristic for cheap tagging, classifier
when accuracy matters.

Model: multinomial logistic regression (softmax) over md5-hashed character
2- and 3-grams of the space-padded lowercased text, mean-pooled (the
fastText formulation). Trained at import time on the fixed self-authored
corpora below — deterministic pure-python full-batch GD (no BLAS), so
every retrain reproduces the same weights (the bigram_lm_tables pattern;
no committed artifact needed).

Cross-engine exactness — STRONGER than the LM/quality scorers: weights
ship as INTEGER MICRO-LOGITS and the argmax compares
    t_c = bias_micro_c * n_feats + sum_w_micro_c
per class — bias/n scaling multiplied through, so the decision is a PURE
INTEGER comparison. No float arithmetic exists anywhere in the scoring
path, in either engine (|t| < 2^50 at a billion grams/doc — no overflow).

Scale shape: char-gram construction is a JVM transform over sequence()
(scan stage); the model is ONE broadcast table (h, w_de, w_en, w_fr); the
only corpus shuffle carries (id, 3 ints) into a uniform-key groupBy.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LANGID_CLASSES",
    "LANGID_DIM",
    "langid_clf_tables",
    "langid_clf_score",
    "langid_clf_oracle_sql",
]

LANGID_DIM = 2048
LANGID_CLASSES = ("de", "en", "fr")  # sorted; ties resolve to the first

# Self-authored ASCII training corpora (deliberately accent-free so the
# ASCII row scope the registered queries share keeps every gram exact).
_CORPORA = {
    "en": [
        "the rocket lifted off from the pad and the data was clear",
        "we watched the launch and the booster landed on the ship",
        "this is a simple sentence about the weather and the sea",
        "the engine starts when the valve opens and the fuel flows",
        "she said that the results of the test were good enough",
        "a fast scan beats a slow scan when the table is large",
        "the crew closed the hatch before the final countdown began",
        "every stage of the flight was tracked by the ground team",
        "reading the report takes time but the summary is short",
        "the wind was strong so the launch was delayed by a day",
    ],
    "de": [
        "die rakete hob von der rampe ab und die daten waren klar",
        "wir sahen den start und die stufe landete auf dem schiff",
        "das ist ein einfacher satz ueber das wetter und das meer",
        "der motor startet wenn das ventil oeffnet und der stoff fliesst",
        "sie sagte dass die ergebnisse der pruefung gut genug waren",
        "ein schneller lauf schlaegt einen langsamen wenn die menge gross ist",
        "die mannschaft schloss die luke vor dem letzten zaehlen",
        "jede stufe des fluges wurde vom bodenteam verfolgt",
        "den bericht zu lesen dauert aber die fassung ist kurz",
        "der wind war stark also wurde der start um einen tag verschoben",
    ],
    "fr": [
        "la fusee a decolle de la rampe et les donnees etaient claires",
        "nous avons vu le lancement et l'etage a atterri sur le navire",
        "ceci est une phrase simple sur le temps et la mer",
        "le moteur demarre quand la vanne ouvre et le carburant coule",
        "elle a dit que les resultats du test etaient assez bons",
        "un balayage rapide bat un balayage lent quand la table est grande",
        "l'equipage a ferme le sas avant le compte final",
        "chaque etape du vol etait suivie par l'equipe au sol",
        "lire le rapport prend du temps mais le resume est court",
        "le vent etait fort donc le lancement a ete retarde d'un jour",
    ],
}


def _char_grams(text: str) -> list[str]:
    """Python twin of the JVM/SQL gram expression: 2- and 3-grams of
    ' ' + lower(text) + ' ' (1-based substring windows that FIT — no
    short trailing grams)."""
    p = " " + text.lower() + " "
    if not p.strip():
        return []          # blank text: no grams -> 'und' (engine parity)
    return ([p[i:i + 2] for i in range(len(p) - 1)]
            + [p[i:i + 3] for i in range(len(p) - 2)])


def _hash_gram(g: str, d: int = LANGID_DIM) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % d


@lru_cache(maxsize=1)
def langid_clf_tables() -> tuple[dict[int, tuple[int, ...]], tuple[int, ...]]:
    """Train the softmax and return (w_micro, bias_micro): w_micro maps
    bucket -> per-class integer micro-logits (LANGID_CLASSES order),
    bias_micro is the per-class intercept. Full-batch GD in pure python
    (sorted iteration everywhere) — bit-deterministic retrains."""
    classes = LANGID_CLASSES
    examples = []
    for ci, c in enumerate(classes):
        for t in _CORPORA[c]:
            grams = _char_grams(t)
            counts: dict[int, float] = {}
            inv = 1.0 / len(grams)
            for g in grams:
                h = _hash_gram(g)
                counts[h] = counts.get(h, 0.0) + inv
            examples.append((ci, sorted(counts.items())))
    k, d = len(classes), LANGID_DIM
    w = [[0.0] * d for _ in range(k)]
    b = [0.0] * k
    n = float(len(examples))
    lr, l2 = 0.5, 1e-3
    for _ in range(400):
        gw: list[dict[int, float]] = [{} for _ in range(k)]
        gb = [0.0] * k
        for y, counts in examples:
            zs = [b[c] + sum(w[c][h] * v for h, v in counts)
                  for c in range(k)]
            m = max(zs)
            exps = [math.exp(z - m) for z in zs]
            tot = sum(exps)
            for c in range(k):
                err = exps[c] / tot - (1.0 if c == y else 0.0)
                gb[c] += err
                gwc = gw[c]
                for h, v in counts:
                    gwc[h] = gwc.get(h, 0.0) + err * v
        for c in range(k):
            b[c] -= lr * gb[c] / n
            wc = w[c]
            for h, g in sorted(gw[c].items()):
                wc[h] -= lr * (g / n + l2 * wc[h])
    w_micro: dict[int, tuple[int, ...]] = {}
    for h in range(d):
        row = tuple(round(w[c][h] * 1_000_000) for c in range(k))
        if any(row):
            w_micro[h] = row
    bias_micro = tuple(round(x * 1_000_000) for x in b)
    return w_micro, bias_micro


def _gram_sql_spark() -> str:
    """Spark SQL fragment building the char-gram array over a padded
    string column `p` (1-based substring, windows that fit). The 3-gram
    branch needs the explicit empty-case: Spark's sequence(1, 0) yields
    a DESCENDING [1, 0] (DuckDB's generate_series(1, 0) is empty), so an
    empty text (p = '  ') would otherwise grow phantom grams."""
    return ("CASE WHEN length(trim(p)) = 0 THEN CAST(array() AS array<string>) "
            "ELSE concat("
            "transform(sequence(1, length(p) - 1), i -> substring(p, i, 2)), "
            "CASE WHEN length(p) < 3 THEN CAST(array() AS array<string>) "
            "ELSE transform(sequence(1, length(p) - 2), i -> substring(p, i, 3)) "
            "END) END")


def langid_clf_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document language decision: (id, n_feats, t_de, t_en, t_fr,
    lang). t_c = bias_micro_c * n_feats + sum of the class's micro-logits
    over gram occurrences — the mean-pooled softmax logit scaled by
    n_feats * 1e6, an order-preserving integer. lang = integer argmax
    with the LANGID_CLASSES-order tie-break; gramless docs -> 'und'."""
    w_micro, bias_micro = langid_clf_tables()
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(h, *ws) for h, ws in sorted(w_micro.items())],
        "h long, " + ", ".join(f"w_{c} bigint" for c in LANGID_CLASSES))

    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    base = df.select(F.col(id_col).alias("id"), padded.alias("p"))
    exploded = base.select(
        "id", F.explode_outer(F.expr(_gram_sql_spark())).alias("g"))
    hashed = exploded.withColumn(
        "h", F.when(F.col("g").isNotNull(), F.pmod(
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
            F.lit(LANGID_DIM))))
    sums = (
        hashed.join(F.broadcast(wdf), ["h"], "left")
        .groupBy("id")
        .agg(F.count("g").alias("n_feats"),
             *[F.sum(F.when(F.col("g").isNotNull(),
                            F.coalesce(f"w_{c}", F.lit(0))))
               .alias(f"s_{c}") for c in LANGID_CLASSES])
    )
    # coalesce: a gramless doc's conditional sum is NULL, but its t must
    # be the integer 0 (the twin coalesces too — hash-layer parity)
    t = {c: (F.lit(bias_micro[i]) * F.col("n_feats")
             + F.coalesce(F.col(f"s_{c}"), F.lit(0))).alias(f"t_{c}")
         for i, c in enumerate(LANGID_CLASSES)}
    scored = sums.select("id", F.col("n_feats").cast("bigint").alias("n_feats"),
                         *t.values())
    de, en, fr = (F.col(f"t_{c}") for c in LANGID_CLASSES)
    lang = (
        F.when(F.col("n_feats") == 0, F.lit("und"))
        .when((de >= en) & (de >= fr), F.lit("de"))
        .when(en >= fr, F.lit("en"))
        .otherwise(F.lit("fr"))
    )
    return scored.select("id", "n_feats", "t_de", "t_en", "t_fr",
                         lang.alias("lang"))


def langid_clf_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB twin: identical padding/gram windows/md5 buckets, identical
    integer micro-logit sums, identical integer argmax + tie-break."""
    w_micro, bias_micro = langid_clf_tables()
    w_rows = ",".join(f"({h},{ws[0]},{ws[1]},{ws[2]})"
                      for h, ws in sorted(w_micro.items()))
    b = dict(zip(LANGID_CLASSES, bias_micro))
    return rf"""
WITH w(h, w_de, w_en, w_fr) AS (VALUES {w_rows}),
docs AS (
  SELECT {id_col} AS id, ' ' || lower({text_col}) || ' ' AS p
  FROM {table} WHERE regexp_matches({text_col}, '^[ -~]*\z')
),
grams AS (
  -- blank text emits NO grams (the Spark fragment's trim guard) -> 'und'
  SELECT id, substring(p, i, 2) AS g FROM
    (SELECT id, p, unnest(generate_series(1, length(p) - 1)) AS i
     FROM docs WHERE length(trim(p)) > 0)
  UNION ALL
  SELECT id, substring(p, i, 3) AS g FROM
    (SELECT id, p, unnest(generate_series(1, length(p) - 2)) AS i
     FROM docs WHERE length(trim(p)) > 0)
),
hashed AS (
  SELECT id, g, (('0x' || substring(md5(g), 1, 8))::BIGINT) % {LANGID_DIM} AS h
  FROM grams
),
sums AS (
  SELECT id, count(g) AS n_feats,
         CAST(sum(coalesce(w.w_de, 0)) AS BIGINT) AS s_de,
         CAST(sum(coalesce(w.w_en, 0)) AS BIGINT) AS s_en,
         CAST(sum(coalesce(w.w_fr, 0)) AS BIGINT) AS s_fr
  FROM hashed LEFT JOIN w ON w.h = hashed.h
  GROUP BY id
),
scored AS (
  SELECT d.id,
         CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         {b['de']} * coalesce(s.n_feats, 0) + coalesce(s.s_de, 0) AS t_de,
         {b['en']} * coalesce(s.n_feats, 0) + coalesce(s.s_en, 0) AS t_en,
         {b['fr']} * coalesce(s.n_feats, 0) + coalesce(s.s_fr, 0) AS t_fr
  FROM docs d LEFT JOIN sums s ON s.id = d.id
)
SELECT id, n_feats,
       CAST(t_de AS BIGINT) AS t_de, CAST(t_en AS BIGINT) AS t_en,
       CAST(t_fr AS BIGINT) AS t_fr,
       CASE WHEN n_feats = 0 THEN 'und'
            WHEN t_de >= t_en AND t_de >= t_fr THEN 'de'
            WHEN t_en >= t_fr THEN 'en'
            ELSE 'fr' END AS lang
FROM scored
"""
