"""Batch model inference + report queries — the rebuild of the reference's
classification pipeline (script_classification/heuristics/
production_classifier.py):

    load unlabeled rows (:88) -> engineer features from text/JSON (:140-229)
    -> model.predict_proba batch inference (:249-255) -> 3-way confidence
    bucket (:264-268) -> report queries over the scored table (:403-506).

The reference scores with a pickled sklearn model; the Spark-first shape is
identical for any model family: broadcast the (small) model, run vectorized
batch inference in a pandas UDF over Arrow batches, keep everything else
declarative. Here the model is a fixed-weight logistic regression — chosen
deterministic so a DuckDB oracle can replay the exact arithmetic and the
driver's value-hash gate can check the full path (features -> sigmoid ->
bucket) end-to-end, which a pickled model could never offer.

Scale: inference is embarrassingly parallel (one UDF stage, no shuffle); the
report query is a groupBy over the scored output. At 100 TB the only change
is a real model object in the broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .queries import fanout, load, q

# fixed "trained model": intercept + weights for (n_tokens, avg_token_len, s_the)
_W = {"intercept": -2.0, "n_tokens": 0.015, "avg_token_len": 0.12, "s_the": 0.35}


@F.pandas_udf(DoubleType())
def _logit_proba(n_tokens: pd.Series, avg_len: pd.Series, s_the: pd.Series) -> pd.Series:
    """Vectorized predict_proba (production_classifier.py:249-255 analog):
    numpy over the whole Arrow batch, model weights from the closure (the
    broadcast-model pattern — swap _W for a broadcast sklearn object)."""
    z = (
        _W["intercept"]
        + _W["n_tokens"] * n_tokens.to_numpy(dtype=np.float64)
        + _W["avg_token_len"] * avg_len.to_numpy(dtype=np.float64)
        + _W["s_the"] * s_the.to_numpy(dtype=np.float64)
    )
    return pd.Series(1.0 / (1.0 + np.exp(-z)))


@q(
    "classifier_inference",
    """
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id,
                 len(toks) AS n_tokens,
                 (n_chars - (len(toks) - 1)) * 1.0 / len(toks) AS avg_token_len,
                 len(list_filter(toks, x -> x = 'the')) AS s_the
          FROM t),
    s AS (SELECT doc_id, n_tokens,
                 1.0 / (1.0 + exp(-(-2.0 + 0.015 * n_tokens
                                    + 0.12 * avg_token_len + 0.35 * s_the))) AS p
          FROM f)
    SELECT doc_id, ROUND(p, 4) AS prob,
           CASE WHEN p >= 0.8 THEN 'high' WHEN p >= 0.5 THEN 'medium'
                ELSE 'low' END AS confidence_level
    FROM s
    """,
    "§3.3 batch inference: feature engineering (classifier.py:140-229) -> vectorized pandas-UDF predict_proba (:249-255) -> np.where buckets (:264-268); deterministic weights let the oracle replay the arithmetic",
)
def classifier_inference(spark, sf_dir):
    d = load(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    f = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        ((F.col("n_chars") - (F.size("toks") - 1)) * 1.0 / F.size("toks")).alias(
            "avg_token_len"
        ),
        F.size(F.filter("toks", lambda x: x == "the")).alias("s_the"),
    )
    s = f.withColumn("p", _logit_proba("n_tokens", "avg_token_len", "s_the"))
    return s.select(
        "doc_id",
        F.round("p", 4).alias("prob"),
        F.when(F.col("p") >= 0.8, "high")
        .when(F.col("p") >= 0.5, "medium")
        .otherwise("low")
        .alias("confidence_level"),
    )


@q(
    "json_map_features",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id, toks, toks[1:6] AS first6 FROM t)
    SELECT doc_id,
           CAST(COALESCE(list_sum(list_transform(first6, x -> strlen(x))), 0) AS BIGINT)
             AS access_total,
           CAST(len(first6) AS BIGINT) AS unique_apis,
           CAST(CASE WHEN len(list_filter(first6, x -> contains(x, 'er'))) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS has_storage_sink,
           CAST(CASE WHEN len(list_filter(first6, x -> x IN ('the', 'and', 'of'))) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS has_network_sink,
           CAST(len(list_filter(toks, x -> contains(x, 'an'))) AS BIGINT) AS mouse_event_count,
           CAST(len(list_filter(toks, x -> contains(x, 'er'))) AS BIGINT) AS keyboard_event_count,
           CAST(len(list_filter(toks, x -> contains(x, 'in'))) AS BIGINT) AS touch_event_count,
           CAST(len(list_filter(toks, x -> contains(x, 'on'))) AS BIGINT) AS pointer_event_count,
           CAST((CASE WHEN len(list_filter(toks, x -> contains(x, 'an'))) > 0 THEN 1 ELSE 0 END
               + CASE WHEN len(list_filter(toks, x -> contains(x, 'er'))) > 0 THEN 1 ELSE 0 END
               + CASE WHEN len(list_filter(toks, x -> contains(x, 'in'))) > 0 THEN 1 ELSE 0 END
               + CASE WHEN len(list_filter(toks, x -> contains(x, 'on'))) > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS behavioral_event_diversity,
           CASE WHEN len(toks) + len(first6) > 0
                THEN ROUND(len(toks) * 1.0 / (len(toks) + len(first6)), 6)
                ELSE 0.0 END AS behavioral_ratio,
           CASE WHEN len(toks) + len(first6) > 0
                THEN ROUND(COALESCE(list_sum(list_transform(first6, x -> strlen(x))), 0)
                           * 1.0 / (len(toks) + len(first6)), 6)
                ELSE 0.0 END AS intensity_ratio
    FROM f
    """,
    "A6/X7 full JSON map+array feature engineering (production_classifier.py:104-123 json field "
    "parse, :154-211 features): Spark builds a JSON object per row, parses it with "
    "from_json->MapType, then computes sum-of-map-values (aggregate over map_values), map size, "
    "key-substring sink flags (exists over map_keys), substring-count event classes over the "
    "array column (size(filter(...))), diversity, and zero-guarded ratios. The DuckDB oracle "
    "derives the same features directly from the tokens, so any loss in the JSON round-trip "
    "breaks the value hash — the map path is checked end-to-end.",
)
def json_map_features(spark, sf_dir):
    from pyspark.sql.types import IntegerType, MapType, StringType

    # fanout (round 6): the JSON round-trip + map/array HOF projection ran
    # in ONE task on the single-row-group scan (2.6 s at sf1.0)
    d = fanout(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # deterministic map column: first-6 tokens -> token length, keys made
    # unique with their 1-based position (map_from_arrays rejects dup keys);
    # serialized to JSON then parsed back so the query exercises the
    # reference's json.loads -> dict path (classifier.py:104-123), not a
    # pre-structured shortcut.
    first6 = F.slice("toks", 1, 6)
    j = F.to_json(
        F.map_from_arrays(
            F.transform(first6, lambda x, i: F.concat(x, F.lit("#"), (i + 1).cast("string"))),
            F.transform(first6, lambda x: F.length(x)),
        )
    )
    m = F.from_json(j, MapType(StringType(), IntegerType()))
    d = d.withColumn("m", m)

    tok_part = lambda k: F.substring_index(k, "#", 1)  # noqa: E731 — key without '#pos'
    count_like = lambda marker: F.size(  # noqa: E731
        F.filter("toks", lambda x: x.contains(marker))
    ).cast("long")

    access_total = F.aggregate(
        F.map_values("m"), F.lit(0), lambda acc, x: acc + x
    ).cast("long")
    unique_apis = F.size("m").cast("long")
    has_storage = F.exists(
        F.map_keys("m"), lambda k: tok_part(k).contains("er")
    ).cast("int").cast("long")
    has_network = F.exists(
        F.map_keys("m"), lambda k: tok_part(k).isin("the", "and", "of")
    ).cast("int").cast("long")

    mouse, kbd, touch, pointer = (count_like(s) for s in ("an", "er", "in", "on"))
    diversity = (
        (mouse > 0).cast("long")
        + (kbd > 0).cast("long")
        + (touch > 0).cast("long")
        + (pointer > 0).cast("long")
    )
    total_apis = F.size("toks").cast("long") + unique_apis
    ratio = lambda num: F.when(  # noqa: E731 — zero-guard (classifier.py:212-219)
        total_apis > 0, F.round(num * 1.0 / total_apis, 6)
    ).otherwise(F.lit(0.0))

    return d.select(
        "doc_id",
        access_total.alias("access_total"),
        unique_apis.alias("unique_apis"),
        has_storage.alias("has_storage_sink"),
        has_network.alias("has_network_sink"),
        mouse.alias("mouse_event_count"),
        kbd.alias("keyboard_event_count"),
        touch.alias("touch_event_count"),
        pointer.alias("pointer_event_count"),
        diversity.alias("behavioral_event_diversity"),
        ratio(F.size("toks").cast("long")).alias("behavioral_ratio"),
        ratio(access_total).alias("intensity_ratio"),
    )


@q(
    "classification_report",
    """
    WITH scored AS (
      SELECT regexp_replace(source, '[0-9]+$', '') AS src_family,
             n_chars, lang
      FROM documents WHERE source IS NOT NULL),
    g AS (
      SELECT src_family,
             COUNT(*) AS n,
             ROUND(AVG(n_chars), 4) AS avg_chars,
             MAX(n_chars) AS max_chars,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
      FROM scored GROUP BY src_family),
    p AS (SELECT *, SUM(n) OVER () AS tot FROM g)
    SELECT src_family, n, avg_chars, max_chars, n_en,
           ROUND(n * 100.0 / tot, 4) AS pct
    FROM p WHERE n >= 2
    ORDER BY avg_chars DESC, src_family ASC
    LIMIT 10
    """,
    "§3.3 composite report (production_classification_queries:30-42 shape): F11 null filter + X1 regex key + A4 HAVING/SUM(CASE) + A3 pct-of-total + T1 top-k, in one plan",
)
def classification_report(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    g = (
        docs.groupBy(F.regexp_replace("source", "[0-9]+$", "").alias("src_family"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        )
        .withColumn(
            "pct", F.round(F.col("n") * 100.0 / F.sum("n").over(Window.partitionBy()), 4)
        )
        .filter(F.col("n") >= 2)
    )
    return g.orderBy(F.col("avg_chars").desc(), F.col("src_family").asc()).limit(10)
