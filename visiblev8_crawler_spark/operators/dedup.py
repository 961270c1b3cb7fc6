"""Frontier preparation: canonicalize -> validate -> first-occurrence dedup ->
robots gate. One declarative pass over the raw seed list.

Reference parity:
- validity filter (backend tasks.py:29-52)            -> F1
- blank/invalid drop (url_sender.py:72-74)            -> F2
- exact-URL dedup, first occurrence wins, later rows get the cached
  submission (backend tasks.py:148-156)               -> D1 (here: rejected
  with reason 'duplicate'; cross-campaign dedup is the anti-join/bloom path
  in the scheduler)
- robots gating (north_rule; absent in reference)     -> C14

Scale: the only shuffle is the dedup window on canon_url (unavoidable for
exact first-occurrence semantics; at 10^10 rows it is one hash-partitioned
exchange, skew-free because canon_url is near-unique). Everything else is
whole-stage-codegen'd projections/filters; the robots dimension is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schemas
from ..functions import urls as U


def prepare_frontier(frontier: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (pending, rejected) with schemas.PENDING / schemas.REJECTED."""
    canon = U.with_canonical(frontier.select("seq", "url", "priority"))

    invalid = canon.filter(~F.col("valid")).select(
        "seq", "url", F.lit("invalid").alias("reason")
    )
    valid = canon.filter(F.col("valid"))

    w = Window.partitionBy("canon_url").orderBy(F.col("seq").asc())
    ranked = valid.withColumn("_rn", F.row_number().over(w))
    dup = ranked.filter(F.col("_rn") > 1).select("seq", "url", F.lit("duplicate").alias("reason"))
    first = ranked.filter(F.col("_rn") == 1).drop("_rn")

    gated = first.join(
        F.broadcast(robots.select("host", "full_block", "disallow_prefixes")), "host", "left"
    ).withColumn(
        "_blocked",
        F.coalesce(F.col("full_block"), F.lit(False))
        | F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
            lambda p: F.col("path").startswith(p),
        ),
    )
    robots_rej = gated.filter(F.col("_blocked")).select(
        "seq", "url", F.lit("robots").alias("reason")
    )
    pending = schemas.conform(
        gated.filter(~F.col("_blocked"))
        .withColumn("image_id", U.image_id_col(F.col("path")))
        .withColumn("attempt", F.lit(1)),
        schemas.PENDING,
    )
    rejected = schemas.conform(
        invalid.unionByName(dup).unionByName(robots_rej), schemas.REJECTED
    )
    return pending, rejected
