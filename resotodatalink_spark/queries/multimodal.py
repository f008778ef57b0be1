"""Multimodal slug: binary payload -> Pandas-UDF decode -> metadata.

No ``oracle_sql`` entry on purpose: the mapInPandas stage is not
ANSI-SQL-expressible, so the driver records the rows-only check (the
pytest suite asserts the decoded values instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark.operators.multimodal import attach_payload, decode_media
from resotodatalink_spark.registry import query
from resotodatalink_spark.sources.tables import table


@query("multimodal_decode")  # rows-only: Pandas-UDF stage, no SQL oracle
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return decode_media(attach_payload(d))


def _feat(i: int) -> str:
    return f"CAST(ascii(substring(rpad(text, 4, '_'), {i + 1}, 1)) AS DOUBLE)"


def _norm_sql() -> str:
    terms = [f"{_feat(i)} * {_feat(i)}" for i in range(4)]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return f"sqrt({out})"


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id,
           {_feat(0)} AS f0, {_feat(1)} AS f1, {_feat(2)} AS f2, {_feat(3)} AS f3,
           {_norm_sql()} AS norm
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF feature extraction over binary payloads, with a FULL
    value oracle: the Python stage performs the identical IEEE op
    sequence as the SQL (ascii bytes -> squares -> left-assoc sum ->
    sqrt), so a mapInPandas stage is hash-verified, not just counted."""
    from resotodatalink_spark.operators.multimodal import (
        attach_payload,
        extract_features,
    )

    d = table(spark, sf_dir, "documents")
    return extract_features(attach_payload(d))
