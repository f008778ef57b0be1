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


@query(
    "pandas_udaf_zscore",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS z
    FROM events
    """,
)
def pandas_udaf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas (the UDAF-ish extension surface, SURVEY
    U5): per-event-type z-score normalization computed in pandas per
    group, checked against the window-function oracle.  The closure is
    self-contained (ships by value; executors need no package import).
    Rounded to 6: pandas' pairwise summation and the SQL engines'
    sequential sums differ in the last ulps of mean/stddev."""
    ev = table(spark, sf_dir, "events")

    def zscore(pdf):
        import pandas as _pd

        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        return _pd.DataFrame(
            {"event_id": pdf["event_id"], "z": ((pdf["value"] - mean) / std).round(6)}
        )

    return ev.select("event_id", "event_type", "value").groupBy(
        "event_type"
    ).applyInPandas(zscore, schema="event_id long, z double")


@query("multimodal_frames")  # rows-only: 1->N mapInPandas fan-out, no SQL oracle
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: each payload
    fans out to one row per sampled fake frame (every 4th of 64-byte
    frames) — the data-dependent 1->N batch shape that rules out
    scalar UDFs.  Codec is a stub; the Arrow plumbing is real."""
    from resotodatalink_spark.operators.multimodal import (
        attach_payload,
        sample_frames,
    )

    d = attach_payload(table(spark, sf_dir, "documents"))
    return sample_frames(d, every_n=4)
