"""GeoJSON layer reader (S13).

The reference reads a regions GeoJSON with ``sf::st_read`` and joins
aggregates onto it by the ``region`` attribute — no spatial predicates
are used (R/export.R:711-746).  Spark-first: read the FeatureCollection
as JSON, explode features, keep properties as columns and geometry as a
JSON string (WKT-convertible downstream if a spatial lib is present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """Read a GeoJSON FeatureCollection into one row per feature:
    property columns + a ``geometry_json`` string column."""
    raw = spark.read.option("multiLine", "true").json(path)
    feats = raw.select(F.explode("features").alias("f"))
    return feats.select(
        F.col("f.properties.*"),
        F.to_json(F.col("f.geometry")).alias("geometry_json"),
    )


def join_attributes(
    geo: DataFrame, attrs: DataFrame, on: str | list[str] = "region"
) -> DataFrame:
    """Attribute join of aggregates onto the geo layer (J11) — a plain
    broadcast equi join, exactly like the reference."""
    return geo.join(F.broadcast(attrs), on=on, how="left")
