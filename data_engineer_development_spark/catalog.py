"""Zones-as-databases catalog surface (SURVEY.md §2.2 K4/K6/K12, §2.1 S9).

The reference's control plane is BigQuery datasets + views + Data Catalog
tags; the Spark-native restatement is the session catalog: databases for
zones, `CREATE OR REPLACE VIEW`, and TBLPROPERTIES for metadata tags. All
DDL is idempotent (C6: the reference swallows Conflict/AlreadyExists —
/root/reference/gcp-python-libs/bigquery.py:17-21,37-53,57-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def create_zone(spark: SparkSession, zone: str) -> None:
    """K4: idempotent dataset/namespace creation.

    Reference: BigQueryCreateEmptyDatasetOperator per zone
    (export_svg.py:115-141); create_dataset with NotFound-guard
    (bigquery.py:14-22).
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {zone}")


def drop_zone(spark: SparkSession, zone: str, cascade: bool = True) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {zone} {'CASCADE' if cascade else ''}")


def create_view(spark: SparkSession, name: str, view_query: str) -> None:
    """K6: idempotent view creation (bigquery.py:56-64, standard SQL).

    The reference's cross-dataset view *authorization* (bigquery.py:96-106)
    has no Spark analogue — Spark's catalog has no per-view grants; recorded
    as a documented no-op.
    """
    spark.sql(f"CREATE OR REPLACE VIEW {name} AS {view_query}")


def set_table_properties(
    spark: SparkSession, table: str, props: dict[str, str]
) -> None:
    """K12: metadata tagging — the reference attaches Data Catalog tags built
    from enum templates (datacatalog.py:28-61); Spark-native is
    TBLPROPERTIES on the table itself."""
    kv = ", ".join(f"'{k}' = '{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def tag_from_template(
    template: dict[str, list[str]], overrides: dict[str, str] | None = None
) -> dict[str, str]:
    """Build a metadata tag from an enum template: each field defaults to its
    FIRST allowed value, overrides must be drawn from the allowed list.

    Mirrors the reference's Data Catalog tag construction
    (datacatalog.py:28-61 — ``TagTemplate`` enum fields, tag built from the
    first ``allowed_values`` entry per field)."""
    tag: dict[str, str] = {}
    for fld, allowed in template.items():
        if not allowed:
            raise ValueError(f"tag template field {fld!r} has no allowed values")
        v = (overrides or {}).get(fld, allowed[0])
        if v not in allowed:
            raise ValueError(
                f"value {v!r} not allowed for tag field {fld!r} (allowed: {allowed})"
            )
        tag[fld] = v
    return tag


def attach_tag(
    spark: SparkSession,
    table: str,
    template: dict[str, list[str]],
    overrides: dict[str, str] | None = None,
    prefix: str = "tag.",
) -> dict[str, str]:
    """K12 full shape: enum-template tag construction + idempotent attach
    (re-attach overwrites the same keys — datacatalog.py:57-60 swallows
    AlreadyExists; TBLPROPERTIES SET is naturally last-write-wins)."""
    tag = tag_from_template(template, overrides)
    set_table_properties(spark, table, {prefix + k: v for k, v in tag.items()})
    return tag


def get_table_properties(spark: SparkSession, table: str) -> dict[str, str]:
    """S9: catalog entry lookup (datacatalog.py:11-18 lookup_bq_entry)."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    return {r["key"]: r["value"] for r in rows}


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def update_table_schema(
    spark: SparkSession, table: str, new_schema: "StructType"
) -> None:
    """K7: schema replace (bigquery.py:87-90 update_table_schema overwrites
    the field list). Spark-native: re-write the table through a cast/rename
    projection to the new StructType — columns are matched by name; new
    columns arrive NULL, dropped columns disappear, changed types cast."""
    from pyspark.sql import functions as F

    df = spark.table(table)
    cols = []
    for field in new_schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    projected = df.select(*cols)
    # two-phase: stage to a temp table, then overwrite (can't overwrite the
    # table being read)
    tmp = f"{table}__schema_stage"
    projected.write.mode("overwrite").saveAsTable(tmp)
    spark.table(tmp).write.mode("overwrite").saveAsTable(table)
    spark.sql(f"DROP TABLE {tmp}")


#: load-time partition column name (K5 ingest-date flavor)
INGEST_DATE_COL = "_ingest_date"


def materialize(
    df: DataFrame,
    table: str,
    partition_by: str | list[str] | None = None,
    ingest_date: bool = False,
) -> None:
    """K1/K2/K5: query→table materialization with truncate semantics.

    WRITE_TRUNCATE + CREATE_IF_NEEDED (export_svg.py:200,248,263) ≡
    ``mode("overwrite")``; time-partitioned tables (bigquery.py:32-54) ≡
    ``partitionBy`` — at 100 TB the partition column is what makes
    downstream partition pruning possible, so it's part of the write
    contract, not an afterthought.

    ``ingest_date=True`` is the reference's LOAD-TIME partitioning flavor
    (bigquery.py:41-51: ``TimePartitioning(type_=DAY)`` with **no field** —
    BigQuery then partitions on the row's load time): rows are stamped with
    a ``_ingest_date = current_date()`` column and the table is partitioned
    on it, so daily re-loads land in their own partition and date-ranged
    scans prune to the loads in range.
    """
    if ingest_date and partition_by:
        raise ValueError(
            "ingest_date=True is the no-field partitioning flavor; pass "
            "either a partition_by field OR ingest_date, not both "
            "(mirrors bigquery.py:41-51: field=None → load-time)"
        )
    if ingest_date:
        from pyspark.sql import functions as F

        df = df.withColumn(INGEST_DATE_COL, F.current_date())
        partition_by = INGEST_DATE_COL
    w = df.write.mode("overwrite")
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        w = w.partitionBy(*cols)
    w.saveAsTable(table)
