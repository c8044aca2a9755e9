"""Manifest-driven file source as a native Python DataSource (Spark 4 API).

The reference's FTP/SFTP stage (reference: kubernetes-yaml/ftp-deployment.yaml,
airflow-dags/transfer_sercom_files.py:60-101) models ingest as "a manifest of
remote files, fetched one by one". This re-expresses that model the
Spark-4-idiomatic way: a registered ``DataSource`` whose ``partitions()`` is
the manifest — ONE InputPartition PER FILE — so a 10,000-file manifest fans
out as 10,000 tasks across executors instead of a driver-side loop. Each
task opens only its own file (here ``file://`` paths stand in for remote
URLs; a real deployment swaps ``open`` for its fetch client and keeps every
other line).

Usage::

    spark.dataSource.register(ManifestDataSource)
    df = (spark.read.format("manifest")
          .schema("n_nationkey int, n_name string, n_regionkey int")
          .option("manifest", "/path/manifest.json")
          .load())

The manifest is a JSON file: ``{"files": ["/abs/path1.tsv", ...],
"delimiter": "\\t"}``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructType,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, delimiter: str):
        self.path = path
        self.delimiter = delimiter


class ManifestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        manifest_path = options.get("manifest")
        if not manifest_path:
            raise ValueError("manifest option is required")
        with open(manifest_path, encoding="utf-8") as fh:
            m = json.load(fh)
        self.files: list[str] = list(m["files"])
        self.delimiter: str = m.get("delimiter", "\t")

    def partitions(self) -> Sequence[InputPartition]:
        # the manifest IS the partitioning: one task per listed file
        return [_FilePartition(p, self.delimiter) for p in self.files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # runs on the executor; touches only this partition's file
        casts = []
        for f in self.schema.fields:
            if isinstance(f.dataType, (IntegerType, LongType)):
                casts.append(int)
            elif isinstance(f.dataType, DoubleType):
                casts.append(float)
            else:
                casts.append(str)
        n_cols = len(casts)
        with open(partition.path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, start=1):
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split(partition.delimiter)
                if len(parts) != n_cols:
                    raise ValueError(
                        f"{partition.path}:{lineno}: expected {n_cols} "
                        f"fields, got {len(parts)} (delimiter "
                        f"{partition.delimiter!r}): {line[:120]!r}"
                    )
                try:
                    yield tuple(
                        None if p == "" else c(p)
                        for c, p in zip(casts, parts)
                    )
                except ValueError as err:
                    raise ValueError(
                        f"{partition.path}:{lineno}: cast failed ({err}): "
                        f"{line[:120]!r}"
                    ) from err


class ManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest"

    def schema(self) -> str:
        raise NotImplementedError(
            "manifest source requires an explicit .schema(...)"
        )

    def reader(self, schema: StructType) -> ManifestReader:
        return ManifestReader(schema, self.options)
