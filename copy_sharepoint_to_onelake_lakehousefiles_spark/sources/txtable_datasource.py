"""Pluggable BATCH source for TxTable: the Python Data Source API packaging
of ``plans/txtable.TxTable``, completing the lite-source matrix (delta_lite /
iceberg_lite / txtable_lite — every table stack the engine writes is
reachable from plain ``spark.sql``).

- The DRIVER resolves the snapshot from the commit log only (one checkpoint
  + tail delta manifests) and plans ONE InputPartition PER LIVE DATA FILE.
- EXECUTORS read their file with pyarrow and yield Arrow RecordBatches,
  null-filling columns the file predates (additive schema evolution — the
  same mergeSchema contract ``TxTable.read`` relies on).
- The pushdown flavor (``.option("pushdown", "true")`` + the session conf,
  same opt-in as the other lite sources) prunes files at PLANNING time via
  the manifest's per-file [min_key, max_key] bounds and per-column
  ``col_stats`` — file skipping is a superset guarantee; comparisons are
  handed back to Spark for row-level re-application.
- ``option("table", "history"|"files")`` selects the METADATA tables
  instead of data (the SQL surface of the commit-log audit).

Options: ``version`` (time travel), ``pushdown``, ``table``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)


@dataclass
class TxFilePartition(InputPartition):
    path: str | None  # absolute path of the data file; None = empty sentinel
    schema_json: str  # snapshot schema (Spark StructType JSON)


@dataclass
class TxMetaPartition(InputPartition):
    root: str
    table: str
    version: int | None = None


class TxTableLiteReader(DataSourceReader):
    def __init__(self, options):
        from ..plans.txtable import TxTable

        root = options.get("path")
        if not root:
            raise ValueError("txtable_lite requires .load(<table root>)")
        self._t = TxTable(None, root)
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self.pushed_bounds: dict[str, list] = {}

    def _resolved(self):
        v = self._t.latest_version() if self.version is None else self.version
        return v, self._t._files(v), self._t._schema_json(v)

    def partitions(self):
        import os

        v, files, schema_json = self._resolved()
        if self.pushed_bounds:
            bounds = {
                c: (
                    max((lo for lo, _ in cmp if lo is not None), default=None),
                    min((hi for _, hi in cmp if hi is not None), default=None),
                )
                for c, cmp in self.pushed_bounds.items()
            }
            key = self._t.key or None
            files = [fe for fe in files if self._overlaps(fe, bounds, key)]
        if not files:
            # the Python Data Source API requires >= 1 partition; an empty
            # snapshot (everything deleted) plans one empty sentinel
            return [TxFilePartition(None, schema_json)]
        return [
            TxFilePartition(os.path.join(self._t.root, fe["path"]), schema_json)
            for fe in files
        ]

    @staticmethod
    def _overlaps(fe: dict, bounds: dict, key: str | None) -> bool:
        """Manifest-stat pruning: the table key uses min_key/max_key, other
        columns use col_stats [lo, hi]; missing stats keep the file."""
        for c, (lo, hi) in bounds.items():
            if c == key and fe.get("min_key") is not None:
                fmin, fmax = fe["min_key"], fe["max_key"]
            else:
                cs = (fe.get("col_stats") or {}).get(c)
                if not cs or cs[0] is None or cs[1] is None:
                    continue
                fmin, fmax = cs[0], cs[1]
            try:
                if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                    return False
            except TypeError:  # incomparable stat/filter types: keep
                continue
        return True

    def read(self, partition: TxFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType

        if partition.path is None:  # empty-snapshot sentinel
            return
        st = StructType.fromJson(json.loads(partition.schema_json))
        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        names = set(tbl.column_names)
        arrays, out_names = [], []
        for f in st.fields:
            at = to_arrow_type(f.dataType)
            if f.name in names:
                col = tbl.column(f.name).combine_chunks()
                arrays.append(col if col.type == at else col.cast(at))
            else:  # pre-evolution file: evolved column reads null
                arrays.append(pa.nulls(n, type=at))
            out_names.append(f.name)
        yield from pa.table(dict(zip(out_names, arrays))).to_batches()


class TxTableLitePushdownReader(TxTableLiteReader):
    """Opt-in pushdown flavor (option pushdown=true + the
    spark.sql.python.filterPushdown.enabled session conf)."""

    _CMP = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)

    def pushFilters(self, filters):
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if isinstance(f, self._CMP) and col and len(f.attribute) == 1:
                lo: Any = None
                hi: Any = None
                if isinstance(f, EqualTo):
                    lo = hi = f.value
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = f.value
                else:
                    hi = f.value
                self.pushed_bounds.setdefault(col, []).append((lo, hi))
                yield f  # stat pruning is file-level: Spark re-applies rows
            else:
                yield f


class TxTableLiteMetaReader(DataSourceReader):
    """Metadata-table flavor: one partition whose executor replays the
    commit log itself (the pure-Python row builders shared with
    history_df/files_df)."""

    def __init__(self, options):
        self.root = options.get("path")
        self.table = options.get("table")
        v = options.get("version")
        self.version = int(v) if v is not None else None

    def partitions(self):
        return [TxMetaPartition(self.root, self.table, self.version)]

    def read(self, partition: TxMetaPartition):
        from ..plans.txtable import TxTable

        t = TxTable(None, partition.root)
        if partition.table == "history":
            yield from t._history_rows()
        else:
            yield from t._files_rows(partition.version)


class TxTableLiteDataSource(DataSource):
    """``spark.read.format("txtable_lite").option("version", 2).load(root)``;
    ``option("table", "history"|"files")`` selects a metadata table."""

    @classmethod
    def name(cls) -> str:
        return "txtable_lite"

    def schema(self) -> str:
        from pyspark.sql.types import StructType

        from ..plans.txtable import TxTable

        root = self.options.get("path")
        if not root:
            raise ValueError("txtable_lite requires .load(<table root>)")
        meta_table = self.options.get("table")
        if meta_table == "history":
            return TxTable.HISTORY_DF_DDL
        if meta_table == "files":
            return TxTable.FILES_DF_DDL
        if meta_table is not None:
            raise ValueError(f"unknown metadata table {meta_table!r}")
        t = TxTable(None, root)
        v = self.options.get("version")
        sj = t._schema_json(t.latest_version() if v is None else int(v))
        if sj is None:
            raise ValueError(f"no schema recorded at {root}")
        st = StructType.fromJson(json.loads(sj))
        return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in st.fields)

    def reader(self, schema) -> DataSourceReader:
        if self.options.get("table") is not None:
            return TxTableLiteMetaReader(self.options)
        if str(self.options.get("pushdown", "")).lower() == "true":
            return TxTableLitePushdownReader(self.options)
        return TxTableLiteReader(self.options)
