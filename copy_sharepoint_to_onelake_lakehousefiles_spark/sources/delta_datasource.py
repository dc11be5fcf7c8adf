"""Pluggable BATCH source for Delta tables: the Python Data Source API
packaging of ``plans/deltalog.DeltaTable``.

``spark.dataSource.register(DeltaLiteDataSource)`` then
``spark.read.format("delta_lite").load(root)`` — after which the table works
everywhere a DataFrame does, including ``createOrReplaceTempView`` + plain
``spark.sql``. This is the Spark-idiomatic delivery of the interop layer: the
log-replay logic stays in one place (deltalog.py), and this module maps it
onto Spark's source contract:

- The DRIVER resolves the snapshot from the log only (one checkpoint + tail
  deltas) and plans ONE InputPartition PER LIVE DATA FILE — scan parallelism
  equals file count, the same planning Delta's own reader does.
- EXECUTORS read their file with pyarrow and yield Arrow RecordBatches
  (zero-copy into Spark), reconstructing partition columns from the log's
  ``partitionValues`` and nulling columns the file predates (schema
  evolution).
- The pushdown flavor (``.option("pushdown", "true")`` + the
  ``spark.sql.python.filterPushdown.enabled`` conf, same opt-in as
  graph_datasource) prunes files at PLANNING time: partition-column
  equality is accepted outright (file-level exact); data-column comparisons
  prune via the add-actions' min/max stats but are handed back to Spark for
  row-level re-application — file skipping is a superset guarantee, so
  correctness never depends on it.

Options: ``version`` (time travel), ``pushdown``.
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
class FilePartition(InputPartition):
    path: str | None  # absolute path of the data file; None = empty sentinel
    partition_values: dict  # raw string-encoded, from the add action
    schema_json: str  # full logical schema (Spark StructType JSON)
    part_cols: list
    # deletion-vector descriptor (storageType, pathOrInlineDv, offset,
    # sizeInBytes) or None — "u" paths are resolved to absolute "p" at
    # planning time; the executor masks the listed row ordinals first
    dv: tuple | None = None
    # logical → physical column names (column mapping); None = identity
    phys: dict | None = None
    # pushed [lo, hi] bounds by PHYSICAL column name — the executor prunes
    # ROW GROUPS by footer statistics before reading pages (the granularity
    # below file-level stats skipping; at 100 TB a file is ~1 GB of ~128 MB
    # row groups, so this is an 8× page-read reduction on selective scans)
    bounds: dict | None = None
    # pushed EQUALITY predicates [(physical col, value), ...] — the
    # executor additionally probes each surviving row group's split-block
    # BLOOM FILTER (plans/parquet_bloom.py) and skips groups whose bloom
    # says definitely-absent: the row-group-granularity twin of
    # DeltaTable.files_point, for point lookups on hash-laid-out data
    # where min/max statistics cannot exclude anything
    eq: list | None = None


def select_row_groups(pf_meta, bounds: dict) -> list[int]:
    """Row-group indexes whose footer statistics OVERLAP every bound —
    conservative (missing stats keep the group); pure function so tests can
    drive it against crafted metadata."""
    keep = []
    for g in range(pf_meta.num_row_groups):
        rg = pf_meta.row_group(g)
        cols = {rg.column(i).path_in_schema: rg.column(i) for i in range(rg.num_columns)}
        alive = True
        for c, (lo, hi) in bounds.items():
            cc = cols.get(c)
            st = cc.statistics if cc is not None else None
            if st is None or not st.has_min_max:
                continue
            if (hi is not None and st.min > hi) or (lo is not None and st.max < lo):
                alive = False
                break
        if alive:
            keep.append(g)
    return keep


def select_row_groups_bloom(
    path: str, num_groups: int, groups: list[int], eq: list
) -> list[int]:
    """Drop row groups whose split-block BLOOM FILTER says an equality
    value is DEFINITELY absent (conjunctive: each (col, value) predicate
    may only shrink the set). Conservative everywhere: a column without a
    bloom, an offset list that doesn't align one-per-row-group, or a value
    the plain encoding refuses all leave the groups untouched."""
    import struct

    from ..plans.parquet_bloom import (
        _read_bitset,
        bitset_maybe_contains,
        bloom_offsets,
        plain_encode,
        xxh64,
    )

    offs_all = bloom_offsets(path)
    with open(path, "rb") as fh:
        for col, val in eq:
            offs = offs_all.get(col)
            if not offs or len(offs) != num_groups:
                continue
            if offs[0][0] in (4, 5):
                # FLOAT/DOUBLE: plain bit-encoding hashes +0.0 and -0.0
                # differently, so an eq probe could report a false
                # "definitely absent" on groups holding the other zero.
                # No verdict for floating-point columns.
                continue
            try:
                h = xxh64(plain_encode(offs[0][0], val))
            except (ValueError, TypeError, OverflowError, struct.error):
                continue
            kept = []
            for g in groups:
                _ptype, off = offs[g]
                if bitset_maybe_contains(_read_bitset(fh, off), h):
                    kept.append(g)
            groups = kept
            if not groups:
                break
    return groups


def _cast_pv(raw: str | None, type_name: str) -> Any:
    if raw is None:
        return None
    if type_name in ("byte", "short", "integer", "long", "int", "bigint", "smallint", "tinyint"):
        return int(raw)
    if type_name in ("float", "double"):
        return float(raw)
    if type_name == "boolean":
        return raw == "true"
    return raw


class DeltaLiteReader(DataSourceReader):
    def __init__(self, options):
        from ..plans.deltalog import DeltaTable

        root = options.get("path")
        if not root:
            raise ValueError("delta_lite requires .load(<table root>)")
        self._t = DeltaTable(None, root)
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self.pushed_partition: list[Filter] = []
        self.pushed_bounds: dict[str, list] = {}

    def _meta(self):
        adds, meta = self._t.snapshot(self.version)
        part_cols = list(meta.get("partitionColumns") or [])
        return adds, meta["schemaString"], part_cols, self._t._phys_map(meta)

    def partitions(self):
        adds, schema_json, part_cols, phys = self._meta()
        if self.pushed_partition:
            want = {
                phys.get(f.attribute[0], f.attribute[0]): str(f.value)
                for f in self.pushed_partition
            }
            adds = [
                a
                for a in adds
                if all(
                    (a.get("partitionValues") or {}).get(k) == v for k, v in want.items()
                )
            ]
        if self.pushed_bounds:
            bounds = {
                phys.get(c, c): (
                    max((lo for lo, _ in cmp if lo is not None), default=None),
                    min((hi for _, hi in cmp if hi is not None), default=None),
                )
                for c, cmp in self.pushed_bounds.items()
            }
            adds = [a for a in adds if self._overlaps(a, bounds)]
        rg_bounds = None
        rg_eq = None
        if self.pushed_bounds:
            rg_bounds = {
                phys.get(c, c): (
                    max((lo for lo, _ in cmp if lo is not None), default=None),
                    min((hi for _, hi in cmp if hi is not None), default=None),
                )
                for c, cmp in self.pushed_bounds.items()
                if phys.get(c, c) not in part_cols
            }
            # an EqualTo pushed exactly one (v, v) tuple — those qualify
            # for row-group bloom probes (range predicates cannot)
            rg_eq = [
                (phys.get(c, c), lo)
                for c, cmp in self.pushed_bounds.items()
                if phys.get(c, c) not in part_cols
                for lo, hi in cmp
                if lo is not None and lo == hi
            ] or None
        out = []
        for a in adds:
            d = a.get("deletionVector")
            dv = None
            if d:
                from ..plans.roaring import dv_path_from_u

                st_ty = d.get("storageType", "p")
                poi = d["pathOrInlineDv"]
                if st_ty == "u":  # resolve relative flavor on the driver
                    st_ty, poi = "p", dv_path_from_u(poi, self._t.root)
                off = int(d["offset"]) if d.get("offset") is not None else None
                dv = (st_ty, poi, off, int(d["sizeInBytes"]))
            out.append(
                FilePartition(
                    self._t._abs_path(a["path"]),
                    a.get("partitionValues") or {},
                    schema_json,
                    part_cols,
                    dv,
                    phys,
                    rg_bounds or None,
                    rg_eq,
                )
            )
        if not out:
            # the Python Data Source API requires >= 1 partition; an empty
            # snapshot (everything deleted/overwritten away) plans one
            # empty sentinel
            out.append(FilePartition(None, {}, schema_json, part_cols))
        return out

    @staticmethod
    def _overlaps(a: dict, bounds: dict) -> bool:
        raw = a.get("stats")
        if not raw:
            return True
        st = json.loads(raw) if isinstance(raw, str) else raw
        mins, maxs = st.get("minValues") or {}, st.get("maxValues") or {}
        for c, (lo, hi) in bounds.items():
            if c not in mins or c not in maxs:
                continue
            if (hi is not None and mins[c] > hi) or (lo is not None and maxs[c] < lo):
                return False
        return True

    def read(self, partition: FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType

        if partition.path is None:  # empty-snapshot sentinel
            return
        st = StructType.fromJson(json.loads(partition.schema_json))
        # compat open: VARIANT-bearing files carry a logical type this
        # container's pyarrow cannot parse (plans/variant.py)
        from ..plans.variant import open_parquet_compat

        pf = open_parquet_compat(partition.path)
        groups = list(range(pf.metadata.num_row_groups))
        if partition.bounds:
            groups = select_row_groups(pf.metadata, partition.bounds)
        if partition.eq and groups:
            groups = select_row_groups_bloom(
                partition.path, pf.metadata.num_row_groups, groups, partition.eq
            )
        if not groups:
            return
        tbl = pf.read_row_groups(groups)
        if partition.dv is not None and tbl.num_rows:
            # merge-on-read: decode this file's deletion vector and mask the
            # dead ordinals executor-side (DVs are metadata-sized vs data).
            # DV ordinals are FILE-level: with row groups skipped, each kept
            # group's rows map back via its cumulative start offset.
            from ..plans.roaring import deserialize_rba, read_dv_descriptor

            st_ty, poi, off, size = partition.dv
            dead = set(
                deserialize_rba(
                    read_dv_descriptor(
                        {
                            "storageType": st_ty,
                            "pathOrInlineDv": poi,
                            "offset": off,
                            "sizeInBytes": size,
                        }
                    )
                )
            )
            if dead:
                starts = []
                pos = 0
                for g in range(pf.metadata.num_row_groups):
                    starts.append(pos)
                    pos += pf.metadata.row_group(g).num_rows
                mask = []
                for g in groups:
                    base = starts[g]
                    mask.extend(
                        (base + i) not in dead
                        for i in range(pf.metadata.row_group(g).num_rows)
                    )
                tbl = tbl.filter(pa.array(mask))
        n = tbl.num_rows
        names = set(tbl.column_names)
        phys = partition.phys or {}
        arrays, out_names = [], []
        for f in st.fields:
            at = to_arrow_type(f.dataType)
            pname = phys.get(f.name, f.name)
            if f.name in partition.part_cols:
                v = _cast_pv(partition.partition_values.get(pname), f.dataType.simpleString())
                arrays.append(pa.array([v] * n, type=at))
            elif pname in names:
                col = tbl.column(pname).combine_chunks()
                if type(f.dataType).__name__ == "VariantType":
                    # shredded/unshredded variant → Spark's (value,
                    # metadata) binaries, reconstructed per spec
                    from ..plans.variant import variant_to_arrow

                    arrays.append(variant_to_arrow(col, at))
                else:
                    arrays.append(col if col.type == at else col.cast(at))
            else:  # pre-evolution file: evolved column is all-null
                arrays.append(pa.nulls(n, type=at))
            out_names.append(f.name)
        yield from pa.table(dict(zip(out_names, arrays))).to_batches()


class DeltaLitePushdownReader(DeltaLiteReader):
    """Opt-in pushdown flavor (option pushdown=true + the
    spark.sql.python.filterPushdown.enabled session conf)."""

    _CMP = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)

    def pushFilters(self, filters):
        _, _, part_cols, _phys = self._meta()
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col in part_cols and isinstance(f, EqualTo) and len(f.attribute) == 1:
                # exact at file granularity: accepted, not handed back
                self.pushed_partition.append(f)
            elif isinstance(f, self._CMP) and col and len(f.attribute) == 1:
                lo: Any = None
                hi: Any = None
                if isinstance(f, EqualTo):
                    lo = hi = f.value
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = f.value
                else:
                    hi = f.value
                self.pushed_bounds.setdefault(col, []).append((lo, hi))
                yield f  # stats pruning is file-level: Spark re-applies rows
            elif isinstance(f, IsNotNull):
                yield f
            else:
                yield f


@dataclass
class MetaPartition(InputPartition):
    root: str
    table: str
    version: int | None = None


class DeltaLiteMetaReader(DataSourceReader):
    """Metadata-table flavor: ``option("table", "history"|"files")`` plans
    ONE partition whose executor replays the log itself (pure-Python row
    builders shared with history_df/files_df) — metadata is
    O(commits)/O(files), so a single task is the right plan, and SQL users
    get ``DESCRIBE HISTORY`` through a plain temp view."""

    def __init__(self, options):
        self.root = options.get("path")
        self.table = options.get("table")
        v = options.get("version")
        self.version = int(v) if v is not None else None

    def partitions(self):
        return [MetaPartition(self.root, self.table, self.version)]

    def read(self, partition: MetaPartition):
        from ..plans.deltalog import DeltaTable

        t = DeltaTable(None, partition.root)
        if partition.table == "history":
            yield from t._history_rows()
        else:
            yield from t._files_rows(partition.version)


class DeltaLiteDataSource(DataSource):
    """``spark.read.format("delta_lite").option("version", 2).load(root)``;
    ``option("table", "history"|"files")`` selects a METADATA table instead
    of data (the SQL surface of DESCRIBE HISTORY / the files table)."""

    @classmethod
    def name(cls) -> str:
        return "delta_lite"

    def schema(self) -> str:
        from pyspark.sql.types import StructType

        from ..plans.deltalog import DeltaTable

        root = self.options.get("path")
        if not root:
            raise ValueError("delta_lite requires .load(<table root>)")
        meta_table = self.options.get("table")
        if meta_table == "history":
            return DeltaTable.HISTORY_DF_DDL
        if meta_table == "files":
            return DeltaTable.FILES_DF_DDL
        if meta_table is not None:
            raise ValueError(f"unknown metadata table {meta_table!r}")
        t = DeltaTable(None, root)
        v = self.options.get("version")
        st = StructType.fromJson(
            json.loads(t.snapshot(int(v) if v is not None else None)[1]["schemaString"])
        )
        return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in st.fields)

    def reader(self, schema) -> DataSourceReader:
        if self.options.get("table") is not None:
            return DeltaLiteMetaReader(self.options)
        if str(self.options.get("pushdown", "")).lower() == "true":
            return DeltaLitePushdownReader(self.options)
        return DeltaLiteReader(self.options)
