"""Pluggable BATCH source for Iceberg v2 tables — the twin of
``delta_datasource`` over ``plans/iceberg.IcebergTable``, so Iceberg tables
reach ``spark.read.format("iceberg_lite")`` / temp views / plain
``spark.sql`` through Spark's own source contract.

- DRIVER planning resolves the snapshot from vN.metadata.json + the Avro
  manifest tree (two-level pruning happens there: manifest partition
  summaries, then per-file partition tuples + Appendix-D bounds) and plans
  ONE InputPartition per surviving data file.
- EXECUTORS read their file with pyarrow into Arrow RecordBatches, overlay
  identity partition values from the manifest tuple (the migrated-table
  fill — correct whether or not the file carries the columns), and
  null-fill columns the file predates.
- Pushdown flavor (``.option("pushdown", "true")`` + the
  ``spark.sql.python.filterPushdown.enabled`` conf): partition-column
  equality accepted outright; data-column comparisons prune files via
  manifest bounds but are handed back for row-level re-application.

Options: ``snapshot_index`` (chronological time travel), ``pushdown``.
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
class IceFilePartition(InputPartition):
    path: str | None  # None = empty-snapshot sentinel
    partition_values: dict  # typed values from the manifest's partition record
    schema_json: str  # Spark StructType JSON
    part_cols: list
    # equality-delete files applicable to THIS data file (strictly newer
    # sequence number): [(delete_file_path, [key_col, ...]), ...]
    deletes: list
    # position-delete specs applicable to THIS data file (seq >= the data
    # file's): [("parquet", path) | ("puffin", path, offset, size,
    # referenced_data_file), ...] — applied FIRST, because pos values
    # are row ordinals of the ORIGINAL file
    pos_deletes: list
    # target-name → write-time-name map when this file's schema diverges
    # from the target (rename/drop evolution, resolved BY FIELD ID at
    # planning); None = names match; a None VALUE = field id absent from
    # the file (reads null)
    colmap: dict | None = None
    # pushed [lo, hi] bounds by TARGET column name: the executor prunes ROW
    # GROUPS by footer statistics (translated to write-time names) before
    # reading pages — the granularity below manifest/file-level pruning
    bounds: dict | None = None
    # v3 column defaults: target-name → PYTHON value of initial-default,
    # applied when the field id is ABSENT from this file's write schema
    # (colmap value None) — spec §Default values; null-fill otherwise
    defaults: dict | None = None


class IcebergLiteReader(DataSourceReader):
    def __init__(self, options):
        from ..plans.iceberg import IcebergTable

        root = options.get("path")
        if not root:
            raise ValueError("iceberg_lite requires .load(<table root>)")
        self._t = IcebergTable(None, root)
        idx = options.get("snapshot_index")
        self.index = int(idx) if idx is not None else None
        self.partition_filter: dict = {}
        self.pushed_bounds: dict[str, list] = {}

    def partitions(self):
        bounds = None
        if self.pushed_bounds:
            bounds = {
                c: (
                    max((lo for lo, _ in cmp if lo is not None), default=None),
                    min((hi for _, hi in cmp if hi is not None), default=None),
                )
                for c, cmp in self.pushed_bounds.items()
            }
        entries, _audit = self._t.files(
            index=self.index,
            partition_filter=self.partition_filter or None,
            bounds=bounds,
        )
        schema_json = self._t.schema(index=self.index).json()
        md0 = self._t.metadata()
        part_cols_by_spec = {
            # identity fields only: bucket/truncate tuple values are
            # derived, never overlaid — the source columns are in the file
            sp["spec-id"]: [
                pf["name"]
                for pf in self._t.partition_fields(sp["spec-id"])
                if pf["transform"] == "identity"
            ]
            for sp in md0["partition-specs"]
        }
        # id-based evolution: recover each file's write-time schema from its
        # sequence number and plan a target-name → write-name map when they
        # diverge (rename/drop) — mirrors IcebergTable._read_data_entries
        md_ = self._t.metadata()
        tgt_sid = self._t._schema_id_for(index=self.index)
        schemas_by_id = {s["schema-id"]: s for s in md_["schemas"]}
        tgt_fields = schemas_by_id[tgt_sid]["fields"]
        seq_to_sid = {
            s["sequence-number"]: s.get("schema-id", tgt_sid)
            for s in md_["snapshots"]
        }

        def colmap_for(e: dict) -> dict | None:
            wsid = seq_to_sid.get(e.get("__seq"), tgt_sid)
            if wsid == tgt_sid or wsid not in schemas_by_id:
                return None
            w_by_id = {f["id"]: f["name"] for f in schemas_by_id[wsid]["fields"]}
            m = {f["name"]: w_by_id.get(f["id"]) for f in tgt_fields}
            return None if all(k == v for k, v in m.items()) else m

        # v3 column defaults (spec §Default values): initial-default as a
        # PYTHON value per target name, applied executor-side when the
        # field id is absent from a file's write schema
        from ..plans.iceberg import default_python_value

        dflt_by_name = {
            f["name"]: default_python_value(f["type"], f["initial-default"])
            for f in tgt_fields
            if f.get("initial-default") is not None
        } or None
        # merge-on-read: ship each data file's APPLICABLE equality-delete
        # files (strictly newer sequence number) into its partition so the
        # executor applies the anti-join locally
        md = self._t.metadata()
        id_to_name = {
            f["id"]: f["name"] for s in md["schemas"] for f in s["fields"]
        }
        dels = self._t.delete_entries(index=self.index)
        eq_dels = [d for d in dels if d.get("content") == 2]
        pos_dels = [d for d in dels if d.get("content") == 1]
        out = []
        for e in entries:
            applicable = [
                (
                    d["data_file"]["file_path"].replace("file:", ""),
                    [id_to_name[i] for i in d["equality_ids"]],
                )
                for d in eq_dels
                if d["seq"] > e["__seq"]
            ]
            pos_applicable = []
            for d in pos_dels:
                if d["seq"] < e["__seq"]:
                    continue
                dfm = d["data_file"]
                if (dfm.get("file_format") or "").upper() == "PUFFIN":
                    # v3 deletion vector: ship the blob span; the executor
                    # decodes the Roaring bitmap (plans/puffin.py) iff the
                    # DV references THIS data file
                    pos_applicable.append(
                        (
                            "puffin",
                            dfm["file_path"].replace("file:", ""),
                            int(dfm["content_offset"]),
                            int(dfm["content_size_in_bytes"]),
                            dfm["referenced_data_file"].replace("file:", ""),
                        )
                    )
                else:
                    pos_applicable.append(
                        ("parquet", dfm["file_path"].replace("file:", ""))
                    )
            out.append(
                IceFilePartition(
                    e["file_path"].replace("file:", ""),
                    dict(e["partition"]),
                    schema_json,
                    # the file's OWN spec's partition columns: under
                    # partition evolution, columns outside it come straight
                    # from the data file
                    part_cols_by_spec.get(e.get("__spec", 0), []),
                    applicable,
                    pos_applicable,
                    colmap_for(e),
                    bounds or None,
                    dflt_by_name,
                )
            )
        if not out:
            # the Python Data Source API requires >= 1 partition; an empty
            # snapshot plans one empty sentinel
            out.append(IceFilePartition(None, {}, schema_json, [], [], []))
        return out

    def read(self, partition: IceFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType

        if partition.path is None:  # empty-snapshot sentinel
            return
        st = StructType.fromJson(json.loads(partition.schema_json))
        # compat open: VARIANT-bearing files carry a logical type this
        # container's pyarrow cannot parse — the footer patch makes them
        # readable (plans/variant.py)
        from ..plans.variant import open_parquet_compat

        pf = open_parquet_compat(partition.path)
        groups = list(range(pf.metadata.num_row_groups))
        if partition.bounds:
            # bounds are keyed by TARGET names; row-group stats carry the
            # file's WRITE-TIME names — translate through colmap, dropping
            # identity-partition columns (constant per file, pruned at
            # planning) and renamed-away fields (no stats to consult)
            from .delta_datasource import select_row_groups

            cm0 = partition.colmap or {}
            wb = {}
            for c, b in partition.bounds.items():
                if c in partition.part_cols:
                    continue
                w = cm0.get(c, c)
                if w is not None:
                    wb[w] = b
            if wb:
                groups = select_row_groups(pf.metadata, wb)
        if not groups:
            return
        tbl = pf.read_row_groups(groups)
        # merge-on-read step 1: position deletes FIRST — their pos values
        # are ordinals of the ORIGINAL file, so with row groups skipped
        # each kept group's rows re-base by its cumulative start offset
        if partition.pos_deletes and tbl.num_rows:
            def _norm(p: str) -> str:
                for pre in ("file://", "file:"):
                    if p.startswith(pre):
                        return p[len(pre):]
                return p

            me = _norm(partition.path)
            dead_pos: set = set()
            for spec in partition.pos_deletes:
                if spec[0] == "puffin":
                    _kind, dpath, off, size, ref = spec
                    if _norm(ref) != me:
                        continue
                    from ..plans.puffin import read_dv_positions

                    dead_pos.update(read_dv_positions(dpath, off, size))
                    continue
                _kind, dpath = spec
                dt = pq.read_table(dpath, columns=["file_path", "pos"])
                fps = dt.column("file_path").to_pylist()
                poss = dt.column("pos").to_pylist()
                dead_pos.update(
                    p for fp, p in zip(fps, poss) if _norm(fp) == me
                )
            if dead_pos:
                starts = []
                pos0 = 0
                for g in range(pf.metadata.num_row_groups):
                    starts.append(pos0)
                    pos0 += pf.metadata.row_group(g).num_rows
                mask_vals = []
                for g in groups:
                    base = starts[g]
                    mask_vals.extend(
                        (base + i) not in dead_pos
                        for i in range(pf.metadata.row_group(g).num_rows)
                    )
                tbl = tbl.filter(pa.array(mask_vals))
        # merge-on-read step 2: apply this file's equality deletes executor-
        # side (pandas anti-join per delete key-set; delete files are
        # metadata-sized relative to data)
        for dpath, key_cols in partition.deletes:
            if tbl.num_rows == 0:
                break
            dt = pq.read_table(dpath, columns=key_cols)
            dead = set(zip(*[dt.column(c).to_pylist() for c in key_cols]))
            if not dead:
                continue
            cols_present = [c for c in key_cols if c in tbl.column_names]
            if len(cols_present) != len(key_cols):
                continue  # key column absent: equality can never match
            rows = zip(*[tbl.column(c).to_pylist() for c in key_cols])
            mask = pa.array([t not in dead for t in rows])
            tbl = tbl.filter(mask)
        n = tbl.num_rows
        names = set(tbl.column_names)
        cm = partition.colmap
        arrays, out_names = [], []
        for f in st.fields:
            at = to_arrow_type(f.dataType)
            # id-based evolution: read this file's column under its WRITE-
            # TIME name; a None mapping = field id absent (renamed-away or
            # post-drop re-add) → null, never the stale same-named column
            wname = cm.get(f.name, f.name) if cm is not None else f.name
            if f.name in partition.part_cols:
                # identity partition value is constant per file BY DEFINITION
                # — overlay from the manifest (migrated-table fill)
                arrays.append(pa.array([partition.partition_values.get(f.name)] * n, type=at))
            elif wname is not None and wname in names:
                col = tbl.column(wname).combine_chunks()
                if type(f.dataType).__name__ == "VariantType":
                    # shredded/unshredded variant → Spark's (value,
                    # metadata) binaries, reconstructed per spec
                    from ..plans.variant import variant_to_arrow

                    arrays.append(variant_to_arrow(col, at))
                else:
                    arrays.append(col if col.type == at else col.cast(at))
            elif (
                wname is None
                and partition.defaults
                and f.name in partition.defaults
            ):
                # field id absent from this file's write schema → the v3
                # initial-default, not null (spec §Default values)
                arrays.append(
                    pa.array([partition.defaults[f.name]] * n, type=at)
                )
            else:
                arrays.append(pa.nulls(n, type=at))
            out_names.append(f.name)
        yield from pa.table(dict(zip(out_names, arrays))).to_batches()


class IcebergLitePushdownReader(IcebergLiteReader):
    _CMP = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)

    def pushFilters(self, filters):
        md = self._t.metadata()
        # a partition EqualTo is file-EXACT (consumable) only when every
        # spec in the table partitions by the column; under partition
        # evolution old-spec files can't be tuple-pruned, so the filter is
        # still used for pruning but handed back for row re-application
        per_spec = [
            {pf["name"] for pf in self._t.partition_fields(sp["spec-id"])}
            for sp in md["partition-specs"]
        ]
        part_cols = set.intersection(*per_spec) if per_spec else set()
        any_part_cols = set.union(*per_spec) if per_spec else set()
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col in part_cols and isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.partition_filter[col] = f.value  # file-exact: consumed
            elif (
                col in any_part_cols and isinstance(f, EqualTo) and len(f.attribute) == 1
            ):
                self.partition_filter[col] = f.value  # prune what we can...
                yield f  # ...but old-spec files need the row filter
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
                yield f  # manifest-bounds pruning is file-level only
            elif isinstance(f, IsNotNull):
                yield f
            else:
                yield f


@dataclass
class IceMetaPartition(InputPartition):
    root: str
    table: str


class IcebergLiteMetaReader(DataSourceReader):
    """Metadata-table flavor (option table = snapshots|files|manifests|refs|partitions):
    one partition whose executor walks the table metadata itself — the SQL
    surface of the metadata tables."""

    def __init__(self, options):
        self.root = options.get("path")
        self.table = options.get("table")

    def partitions(self):
        return [IceMetaPartition(self.root, self.table)]

    def read(self, partition: IceMetaPartition):
        from ..plans.iceberg import IcebergTable

        t = IcebergTable(None, partition.root)
        if partition.table == "files":
            yield from t._files_rows()
        elif partition.table == "partitions":
            yield from t._partitions_rows()
        elif partition.table == "manifests":
            yield from t._manifests_rows()
        elif partition.table == "refs":
            yield from t._refs_rows()
        else:
            yield from t._snapshots_rows()


class IcebergLiteDataSource(DataSource):
    """``spark.read.format("iceberg_lite").option("snapshot_index", 1)
    .load(root)`` after registration; ``option("table", "snapshots")``
    selects the snapshots METADATA table instead of data."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_lite"

    def schema(self) -> str:
        from ..plans.iceberg import IcebergTable

        root = self.options.get("path")
        if not root:
            raise ValueError("iceberg_lite requires .load(<table root>)")
        meta_table = self.options.get("table")
        if meta_table == "snapshots":
            return IcebergTable.SNAPSHOTS_DF_DDL
        if meta_table == "files":
            return IcebergTable.FILES_DF_DDL
        if meta_table == "manifests":
            return IcebergTable.MANIFESTS_DF_DDL
        if meta_table == "refs":
            return IcebergTable.REFS_DF_DDL
        if meta_table == "partitions":
            return IcebergTable.PARTITIONS_DF_DDL
        if meta_table is not None:
            raise ValueError(f"unknown metadata table {meta_table!r}")
        idx = self.options.get("snapshot_index")
        st = IcebergTable(None, root).schema(
            index=int(idx) if idx is not None else None
        )
        return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in st.fields)

    def reader(self, schema) -> DataSourceReader:
        if self.options.get("table") is not None:
            return IcebergLiteMetaReader(self.options)
        if str(self.options.get("pushdown", "")).lower() == "true":
            return IcebergLitePushdownReader(self.options)
        return IcebergLiteReader(self.options)
