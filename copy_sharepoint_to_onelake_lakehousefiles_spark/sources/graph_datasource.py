"""A real pluggable source for the Graph-shaped tree listing: the PySpark
Python Data Source API (Spark 4) upgrade of `manifest.walk_tree`.

The reference lists a drive tree with driver-side recursion + cursor pages
(collect_files_recursive NB:213-236, list_children_paged NB:204-211) and
pushes `$filter`/`$select` to the service (NB:86/95/161 — O6 in SURVEY §2).
This source reproduces that split with Spark's own source contract:

- The DRIVER enumerates only the directory frontier (cheap: names, no file
  stats) and plans ONE InputPartition PER DIRECTORY.
- EXECUTORS page through their directory's listing and emit manifest rows —
  the per-page fetching the reference did serially on the driver runs in
  parallel across the cluster.
- `pushFilters` accepts size comparisons and name prefix/equality filters —
  the engine-side equivalent of the reference's server-evaluated OData
  `$filter` — so non-matching rows never leave the lister. Unsupported
  filters are returned to Spark, which re-applies them (correctness never
  depends on the pushdown).

Two backends behind the same planning:
- a local directory tree (same substitution as tests/test_copy.py), and
- a LIVE paged-REST listing when `path` is an http(s) URL: every directory
  is a JSON listing endpoint returning `{"value": [items...],
  "@odata.nextLink": "...?cursor=..."}` pages — the reference's cursor walk
  (NB:204-211) executed with real HTTP fetches (loopback-served in tests),
  executors following each directory's cursor chain in parallel.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from urllib.request import urlopen

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
    StringStartsWith,
)

MANIFEST_DDL = "file_id string, name string, rel_path string, download_url string, size long"


@dataclass
class DirPartition(InputPartition):
    dir_path: str  # filesystem path OR http(s) listing-endpoint URL
    rel_base: str


def _iter_pages(url: str, timeout: float = 30.0, auth=None):
    """Follow a cursor-paged listing: GET url → {"value": [...],
    "@odata.nextLink": next_url?} until no nextLink remains (the
    reference's list_children_paged loop, NB:204-211). `auth` is an O3
    token provider (sources/auth.py) supplying the bearer header the
    reference sends on every Graph call (NB:53-59)."""
    from urllib.error import HTTPError
    from urllib.request import Request

    while url:
        headers = auth.auth_headers() if auth is not None else {}
        try:
            with urlopen(Request(url, headers=headers), timeout=timeout) as r:
                page = json.load(r)
        except HTTPError as e:
            if e.code == 401 and auth is not None:  # expired → refresh once
                auth.invalidate()
                headers = auth.auth_headers()
                with urlopen(Request(url, headers=headers), timeout=timeout) as r:
                    page = json.load(r)
            else:
                raise
        yield from page.get("value", [])
        url = page.get("@odata.nextLink")


def _row_filter(filters: list[Filter]):
    """Compile the pushed filters into one row predicate (AND semantics)."""

    def keep(name: str, size: int) -> bool:
        for f in filters:
            col = f.attribute[0]
            if col == "name":
                if isinstance(f, EqualTo) and name != f.value:
                    return False
                if isinstance(f, StringStartsWith) and not name.startswith(f.value):
                    return False
            elif col == "size":
                if isinstance(f, GreaterThan) and not size > f.value:
                    return False
                if isinstance(f, GreaterThanOrEqual) and not size >= f.value:
                    return False
                if isinstance(f, LessThan) and not size < f.value:
                    return False
                if isinstance(f, LessThanOrEqual) and not size <= f.value:
                    return False
                if isinstance(f, EqualTo) and size != f.value:
                    return False
        return True

    return keep


class GraphManifestReader(DataSourceReader):
    """Base reader: partition-per-directory planning, NO pushFilters —
    merely defining pushFilters makes Spark demand the
    `spark.sql.python.filterPushdown.enabled` conf, which a stock session
    lacks; the pushdown flavor is the opt-in subclass below."""

    def __init__(self, options):
        raw = options.get("path")
        self.http = str(raw).startswith(("http://", "https://"))
        if self.http:
            self.root = raw
        else:
            self.root = os.path.abspath(raw)
            if not os.path.isdir(self.root):
                raise FileNotFoundError(self.root)
        self.pushed: list[Filter] = []
        # O3: optional client-credentials auth for the http backend —
        # .option("auth_token_url", ...).option("auth_client_id", ...)
        # .option("auth_client_secret", ...)[.option("auth_scope", ...)]
        self.auth = None
        if self.http and options.get("auth_token_url"):
            from .auth import ClientCredentialsTokenProvider

            self.auth = ClientCredentialsTokenProvider(
                options.get("auth_token_url"),
                options.get("auth_client_id", ""),
                options.get("auth_client_secret", ""),
                scope=options.get("auth_scope"),
            )

    def partitions(self):
        # Frontier walk over DIRECTORIES only — the driver never touches
        # file metadata; that cost is paid inside each partition's read().
        # In http mode the driver pages each directory's listing just to
        # find subfolders (cheap: names + facets), exactly the recursion
        # the reference runs on the driver (NB:213-236) — but file-row
        # emission happens in read(), parallel across executors.
        parts = [DirPartition(self.root, "")]
        frontier = [(self.root, "")]
        while frontier:
            nxt = []
            for d, base in frontier:
                for name, child in self._subdirs(d):
                    rel = f"{base}/{name}" if base else name
                    nxt.append((child, rel))
                    parts.append(DirPartition(child, rel))
            frontier = nxt
        return parts

    def _subdirs(self, d: str):
        if self.http:
            for item in _iter_pages(d, auth=self.auth):
                if "folder" in item and item.get("childrenUrl"):
                    yield item["name"], item["childrenUrl"]
        else:
            for e in sorted(os.scandir(d), key=lambda e: e.name):
                if e.is_dir():
                    yield e.name, e.path

    def read(self, partition: DirPartition):
        keep = _row_filter(self.pushed)
        base = partition.rel_base
        if self.http:
            for item in _iter_pages(partition.dir_path, auth=self.auth):
                if "folder" in item:
                    continue
                name, size = item["name"], int(item.get("size", 0))
                if not keep(name, size):
                    continue
                rel = f"{base}/{name}" if base else name
                yield (
                    item.get("id", rel),
                    name,
                    rel,
                    item.get("@microsoft.graph.downloadUrl") or item.get("downloadUrl"),
                    size,
                )
            return
        for e in sorted(os.scandir(partition.dir_path), key=lambda e: e.name):
            if not e.is_file():
                continue
            size = e.stat().st_size
            if not keep(e.name, size):
                continue
            rel = f"{base}/{e.name}" if base else e.name
            yield (partition.dir_path + "/" + e.name, e.name, rel, e.path, size)


class GraphManifestPushdownReader(GraphManifestReader):
    """Pushdown flavor (option pushdown=true): requires the session conf
    `spark.sql.python.filterPushdown.enabled=true`."""

    _SUPPORTED_COLS = {
        "name": (EqualTo, StringStartsWith),
        "size": (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual),
    }

    def pushFilters(self, filters):
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            supported = self._SUPPORTED_COLS.get(col, ())
            if isinstance(f, supported) and len(f.attribute) == 1:
                self.pushed.append(f)
            elif isinstance(f, IsNotNull):
                pass  # listing never emits null name/size — trivially satisfied
            else:
                yield f  # give it back: Spark re-applies it above the scan


class GraphManifestDataSource(DataSource):
    """`spark.read.format("graph_manifest").load(root)` after
    `spark.dataSource.register(GraphManifestDataSource)`. Pass
    .option("pushdown", "true") (plus the filterPushdown session conf) for
    source-side filtering."""

    @classmethod
    def name(cls) -> str:
        return "graph_manifest"

    def schema(self) -> str:
        return MANIFEST_DDL

    def reader(self, schema) -> GraphManifestReader:
        if str(self.options.get("pushdown", "")).lower() == "true":
            return GraphManifestPushdownReader(self.options)
        return GraphManifestReader(self.options)
