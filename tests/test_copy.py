"""Copy subsystem: manifest walk (pagination, facets), idempotent planning
(anti-join), distributed execution, grant planner — the reference's whole
behavior surface (NB:110-305) under test, which the reference itself lacks."""

import os

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.copy_plan import (
    PERMISSIONS_SCHEMA,
    copy_tree,
    execute_copy,
    plan_copy,
    plan_grants,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.manifest import (
    MANIFEST_SCHEMA,
    manifest_from_local_dir,
    manifest_from_tree,
    walk_tree,
)


def _build_tree(root):
    os.makedirs(os.path.join(root, "sub1", "sub2"))
    os.makedirs(os.path.join(root, "empty_dir"))
    with open(os.path.join(root, "a.csv"), "w") as f:
        f.write("x,y\n1,2\n")
    with open(os.path.join(root, "sub1", "b.bin"), "wb") as f:
        f.write(b"\x01\x02" * 100)
    with open(os.path.join(root, "sub1", "sub2", "c.txt"), "w") as f:
        f.write("hello\n")


# --- Graph-shaped paged walk (FIXTURES.md B2) -------------------------------

PAGES = {
    "root#1": {
        "value": [
            {"id": "F1", "name": "sub1", "folder": {"childCount": 2}},
            {
                "id": "I1",
                "name": "a.csv",
                "file": {"mimeType": "text/csv"},
                "size": 8,
                "@microsoft.graph.downloadUrl": "u/a.csv",
            },
        ],
        "@odata.nextLink": "root#2",
    },
    "root#2": {
        "value": [
            {"id": "I2", "name": "package.one", "package": {"type": "oneNote"}},  # neither facet
            {
                "id": "I3",
                "name": "nourl.dat",
                "file": {"mimeType": "x"},
                "size": 1,
                # no downloadUrl → planner must skip it
            },
        ],
        "@odata.nextLink": None,
    },
    "children/F1": {
        "value": [
            {
                "id": "I4",
                "name": "b bin.dat",
                "file": {"mimeType": "x"},
                "size": 9,
                "@microsoft.graph.downloadUrl": "u/b%20bin.dat",
            }
        ],
        "@odata.nextLink": None,
    },
}


def test_walk_tree_pagination_facets_and_paths():
    rows = list(walk_tree(PAGES.__getitem__, "root#1", lambda i: f"children/{i}"))
    by_name = {r["name"]: r for r in rows}
    # package (neither facet) dropped, both pages consumed, folder recursed
    assert set(by_name) == {"a.csv", "nourl.dat", "b bin.dat"}
    assert by_name["b bin.dat"]["rel_path"] == "sub1/b bin.dat"
    assert by_name["a.csv"]["rel_path"] == "a.csv"
    assert by_name["nourl.dat"]["download_url"] is None


def test_plan_copy_drops_null_urls_and_already_copied(spark):
    manifest = manifest_from_tree(
        spark, PAGES.__getitem__, "root#1", lambda i: f"children/{i}"
    )
    assert manifest.schema == MANIFEST_SCHEMA
    todo = plan_copy(manifest, existing=None)
    assert {r["name"] for r in todo.collect()} == {"a.csv", "b bin.dat"}

    existing = spark.createDataFrame([("a.csv",)], "rel_path string")
    todo2 = plan_copy(manifest, existing)
    assert {r["name"] for r in todo2.collect()} == {"b bin.dat"}


# --- end-to-end local copy ---------------------------------------------------


def test_copy_tree_roundtrip_and_idempotency(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_tree(src)

    result = copy_tree(spark, src, dst)
    rows = result.collect()
    assert all(r["status"] == "ok" for r in rows)
    assert len(rows) == 3
    # byte-exact copies, tree shape preserved
    assert open(os.path.join(dst, "sub1", "sub2", "c.txt")).read() == "hello\n"
    assert (
        open(os.path.join(dst, "sub1", "b.bin"), "rb").read()
        == open(os.path.join(src, "sub1", "b.bin"), "rb").read()
    )
    # second run: nothing to do (the reference re-copies everything — we don't)
    assert copy_tree(spark, src, dst).count() == 0


def test_execute_copy_reports_errors_not_raises(spark, tmp_path):
    manifest = spark.createDataFrame(
        [("x", "ghost.bin", "ghost.bin", "/nonexistent/ghost.bin", 1)], MANIFEST_SCHEMA
    )
    out = execute_copy(plan_copy(manifest, None), str(tmp_path / "dst")).collect()
    assert len(out) == 1 and out[0]["status"] == "error" and out[0]["error"]


# --- grant planner (FIXTURES.md B3, NB:110-144) ------------------------------


def test_plan_grants_idempotent(spark):
    perms = spark.createDataFrame(
        [
            (
                "P1",
                ["write"],
                [{"application": {"id": "app-b", "displayName": "MySite-Access"}}],
            )
        ],
        PERMISSIONS_SCHEMA,
    )
    desired = spark.createDataFrame(
        [("app-a", "Copier"), ("app-b", "MySite-Access")], "app_id string, display_name string"
    )
    todo = plan_grants(desired, perms).collect()
    # app-b already granted → only app-a planned, with write role
    assert [(r["app_id"], r["roles"]) for r in todo] == [("app-a", ["write"])]


def test_manifest_from_local_dir_rel_paths(spark, tmp_path):
    src = str(tmp_path / "src")
    _build_tree(src)
    m = manifest_from_local_dir(spark, src)
    rels = {r["rel_path"] for r in m.collect()}
    assert rels == {"a.csv", "sub1/b.bin", "sub1/sub2/c.txt"}
    sizes = {r["rel_path"]: r["size"] for r in m.collect()}
    assert sizes["sub1/b.bin"] == 200


def test_local_fetcher_adapts_fs_to_graph_protocol(spark, tmp_path):
    src = str(tmp_path / "src2")
    _build_tree(src)
    from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.manifest import local_fetcher

    fetch, root_url, child_url = local_fetcher(src)
    rows = list(walk_tree(fetch, root_url, child_url))
    assert {r["rel_path"] for r in rows} == {"a.csv", "sub1/b.bin", "sub1/sub2/c.txt"}
    # facet discrimination happened through the page protocol, not os.walk
    assert all(r["download_url"] for r in rows)


def test_manifest_from_tree_empty(spark, tmp_path):
    empty = tmp_path / "nothing"
    empty.mkdir()
    from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.manifest import local_fetcher

    fetch, root_url, child_url = local_fetcher(str(empty))
    m = manifest_from_tree(spark, fetch, root_url, child_url)
    assert m.count() == 0
    assert m.schema == MANIFEST_SCHEMA


def test_observe_metrics_on_copy_result(spark, tmp_path):
    """O23 (success counter) the Spark-native way: df.observe attaches
    aggregate metrics to the copy-result materialization — no second pass
    over the data, no driver-side counting loop (NB:283/303/305)."""
    from pyspark.sql import Observation

    src = str(tmp_path / "src3")
    _build_tree(src)
    obs = Observation("copy_metrics")
    result = copy_tree(spark, src, str(tmp_path / "dst3")).observe(
        obs,
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
        F.sum("bytes").alias("total_bytes"),
    )
    result.collect()
    got = obs.get
    assert got["n_files"] == 3 and got["n_ok"] == 3 and got["total_bytes"] > 0


def test_plan_sync_actions(spark, tmp_path):
    """new / changed / unchanged / orphan classification from a full-outer
    manifest compare."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.copy_plan import plan_sync
    from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.manifest import (
        manifest_from_local_dir,
    )

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    for d in (src, dst):
        d.mkdir()
    (src / "same.txt").write_bytes(b"identical")
    (dst / "same.txt").write_bytes(b"identical")
    (src / "changed.txt").write_bytes(b"new content longer")
    (dst / "changed.txt").write_bytes(b"old")
    (src / "fresh.txt").write_bytes(b"brand new")
    (dst / "stale.txt").write_bytes(b"only in dest")

    plan = plan_sync(
        manifest_from_local_dir(spark, str(src)), manifest_from_local_dir(spark, str(dst))
    )
    actions = {r["rel_path"]: r["action"] for r in plan.collect()}
    assert actions == {
        "same.txt": "unchanged",
        "changed.txt": "changed",
        "fresh.txt": "new",
        "stale.txt": "orphan",
    }


def test_copy_retry_and_checksum(spark, tmp_path):
    """A copy records the md5 of what it wrote and attempts=1 on clean runs;
    a missing source exhausts max_attempts and lands as an error row."""
    import hashlib

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.copy_plan import execute_copy

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(b"payload-a")
    manifest = spark.createDataFrame(
        [
            ("id-a", str(src / "a.bin"), "a.bin", 9),
            ("id-b", str(src / "missing.bin"), "missing.bin", 0),
        ],
        "file_id: string, download_url: string, rel_path: string, size: long",
    )
    result = execute_copy(manifest, str(tmp_path / "dst"), max_attempts=2, backoff_s=0.0)
    rows = {r["file_id"]: r for r in result.collect()}
    ok = rows["id-a"]
    assert ok["status"] == "ok" and ok["attempts"] == 1
    assert ok["checksum"] == hashlib.md5(b"payload-a").hexdigest()
    bad = rows["id-b"]
    assert bad["status"] == "error" and bad["attempts"] == 2 and bad["checksum"] is None


def test_verify_copy_detects_corruption(spark, tmp_path):
    """verify_copy: clean copies verify; a post-copy corruption and a deleted
    file surface as mismatch / missing."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.copy_plan import (
        copy_tree,
        verify_copy,
    )

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        (src / f"f{i}.bin").write_bytes(b"x" * (i + 1) * 10)
    dest = tmp_path / "dst"
    result = copy_tree(spark, str(src), str(dest)).cache()
    assert result.where("status = 'ok'").count() == 4

    (dest / "f0.bin").write_bytes(b"corrupted!")
    (dest / "f1.bin").unlink()
    verdict = {r["dest_path"].split("/")[-1]: r["verify_status"]
               for r in verify_copy(spark, result, str(dest)).collect()}
    assert verdict["f0.bin"] == "mismatch"
    assert verdict["f1.bin"] == "missing"
    assert verdict["f2.bin"] == "verified" and verdict["f3.bin"] == "verified"


def test_verify_copy_with_relative_dest_root(spark, tmp_path):
    """verify_copy must anchor the recorded dest_path and the binaryFile
    scan on the same absolute form — a relative dest_root used to mis-join
    and report every file as missing."""
    import os

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.copy_plan import (
        copy_tree,
        verify_copy,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "one.bin").write_bytes(b"payload-1")
    (src / "two.bin").write_bytes(b"payload-22")
    rel_dest = os.path.relpath(str(tmp_path / "dst"), os.getcwd())
    result = copy_tree(spark, str(src), rel_dest).cache()
    assert result.where("status = 'ok'").count() == 2
    verdict = {
        r["dest_path"].split("/")[-1]: r["verify_status"]
        for r in verify_copy(spark, result, rel_dest).collect()
    }
    assert verdict == {"one.bin": "verified", "two.bin": "verified"}
