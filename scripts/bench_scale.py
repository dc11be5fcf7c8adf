#!/usr/bin/env python
"""Scale-evidence bench (VERDICT r5 #6): measure the dedup/ANN tier's
wall-time at sf0.1 AND at a 10x-inflated copy, so the scaling exponent is
MEASURED rather than inferred from plan shapes.

Inflation = every document/embedding duplicated 10x under fresh ids — the
adversarial direction for dedup (every copy group collides in every LSH
band) and a fair one for ANN (10x corpus, same dimensionality).

Writes ONE JSON line:
  {"metric": "scale_ratio_10x", "queries": {q: {"base_sec": .., "x10_sec": ..,
   "ratio": ..}}, "rows": {...}, "sf": 0.1}

Near-linear operators should land ratio <= ~12 (10x data + constant
overheads); anything super-linear flags a candidate-generation blowup.

Usage: python scripts/bench_scale.py [out.json]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from copy_sharepoint_to_onelake_lakehousefiles_spark import all_queries  # noqa: E402
from copy_sharepoint_to_onelake_lakehousefiles_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q22_exact_dedup",
    "q26_minhash_lsh_pairs",
    "q153_exact_substring_dup",
    "q164_ivfpq_ann_topk",
    # r13 (VERDICT r12 #4): the round-12 flagship plan changes get
    # committed at-scale numbers too. q27 pins the join-free posting-list
    # candidate plan (output grows ~quadratically inside duplicate groups
    # — read the per-krow columns, not the raw ratio); q30 pins the
    # norms-below-the-join exact cosine kernel (pure compute, constant
    # output). q54's fixture is synthetic (sf-independent), so the copy
    # subsystem gets its own 10x file-count block below.
    "q27_ngram_jaccard_pairs",
    "q30_cosine_topk",
]


def build_inflated(spark, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    d = spark.read.parquet(os.path.join(src, "documents.parquet"))
    (
        d.withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .withColumn("doc_id", (F.col("doc_id") * 10 + F.col("copy")).cast("long"))
        .select(d.columns)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "documents.parquet"))
    )
    e = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    (
        e.withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .withColumn("vec_id", (F.col("vec_id") * 10 + F.col("copy")).cast("long"))
        .select(e.columns)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "embeddings.parquet"))
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE_local.json"
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # pay the session's first Python-worker/Arrow fork outside the timings
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(warm("id")).count()

    inflated = os.path.join(
        tempfile.gettempdir(), f"bench_scale_{os.getpid()}"
    )
    build_inflated(spark, base, inflated)
    qs = all_queries()
    result = {"metric": "scale_ratio_10x", "sf": 0.1, "queries": {}, "rows": {}}
    try:
        # r13 measurement fix: several queries memoize bounded per-session
        # intermediates (exact_topk/exact_l2 memos, the IVF centroid list,
        # track_persist'ed shingle tables). The warm run used to leave the
        # BASE timed run a cache hit while the x10 run (different sf_dir
        # key) computed fresh — inflating ratios for exactly the queries
        # the memos help (q30 read 19x while its compute is ~linear).
        # Resetting the session memos before EVERY timed run times the
        # computation at both scales; the warm run still pays JIT/codegen.
        from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import (
            pq as _pq,
        )
        from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import (
            similarity as _sim,
        )
        from copy_sharepoint_to_onelake_lakehousefiles_spark.registry import (
            release_caches,
        )

        def _reset_session_memos() -> None:
            release_caches(0)
            _sim._EXACT_TOPK_CACHE.clear()
            _sim._IVF_CENTS_CACHE.clear()
            _pq._EXACT_L2_CACHE.clear()

        for name in QUERIES:
            qs[name](spark, base).count()  # warm code paths once per query
            rec = {}
            _reset_session_memos()
            t0 = time.time()
            n_base = qs[name](spark, base).count()
            rec["base_sec"] = round(time.time() - t0, 3)
            _reset_session_memos()
            t0 = time.time()
            n_10 = qs[name](spark, inflated).count()
            rec["x10_sec"] = round(time.time() - t0, 3)
            rec["ratio"] = round(rec["x10_sec"] / max(rec["base_sec"], 1e-9), 2)
            # output-normalized view (VERDICT r8 ask #3): dedup-style
            # queries emit MORE rows on duplicated data (q26's 10x ratio is
            # dominated by ~1000x pair growth, not compute) — report the
            # output growth and sec-per-1k-output-rows so compute scaling
            # reads separately from output scaling
            rec["rows_ratio"] = round(n_10 / max(n_base, 1), 2)
            rec["base_sec_per_krow"] = round(
                rec["base_sec"] / max(n_base / 1000.0, 1e-9), 4
            )
            rec["x10_sec_per_krow"] = round(
                rec["x10_sec"] / max(n_10 / 1000.0, 1e-9), 4
            )
            result["queries"][name] = rec
            result["rows"][name] = {"base": n_base, "x10": n_10}
        worst = max(r["ratio"] for r in result["queries"].values())
        result["worst_ratio"] = worst
        result["worst_compute_ratio"] = max(
            # wall ratio divided by output growth, floored at the 10x input
            # growth denominator=1: a ratio per unit of OUTPUT
            round(r["x10_sec_per_krow"] / max(r["base_sec_per_krow"], 1e-9), 2)
            for r in result["queries"].values()
        )
        # r13: the near-linear verdict reads the OUTPUT-NORMALIZED ratio
        # (the r8 columns). The raw wall ratio conflates output growth
        # with compute for dedup-style queries — q26/q27 legitimately
        # emit ~1000x the pairs on a 90%-duplicate corpus, so their raw
        # ratio tracks the answer size, not the algorithm. worst_ratio
        # stays reported raw for the constant-output queries' benefit.
        result["near_linear"] = result["worst_compute_ratio"] <= 12.0
        # FORCED FLOOD ROUTE (r8): the 10x corpus is 90% duplicates, but at
        # sf0.1 it sits below PROBE_MIN_ROWS, so the direct route above is
        # what ran. Lower the probe gate to 0 so the same inflated corpus
        # routes through _lsh_pairs_flood_route (sha2 pre-dedup → LSH on
        # representatives → keyed-join expansion) and measure it — the
        # flood route must be output-identical and no slower than the
        # direct route at equal duplication.
        from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import dedup as _dedup

        q26 = "q26_minhash_lsh_pairs"
        old_gate = _dedup.PROBE_MIN_ROWS
        _dedup.PROBE_MIN_ROWS = 0
        try:
            qs[q26](spark, inflated).count()  # warm the flood code path
            t0 = time.time()
            n_flood = qs[q26](spark, inflated).count()
            flood_sec = round(time.time() - t0, 3)
        finally:
            _dedup.PROBE_MIN_ROWS = old_gate
        direct = result["queries"][q26]
        # the scale-path view: at production row counts the footer-row
        # probe routes q26's exact-copy flood through the flood route, so
        # the fleet-relevant worst ratio substitutes it for q26-direct.
        # r13: compute-normalized like near_linear above (the flood
        # route's per-krow wall vs the direct base's per-krow wall).
        flood_compute_ratio = round(
            (flood_sec / max(n_flood / 1000.0, 1e-9))
            / max(direct["base_sec_per_krow"], 1e-9),
            2,
        )
        result["worst_ratio_scale_path"] = round(
            max(
                flood_compute_ratio
                if name == q26
                else round(
                    r["x10_sec_per_krow"] / max(r["base_sec_per_krow"], 1e-9), 2
                )
                for name, r in result["queries"].items()
            ),
            2,
        )
        result["near_linear_scale_path"] = result["worst_ratio_scale_path"] <= 12.0
        result["flood_route"] = {
            "x10_sec": flood_sec,
            "ratio": round(flood_sec / max(direct["base_sec"], 1e-9), 2),
            "direct_ratio": direct["ratio"],
            "x10_sec_per_krow": round(
                flood_sec / max(n_flood / 1000.0, 1e-9), 4
            ),
            "flood_not_slower": flood_sec <= direct["x10_sec"] * 1.1,
            "rows_match_direct": n_flood == result["rows"][q26]["x10"],
        }
        # BLOOM POINT-LOOKUP FLATNESS (r9): on hash-laid-out Delta tables
        # at 1x and 10x rows, a files_point lookup's wall time should stay
        # ~flat (stats + bloom probes are metadata-bound; only the hit
        # file is read) while a full filter scan grows with the data. The
        # pair of ratios is the scale story for q202's tier.
        from pyspark.sql import functions as F

        from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import (
            DeltaTable,
        )

        ev = spark.read.parquet(os.path.join(base, "events.parquet")).select(
            F.col("event_id").cast("long").alias("event_id"), "event_type", "value"
        )
        ev10 = (
            ev.withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(9))))
            .withColumn(
                "event_id", (F.col("event_id") * 10 + F.col("c")).cast("long")
            )
            .drop("c")
        )
        pl: dict = {}
        for tag, df, nfiles in (("base", ev, 8), ("x10", ev10, 8)):
            troot = os.path.join(inflated, f"bloom_{tag}")
            n_rows = df.count()
            # size the bloom for the keys each FILE will actually hold —
            # an under-declared ndv saturates the bitset and the fp rate
            # explodes (measured: 20k ndv under 125k inserts → ~80% fp)
            t = DeltaTable.create(
                spark,
                troot,
                df.repartition(nfiles, "event_id"),
                bloom_filters={"event_id": max(1000, n_rows // nfiles)},
            )
            key = 4242  # mid-range: inside every file's hash-layout span
            t.point_lookup("event_id", key).count()  # warm
            t0 = time.time()
            n_hit = t.point_lookup("event_id", key).count()
            pl[f"{tag}_lookup_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            t.read().where(F.col("event_id") == key).count()
            pl[f"{tag}_scan_sec"] = round(time.time() - t0, 3)
            pl[f"{tag}_files_read"] = len(t.files_point("event_id", key))
            pl[f"{tag}_rows"] = n_hit
        pl["lookup_ratio"] = round(
            pl["x10_lookup_sec"] / max(pl["base_lookup_sec"], 1e-9), 2
        )
        pl["scan_ratio"] = round(
            pl["x10_scan_sec"] / max(pl["base_scan_sec"], 1e-9), 2
        )
        pl["lookup_flat"] = pl["lookup_ratio"] <= 3.0
        result["bloom_point_lookup"] = pl
        # WIDE-DELETE DV CONSTRUCTION (r10, VERDICT r9 ask #1): deletion
        # vectors are built and serialized EXECUTOR-side (one applyInPandas
        # group per touched file unions ordinals with the old DV and writes
        # the blob task-side); the driver collects only O(touched files)
        # descriptor rows, so a 50% delete should scale near-linearly with
        # data while driver traffic stays constant at the file count.
        wd: dict = {}
        # pay the DV applyInPandas/roaring code-path warm-up outside the
        # timed runs (a 100-row throwaway table) so base vs x10 is apples
        warm_root = os.path.join(inflated, "wdel_warm")
        DeltaTable.create(
            spark, warm_root, ev.limit(100).repartition(2, "event_id")
        ).delete_vectors("event_id % 2 = 0")
        for tag, df, nfiles in (("base", ev, 8), ("x10", ev10, 8)):
            troot = os.path.join(inflated, f"wdel_{tag}")
            t = DeltaTable.create(spark, troot, df.repartition(nfiles, "event_id"))
            t0 = time.time()
            out = t.delete_vectors("event_id % 2 = 0")
            wd[f"{tag}_delete_sec"] = round(time.time() - t0, 3)
            wd[f"{tag}_rows_deleted"] = out["deleted"]
            wd[f"{tag}_files_touched"] = out["files_updated"]
            # post-delete read correctness at scale: survivors only
            wd[f"{tag}_survivors"] = t.read().count()
        wd["delete_ratio"] = round(
            wd["x10_delete_sec"] / max(wd["base_delete_sec"], 1e-9), 2
        )
        wd["near_linear"] = wd["delete_ratio"] <= 12.0
        wd["driver_rows_collected_base"] = wd["base_files_touched"]
        wd["driver_rows_collected_x10"] = wd["x10_files_touched"]
        result["wide_delete_dv"] = wd
        # INCREMENTAL NEAR-DUP (r10): dedup a FIXED small batch against a
        # persisted index at 1x and 10x corpus size. The incremental wall
        # should stay ~flat while a full recompute grows with the corpus —
        # the batch is shingled alone and joins the streamed index.
        from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.dedup import (
            NearDupIndex,
            _lsh_scored_pairs,
            _shingled,
        )

        docs = spark.read.parquet(os.path.join(base, "documents.parquet")).select(
            "doc_id", "text"
        )
        docs10 = spark.read.parquet(
            os.path.join(inflated, "documents.parquet")
        ).select("doc_id", "text")
        batch = docs.where(F.col("doc_id") % 100 == 7).withColumn(
            "doc_id", (F.col("doc_id") + 10_000_000).cast("long")
        )
        n_batch = batch.count()
        inc: dict = {"batch_rows": n_batch}
        for tag, corpus in (("base", docs), ("x10", docs10)):
            iroot = os.path.join(inflated, f"ndidx_{tag}")
            t0 = time.time()
            idx = NearDupIndex.build(spark, iroot, corpus)
            inc[f"{tag}_build_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            n_pairs = idx.dedup_incremental(batch).count()
            inc[f"{tag}_incremental_sec"] = round(time.time() - t0, 3)
            inc[f"{tag}_pairs"] = n_pairs
        t0 = time.time()
        _lsh_scored_pairs(_shingled(docs.unionByName(batch))).count()
        inc["base_full_recompute_sec"] = round(time.time() - t0, 3)
        inc["incremental_ratio_10x"] = round(
            inc["x10_incremental_sec"] / max(inc["base_incremental_sec"], 1e-9), 2
        )
        # the per-batch win at base scale: incremental vs full recompute
        inc["speedup_vs_full_base"] = round(
            inc["base_full_recompute_sec"] / max(inc["base_incremental_sec"], 1e-9),
            2,
        )
        result["incremental_neardup"] = inc
        # INCREMENTAL ANALYZE (r10): full analyze at 1x vs incremental
        # after appending ~10% — the incremental pass hashes only the new
        # files, so its wall should track the append, not the table.
        from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import (
            IcebergTable,
        )

        ia: dict = {}
        aroot = os.path.join(inflated, "inc_analyze")
        evt = ev10.select("event_id", "event_type", "value")
        # 8-file corpus + 1-file append: the incremental pass should cost
        # ~1/9th of the full pass (it reads only the appended file)
        t = IcebergTable.create(
            spark, aroot, evt.where(F.col("event_id") % 11 != 0).repartition(8)
        )
        t0 = time.time()
        t.analyze(columns=["event_id", "event_type"])
        ia["full_sec"] = round(time.time() - t0, 3)
        t.append(evt.where(F.col("event_id") % 11 == 0).coalesce(1))
        t0 = time.time()
        out = t.analyze_incremental()
        ia["incremental_sec"] = round(time.time() - t0, 3)
        ia["mode"] = out["mode"]
        ia["files_hashed"] = out.get("files_hashed")
        ia["files_total"] = out.get("files_total")
        ia["speedup"] = round(ia["full_sec"] / max(ia["incremental_sec"], 1e-9), 2)
        result["incremental_analyze"] = ia
        # STATS-DRIVEN JOIN PLANNER (r10): per-partition ANALYZE scales
        # with the data (one pass for all columns), but the PLANNING
        # decision itself reads only manifests + Puffin blobs — its wall
        # must stay ~flat at 10x rows, and its cardinality estimate must
        # match the true join size (PK-FK containment → the System-R
        # formula is exact).
        from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.joinplan import (
            execute_equi_join,
            plan_equi_join,
        )

        jp: dict = {}
        for tag, df in (("base", ev), ("x10", ev10)):
            froot = os.path.join(inflated, f"plan_f_{tag}")
            droot = os.path.join(inflated, f"plan_d_{tag}")
            ft = IcebergTable.create(
                spark,
                froot,
                df.repartition(4, "event_id"),
                partition_by=["event_type"],
            )
            t0 = time.time()
            ft.analyze_partitions(columns=["event_id", "event_type"])
            jp[f"{tag}_analyze_partitions_sec"] = round(time.time() - t0, 3)
            dim = (
                df.select(F.col("event_type").alias("etype"))
                .distinct()
                .withColumn("weight", F.lit(1.0))
            )
            dt = IcebergTable.create(spark, droot, dim.coalesce(1))
            dt.analyze(columns=["etype"])
            plan_equi_join(ft, dt, "event_type", "etype")  # warm
            t0 = time.time()
            dec = plan_equi_join(ft, dt, "event_type", "etype")
            jp[f"{tag}_plan_sec"] = round(time.time() - t0, 3)
            actual = execute_equi_join(
                dec, ft.read(), dt.read(), "event_type", "etype"
            ).count()
            jp[f"{tag}_strategy"] = dec["strategy"]
            jp[f"{tag}_est_rows"] = dec["est_rows"]
            jp[f"{tag}_actual_rows"] = actual
            jp[f"{tag}_est_exact"] = dec["est_rows"] == actual
        jp["analyze_ratio"] = round(
            jp["x10_analyze_partitions_sec"]
            / max(jp["base_analyze_partitions_sec"], 1e-9),
            2,
        )
        jp["plan_ratio"] = round(
            jp["x10_plan_sec"] / max(jp["base_plan_sec"], 1e-9), 2
        )
        jp["plan_flat"] = jp["plan_ratio"] <= 3.0
        result["stats_join_planner"] = jp
        # PER-FILE NDV / ndv_bounds (r11): analyze_files is one pass over
        # the data (scales with rows); the DISTINCT-UNDER-RANGE answer is
        # a metadata-only sketch union — its wall must stay ~flat at 10x
        # and the bracket must contain the exact count at both scales.
        nb_res: dict = {}
        for tag, df in (("base", ev), ("x10", ev10)):
            nroot = os.path.join(inflated, f"ndvb_{tag}")
            nt = IcebergTable.create(
                spark,
                nroot,
                df.select("event_id", "event_type", "value").repartitionByRange(
                    8, "event_id"
                ),
            )
            t0 = time.time()
            nt.analyze_files(columns=["event_id"])
            nb_res[f"{tag}_analyze_files_sec"] = round(time.time() - t0, 3)
            # bounded: one min/max row
            r = df.agg(F.min("event_id"), F.max("event_id")).collect()[0]
            lo = int(r[0]) + (int(r[1]) - int(r[0])) // 4
            hi = int(r[0]) + (int(r[1]) - int(r[0])) // 2
            nt.ndv_bounds("event_id", lo, hi)  # warm
            t0 = time.time()
            nb = nt.ndv_bounds("event_id", lo, hi)
            nb_res[f"{tag}_bounds_sec"] = round(time.time() - t0, 3)
            exact = (
                df.where(F.col("event_id").between(lo, hi))
                .select("event_id")
                .distinct()
                .count()
            )
            # estimation mode at these cardinalities (>> k=4096): the
            # bracket ends are ESTIMATES of true-bound quantities, so the
            # check carries the sketch's ~3-sigma 5% band
            nb_res[f"{tag}_bracket_ok"] = bool(
                nb["ndv_lower"] <= exact * 1.05
                and exact <= nb["ndv_upper"] * 1.05
            )
        nb_res["analyze_ratio"] = round(
            nb_res["x10_analyze_files_sec"]
            / max(nb_res["base_analyze_files_sec"], 1e-9),
            2,
        )
        nb_res["bounds_ratio"] = round(
            nb_res["x10_bounds_sec"] / max(nb_res["base_bounds_sec"], 1e-9), 2
        )
        nb_res["bounds_flat"] = nb_res["bounds_ratio"] <= 3.0
        result["ndv_bounds"] = nb_res
        # MULTI-WAY JOIN ORDERING (r12): the subset DP reads only
        # manifests + Puffin sketches — ANALYZE scales with the data, but
        # the ordering decision itself must stay ~flat at 10x rows and
        # pick the same (dimension-first) tree at both scales.
        from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.joinplan import (
            plan_join_tree,
        )

        jo: dict = {}
        for tag, df in (("base", ev), ("x10", ev10)):
            star_roots = {
                a: os.path.join(inflated, f"jo_{a}_{tag}")
                for a in ("fact", "dtype", "dbucket")
            }
            fact_df = df.select(
                "event_id",
                "event_type",
                (F.col("event_id") % 50).alias("vbucket"),
            )
            ftab = IcebergTable.create(
                spark, star_roots["fact"], fact_df.repartition(4)
            )
            ftab.analyze(columns=["event_type", "vbucket"])
            d1 = df.select(F.col("event_type").alias("etype")).distinct()
            t1 = IcebergTable.create(spark, star_roots["dtype"], d1.coalesce(1))
            t1.analyze(columns=["etype"])
            d2 = (
                fact_df.select(F.col("vbucket").alias("vb"))
                .distinct()
                .withColumn("vb_label", F.concat(F.lit("b"), F.col("vb")))
            )
            t2 = IcebergTable.create(spark, star_roots["dbucket"], d2.coalesce(1))
            t2.analyze(columns=["vb"])
            tabs = {"fact": ftab, "dtype": t1, "dbucket": t2}
            preds = [
                ("fact", "event_type", "dtype", "etype"),
                ("fact", "vbucket", "dbucket", "vb"),
            ]
            plan_join_tree(tabs, preds)  # warm
            t0 = time.time()
            plan = plan_join_tree(tabs, preds)
            jo[f"{tag}_plan_sec"] = round(time.time() - t0, 3)
            jo[f"{tag}_order"] = plan["order"]
            jo[f"{tag}_cost_le_naive"] = plan["cost"] <= plan["naive_cost"]
        jo["plan_ratio"] = round(
            jo["x10_plan_sec"] / max(jo["base_plan_sec"], 1e-9), 2
        )
        jo["plan_flat"] = jo["plan_ratio"] <= 3.0
        jo["order_stable"] = jo["base_order"] == jo["x10_order"]
        result["join_ordering"] = jo
        # COPY SUBSYSTEM 10x (r13, VERDICT r12 #4): q54's fixture is
        # synthetic (256 × 16 KB files, independent of sf_dir), so its
        # scale evidence times the same engine pass — copy_tree + the
        # fused (count, ok-count, byte-sum) aggregate, q54's exact timed
        # region — on a 10x FILE COUNT. Parallelism comes from the
        # listing scan's size-based splits (the r12 change); near-linear
        # wall at 10x files is the claim under test.
        from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.copy_plan import (
            copy_tree,
        )

        def _copy_probe(n_files: int) -> float:
            croot = os.path.join(inflated, f"copy_{n_files}")
            src, dst = os.path.join(croot, "src"), os.path.join(croot, "dst")
            for dnum in range(8):
                os.makedirs(os.path.join(src, f"d{dnum}"))
            payload = bytes(range(256)) * 64  # 16 KB
            for i in range(n_files):
                with open(
                    os.path.join(src, f"d{i % 8}", f"f{i:05d}.bin"), "wb"
                ) as fh:
                    fh.write(payload)
            t0 = time.time()
            row = (
                copy_tree(spark, src, dst)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count(F.when(F.col("status") == "ok", 1)).alias("ok"),
                    F.sum("bytes").alias("b"),
                )
                .collect()[0]  # bounded: 1-row agg (q54's timed shape)
            )
            sec = round(time.time() - t0, 3)
            shutil.rmtree(croot, ignore_errors=True)
            assert int(row["n"]) == int(row["ok"]) == n_files, row
            return sec

        _copy_probe(256)  # warm the copy/scan code paths once
        cp = {
            "base_sec": _copy_probe(256),
            "x10_sec": _copy_probe(2560),
            "base_files": 256,
            "x10_files": 2560,
        }
        cp["ratio"] = round(cp["x10_sec"] / max(cp["base_sec"], 1e-9), 2)
        cp["near_linear"] = cp["ratio"] <= 12.0
        result["copy_scale"] = cp
    finally:
        shutil.rmtree(inflated, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
