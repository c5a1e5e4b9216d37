#!/usr/bin/env python3
"""Benchmark harness — one JSON line for the driver.

Headline metric: PDFs extracted/sec through the full pipeline (corpus
synthesis excluded from the timed region via cache+count; extraction
UDF + skew repartition + status agg included). Secondary: the SQL and
training-data plane queries.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_REPLICATE (corpus multiplier, default 4 -> 20k PDFs at sf0.1),
     BENCH_PROTOCOL ("steady" = extract best-of-3 / queries best-of-2,
     the default; "cold" = every timing single-shot, first-run warm-up
     included — kept so round-over-round comparisons can be made under
     either discipline, see BENCH/BASELINE.md r4 dual-protocol table).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pdfio_spark.pipeline.session import get_spark  # noqa: E402
from pdfio_spark.pipeline.job import (extract_pdfs,  # noqa: E402
                                      gen_pdf_corpus)
from pdfio_spark.pipeline import queries as Q  # noqa: E402

BENCH_QUERIES = [
    "q_pricing_summary", "q_top_customers", "q_order_priority_window",
    "q_events_sessionize", "q_dedup_pipeline", "q_text_analytics",
    "q_repetition_filter", "q_ann_bruteforce", "q_dedup_minhash",
    "q_ngram_jaccard", "q_asof_join", "q_time_rollup", "q_range_join",
    "q_ann_lsh_topk", "q_ann_ivf", "q_html_main", "q_line_dedup",
    "q_substr_dedup",
]


def replicate_corpus(spark, sf_dir: str, k: int,
                     extra_cols: tuple = ()):
    """Deterministically scale the synthetic corpus: k replicas of each
    document's TEXT under distinct doc_ids. The +rep*1_000_000 offset
    deliberately shifts each replica's fixture class and 'Doc <id>:'
    prefix (1e6 % 25 != 0), so replicas are distinct PDFs exercising
    the full class rotation — NOT byte-identical copies (r5 review:
    the old docstring claimed same-bytes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = [c for c in extra_cols if c in docs.columns]
    if k <= 1:
        return docs.select("doc_id", "text", *extra)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    return (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                    .alias("doc_id"), "text", *extra))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = int(os.environ.get("BENCH_REPLICATE", "4"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    protocol = os.environ.get("BENCH_PROTOCOL", "steady")
    reps_extract, reps_query = (3, 2) if protocol == "steady" else (1, 1)

    spark = get_spark(cpus=cpus, app="pdfio_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}

    # ---- headline: PDF extraction throughput ----
    docs = replicate_corpus(spark, sf_dir, k)
    corpus = gen_pdf_corpus(docs).cache()
    n_pdfs = corpus.count()  # materialize corpus outside the timed region
    sum_bytes = corpus.agg(F.sum("nbytes")).collect()[0][0]

    # best-of-3: the sandbox VM shows double-digit run-to-run variance
    t_extract = None
    for _ in range(reps_extract):
        t0 = time.perf_counter()
        ext = extract_pdfs(corpus)
        agg = (ext.groupBy("status")
               .agg(F.count("*").alias("n"), F.sum("n_pages").alias("pages"))
               .collect())
        dt = time.perf_counter() - t0
        t_extract = dt if t_extract is None else min(t_extract, dt)
    n_ok = sum(r["n"] for r in agg if r["status"] == "ok")
    n_pages = sum(r["pages"] or 0 for r in agg)
    results["q_extract_corpus"] = round(t_extract, 3)
    corpus.unpersist()

    # ---- secondary queries ----
    # best-of-2 per query, same rationale as the best-of-3 headline:
    # the sandbox VM drifts by tens of percent between runs, and the
    # first Arrow-UDF job after a stretch of SQL-plane queries pays a
    # multi-second worker re-warm that steady-state throughput doesn't.
    # The timing discipline is declared in the output JSON ("timing").
    for name in BENCH_QUERIES:
        # r6: q_dedup_minhash left the 50-entry driver registry (slot
        # freed for q_substr_dedup) but stays in the bench series —
        # resolve retired production variants from the module
        fn = Q.QUERIES.get(name) or getattr(Q, name)
        best = None
        for _ in range(reps_query):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)

    pdfs_per_sec = n_pdfs / t_extract if t_extract > 0 else 0.0
    out = {
        "metric": "pdfs_extracted_per_sec",
        "value": round(pdfs_per_sec, 2),
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "n_pdfs": n_pdfs,
        "n_ok": n_ok,
        "n_pages": int(n_pages),
        "corpus_mb": round((sum_bytes or 0) / 1e6, 1),
        "cpus": cpus,
        "extract_sec": round(t_extract, 3),
        "timing": ("extract best-of-3, queries best-of-2 (steady-state; "
                   "VM run-to-run variance is double-digit)"
                   if protocol == "steady" else
                   "cold: every timing single-shot incl. first-run "
                   "warm-up (r2-and-earlier protocol)"),
    }
    # attach the latest pinned local[8]/local[32] study if present
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        out["scaling"] = {
            "local8_pdfs_per_sec": sc["local8"]["pdfs_per_sec"],
            "local32_pdfs_per_sec": sc["local32"]["pdfs_per_sec"],
            "efficiency_8_to_32": sc["scaling_efficiency"],
        }
        if "local2" in sc:
            out["scaling"]["local2_pdfs_per_sec"] = \
                sc["local2"]["pdfs_per_sec"]
        if "scaling_efficiency_2_to_8" in sc:
            # the N->4N pair measured where the sandbox's memory-
            # bandwidth ceiling (pure-Python scales 0.77 at 8->32)
            # does not bind — the honest pipeline-scaling number
            out["scaling"]["efficiency_2_to_8"] = \
                sc["scaling_efficiency_2_to_8"]
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
