#!/usr/bin/env python3
"""Sustained-throughput soak (the BASELINE.md protocol, now pinned as
a script): materialize an N-doc corpus to parquet, then time the
extraction stage alone reading from that parquet — corpus synthesis is
excluded, exactly like a production run over an existing crawl table.

Usage: python3 tools/soak.py [pdf|html|dedup] [n_docs]  (default pdf 1e6)
Env:   SPARK_GRAFT_CPUS (default 32), SOAK_DIR (default /tmp/soak),
       SOAK_SMJ=1 disables broadcast joins (autoBroadcastJoinThreshold
       =-1) so every join runs the at-scale sort-merge path — the
       100 TB join shape, where key skew actually forms stragglers
       (r5 verdict #6; same rationale as bench_skew_crossover.py)

dedup mode: the corpus is n_docs with 200-way exact duplication (the
clique stress from BENCH/BASELINE.md) run through dedup_keep_list —
the composed operator whose exact-first ordering is the point.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "pdf"
    n_docs = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    soak_dir = os.environ.get("SOAK_DIR", "/tmp/soak")
    sf_dir = "/root/testdata/sf0.1"

    from pdfio_spark.pipeline.session import get_spark
    spark = get_spark(cpus=cpus, app=f"pdfio_soak_{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    smj = os.environ.get("SOAK_SMJ") == "1"
    if smj:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    if mode == "dedup":
        from pdfio_spark.pipeline.queries import dedup_keep_list
        tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
        k = max(1, n_docs // max(tbl.count(), 1))
        reps = spark.range(k).select(F.col("id").alias("rep"))
        docs = (tbl.select("doc_id", "text").crossJoin(reps)
                .select((F.col("doc_id") * k + F.col("rep"))
                        .alias("doc_id"), "text")
                .limit(n_docs).repartition(cpus * 2).localCheckpoint())
        n = docs.count()
        t0 = time.perf_counter()
        out = dedup_keep_list(docs)
        n_rows = out.count()
        n_kept = out.filter("is_kept").count()
        dt = time.perf_counter() - t0
        print(json.dumps({"mode": mode, "smj": smj, "n_docs": n,
                          "rows": n_rows, "kept": n_kept,
                          "sec": round(dt, 1),
                          "docs_per_sec": round(n / dt, 1)}))
        spark.stop()
        return

    tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tbl.count()
    k = max(1, (n_docs + base - 1) // base)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    docs = (tbl.select("doc_id", "text", "lang").crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                    .alias("doc_id"), "text", "lang")
            .limit(n_docs))
    corpus_path = os.path.join(soak_dir, f"{mode}_corpus")
    shutil.rmtree(corpus_path, ignore_errors=True)

    if mode == "pdf":
        from pdfio_spark.pipeline.job import extract_pdfs, gen_pdf_corpus
        gen_pdf_corpus(docs.select("doc_id", "text")).write \
            .parquet(corpus_path)
        run = extract_pdfs
    else:
        from pdfio_spark.pipeline.html_extract import (extract_html,
                                                       gen_html_corpus)
        gen_html_corpus(docs).write.parquet(corpus_path)
        run = extract_html

    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    nbytes = corpus.agg(F.sum("nbytes")).collect()[0][0]
    # fan out: a parquet-file partitioning is byte-based; the UDF cost
    # is per-row CPU (CLAUDE.md perf lesson)
    corpus = corpus.repartition(cpus * 4)

    t0 = time.perf_counter()
    out = run(corpus)
    agg = out.groupBy("status").agg(F.count("*").alias("c")).collect()
    dt = time.perf_counter() - t0
    n_ok = sum(r["c"] for r in agg if r["status"] == "ok")
    print(json.dumps({
        "mode": mode, "n_docs": n, "ok": n_ok,
        "corpus_mb": round((nbytes or 0) / 1e6, 1),
        "sec": round(dt, 1),
        "docs_per_sec": round(n / dt, 1),
        "statuses": {r["status"]: r["c"] for r in agg},
    }))
    shutil.rmtree(corpus_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
