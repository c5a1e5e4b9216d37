#!/usr/bin/env python3
"""Generate QUERIES.md — the catalog of every registry query, its
one-line purpose (first docstring line), and its oracle status."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdfio_spark.pipeline.queries import ORACLES, QUERIES  # noqa: E402

GROUPS = [
    ("Extraction plane (full parse stack in the Arrow UDF)", "q_extract"),
    ("Document metadata / navigation", ("q_page", "q_outline", "q_doc")),
    ("Pipeline plane (verify / resume / metrics / skew)",
     ("q_verify", "q_resume", "q_skew")),
    ("SQL plane (joins / aggs / windows / set ops / sessions)",
     ("q_pricing", "q_top", "q_order", "q_regression", "q_events")),
    ("Training-data ops (dedup / similarity / text analysis)",
     ("q_dedup", "q_text", "q_repetition", "q_sample",
      "q_ann", "q_lsh", "q_ngram")),
    ("Multimodal plane", "q_media"),
    ("Web-page plane (HTML boilerplate strip)", "q_html"),
]


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    return doc[0] if doc else ""


def main() -> None:
    lines = ["# QUERIES — registry catalog",
             "",
             f"{len(QUERIES)} queries; {len(ORACLES)} with full DuckDB "
             "value-hash oracles, the rest rows-only (hash-seed or "
             "kern-sum dependent). Regenerate: "
             "`python3 tools/gen_query_catalog.py`.",
             ""]
    listed = set()
    for title, prefixes in GROUPS:
        if isinstance(prefixes, str):
            prefixes = (prefixes,)
        names = [n for n in QUERIES
                 if any(n.startswith(p) for p in prefixes)
                 and n not in listed]
        if not names:
            continue
        listed.update(names)
        lines.append(f"## {title}")
        lines.append("")
        lines.append("| query | oracle | purpose |")
        lines.append("|---|---|---|")
        for n in names:
            orc = "full" if n in ORACLES else "rows-only"
            lines.append(f"| `{n}` | {orc} | {first_line(QUERIES[n])} |")
        lines.append("")
    rest = [n for n in QUERIES if n not in listed]
    if rest:
        lines.append("## Other")
        lines.append("")
        lines.append("| query | oracle | purpose |")
        lines.append("|---|---|---|")
        for n in rest:
            orc = "full" if n in ORACLES else "rows-only"
            lines.append(f"| `{n}` | {orc} | {first_line(QUERIES[n])} |")
        lines.append("")
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "QUERIES.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"QUERIES.md: {len(QUERIES)} queries, {len(ORACLES)} oracled")


if __name__ == "__main__":
    main()
