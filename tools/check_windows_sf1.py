#!/usr/bin/env python3
"""Validate the window-query oracles (sessionize / running RANGE window
/ time rollup / asof) at sf~1 — a 10x deterministic replication of the
sf0.1 events table (event-id offsets + fixed value scaling; no RNG).
Flushes rounding-boundary flake classes that sf0.01 can't reach
(VERDICT r1 item 10).

Usage: python3 tools/check_windows_sf1.py [q_name ...]
"""
import os
import subprocess
import sys
import tempfile

import duckdb

QUERIES = ["q_events_sessionize", "q_events_running_window",
           "q_time_rollup", "q_asof_join"]

GEN_SQL = """
COPY (
  SELECT
    event_id + t.off * 100000              AS event_id,
    ts + to_seconds(t.off * 17)            AS ts,
    user_id + (t.off % 3) * 1500           AS user_id,
    event_type,
    round(value * (1.0 + t.off * 0.137), 2) AS value,
    props
  FROM '/root/testdata/sf0.1/events.parquet'
  CROSS JOIN (SELECT unnest(range(10)) AS off) t
) TO '{dest}' (FORMAT PARQUET)
"""


def main() -> int:
    names = sys.argv[1:] or QUERIES
    tmp = tempfile.mkdtemp(prefix="sf1_events_")
    evp = os.path.join(tmp, "events.parquet")
    con = duckdb.connect()
    con.execute(GEN_SQL.format(dest=evp))
    n = con.execute(f"SELECT count(*) FROM '{evp}'").fetchone()[0]
    print(f"synth events at {evp}: {n} rows")
    for t in ("orders", "lineitem", "customer", "documents", "embeddings",
              "supplier", "part", "nation", "region"):
        src = f"/root/testdata/sf0.1/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, os.path.join(tmp, f"{t}.parquet"))
    env = dict(os.environ, SF_DIR=tmp)
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "check_oracle.py")] + names,
        env=env).returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
