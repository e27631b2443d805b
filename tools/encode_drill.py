#!/usr/bin/env python3
"""Testdata-regeneration fire drill: re-encode a driver SF dir the way a
previous testdata generation shipped it (TIMESTAMP(NANOS) for events.ts,
l_shipdate, o_orderdate — the round-9 encoding whose silent switch to
MICROS broke 17 queries in round 10), then run the full Verify + DuckDB
gate against the replica. The loaders' schema-adaptive normalization
(sources/Tables.scala) must make the replica's results identical to the
original dir's.

Usage: python3 tools/encode_drill.py [sfDir] [workDir]
Expected outcome: check.py deltas vs the same run on sfDir are ZERO
(the sf0.01-pinned *_sig literals fail identically on both when run at a
different SF — compare failure SETS, not absolute pass counts).
"""
import sys, os, shutil, subprocess
import pyarrow as pa
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_encode_drill"
data, out = f"{work}/data", f"{work}/verify"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(data)

NANOS = {"events": ["ts"], "lineitem": ["l_shipdate"], "orders": ["o_orderdate"]}
for p in os.listdir(sf):
    t = p.replace(".parquet", "")
    if t in NANOS:
        tb = pq.read_table(f"{sf}/{p}")
        for c in NANOS[t]:
            i = tb.schema.get_field_index(c)
            tb = tb.set_column(i, c, tb.column(c).cast(pa.timestamp("ns")))
        pq.write_table(tb, f"{data}/{p}", version="2.6")
    else:
        shutil.copy(f"{sf}/{p}", f"{data}/{p}")

jars = ":".join(
    f"/opt/spark/jars/{j}" for j in os.listdir("/opt/spark/jars") if j.endswith(".jar"))
cp = f"{jars}:target/scala-2.13/classes"
subprocess.run(["java", "-cp", cp, "graft.Verify", data, out], check=True)
rc = subprocess.run(
    [sys.executable, "tools/check.py", data, out]).returncode
print(f"[drill] check.py rc={rc} against the NANOS replica of {sf}")
sys.exit(rc)
