#!/usr/bin/env python3
"""Testdata-regeneration fire drill: re-encode a driver SF dir the way a
previous testdata generation shipped it (TIMESTAMP(NANOS) for events.ts,
l_shipdate, o_orderdate — the round-9 encoding whose silent switch to
MICROS broke 17 queries in round 10), then run the full Verify + DuckDB
gate against BOTH the replica and the unmodified dir and compare the
failure SETS. The loaders' schema-adaptive normalization
(sources/Tables.scala) must make the replica's outcome identical to the
original's — absolute pass counts are NOT the bar, because the
sf0.01-pinned *_sig literals fail identically on both dirs when the
drill runs at a different SF.

Usage: python3 tools/encode_drill.py [sfDir] [workDir]
Exit 0 iff the replica's per-query outcome set matches the original's.
"""
import sys, os, re, shutil, subprocess
import pyarrow as pa
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_encode_drill"
data = f"{work}/data"
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


def gate(src, out):
    """Verify + check.py on one dir; returns the set of FAILed query names.

    Hard-fails if check.py produced no PASS lines or died abnormally: an
    empty failure set must mean "everything passed", never "the gate
    itself crashed on both dirs and the sets vacuously matched"."""
    subprocess.run(["java", "-cp", cp, "graft.Verify", src, out], check=True)
    r = subprocess.run([sys.executable, "tools/check.py", src, out],
                       capture_output=True, text=True)
    fails = set(re.findall(r"^FAIL (\S+):", r.stdout, re.M))
    passes = len(re.findall(r"^PASS ", r.stdout, re.M))
    print(f"[drill] {src}: rc={r.returncode} passes={passes} fails={sorted(fails)}")
    if passes == 0 or r.returncode not in (0, 1):
        print(f"[drill] check.py did not gate (rc={r.returncode}); stderr tail:")
        print(r.stderr[-2000:])
        sys.exit(2)
    return fails


base_fails = gate(sf, f"{work}/verify_base")
repl_fails = gate(data, f"{work}/verify_replica")
delta = base_fails ^ repl_fails
if delta:
    print(f"[drill] FAILURE-SET DELTA vs NANOS replica: {sorted(delta)}")
else:
    print("[drill] zero delta: the NANOS replica gates identically")
sys.exit(1 if delta else 0)
