"""Forensic reproducer for the RSS fork-ghost fabrication (r11).

Runs a fork-heavy streaming query while sampling the process tree with
the PRE-FIX walk (smaps_rollup Pss where readable, stat-RSS fallback
otherwise) and records the per-proc table at the worst sample. On the
unfixed walk this catches ~9 "Executor task launch worker" JVM fork
children, each reporting the FULL parent JVM RSS (pure COW, no readable
smaps_rollup yet) — a fabricated ~30 GB "peak" for a ~4 GB workload.
bench.py's fixed sampler counts such ghosts as zero; this script keeps
the evidence reproducible.

Usage: python scripts/exp_rss_ghost.py
"""
import os, sys, threading, time
sys.path.insert(0, "/root/repo")
from tmdb_sync_spark.session import get_spark
import tmdb_sync_spark.all_queries  # noqa
from tmdb_sync_spark.registry import QUERIES
from tmdb_sync_spark.util import reset_materialization_cache

_PAGE = os.sysconf("SC_PAGE_SIZE")

def tree_table():
    me = os.getpid()
    ppid, rss, names = {}, {}, {}
    for d in os.listdir("/proc"):
        if not d.isdigit(): continue
        try:
            with open(f"/proc/{d}/stat") as fh:
                raw = fh.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            tail = raw.rsplit(")", 1)[1].split()
        except OSError: continue
        pid = int(d)
        ppid[pid] = int(tail[1]); rss[pid] = int(tail[21]); names[pid] = comm
    kids = {}
    for p, pp in ppid.items(): kids.setdefault(pp, []).append(p)
    rows, stack = [], [me]
    while stack:
        p = stack.pop()
        pss = None
        try:
            with open(f"/proc/{p}/smaps_rollup") as fh:
                for line in fh:
                    if line.startswith("Pss:"):
                        pss = int(line.split()[1]) * 1024; break
        except OSError:
            pass
        val = pss if pss is not None else rss.get(p, 0) * _PAGE
        rows.append((val, p, names.get(p, "?"), ppid.get(p, -1),
                     "pss" if pss is not None else "rss"))
        stack.extend(kids.get(p, ()))
    return rows

spark = get_spark("hunt-ghost")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
spark.range(1000).collect()

best = {"tot": 0, "rows": []}
stop = threading.Event()

def sampler():
    while not stop.is_set():
        rows = tree_table()
        tot = sum(r[0] for r in rows)
        if tot > best["tot"]:
            best["tot"] = tot; best["rows"] = rows
        stop.wait(0.05)

t = threading.Thread(target=sampler, daemon=True); t.start()
for attempt in range(4):
    for _ in range(2):
        reset_materialization_cache(kinds=("staged",))
        QUERIES["st1_st3_ingest_resume"](spark, sf).write.format(
            "noop").mode("overwrite").save()
    print(f"attempt {attempt}: running max {best['tot']/1e6:,.0f}MB",
          flush=True)
    if best["tot"] > 10e9:
        break
stop.set(); t.join(2)
print(f"PEAK {best['tot']/1e6:,.0f}MB over {len(best['rows'])} procs; top:")
for val, pid, comm, pp, src in sorted(best["rows"], reverse=True)[:15]:
    print(f"  {val/1e6:10,.0f}MB pid={pid} ppid={pp} {comm} [{src}]")
spark.stop()
