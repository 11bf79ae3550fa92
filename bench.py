#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion with the noop sink (full compute,
no driver-side result transfer) after a short JVM warmup.

Environment knobs:
- SPARK_GRAFT_BENCH_REPS (default 4): timed executions per query. Run 1
  is recorded as "first_rep" — on the process's FIRST attempt it is the
  true cold run (whole-stage-codegen compile included); on retry
  attempts the JVM is already JIT-warm, so the field is named for what
  it measurably is (the attempt's first rep), not "cold" (r9 verdict
  #8: the old name overclaimed). "warm" is the MEDIAN of runs 2..N
  (3 warm reps by default), so the recorded artifact is noise-robust
  and a single JIT-tier-up outlier (e.g. the documented
  dd_embedding_cosine 2.355 → 0.674 warm-up step) can never masquerade
  as a regression. Set to 2 for a quick single-warm-rep iteration loop.
- SPARK_GRAFT_BENCH_ATTEMPTS (default 3): max suite attempts when the
  host self-labels contended (see below). Set to 1 to force the old
  single-shot behavior.

Coverage (r9 verdict #3): the HEADLINE list is frozen for r7+ artifact
comparability; every OTHER driver-registry query gets a standing perf
row in a second measured section — `queries_extended` in the final
line (warm medians + its own contended flag), full forensics in
bench_detail.json — so no driver slot ships without a recorded number.

Contention self-SELECTION (r8 verdict #1): r7/r8 both recorded suites
from degraded host windows (BENCH_r08 went on record at 39.8 s while the
code's honest number was ~23 s). Labeling alone wasn't enough — a gate
or a reader of artifacts alone misfires. Now, when a suite's floor pair
flags contention, the whole timed suite re-runs (up to ATTEMPTS, with a
cooldown) and the artifact records the BEST HEALTHY attempt — or, if
every attempt was contended, the best attempt still flagged
contended=true. Every attempt's total/ratios stay in the artifact
(`attempts`), so nothing is hidden.

Contention LABELING (r10 verdict #1 — the r10 headline shipped tainted
because both bracket samples read just under the old 6.0 flag while the
host degraded mid-suite): three defenses now decide the flag, unit-
replayed in tests/test_bench_labeling.py:
(a) floor pairs are sampled every FLOOR_SAMPLE_EVERY queries, not just
    at the brackets, and the WORST sample decides;
(b) CONTENDED_RATIO is 5.0 — just above the measured JVM-alive healthy
    band (3.7-4.5); r10's 5.85 weather now flags;
(c) a per-query family-history check: warm median > FAMILY_OUTLIER_X ×
    the query's median across prior rounds' same-SF artifacts marks the
    attempt contended even with clean floors (`family_outliers` names
    the evidence — a REAL code regression also trips this, so read the
    field: host weather moves many queries, a regression moves the one
    you changed). The family LOADER carries the re-baselining path
    (r11 ADVICE — see FAMILY_PERSIST): floor-clean artifacts flagged
    only by outliers still feed the family for their non-outlier
    queries, and an outlier that persists FAMILY_PERSIST consecutive
    floor-clean rounds becomes the query's new baseline — a legitimate
    slowdown flags loudly twice, then the median moves on.

Memory signal (r11 verdict #4): the archived `max_rss_spike_mb` is the
worst WARM-rep spike (peak − at-rep-start tree PSS, reps 2..N) — rep-1
one-time model training (IVF k-means read 2288 MB in r11) is a
build-time cost, not the steady-state footprint that regresses at
scale. Per-rep spikes, rep 1 included, are in bench_detail.json.

Forensic detail (per-rep warm runs, first-rep runs, per-query peak
process-tree RSS, and `table_rows` — the row count per input table at
this SF, so a driver-side regeneration of /root/testdata is visible
without manual forensics) is written to bench_detail.json beside this
script and printed as an earlier stdout line; the FINAL stdout line is
the compact driver contract and must stay within the driver's
~2000-char stdout tail window (see the length guard in main()).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tmdb_sync_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_sync_coverage",
    "q5_revenue_by_nation",
    "q3_top_orders_by_revenue",
    "w1_argmax_exclusion",
    "w2_w3_dedup_variants",
    "o1_o2_pagination_topk",
    "j1_merge_upsert",
    "a4_a5_report_stats",
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
    "dd_exact",
    "dd_minhash_lsh",
    "dd_embedding_cosine",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "tx_text_features",
    "pipeline_curation",
    "mm_media_pipeline",
    "s1_discover_source",
    "s7_backdrop_pipeline",
]

# Contention flag calibration (r8, measured IN the bench's own context —
# an idle Spark JVM alive): bare host ratio 2.2-2.3; JVM-alive healthy
# 3.7-4.5 (the JVM's background threads tax the 32-way floor ~2×); r7's
# contended windows read ~8-12 with the 1t floor flat throughout.
# r10 lesson (verdict #1): the official r10 run read ratio_end 5.85 —
# 0.15 under the old 6.0 flag — while the host was demonstrably
# degrading (cpu_floor_32t doubled start→end, dd_exact warm reps climbed
# 1.09→2.48 s against a nine-round 0.20-0.33 family with its code
# untouched). Flag at 5.0: just above the JVM-noise band, and r10's
# 5.85 weather now labels contended. Two further defenses below:
# interior floor samples (the brackets alone missed the mid-suite ramp)
# and a per-query family-history outlier check.
CONTENDED_RATIO = 5.0
HEALTHY_RATIO_32T = 4.0   # JVM-alive band midpoint
COOLDOWN_S = 20.0         # between contended attempts
FLOOR_SAMPLE_EVERY = 3    # interior floor pair every N queries
# Family-history check (r10 verdict #1c): a query whose warm median
# exceeds OUTLIER_X × its median across prior rounds' artifacts marks
# the attempt contended regardless of floor ratios — floor sampling is
# between queries, so contention that spikes only DURING a query's own
# reps is invisible to the ratios. 2.5× absorbs host-to-host variance
# (the healthy family spread observed over nine rounds is <2×); the
# cross-round median absorbs one mislabeled round (r10's dd_exact 1.708
# barely moves a nine-round median). Needs MIN_SAMPLES prior rounds —
# the extended section starts applying it once three rounds carry it.
FAMILY_OUTLIER_X = 2.5
FAMILY_MIN_SAMPLES = 3
# Re-baselining path (r11 ADVICE): without one, a LEGITIMATE slowdown of
# one query flags every future attempt, each flagged artifact is
# excluded from the family, and the median can never adjust — permanent
# taint. Two admission rules in load_family, both conditioned on clean
# floors (ratio_worst <= CONTENDED_RATIO recorded in the artifact):
# (a) a floor-clean artifact flagged ONLY by family outliers still
#     contributes its NON-outlier queries (they passed both checks);
# (b) a query named an outlier in the last FAMILY_PERSIST consecutive
#     floor-clean same-SF artifacts regime-switches: its family becomes
#     the median of those readings (persistent + floors clean + same
#     single query = the code moved, not the weather — weather moves
#     many queries and trips floors).
FAMILY_PERSIST = 2

_PAGE = os.sysconf("SC_PAGE_SIZE")


def _tree_rss_bytes() -> int:
    """PSS summed over this process's whole tree (driver Python + the
    local-mode JVM + every Python worker the JVM forked) — the honest
    single-host stand-in for 'peak executor memory': in local[32] the
    executors ARE the JVM, and Arrow workers are its children.

    PSS (proportional set size, /proc/pid/smaps_rollup), not RSS, and
    mid-fork ghosts skipped — two distinct fabrications hunted down in
    r11 (scripts kept the forensics; COVERAGE.md r11 has the table):

    - COW double-count: the pyspark daemon FORKS its workers, so every
      worker's stat-RSS re-counts pages shared with the daemon. PSS
      charges each shared page 1/N to each sharer.
    - fork ghosts: while the JVM's "Executor task launch worker"
      threads fork+exec python workers, each not-yet-exec'd child
      momentarily shows the FULL parent JVM RSS in /proc stat (pure
      COW) and has NO readable smaps_rollup — a sampler that falls
      back to stat-RSS there reads 9 ghosts × 3.4 GB = a fabricated
      ~30 GB "peak" for a 4 GB workload (this is what r10's
      st_session_window 19.3 GB reading was). When the kernel supports
      smaps_rollup (checked on our own pid), an unreadable tree member
      is a transitional ghost and counts as ZERO; stat-RSS is the
      whole-sweep fallback only on kernels without smaps_rollup.

    One /proc sweep per sample (~15 ms); processes that exit mid-sweep
    are skipped."""
    me = os.getpid()
    try:
        with open(f"/proc/{me}/smaps_rollup") as fh:
            fh.readline()
        kernel_has_pss = True
    except OSError:
        kernel_has_pss = False
    ppid: dict[int, int] = {}
    rss: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as fh:
                tail = fh.read().rsplit(")", 1)[1].split()
        except OSError:
            continue
        pid = int(d)
        ppid[pid] = int(tail[1])      # field 4 (ppid), 0-indexed past comm
        rss[pid] = int(tail[21])      # field 24 (rss pages)
    kids: dict[int, list[int]] = {}
    for p, pp in ppid.items():
        kids.setdefault(pp, []).append(p)
    total, stack = 0, [me]
    while stack:
        p = stack.pop()
        if kernel_has_pss:
            try:
                with open(f"/proc/{p}/smaps_rollup") as fh:
                    for line in fh:
                        if line.startswith("Pss:"):
                            total += int(line.split()[1]) * 1024
                            break
            except OSError:
                pass  # mid-fork ghost / exited: contributes nothing
        else:
            total += rss.get(p, 0) * _PAGE
        stack.extend(kids.get(p, ()))
    return total


class _PeakRss:
    """Background sampler: peak process-tree PSS while a query runs.
    0.25 s cadence — the PSS sweep reads smaps_rollup for every tree
    member (~15 ms, kernel VMA walks under the target's mmap_lock), so
    the old 0.1 s cadence tuned for the ~1 ms stat sweep would burn
    ~15% of a core and contend the measured JVM's page-fault path;
    at 0.25 s it is ~6%, and a spike shorter than 250 ms was never
    going to OOM an executor. Per-query peaks land in
    bench_detail.json (r8 verdict #7: wall time alone cannot see a
    scale-killer that buffers memory)."""

    def __init__(self) -> None:
        self.peak = 0
        self._stop = threading.Event()
        self._t: threading.Thread | None = None

    def __enter__(self) -> "_PeakRss":
        def run() -> None:
            while not self._stop.is_set():
                try:
                    self.peak = max(self.peak, _tree_rss_bytes())
                except OSError:
                    pass
                self._stop.wait(0.25)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._t is not None:
            self._t.join(timeout=2)


def _hash_unit(_=None):
    import hashlib

    h = hashlib.sha256()
    b = b"x" * 1_000_000
    for _ in range(100):
        h.update(b)


def _floor_pair() -> tuple[float, float]:
    """CPU-parallelism floor, JVM-free: the same GIL-releasing hash work
    on 1 thread vs 32 concurrent. On a healthy 32-vCPU host the two are
    near-equal; under hypervisor contention the 32-thread number
    inflates while 1-thread stays flat (measured 3× mid-round-7) — the
    pair attributes a slow bench to the host without any Spark noise in
    the signal."""
    from concurrent.futures import ThreadPoolExecutor

    _hash_unit()
    t0 = time.perf_counter()
    _hash_unit()
    f1 = time.perf_counter() - t0
    with ThreadPoolExecutor(32) as ex2:
        t0 = time.perf_counter()
        list(ex2.map(_hash_unit, range(32)))
        f32 = time.perf_counter() - t0
    return round(f1, 3), round(f32, 3)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def load_family(
    bench_dir: str, sf_val: object
) -> tuple[dict[str, float], dict[str, float]]:
    """Per-query medians across prior rounds' BENCH_r*.json artifacts
    (driver format: the contract line under ``parsed``). Artifacts at
    the same SF whose section was NOT flagged contended contribute
    (pre-flag rounds have ``contended: null`` — those were hand-checked
    healthy and stay in); the MEDIAN across rounds is what makes one
    mislabeled round (r10) harmless. Flagged artifacts are not discarded
    wholesale: the FAMILY_PERSIST re-baselining rules (see the constant)
    give a legitimately slowed query a path back to a moving baseline
    instead of a permanent taint. Returns (headline, extended) family
    medians, each only for queries with >= FAMILY_MIN_SAMPLES prior
    readings (regime-switched queries excepted — their history already
    cleared that bar, or they'd never have been outliers)."""
    import glob

    head_rows: list[dict] = []
    ext_rows: list[dict] = []
    for path in sorted(glob.glob(os.path.join(bench_dir, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed")
        except (OSError, ValueError, AttributeError):
            continue
        if not isinstance(parsed, dict) or parsed.get("sf") != sf_val:
            continue

        def row(queries, contended, ratio_worst, outliers) -> dict:
            return {
                "q": {
                    n: float(v)
                    for n, v in (queries or {}).items()
                    if isinstance(v, (int, float))
                },
                "contended": contended is True,
                # floors clean iff the artifact recorded a ratio under
                # the flag; artifacts without the field (or non-numeric)
                # can't prove clean floors and get no re-admission
                "floor_clean": isinstance(ratio_worst, (int, float))
                and ratio_worst <= CONTENDED_RATIO,
                "outliers": set(outliers or []),
            }

        head_rows.append(
            row(
                parsed.get("queries"),
                parsed.get("contended"),
                parsed.get("ratio_worst"),
                parsed.get("family_outliers"),
            )
        )
        ext_rows.append(
            row(
                parsed.get("queries_extended"),
                parsed.get("extended_contended"),
                parsed.get("extended_ratio_worst"),
                parsed.get("extended_family_outliers"),
            )
        )

    def family(rows: list[dict]) -> dict[str, float]:
        vals: dict[str, list[float]] = {}
        for r in rows:
            for n, v in r["q"].items():
                # floor-clean artifacts contribute EVERY query's reading
                # — including the outlier-named ones. Excluding outlier
                # readings made the regime switch non-sticky (review
                # r12): the first clean round after a legitimate
                # slowdown rebuilt the family from pre-slowdown history
                # only, snapped the baseline back, and re-flagged the
                # new level in a flag/clear oscillation for many rounds.
                # A one-off floor-clean spike admitted here is absorbed
                # by the cross-round median; a persistent shift now
                # accumulates history and converges right after the
                # FAMILY_PERSIST switch. Floor-contended artifacts stay
                # fully excluded (the strict r10 tripwire).
                admitted = (not r["contended"]) or r["floor_clean"]
                if admitted:
                    vals.setdefault(n, []).append(v)
        fam = {
            n: round(_median(v), 3)
            for n, v in vals.items()
            if len(v) >= FAMILY_MIN_SAMPLES
        }
        # regime switch: outlier named by the last FAMILY_PERSIST
        # consecutive floor-clean artifacts → its family becomes the
        # median of those readings, so the baseline can legitimately
        # move (and a real unfixed regression stops re-flagging after
        # it has been on the record FAMILY_PERSIST rounds running)
        tail = rows[-FAMILY_PERSIST:]
        if len(tail) == FAMILY_PERSIST:
            persistent = set.intersection(
                *(r["outliers"] for r in tail)
            ) if tail else set()
            for n in persistent:
                if all(
                    r["floor_clean"] and n in r["q"] for r in tail
                ):
                    fam[n] = round(_median([r["q"][n] for r in tail]), 3)
        return fam

    return family(head_rows), family(ext_rows)


def label_attempt(
    ratios: list[float], warm: dict[str, float], family: dict[str, float]
) -> dict:
    """The contended decision, pure so the r10 weather replays in a unit
    test: WORST floor ratio across ALL samples (brackets + interior)
    against CONTENDED_RATIO, plus the family-history outlier check."""
    ratio_worst = max(ratios)
    floor_contended = ratio_worst > CONTENDED_RATIO
    outliers = sorted(
        n
        for n, w in warm.items()
        if family.get(n, 0) > 0 and w > FAMILY_OUTLIER_X * family[n]
    )
    return {
        "contended": floor_contended or bool(outliers),
        "floor_contended": floor_contended,
        "family_outliers": outliers,
        "ratio_worst": round(ratio_worst, 2),
    }


def _run_suite(
    spark,
    sf_dir: str,
    reps: int,
    names: list[str],
    family: dict[str, float] | None = None,
) -> dict:
    """One full timed pass over ``names``, with floor-pair samples at
    the brackets AND every FLOOR_SAMPLE_EVERY queries in between — the
    WORST sample decides the floor flag (r10's contention ramped
    mid-suite and both brackets read under the old threshold). A
    ``family`` of prior-round warm medians adds the per-query outlier
    check. Returns everything an attempt needs to be compared, chosen,
    and recorded."""
    from tmdb_sync_spark.registry import QUERIES
    from tmdb_sync_spark.util import reset_materialization_cache

    # Host-speed floor: a trivial one-exchange job, warm best-of-3.
    # Query wall times at tiny SFs are dominated by task scheduling
    # (each AQE query stage is a job); hosts have varied ~4× in that
    # overhead between sessions. Reported beside the suite so deltas
    # that track the floor read as the machine, not the code.
    floor_df = spark.range(1000).repartition(32)
    floor_df.count()
    floor_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.count()
        floor_runs.append(time.perf_counter() - t0)
    machine_floor = round(min(floor_runs), 3)

    cpu_floor_1t, cpu_floor_32t = _floor_pair()
    floor_samples: list[tuple[float, float]] = [(cpu_floor_1t, cpu_floor_32t)]

    first_rep: dict[str, float] = {}
    warm: dict[str, float] = {}
    warm_all: dict[str, list[float]] = {}
    peak_rss_mb: dict[str, float] = {}
    rss_spike_mb: dict[str, float] = {}
    rss_spike_per_rep_mb: dict[str, list[float]] = {}
    for qi, name in enumerate(names):
        if qi and qi % FLOOR_SAMPLE_EVERY == 0:
            floor_samples.append(_floor_pair())
        fn = QUERIES[name]
        # Per-REP RSS sampling (r11 verdict #4): the spike (peak − this
        # rep's start) is the query's OWN transient footprint,
        # independent of suite-accumulated heap — r10's st_session_window
        # read an alarming 19.3 GB absolute peak that profiling
        # attributed to ~14 GB of accumulated heap plus a ~5 GB
        # execution-memory spike. The ARCHIVED spike is warm-only
        # (max over reps 2..N): rep 1 legitimately pays one-time model
        # training (ann_ivf_topk's k-means, 2288 MB in r11) that a
        # steady-state executor never re-pays — the warm spike is what
        # regresses at scale. Per-rep spikes go to bench_detail.json.
        runs = []
        rep_spikes: list[float] = []
        abs_peak = 0
        for _ in range(reps):
            spark.catalog.clearCache()
            # staged-only: per-query scratch materializations
            # (minhash signatures, curation stages) are recomputed
            # every rep, but trained MODEL artifacts (the IVF
            # k-means codebook) survive — a steady-state query
            # serves from the built index, so rep 1 (cold) pays
            # training and the warm median measures the probe,
            # mirroring the production build-once/probe-many split.
            reset_materialization_cache(kinds=("staged",))
            start_rss = _tree_rss_bytes()
            with _PeakRss() as sampler:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            abs_peak = max(abs_peak, sampler.peak)
            rep_spikes.append(max(0, sampler.peak - start_rss))
        first_rep[name] = round(runs[0], 3)
        warm[name] = round(_median(runs[1:]), 3)
        warm_all[name] = [round(r, 3) for r in runs[1:]]
        peak_rss_mb[name] = round(abs_peak / 1e6, 1)
        rss_spike_mb[name] = round(max(rep_spikes[1:]) / 1e6, 1)
        rss_spike_per_rep_mb[name] = [
            round(s / 1e6, 1) for s in rep_spikes
        ]
    spark.catalog.clearCache()

    cpu_floor_1t_end, cpu_floor_32t_end = _floor_pair()
    floor_samples.append((cpu_floor_1t_end, cpu_floor_32t_end))
    ratios = [f32 / max(f1, 1e-9) for f1, f32 in floor_samples]
    label = label_attempt(ratios, warm, family or {})
    worst_32t = max(f32 for _, f32 in floor_samples)
    # value_floor_norm rescales the suite total to the expected healthy
    # floor (HEALTHY_RATIO × this machine's own 1t floor — scale-free,
    # no stored absolute) — an ATTRIBUTION AID for round-over-round
    # reads on unequal hosts, not a measurement (suite time is not 100%
    # cpu-floor-bound, so it UNDERestimates the healthy-host time).
    healthy_32t = HEALTHY_RATIO_32T * min(f1 for f1, _ in floor_samples)
    total = round(sum(warm.values()), 3)
    return {
        "total": total,
        "first_rep": first_rep,
        "warm": warm,
        "warm_all": warm_all,
        "peak_rss_mb": peak_rss_mb,
        "rss_spike_mb": rss_spike_mb,
        "rss_spike_per_rep_mb": rss_spike_per_rep_mb,
        "machine_floor": machine_floor,
        "cpu_floor_1t": cpu_floor_1t,
        "cpu_floor_32t": cpu_floor_32t,
        "cpu_floor_32t_end": cpu_floor_32t_end,
        "ratio_start": round(ratios[0], 2),
        "ratio_end": round(ratios[-1], 2),
        "ratio_worst": label["ratio_worst"],
        "ratios": [round(r, 2) for r in ratios],
        "floor_contended": label["floor_contended"],
        "family_outliers": label["family_outliers"],
        "contended": label["contended"],
        "floor_norm": round(
            total * min(1.0, healthy_32t / max(worst_32t, 1e-9)), 2
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmdb-sync-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    # A missing headline query is a broken registry, not a skip:
    # silently dropping it would shrink the suite and read as a huge
    # speedup.
    missing = [n for n in HEADLINE if n not in QUERIES]
    if missing:
        raise RuntimeError(f"headline queries missing from registry: {missing}")

    # JVM / codegen / Python-worker-pool warmup (not measured): spin up
    # the JVM whole-stage pipeline, one Python Data Source scan, and one
    # mapInPandas exchange so per-session daemon startup isn't
    # attributed to the first measured query.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["a1_sync_coverage"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for warm_q in ("s1_discover_source", "mm_media_pipeline"):
        if warm_q in QUERIES:
            QUERIES[warm_q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    # Input-corpus fingerprint: parquet count() is footer-metadata-only,
    # so this costs ~one job per table, not a data scan.
    table_rows = {}
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            table_rows[t] = spark.read.parquet(p).count()

    reps = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4")))
    max_attempts = max(
        1, int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    bench_dir = os.path.dirname(os.path.abspath(__file__))
    head_family, ext_family = load_family(bench_dir, sf_val)

    # Self-selecting attempt loop (r8 verdict #1): a contended attempt
    # triggers a cooldown + full re-run; the recorded artifact is the
    # best healthy attempt, or — if the host never gave a healthy
    # window — the best attempt, still flagged contended. Every
    # attempt's summary stays in the artifact.
    attempts: list[dict] = []
    for i in range(max_attempts):
        att = _run_suite(spark, sf_dir, reps, HEADLINE, family=head_family)
        attempts.append(att)
        if not att["contended"]:
            break
        if i < max_attempts - 1:
            time.sleep(COOLDOWN_S)
    healthy = [a for a in attempts if not a["contended"]]
    pool = healthy or attempts
    chosen = min(pool, key=lambda a: a["total"])
    chosen_idx = attempts.index(chosen)

    # Extended section (r9 verdict #3): a standing warm-median row for
    # every driver-registry query NOT in the frozen headline — same
    # measurement protocol, its own contention self-selection (2
    # attempts max: the headline already characterized the host).
    ext_names = [n for n in QUERIES if n not in HEADLINE]
    ext_attempts: list[dict] = []
    for i in range(min(2, max_attempts)):
        att = _run_suite(spark, sf_dir, reps, ext_names, family=ext_family)
        ext_attempts.append(att)
        if not att["contended"]:
            break
        if i == 0:
            time.sleep(COOLDOWN_S)
    ext_pool = [a for a in ext_attempts if not a["contended"]] or ext_attempts
    ext = min(ext_pool, key=lambda a: a["total"])

    # Full forensic detail (per-rep warm runs, cold runs, per-query peak
    # tree RSS, input-table row counts, every attempt) goes to a side
    # file + an EARLIER stdout line. The external driver keeps only the
    # last ~2000 chars of stdout and json-parses the final line within
    # that tail — round 6's artifact was lost because embedding
    # queries_warm_all pushed the single line past the window
    # (BENCH_r06.json: parsed=null). The contract line printed LAST
    # below stays compact and is guarded against outgrowing the window.
    detail = {
        "metric": "headline_suite_detail",
        "queries_first_rep": chosen["first_rep"],
        "first_rep_total": round(sum(chosen["first_rep"].values()), 3),
        "table_rows": table_rows,
        "queries_warm_all": chosen["warm_all"],
        "peak_tree_rss_mb": chosen["peak_rss_mb"],
        "rss_spike_mb": chosen["rss_spike_mb"],
        "rss_spike_per_rep_mb": chosen["rss_spike_per_rep_mb"],
        "attempts": [
            {k: a[k] for k in ("total", "contended", "floor_contended",
                               "family_outliers", "ratios",
                               "machine_floor")}
            for a in attempts
        ],
        "attempt_chosen": chosen_idx,
        "family_headline": head_family,
        "family_extended": ext_family,
        "extended_first_rep": ext["first_rep"],
        "extended_warm_all": ext["warm_all"],
        "extended_peak_tree_rss_mb": ext["peak_rss_mb"],
        "extended_rss_spike_mb": ext["rss_spike_mb"],
        "extended_rss_spike_per_rep_mb": ext["rss_spike_per_rep_mb"],
        "extended_attempts": [
            {k: a[k] for k in ("total", "contended", "floor_contended",
                               "family_outliers", "ratios",
                               "machine_floor")}
            for a in ext_attempts
        ],
        "sf": sf_val,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))

    contract = {
        "metric": "headline_suite_total",
        "value": chosen["total"],
        "unit": "sec",
        "queries": chosen["warm"],
        "queries_extended": ext["warm"],
        "value_extended": ext["total"],
        "extended_contended": ext["contended"],
        # the extended section's own floor/outlier evidence — load_family
        # needs both to apply the re-baselining rules to extended slots
        "extended_ratio_worst": ext["ratio_worst"],
        "extended_family_outliers": ext["family_outliers"],
        "machine_floor_sec": chosen["machine_floor"],
        "cpu_floor_1t": chosen["cpu_floor_1t"],
        "cpu_floor_32t": chosen["cpu_floor_32t"],
        "cpu_floor_32t_end": chosen["cpu_floor_32t_end"],
        "ratio_worst": chosen["ratio_worst"],
        "family_outliers": chosen["family_outliers"],
        "contended": chosen["contended"],
        # worst WARM-rep transient memory spike (peak − at-rep-start
        # tree RSS, reps 2..N only — rep-1 one-time training spikes
        # like IVF k-means are excluded by design) and its query — the
        # archived per-round memory regression signal (per-rep spikes
        # incl. rep 1 in the detail file)
        "max_rss_spike_mb": max(chosen["rss_spike_mb"].values()),
        "max_rss_spike_q": max(
            chosen["rss_spike_mb"], key=chosen["rss_spike_mb"].get
        ),
        "value_floor_norm": chosen["floor_norm"],
        "attempts": len(attempts),
        "attempt_totals": [a["total"] for a in attempts],
        "warm_reps": reps - 1,
        "sf": sf_val,
    }
    print(contract_line(contract))


# Driver stdout-tail budget: the external driver keeps ~2000 chars and
# json-parses the FINAL line within that tail (BENCH_r06 was lost to an
# oversized line). 1900 leaves margin for a trailing newline + prompt.
LINE_BUDGET = 1900


def contract_line(contract: dict) -> str:
    """The bench's final stdout line, guarded against the driver's tail
    window — degrade in steps rather than emit an unparseable line:
    (1) full contract; (2) truncate the family-outlier lists (they are
    unbounded in principle — every query could outlie — and the full
    contract sits ~25 chars under budget as of r12, so a handful of
    outlier names on a contended driver run is the REALISTIC overflow;
    folding a whole medians section for that would cost the next
    round's extended family baseline); (3) fold the extended medians
    into the detail file only; (4) drop the per-query medians too.
    Pure so the degradation ladder is unit-tested against worst-case
    payloads (tests/test_bench_labeling.py)."""
    contract = dict(contract)
    line = json.dumps(contract, separators=(",", ":"))
    if len(line) > LINE_BUDGET:
        for key in ("family_outliers", "extended_family_outliers"):
            # only rewrite a list the contract actually carries (ADVICE
            # r12: the unconditional assignment injected empty outlier
            # lists into contracts that never had the key — a shape a
            # consumer could misread as "measured, zero outliers"), and
            # only when the truncation SHRINKS the encoding (4 short
            # names can be shorter than 3 names + the sentinel)
            if key not in contract:
                continue
            outliers = contract[key] or []
            if len(outliers) <= 3:
                continue
            truncated = outliers[:3] + [f"+{len(outliers) - 3} more"]
            if len(json.dumps(truncated)) < len(json.dumps(outliers)):
                contract[key] = truncated
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > LINE_BUDGET and "queries_extended" in contract:
        ext_q = contract.pop("queries_extended")
        contract["extended_in_detail_file"] = len(ext_q)
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > LINE_BUDGET and "queries" in contract:
        q = contract.pop("queries")
        contract["queries_in_detail_file"] = len(q)
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > LINE_BUDGET:
        # last resort — a fixed-size minimal dict that CANNOT outgrow
        # the window (attempt_totals is unbounded when BENCH_ATTEMPTS
        # is cranked up on a contended host; everything variable-length
        # is dropped here, never truncated into invalid JSON)
        line = json.dumps(
            {
                "metric": contract.get("metric"),
                "value": contract.get("value"),
                "unit": contract.get("unit"),
                "contended": contract.get("contended"),
                "attempts": contract.get("attempts"),
                "warm_reps": contract.get("warm_reps"),
                "sf": contract.get("sf"),
                "detail_file_only": True,
            },
            separators=(",", ":"),
        )
    return line


if __name__ == "__main__":
    main()
