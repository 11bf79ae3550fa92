"""Replay the r10 contention weather through bench.py's labeling logic
(r10 verdict #1: the official r10 headline read ratio_end 5.85 — under
the old 6.0 flag — and shipped a tainted artifact labeled healthy).
Pure-function tests, no Spark session."""

from __future__ import annotations

import importlib.util
import os

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

REPO = os.path.dirname(os.path.abspath(_BENCH))

# The r10 official run's recorded evidence (BENCH_r10.json +
# bench_detail.json): brackets 2.59 / 5.85, dd_exact warm 1.708 vs a
# nine-round family of 0.20-0.33.
R10_RATIOS = [2.59, 5.85]
R10_WARM = {"dd_exact": 1.708, "q5_revenue_by_nation": 0.35}


def test_r10_weather_now_flags_on_floor_alone():
    label = bench.label_attempt(R10_RATIOS, {}, {})
    assert label["floor_contended"] is True
    assert label["contended"] is True
    assert label["ratio_worst"] == 5.85


def test_r10_weather_flags_on_family_even_with_clean_floors():
    """Interior sampling can still miss a spike confined to one query's
    reps — the family check is the independent second tripwire."""
    family = {"dd_exact": 0.25, "q5_revenue_by_nation": 0.3}
    label = bench.label_attempt([2.3, 2.4], R10_WARM, family)
    assert label["floor_contended"] is False
    assert label["family_outliers"] == ["dd_exact"]
    assert label["contended"] is True


def test_healthy_attempt_stays_healthy():
    family = {"dd_exact": 0.25}
    label = bench.label_attempt(
        [3.8, 4.4, 4.1], {"dd_exact": 0.31}, family
    )
    assert label["contended"] is False
    assert label["family_outliers"] == []


def test_worst_interior_sample_decides():
    """A run that is healthy at both brackets but spikes mid-suite —
    exactly the r10 shape — must flag from the interior sample."""
    label = bench.label_attempt([3.9, 9.2, 4.1], {}, {})
    assert label["floor_contended"] is True
    assert label["ratio_worst"] == 9.2


def test_family_from_repo_artifacts_is_robust_to_r10():
    """The family loader over the repo's real BENCH_r*.json history:
    r8 (contended: true) is excluded; r10's tainted dd_exact 1.708 is
    absorbed by the cross-round median; the resulting family median
    sits in the healthy 0.20-0.35 band, so an r10-like reading is an
    outlier against it."""
    head, ext = bench.load_family(REPO, 0.1)
    assert head, "no headline family derived from repo artifacts"
    dd = head.get("dd_exact")
    assert dd is not None and 0.15 < dd < 0.40, dd
    assert 1.708 > bench.FAMILY_OUTLIER_X * dd
    # the extended family is empty until >= MIN_SAMPLES rounds carry an
    # un-flagged extended section (none did through r10) — once they
    # exist, every median must be a positive wall time; do NOT pin
    # emptiness (a healthy r13+ would rightly populate it)
    assert all(v > 0 for v in ext.values())


def _artifact(tmp_path, i, queries=None, contended=False, ratio_worst=4.0,
              outliers=(), ext=None, ext_contended=False,
              ext_ratio_worst=4.0, ext_outliers=()):
    import json

    (tmp_path / f"BENCH_r{i:02d}.json").write_text(
        json.dumps(
            {"parsed": {
                "sf": 0.1,
                "contended": contended,
                "ratio_worst": ratio_worst,
                "family_outliers": list(outliers),
                "queries": queries or {},
                "queries_extended": ext or {},
                "extended_contended": ext_contended,
                "extended_ratio_worst": ext_ratio_worst,
                "extended_family_outliers": list(ext_outliers),
            }}
        )
    )


def test_floor_clean_outlier_flagged_round_admits_non_outliers(tmp_path):
    """Re-baselining rule (a): an artifact flagged ONLY by family
    outliers (floors clean) still feeds the family for its non-outlier
    queries — one slow slot must not starve every other query's
    baseline."""
    for i in range(3):
        _artifact(tmp_path, i, queries={"qa": 0.2, "qb": 0.5})
    _artifact(tmp_path, 3, queries={"qa": 0.9, "qb": 0.5},
              contended=True, ratio_worst=4.2, outliers=["qa"])
    head, _ = bench.load_family(str(tmp_path), 0.1)
    # qb: all 4 readings admitted; qa: the flagged 0.9 excluded
    assert head["qb"] == 0.5
    assert head["qa"] == 0.2


def test_floor_flagged_rounds_stay_fully_excluded(tmp_path):
    """A floor-contended artifact (ratio over the flag) proves nothing
    about any query — no re-admission, the pre-r12 behavior."""
    for i in range(3):
        _artifact(tmp_path, i, queries={"qa": 0.2})
    _artifact(tmp_path, 3, queries={"qa": 0.2, "qb": 9.9},
              contended=True, ratio_worst=9.0, outliers=[])
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head["qa"] == 0.2
    assert "qb" not in head


def test_persistent_outlier_regime_switches_family(tmp_path):
    """Re-baselining rule (b): an outlier named by the last
    FAMILY_PERSIST consecutive floor-clean artifacts becomes the new
    baseline — a legitimate slowdown flags loudly that many rounds,
    then the family moves on instead of tainting forever."""
    for i in range(3):
        _artifact(tmp_path, i, queries={"qa": 0.2})
    for i in (3, 4):
        _artifact(tmp_path, i, queries={"qa": 0.9}, contended=True,
                  ratio_worst=4.1, outliers=["qa"])
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head["qa"] == 0.9
    # the NEXT attempt at ~0.9 is no longer an outlier
    label = bench.label_attempt([4.0], {"qa": 0.92}, head)
    assert label["contended"] is False


def test_regime_switch_is_sticky_no_flag_clear_oscillation(tmp_path):
    """r12 review finding: after the FAMILY_PERSIST switch, the FIRST
    clean round must not snap the baseline back to pre-slowdown history
    (the old exclusion of outlier-named readings rebuilt the family
    from 0.2-era rounds only, re-flagging 0.9 in a flag/clear cycle for
    ~9 rounds). Floor-clean readings — outlier-named or not — now
    accumulate, so the post-switch family stays at the new level."""
    for i in range(3):
        _artifact(tmp_path, i, queries={"qa": 0.2})
    # legitimate slowdown: two loudly-flagged floor-clean rounds
    for i in (3, 4):
        _artifact(tmp_path, i, queries={"qa": 0.9}, contended=True,
                  ratio_worst=4.1, outliers=["qa"])
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert bench.label_attempt([4.0], {"qa": 0.9}, head)["contended"] is False
    # that attempt ships as a HEALTHY artifact (no outliers recorded)
    _artifact(tmp_path, 5, queries={"qa": 0.9})
    # every later round at the new level must stay clean — the old code
    # flagged round 6 again (family snapped back to 0.2)
    for rnd in (6, 7, 8):
        head, _ = bench.load_family(str(tmp_path), 0.1)
        label = bench.label_attempt([4.0], {"qa": 0.9}, head)
        assert label["contended"] is False, (
            f"round {rnd}: flag/clear oscillation — family {head['qa']}"
        )
        _artifact(tmp_path, rnd, queries={"qa": 0.9})
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head["qa"] == 0.9  # history has fully converged


def test_persistence_requires_consecutive_and_clean_floors(tmp_path):
    """One flagged round (or a floor-dirty one in the window) is NOT
    persistence — the strict r10 tripwire stays in force."""
    for i in range(3):
        _artifact(tmp_path, i, queries={"qa": 0.2})
    _artifact(tmp_path, 3, queries={"qa": 0.9}, contended=True,
              ratio_worst=4.1, outliers=["qa"])
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head["qa"] == 0.2  # single flagged round: median unmoved
    # floor-dirty second round breaks the persistence chain
    _artifact(tmp_path, 4, queries={"qa": 0.9}, contended=True,
              ratio_worst=9.0, outliers=["qa"])
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head["qa"] == 0.2


def test_extended_section_rebaselines_independently(tmp_path):
    for i in range(3):
        _artifact(tmp_path, i, ext={"ex": 1.0})
    for i in (3, 4):
        _artifact(tmp_path, i, ext={"ex": 3.0}, ext_contended=True,
                  ext_ratio_worst=4.3, ext_outliers=["ex"])
    _, ext = bench.load_family(str(tmp_path), 0.1)
    assert ext["ex"] == 3.0


def test_family_requires_min_samples(tmp_path):
    import json

    for i, v in enumerate([0.2, 0.3]):
        (tmp_path / f"BENCH_r{i:02d}.json").write_text(
            json.dumps(
                {"parsed": {"sf": 0.1, "contended": False,
                            "queries": {"qx": v}}}
            )
        )
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head == {}  # 2 samples < FAMILY_MIN_SAMPLES


def test_family_ignores_other_sf_and_unparsed(tmp_path):
    import json

    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_r02.json").write_text("not json at all")
    for i in range(3, 7):
        (tmp_path / f"BENCH_r{i:02d}.json").write_text(
            json.dumps(
                {"parsed": {"sf": 0.01, "contended": False,
                            "queries": {"qx": 0.2}}}
            )
        )
    head, _ = bench.load_family(str(tmp_path), 0.1)
    assert head == {}


def _fat_contract(n_head=21, n_ext=36, n_outliers=21):
    qs = {f"very_long_query_name_number_{i:02d}": 12.345 for i in range(n_head)}
    ext = {f"extended_query_with_long_name_{i:02d}": 123.456
           for i in range(n_ext)}
    return {
        "metric": "headline_suite_total",
        "value": 1234.567,
        "unit": "sec",
        "queries": qs,
        "queries_extended": ext,
        "value_extended": 9876.543,
        "extended_contended": True,
        "extended_ratio_worst": 18.66,
        "extended_family_outliers": sorted(ext)[:n_outliers],
        "machine_floor_sec": 0.569,
        "cpu_floor_1t": 0.073,
        "cpu_floor_32t": 0.435,
        "cpu_floor_32t_end": 0.435,
        "ratio_worst": 18.66,
        "family_outliers": sorted(qs)[:n_outliers],
        "contended": True,
        "max_rss_spike_mb": 22218.5,
        "max_rss_spike_q": "very_long_query_name_number_00",
        "attempts": 3,
        "attempt_totals": [1238.421, 1234.073, 1235.552],
        "warm_reps": 3,
        "sf": 0.1,
    }


def test_contract_line_stays_in_budget_on_worst_case():
    """Every degradation step: a worst-case payload (50+ long names,
    every headline query a family outlier) must still emit one
    json-parseable line within the driver's tail window."""
    import json

    line = bench.contract_line(_fat_contract())
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_total"
    assert parsed["value"] == 1234.567
    assert parsed["contended"] is True
    # degraded forms still record HOW MANY medians went to the detail file
    assert ("queries" in parsed) or ("queries_in_detail_file" in parsed)
    assert ("queries_extended" in parsed) or (
        "extended_in_detail_file" in parsed)


def test_contract_line_untouched_when_it_fits():
    import json

    small = _fat_contract(n_head=3, n_ext=2, n_outliers=0)
    line = bench.contract_line(small)
    assert len(line) <= bench.LINE_BUDGET
    assert json.loads(line) == small


def test_contract_line_truncates_outliers_before_folding_sections():
    """The realistic r12 overflow: the full contract sits just under
    budget, so a contended driver run adding a handful of outlier
    NAMES must degrade by truncating the outlier lists — NOT by
    folding queries_extended into the detail file, which would cost
    the next round its extended family baseline."""
    import json

    # sized so the overflow is attributable to the outlier names alone
    # (truncating them brings the line back under budget; bigger
    # payloads legitimately fall through to the section folds, covered
    # by the worst-case test above)
    c = _fat_contract(n_head=13, n_ext=13, n_outliers=8)
    assert len(json.dumps(c, separators=(",", ":"))) > bench.LINE_BUDGET
    parsed = json.loads(bench.contract_line(c))
    assert "queries" in parsed and "queries_extended" in parsed
    assert len(parsed["family_outliers"]) == 4          # 3 + "+N more"
    assert parsed["family_outliers"][3] == "+5 more"
