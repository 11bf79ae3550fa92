"""register_views idempotence memo (r12 optimization).

The memo must (a) skip re-registration when nothing changed — the whole
point, q1_sql paid ~0.7 s of footer re-reads per construction — while
(b) re-registering on a table-content change (the driver regenerates
/root/testdata in place between rounds) and (c) re-registering when the
SAME session switches sf_dir (the view names are shared, so a stale skip
would leave views pointing at the other directory's data).
"""

from __future__ import annotations

import os
import shutil

import tmdb_sync_spark.io as io


def _registration_counter(monkeypatch):
    calls = {"n": 0}
    real = io.table

    def counting(spark, sf_dir, name):
        calls["n"] += 1
        return real(spark, sf_dir, name)

    monkeypatch.setattr(io, "table", counting)
    return calls


def test_repeat_call_skips_reregistration(spark, sf_dir, monkeypatch):
    calls = _registration_counter(monkeypatch)
    io._VIEWS_REGISTERED.pop(spark, None)
    io.register_views(spark, sf_dir)
    assert calls["n"] == len(io.TABLES)
    io.register_views(spark, sf_dir)
    assert calls["n"] == len(io.TABLES)   # memo hit: no table() calls


def test_content_change_reregisters(spark, sf_dir, monkeypatch, tmp_path):
    # copy one sf_dir so the file mtimes are ours to touch
    d = tmp_path / "sf"
    d.mkdir()
    for t in io.TABLES:
        shutil.copy2(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    calls = _registration_counter(monkeypatch)
    io.register_views(spark, str(d))
    first = calls["n"]
    os.utime(d / "orders.parquet")   # simulate in-place regeneration
    io.register_views(spark, str(d))
    assert calls["n"] == 2 * first   # fingerprint miss: full re-register


def test_sf_dir_switch_always_reregisters(spark, sf_dir, monkeypatch, tmp_path):
    d = tmp_path / "sf2"
    d.mkdir()
    for t in io.TABLES:
        shutil.copy2(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    calls = _registration_counter(monkeypatch)
    io.register_views(spark, sf_dir)
    io.register_views(spark, str(d))
    io.register_views(spark, sf_dir)   # switch BACK must also re-register
    assert calls["n"] == 3 * len(io.TABLES)
