"""bench_scaling report-layer contract tests (no Spark, stubbed runs).

Two properties the round-5 review found violated and fixed:
1. the fixed-term criterion sentence must be CONDITIONAL — a capture
   whose fitted range fixed term exceeds 5% of the local[4] wall must
   render a report that says the criterion FAILED (the r5 run-1 report
   asserted a pass its own numbers refuted);
2. the compose-rerun mode (SPARK_GRAFT_SCALE_RERUN_JOBS) must splice
   only the named workloads into the base capture, recompute totals,
   carry the fresh witnesses for the re-measured legs, and state the
   two-run provenance in both the JSON and the rendered report.
"""

import contextlib
import io
import json
import os

import pytest


def _fake_base(walls_4_range=20.0, eff=1.0):
    # perfectly-scaling pip/distance; range per `eff` is irrelevant here —
    # the base capture just needs a full four-level wall table
    walls = {}
    for c in (4, 8, 16, 32):
        w = {"pip_join": 320.0 / c, "distance_join": 200.0 / c,
             "range_count": walls_4_range * 4.0 / c}
        w["total"] = sum(w.values())
        walls[str(c)] = w
    return {
        "rows": 57_600_000, "range_n": 18_004, "walls": walls,
        "tiers_learned_vs_binsearch": {
            "lo_learned": 1.0, "lo_binsearch": 1.0, "mid_learned": 1.0,
            "mid_binsearch": 1.0, "hi_learned": 1.0, "hi_binsearch": 1.0,
            "knn_30q": 2.0},
        "kernel_ns_per_lookup": [
            {"partition_size": 8000, "cell_rows": 8000, "n_knots": 10,
             "n_queries": 200000, "learned_ns_per_lookup": 900.0,
             "binsearch_ns_per_lookup": 120.0}],
        "level_witnesses": {str(c): {"pagetouch_before": 3.0,
                                     "pagetouch_after": 3.1,
                                     "quiet_wait_s": 0.0}
                            for c in (4, 8, 16, 32)},
    }


@pytest.fixture
def bs(tmp_path, monkeypatch):
    import bench_scaling as mod
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    monkeypatch.setattr(mod, "prepare_input", lambda sf: None)
    for var in ("SPARK_GRAFT_SCALE_FROM_JSON", "SPARK_GRAFT_SCALE_RERUN_JOBS",
                "SPARK_GRAFT_SCALE_BASE_JSON", "SPARK_GRAFT_SCALE_RERUN_OUT"):
        monkeypatch.delenv(var, raising=False)
    return mod


def _render(bs_mod):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bs_mod.main()
    out = json.loads(buf.getvalue())
    with open(os.path.join(bs_mod.REPO, "BENCH", "BASELINE.md")) as f:
        md = f.read()
    return out, md


def test_fixed_term_criterion_wording_is_conditional(bs, tmp_path, monkeypatch):
    # range leg with a LARGE fixed term: w(4)=22.7, w(16)=9.27 fits f~4.8s
    base = _fake_base()
    for c, w in ((4, 22.7), (8, 14.0), (16, 9.27), (32, 7.0)):
        base["walls"][str(c)]["range_count"] = w
        base["walls"][str(c)]["total"] = sum(
            v for k, v in base["walls"][str(c)].items() if k != "total")
    p = tmp_path / "base.json"
    p.write_text(json.dumps(base))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_FROM_JSON", str(p))
    _, md = _render(bs)
    assert "FAILS the <5% criterion" in md
    assert "measures compute scaling, not per-job overhead" not in md

    # and a SMALL fixed term renders the pass wording
    for c in (4, 8, 16, 32):
        base["walls"][str(c)]["range_count"] = 40.0 * 4 / c  # pure 1/N
        base["walls"][str(c)]["total"] = sum(
            v for k, v in base["walls"][str(c)].items() if k != "total")
    p.write_text(json.dumps(base))
    _, md = _render(bs)
    assert "FAILS the <5% criterion" not in md
    assert "measures compute scaling, not per-job overhead" in md


def test_compose_rerun_splices_only_named_leg(bs, tmp_path, monkeypatch):
    base = _fake_base()
    p = tmp_path / "base.json"
    p.write_text(json.dumps(base))

    def fake_run(c):
        tiers = {}
        if c == 32:
            tiers = {"lo_learned": 1.0, "lo_binsearch": 1.2,
                     "mid_learned": 1.0, "mid_binsearch": 1.2,
                     "hi_learned": 1.0, "hi_binsearch": 1.2, "knn_30q": 1.5}
        return {"cores": c, "rows": 57_600_000,
                "walls": {"range_count": 64.0 / c, "total": 64.0 / c},
                "tiers": tiers,
                "witness": {"pagetouch_before": 2.5, "pagetouch_after": 2.6,
                            "quiet_wait_s": 7.0}}

    monkeypatch.setattr(bs, "run", fake_run)
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RERUN_JOBS", "range_count")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_BASE_JSON", str(p))
    rerun_out = tmp_path / "rerun_raw.json"
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RERUN_OUT", str(rerun_out))
    out, md = _render(bs)

    # spliced: fresh range wall, base pip/distance walls, totals recomputed
    assert out["walls"]["4"]["range_count"] == 16.0
    assert out["walls"]["4"]["pip_join"] == 80.0
    assert out["walls"]["4"]["total"] == pytest.approx(80.0 + 50.0 + 16.0)
    assert out["efficiency_4_to_16"]["range_count"] == 1.0
    # provenance: composed_from + fresh witnesses + two-run note in the md
    assert out["composed_from"] == {"base_json": "base.json",
                                    "rerun_jobs": ["range_count"]}
    assert out["level_witnesses"]["4"]["pagetouch_before"] == 2.5
    assert "re-measurement" in out["witness_note"]
    assert "base.json" in md and "re-measurement" in md
    # the captured kernel sweep is reused, never re-measured mid-render
    assert out["kernel_ns_per_lookup"][0]["binsearch_ns_per_lookup"] == 120.0
    # raw rerun JSON lands where asked
    raw = json.loads(rerun_out.read_text())
    assert raw["4"]["walls"]["range_count"] == 16.0
