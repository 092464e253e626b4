"""Benchmark suite configuration sanity (baselines match SURVEY.md §6)."""

import json


def test_bench_suite_well_formed():
    import bench_all

    names = [row[0] for row in bench_all.SUITE]
    # every registered model family appears in the suite
    from monocular_depth_estimation_trt_tpu.registry import list_models

    assert set(names) == set(list_models())
    for name, kw, in_hw, baseline in bench_all.SUITE:
        assert isinstance(kw, dict)
        assert len(in_hw) == 2
        assert baseline is None or baseline > 0


def test_bench_baselines_match_survey():
    """Spot-check the hard-coded TRT baselines against SURVEY.md §6."""
    import bench_all

    table = {
        (r[0], r[1].get("encoder", "")): r[3] for r in bench_all.SUITE
    }
    assert table[("depth_anything_v2", "vits")] == 122.92
    assert table[("depth_pro", "")] == 1.41
    assert table[("vggt", "")] == 7.15
    assert table[("raft", "")] == 21.96
    assert table[("meflow", "")] == 18.52


def test_headline_bench_baseline():
    import bench

    assert bench.TRT_BASELINE_FPS["vits"] == 122.92


def test_probe_retry_succeeds_mid_budget(monkeypatch):
    """A link that recovers during the retry window must yield True —
    the whole point of retrying is that outages end abruptly."""
    import bench

    sleeps = []
    monkeypatch.setattr("time.sleep", lambda s: sleeps.append(s))
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        return calls["n"] >= 3

    assert bench._probe_link_with_retries(flaky, budget_s=1e9,
                                          retry_sleep_s=30)
    assert calls["n"] == 3
    assert len(sleeps) == 2


def test_probe_retry_exhausts_budget(monkeypatch):
    """A dead link must fail within the budget, not loop forever (driver
    contract: bench.py always terminates with one JSON line)."""
    import itertools

    import bench

    t = itertools.count(step=100.0)  # each monotonic() call advances 100 s
    monkeypatch.setattr("time.monotonic", lambda: float(next(t)))
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = {"n": 0}

    def dead():
        calls["n"] += 1
        return False

    assert not bench._probe_link_with_retries(dead, budget_s=250.0)
    assert calls["n"] >= 2  # it did retry before giving up
