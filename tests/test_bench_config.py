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
