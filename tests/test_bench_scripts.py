"""scripts/merge_bench.py + scripts/gen_readme_table.py — these run right
after a hardware measurement window; a bug here throws away real TPU
numbers, so the merge semantics are pinned."""

import importlib.util
import json
import os
import sys


def _load(name):
    root = os.path.join(os.path.dirname(__file__), "..", "scripts")
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(root, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_replaces_appends_and_protects_good_rows(tmp_path):
    full = {"timestamp": 1.0, "results": [
        {"model": "a", "fps": 100.0},
        {"model": "b", "fps": 50.0},
    ]}
    partial = {"results": [
        {"model": "a", "fps": 120.0},            # replace
        {"model": "c", "fps": 10.0},             # append
        {"model": "b", "error": "worker crash"},  # must NOT clobber b
    ]}
    fp, pp = tmp_path / "all.json", tmp_path / "part.json"
    fp.write_text(json.dumps(full))
    pp.write_text(json.dumps(partial))

    mb = _load("merge_bench")
    assert mb.merge(str(pp), str(fp)) == 0
    out = json.loads(fp.read_text())
    rows = {r["model"]: r for r in out["results"]}
    assert rows["a"]["fps"] == 120.0
    assert rows["b"]["fps"] == 50.0 and "error" not in rows["b"]
    assert rows["c"]["fps"] == 10.0
    assert out["timestamp"] > 1.0


def test_merge_error_row_lands_when_no_prior_good_row(tmp_path):
    fp, pp = tmp_path / "all.json", tmp_path / "part.json"
    fp.write_text(json.dumps({"timestamp": 0, "results": []}))
    pp.write_text(json.dumps({"results": [{"model": "x", "error": "boom"}]}))
    _load("merge_bench").merge(str(pp), str(fp))
    out = json.loads(fp.read_text())
    assert out["results"][0]["error"] == "boom"


def test_merge_refreshes_stale_fidelity_from_registry(tmp_path):
    """Fidelity is registry metadata joined into the row at bench time; a
    family promoted after its last hardware run (bridge/litevggt in round 3)
    must be re-stamped on merge without touching any measurement."""
    mb = _load("merge_bench")
    live = mb._live_fidelity("bridge_vits")
    assert live == "converter-verified"  # the registry is the source of truth

    full = {"timestamp": 1.0, "results": [
        {"model": "bridge_vits", "fps": 256.11,
         "fidelity": "architecture-matched"},      # stale: benched pre-promotion
        {"model": "not_a_registry_tag", "fps": 1.0,
         "fidelity": "approximated"},               # unknown tag: left alone
    ]}
    fp, pp = tmp_path / "all.json", tmp_path / "part.json"
    fp.write_text(json.dumps(full))
    pp.write_text(json.dumps({"results": []}))
    mb.merge(str(pp), str(fp))
    rows = {r["model"]: r for r in json.loads(fp.read_text())["results"]}
    assert rows["bridge_vits"]["fidelity"] == "converter-verified"
    assert rows["bridge_vits"]["fps"] == 256.11
    assert rows["not_a_registry_tag"]["fidelity"] == "approximated"

    # --refresh-fidelity entry: idempotent second pass reports nothing to do
    assert mb.refresh_fidelity(json.loads(fp.read_text())["results"]) == 0


def test_gen_readme_table_rewrites_between_markers(tmp_path, monkeypatch):
    gt = _load("gen_readme_table")
    bench = {"results": [
        {"model": "raft", "fps": 84.8, "baseline_trt_fps": 21.96,
         "speedup_vs_trt": 3.86, "fidelity": "converter-verified"},
        {"model": "depth_anything_v2_vitl_int8", "fps": 100.0,
         "speedup_vs_bf16": 1.5, "bf16_fps": 66.7,
         "fidelity": "converter-verified"},
        {"model": "neuflow", "error": "kernel fault"},
    ]}
    bp = tmp_path / "bench.json"
    bp.write_text(json.dumps(bench))
    rp = tmp_path / "README.md"
    rp.write_text("head\n<!-- BENCH_TABLE_START -->\nOLD\n"
                  "<!-- BENCH_TABLE_END -->\ntail\n")
    monkeypatch.setattr(sys, "argv",
                        ["gen_readme_table.py", str(bp), str(rp)])
    assert gt.main() == 0
    text = rp.read_text()
    assert "OLD" not in text
    assert "| `raft` |" in text and "3.9×" in text
    assert "1.50× vs bf16" in text
    assert "`neuflow` is missing from this run" in text
    assert text.startswith("head\n") and text.endswith("tail\n")


def test_pct_of_roof_from_fake_engine():
    """bench_all._pct_of_roof: roofline %-of-bound from an engine's XLA cost
    analysis (round-3 verdict item 5 — falsifiable 'fast' for baseline-less
    rows)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "bench_all", os.path.join(root, "bench_all.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class FakeEng:
        def cost_analysis(self):
            # memory-bound program: 819 MB accessed -> bound = 1 ms
            return {"flops": 1e9, "bytes accessed": 819e6}

    class FakePipe:
        _engines = {"k": FakeEng()}

    # pin the measured dispatch floor (normally measured on-device once per
    # run; round-4 verdict item 4 — the bound must include it so measured
    # <= bound always)
    mod._DISPATCH_FLOOR_S = 0.0
    # measured 2 ms against a 1 ms bound -> 50% of roof
    pct, bound_ms = mod._pct_of_roof(FakePipe(), 2e-3)
    assert bound_ms == 1.0 and pct == 50.0
    # batched program: bound_ms reported per frame, pct unchanged
    pct_b, bound_b = mod._pct_of_roof(FakePipe(), 2e-3, frames=4)
    assert pct_b == 50.0 and bound_b == 0.25
    # a 0.5 ms dispatch floor raises the bound: 1.5 ms / 2 ms = 75%
    mod._DISPATCH_FLOOR_S = 0.5e-3
    pct_f, bound_f = mod._pct_of_roof(FakePipe(), 2e-3)
    assert bound_f == 1.5 and pct_f == 75.0
    # engines without cost analysis degrade to (None, None)

    class NoCa:
        def cost_analysis(self):
            return {}

    class NoPipe:
        _engines = {"k": NoCa()}

    assert mod._pct_of_roof(NoPipe(), 2e-3) == (None, None)

    # round-5: XLA "bytes accessed" can over-count (vggt: apparent 935 GB/s
    # on an 819 GB/s chip -> bound > measured -> pct > 100). When the
    # executable's memory_analysis is available, the memory term must drop
    # to the provable floor: arguments + outputs - aliases.
    class MemStats:
        argument_size_in_bytes = 81.9e6
        output_size_in_bytes = 0.0
        alias_size_in_bytes = 0.0

    class OverEng(FakeEng):
        def memory_analysis(self):
            return MemStats()

    class OverPipe:
        _engines = {"k": OverEng()}

    mod._DISPATCH_FLOOR_S = 0.0
    # naive bytes say 1 ms; provable floor says 0.1 ms; flops say ~0.005 ms
    pct_o, bound_o = mod._pct_of_roof(OverPipe(), 2e-3)
    assert bound_o == 0.1 and pct_o == 5.0

    # split pipelines (moge2/metric_anything): the bound sums both
    # programs' terms and pays the dispatch floor once per program
    class SplitEng:
        def __init__(self):
            self.e1, self.e2 = FakeEng(), FakeEng()

    class SplitPipe:
        _engines = {"k": SplitEng()}

    mod._DISPATCH_FLOOR_S = 0.25e-3
    # two programs x 1 ms memory bound + 2 x 0.25 ms floor = 2.5 ms
    pct_s, bound_s = mod._pct_of_roof(SplitPipe(), 5e-3)
    assert bound_s == 2.5 and pct_s == 50.0


def test_merge_recomputes_int8_ratios(tmp_path):
    """isolate-mode int8 rows join a STALE bf16_fps (the subprocess can't
    see same-run rows); the merge must recompute the ratio from the merged
    bf16 row."""
    full = {"timestamp": 1.0, "results": [
        {"model": "m_vitl", "fps": 65.0},
        {"model": "m_vitl_int8", "fps": 72.0, "bf16_fps": 60.0,
         "speedup_vs_bf16": 1.2},
    ]}
    partial = {"results": [
        {"model": "m_vitl", "fps": 75.0},
        {"model": "m_vitl_int8", "fps": 82.0, "bf16_fps": 65.0,
         "speedup_vs_bf16": 1.26},
    ]}
    fp, pp = tmp_path / "all.json", tmp_path / "part.json"
    fp.write_text(json.dumps(full))
    pp.write_text(json.dumps(partial))
    mb = _load("merge_bench")
    assert mb.merge(str(pp), str(fp)) == 0
    rows = {r["model"]: r for r in json.loads(fp.read_text())["results"]}
    assert rows["m_vitl_int8"]["bf16_fps"] == 75.0
    assert rows["m_vitl_int8"]["speedup_vs_bf16"] == round(82.0 / 75.0, 2)


def test_refresh_int8_ratios_skips_error_and_missing_base():
    mb = _load("merge_bench")
    rows = [
        {"model": "x_int8", "fps": 10.0, "bf16_fps": 9.0},      # no base row
        {"model": "y", "error": "crash"},
        {"model": "y_int8", "fps": 5.0, "bf16_fps": 4.0},        # base errored
        {"model": "z", "fps": 8.0},
        {"model": "z_int8", "error": "crash", "bf16_fps": 1.0},  # self errored
    ]
    assert mb.refresh_int8_ratios(rows) == 0
    assert rows[0]["bf16_fps"] == 9.0 and rows[2]["bf16_fps"] == 4.0
