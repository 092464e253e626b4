"""File-locator and stage-timer utilities."""

import os

import numpy as np
import pytest

from monocular_depth_estimation_trt_tpu.runtime.profiler import StageTimer
from monocular_depth_estimation_trt_tpu.utils.files import GiB, locate_files


def test_gib():
    assert GiB(2) == 2 << 30


def test_locate_files(tmp_path):
    (tmp_path / "a.txt").write_text("x")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.txt").write_text("y")
    found = locate_files([str(tmp_path), str(sub)], ["a.txt", "b.txt"])
    assert found[0].endswith("a.txt") and found[1].endswith("b.txt")
    with pytest.raises(FileNotFoundError):
        locate_files([str(tmp_path)], ["nope.bin"])


def test_stage_timer():
    t = StageTimer()
    with t.section("work"):
        sum(range(1000))
    with t.section("work"):
        sum(range(1000))
    rep = t.report()
    assert rep["work"]["count"] == 2
    assert rep["work"]["avg_ms"] >= 0
