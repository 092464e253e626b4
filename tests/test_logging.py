"""Logging-stream regression tests.

The reference logs with bare ``print('[MDET] ...')`` (e.g. reference
``Depth_Anything_V2/infer.py:19``); our structured logger must keep those
lines visible to whatever stdout is *current*, not the stdout object cached
at first configure. Round-4 bug: pytest capsys (or any app redirecting
stdout) silently lost every ``[MDET]`` line emitted after the first
``_configure()`` in the process.
"""

from __future__ import annotations

import contextlib
import io

from monocular_depth_estimation_trt_tpu.utils.logging import get_logger, log


def test_log_visible_after_stdout_redirect(capsys):
    # Force configuration against the *original* stdout first.
    get_logger()
    log("first line before capture check")
    captured = capsys.readouterr()
    assert "[MDET] first line before capture check" in captured.out


def test_log_follows_redirect_stdout():
    get_logger()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        log("redirected line", tag="TEST")
    assert "[TEST] redirected line" in buf.getvalue()


def test_log_repeated_redirects_each_capture_their_own_lines():
    get_logger()
    outs = []
    for i in range(3):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            log(f"line {i}")
        outs.append(buf.getvalue())
    for i, out in enumerate(outs):
        assert f"[MDET] line {i}" in out
        # No cross-talk between captures.
        assert sum(f"line {j}" in out for j in range(3)) == 1
