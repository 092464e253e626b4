"""Structured logging with the reference's ``[MDET]`` section convention.

The reference logs with bare ``print('[MDET] ...')`` / ``print('[TRT_E] ...')``
prefixes everywhere (e.g. reference ``Depth_Anything_V2/infer.py:19``,
``onnx2trt.py:56``). We keep the visible format identical so run logs are
diffable against the reference's READMEs, but route through ``logging`` so
apps can silence or capture it.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(message)s"
_CONFIGURED = False


class _CurrentStdout:
    """File-like proxy that always writes to the *current* ``sys.stdout``.

    ``logging.StreamHandler(sys.stdout)`` binds the stdout object that exists
    at first configure; any later redirection (pytest capsys, an app capturing
    ``[MDET]`` output, ``contextlib.redirect_stdout``) would silently lose all
    log lines. Delegating per-call keeps the handler pointed at whatever
    stdout is live when the record is emitted.
    """

    def write(self, s: str) -> int:
        return sys.stdout.write(s)

    def flush(self) -> None:
        sys.stdout.flush()


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    handler = logging.StreamHandler(_CurrentStdout())
    handler.setFormatter(logging.Formatter(_FORMAT))
    root = logging.getLogger("mdet")
    root.addHandler(handler)
    level = os.environ.get("MDET_LOG_LEVEL", "INFO").upper()
    root.setLevel(getattr(logging, level, logging.INFO))
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str = "mdet") -> logging.Logger:
    _configure()
    if name == "mdet" or name.startswith("mdet."):
        return logging.getLogger(name)
    return logging.getLogger(f"mdet.{name}")


def log(msg: str, *args, tag: str = "MDET") -> None:
    """Print one reference-style tagged line: ``[MDET] msg``."""
    get_logger().info(f"[{tag}] {msg}", *args)
