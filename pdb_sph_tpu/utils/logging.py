"""Structured per-step metrics (JSONL) — replaces the reference's
debugMode-gated fps printf (src/main.cpp:94-104)."""

from __future__ import annotations

import json
import sys
from typing import IO


class MetricsLogger:
    """Writes one JSON object per line; None path -> stdout."""

    def __init__(self, path: str | None = None):
        self._own = path is not None
        self._f: IO[str] = open(path, "a") if path else sys.stdout

    def log(self, **fields) -> None:
        self._f.write(json.dumps(fields, default=float) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._own:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
