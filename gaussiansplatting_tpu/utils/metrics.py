"""Structured metrics logging: JSONL stream + stdout summaries.

The reference logs with scattered printf (loss per 20 images
mtl_engine.mm:1098-1101, epoch summaries 1209-1213, density stats
density_control.mm:495-498).  Here every event is one JSON object on a
line — machine-parseable for dashboards and the benchmark harness — with
optional human-readable echo.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Any


class MetricsLogger:
    def __init__(
        self,
        path: str | None = None,
        echo: bool = True,
        stream: IO[str] | None = None,
    ):
        self._file = None
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._file = open(path, "a", buffering=1)
        self._echo = echo
        self._stream = stream if stream is not None else sys.stdout
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> None:
        record = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        line = json.dumps(record, default=_jsonable)
        if self._file is not None:
            self._file.write(line + "\n")
        if self._echo:
            pretty = " ".join(
                f"{k}={_fmt(v)}" for k, v in fields.items() if not k.startswith("_")
            )
            print(f"[{event}] {pretty}", file=self._stream)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _jsonable(x):
    try:
        import numpy as np

        if isinstance(x, np.ndarray):
            return x.tolist()
        if isinstance(x, np.generic):
            return x.item()
    except ImportError:
        pass
    return float(x)


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.5g}"
    return str(v)
