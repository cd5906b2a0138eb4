"""Live console status line for ingest runs.

Re-expresses the reference's 1 Hz status loop (reference
pipeline/utils/api.py:80-108): interactive terminals get a
carriage-return-rewritten single line every ``interval`` seconds;
non-interactive (piped / container) output falls back to a plain print
every ``log_interval`` seconds so logs are not flooded — the same
isatty branch the reference takes. The reference feeds a process-global
Counter; here any zero-argument callable returning counters works, so
both :class:`~automated_data_pipeline_python_spark.ingest.fetcher.FetchStats`
and ``df.observe`` results plug in.

Runs on a daemon thread rather than an asyncio task so it can wrap
driver-side Spark actions (which block the loop) just as well as the
async fetch pipeline.
"""

from __future__ import annotations

import sys
import threading
import time
from collections.abc import Callable, Mapping


def format_status(stats: Mapping[str, object], elapsed_s: float) -> str:
    """One line in the reference's ``k: v | k: v | Elapsed`` shape."""
    parts = [f"{k.replace('_', ' ').title()}: {v}" for k, v in stats.items()]
    parts.append(f"Elapsed: {elapsed_s / 60:.2f} minutes")
    return " | ".join(parts)


class ConsoleStatus:
    """Background status reporter; use as a context manager.

    ``stats_source`` is called on the reporter thread each tick and must
    return an ordered mapping of counter name → value.
    """

    def __init__(
        self,
        stats_source: Callable[[], Mapping[str, object]],
        interval: float = 1.0,
        log_interval: float = 30.0,
        out=None,
        interactive: bool | None = None,
    ) -> None:
        self._source = stats_source
        self._out = out if out is not None else sys.stdout
        if interactive is None:
            isatty = getattr(self._out, "isatty", lambda: False)
            interactive = bool(isatty())
        self._interactive = interactive
        # Reference semantics: 1 Hz rewrite on a TTY, slow plain prints
        # otherwise (api.py:83-84).
        self._tick = interval if interactive else log_interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0

    def _emit(self) -> None:
        line = format_status(self._source(), time.monotonic() - self._t0)
        if self._interactive:
            self._out.write("\r" + line)
        else:
            self._out.write(line + "\n")
        self._out.flush()

    def _run(self) -> None:
        while not self._stop.wait(self._tick):
            self._emit()

    def start(self) -> "ConsoleStatus":
        self._t0 = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name="console-status", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        self._emit()  # final line so the end state is always printed
        if self._interactive:
            self._out.write("\n")
            self._out.flush()

    def __enter__(self) -> "ConsoleStatus":
        return self.start()

    def __exit__(self, *exc: object) -> None:
        self.stop()
