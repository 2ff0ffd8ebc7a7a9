"""Process admission queue + graceful stop (reference parity: P4 control
plane).

The reference runs at most four long-running processes concurrently: new
submissions enqueue, and a finishing process finalizes and dequeues the next
(control/ProcessScheduler.scala:31-59, ``MAX_RUNNING_PROCESSES = 4``). Its
HTTP control server exposes ``/version`` and ``/stop``; stop flips a flag so
running work drains and nothing new is admitted
(control/Server.scala:31-56).

Spark-first realization: processes here are DRIVER-side orchestrations
(e.g. a crawl-round loop, a dedup sweep) — Spark's scheduler handles the
data-parallel concurrency inside each; this queue bounds how many
orchestrations submit jobs at once (Spark's FAIR scheduler pools interleave
their stages). Pure threading, no Spark dependency, so it is unit-testable
without a session.
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable

MAX_RUNNING_PROCESSES = 4  # reference ProcessScheduler.scala:33


@dataclass(eq=False)  # identity semantics — handles live in sets
class ProcessHandle:
    """A submitted process: wait on ``done``; inspect result/error/status."""

    name: str
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: BaseException | None = None
    status: str = "queued"  # queued | running | finished | failed | rejected

    def wait(self, timeout: float | None = None) -> bool:
        return self.done.wait(timeout)


class ProcessScheduler:
    """Bounded-concurrency process queue with cooperative stop.

    - ``submit`` admits immediately while fewer than ``max_running``
      processes run, else enqueues (reference enqueue-on-full,
      ProcessScheduler.scala:38-44);
    - a finishing process dequeues the next (finalize-then-dequeue,
      ProcessScheduler.scala:47-59);
    - ``stop`` rejects the queued remainder and admits nothing new; running
      processes drain (reference /stop, Server.scala:42-51). Long-running
      bodies can poll ``stopping`` between rounds for an early exit.
    """

    def __init__(self, max_running: int = MAX_RUNNING_PROCESSES):
        self._max = max_running
        self._lock = threading.Lock()
        self._queue: deque[tuple[ProcessHandle, Callable[[], Any]]] = deque()
        self._running: set[ProcessHandle] = set()
        self._all: list[ProcessHandle] = []
        self._stopping = False
        self.peak_concurrent = 0  # observability: max simultaneous processes

    # ------------------------------------------------------------------ api
    @property
    def stopping(self) -> bool:
        return self._stopping

    def submit(self, name: str, fn: Callable[[], Any]) -> ProcessHandle:
        h = ProcessHandle(name)
        with self._lock:
            self._all.append(h)
            if self._stopping:
                h.status = "rejected"
                h.done.set()
                return h
            self._queue.append((h, fn))
            self._maybe_start_locked()
        return h

    def stop(self) -> None:
        """Graceful stop: reject everything still queued; let running
        processes finish (they may also poll ``stopping``)."""
        with self._lock:
            self._stopping = True
            while self._queue:
                h, _ = self._queue.popleft()
                h.status = "rejected"
                h.done.set()

    def drain(self, timeout: float | None = None) -> bool:
        """Wait until every admitted process finished. True if drained."""
        with self._lock:
            handles = list(self._all)
        ok = True
        for h in handles:
            ok = h.wait(timeout) and ok
        return ok

    def running_count(self) -> int:
        with self._lock:
            return len(self._running)

    @staticmethod
    def version() -> str:
        """Reference /version endpoint (Server.scala:31-38)."""
        from delphi_crawler_spark import __version__

        return __version__

    def status(self) -> dict:
        """Introspection surface (the /version + queue-state analogue of the
        reference control server, Server.scala:31-56): engine version,
        stop flag, queue depth, per-state process counts, and the names of
        what is queued/running — everything an operator polls to decide
        whether a /stop has drained."""
        with self._lock:
            by_state: dict[str, int] = {}
            for h in self._all:
                by_state[h.status] = by_state.get(h.status, 0) + 1
            return {
                "version": self.version(),
                "stopping": self._stopping,
                "max_running": self._max,
                "queued": [h.name for h, _ in self._queue],
                "running": sorted(h.name for h in self._running),
                "counts": by_state,
                "peak_concurrent": self.peak_concurrent,
                "drained": not self._queue and not self._running,
            }

    # ------------------------------------------------------------ internals
    def _maybe_start_locked(self) -> None:
        while self._queue and len(self._running) < self._max and not self._stopping:
            h, fn = self._queue.popleft()
            h.status = "running"
            self._running.add(h)
            self.peak_concurrent = max(self.peak_concurrent, len(self._running))
            threading.Thread(target=self._run, args=(h, fn), daemon=True).start()

    def _run(self, h: ProcessHandle, fn: Callable[[], Any]) -> None:
        try:
            h.result = fn()
            h.status = "finished"
        except BaseException as e:  # noqa: BLE001 — the handle carries it
            h.error = e
            h.status = "failed"
        finally:
            with self._lock:
                self._running.discard(h)
                self._maybe_start_locked()  # finalize -> dequeue next
            h.done.set()
