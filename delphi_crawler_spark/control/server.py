"""HTTP control façade over the process scheduler (reference parity:
control/Server.scala:31-56, which exposes ``/version`` and ``/stop`` over
REST next to the process queue).

Stdlib-only (``http.server`` on a daemon thread, ephemeral port by default)
so the in-sandbox engine gains the same operational surface without any new
dependency: ``GET /version`` returns the engine version, ``GET /status``
the scheduler's full introspection dict, and ``POST /stop`` (GET also
accepted, matching the reference's simple endpoint) flips the cooperative
stop flag — queued work is rejected, running work drains, and subsequent
``/status`` polls report ``drained`` exactly as the Python API does.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from delphi_crawler_spark.control.scheduler import ProcessScheduler


class ControlServer:
    """Lifecycle wrapper: ``start()`` binds and serves on a daemon thread,
    ``stop_server()`` shuts the listener down (NOT the scheduler — that is
    what the /stop endpoint is for)."""

    def __init__(self, scheduler: ProcessScheduler, host: str = "127.0.0.1",
                 port: int = 0):
        self._scheduler = scheduler
        self._host = host
        self._port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- lifecycle
    def start(self) -> tuple[str, int]:
        """Bind and serve; returns (host, actual_port)."""
        sched = self._scheduler

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _route(self) -> None:
                path = self.path.rstrip("/") or "/"
                if path == "/version":
                    self._send(200, {"version": sched.version()})
                elif path == "/status":
                    self._send(200, sched.status())
                elif path == "/stop":
                    sched.stop()
                    self._send(200, {"stopping": True})
                else:
                    self._send(404, {"error": f"no such endpoint: {path}"})

            do_GET = _route
            do_POST = _route

            def log_message(self, *args) -> None:  # keep pytest output clean
                pass

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[0], self._httpd.server_address[1]

    def stop_server(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self) -> "ControlServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop_server()

    @property
    def address(self) -> tuple[str, int]:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[:2]
