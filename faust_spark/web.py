"""Minimal HTTP serving for ``@app.page`` / ``@app.table_route`` parity.

Reference surface: ``faust/app/base.py:1218-1283`` (page registration) and
the front-page demo ``examples/word_count.py:35-40`` — a page route renders
a table lookup as JSON. Faust runs an aiohttp server per worker and
``table_route`` forwards a request to the worker owning the key's
partition; here every table a query materializes is a DataFrame visible to
the one driver process, so ``table_route`` is a registration-time marker
(it validates the table/key wiring) and lookups execute locally. The
server itself is stdlib ``ThreadingHTTPServer`` — no new dependencies.

Handlers are sync callables ``fn(web, request, **match)`` returning a dict
(rendered as JSON), a ``Web.json(...)`` payload, or a DataFrame (rendered
as a JSON array of row dicts — keep pages to small results; a page is a
point lookup, not an export path).
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Optional
from urllib.parse import parse_qs, urlparse


@dataclass
class Request:
    path: str
    match: dict
    query: dict


@dataclass
class TextResponse:
    """A non-JSON page payload (e.g. the Prometheus /metrics
    exposition, which scrapers require as ``text/plain``)."""

    body: str
    content_type: str = "text/plain; charset=utf-8"


class Web:
    """Handler toolkit (the ``web`` argument — reference ``faust.web``)."""

    @staticmethod
    def json(obj: Any, status: int = 200) -> tuple[int, Any]:
        return (status, obj)

    @staticmethod
    def text(
        body: str,
        status: int = 200,
        content_type: str = "text/plain; charset=utf-8",
    ) -> tuple[int, "TextResponse"]:
        return (status, TextResponse(body, content_type))


@dataclass
class PageRoute:
    pattern: str
    regex: "re.Pattern"
    fn: Callable
    table: Any = None
    match_info: Optional[str] = None


def compile_route(pattern: str) -> "re.Pattern":
    """``/count/{word}/`` → anchored regex with named groups."""
    out = re.sub(r"\{(\w+)\}", r"(?P<\1>[^/]+)", pattern.rstrip("/"))
    return re.compile(f"^{out}/?$")


@dataclass
class WebServer:
    routes: list = field(default_factory=list)
    port: int = 6066
    _httpd: Optional[ThreadingHTTPServer] = None
    _thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        assert self._httpd is not None, "server not started"
        return f"http://127.0.0.1:{self._httpd.server_address[1]}"

    def start(self) -> "WebServer":
        routes = self.routes
        web = Web()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a: Any) -> None:  # quiet test output
                pass

            def do_GET(self) -> None:
                parsed = urlparse(self.path)
                for route in routes:
                    m = route.regex.match(parsed.path)
                    if not m:
                        continue
                    req = Request(
                        path=parsed.path,
                        match=m.groupdict(),
                        query=parse_qs(parsed.query),
                    )
                    try:
                        result = route.fn(web, req, **m.groupdict())
                    except Exception as e:  # handler bug → 500, keep serving
                        self._send(500, {"error": str(e)})
                        return
                    status, payload = (
                        result
                        if isinstance(result, tuple)
                        else (200, result)
                    )
                    if hasattr(payload, "toJSON"):  # DataFrame
                        payload = [
                            json.loads(r) for r in payload.toJSON().collect()
                        ]
                    self._send(status, payload)
                    return
                self._send(404, {"error": f"no page for {parsed.path}"})

            def _send(self, status: int, obj: Any) -> None:
                if isinstance(obj, TextResponse):
                    body = obj.body.encode()
                    ctype = obj.content_type
                else:
                    body = json.dumps(obj).encode()
                    ctype = "application/json"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        # port 0 → ephemeral (tests); fixed port in deployments
        self._httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


__all__ = [
    "Web",
    "Request",
    "PageRoute",
    "TextResponse",
    "WebServer",
    "compile_route",
]
