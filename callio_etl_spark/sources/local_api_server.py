"""In-process HTTP stand-in for the Callio paginated API.

Serves the exact JSON surface the reference's client consumes
(reference ``api.py:86-148`` login + token header + 401 refresh,
``api.py:151-218`` page/pageSize/sort/from/to params, ``docs`` /
``totalDocs`` / ``hasNextPage`` payload, and the literal HTTP 400
``"Result window is too large"`` refusal) so ``HttpApiTransport`` — the
REAL urllib client — can be driven end to end inside this container,
which has no external network. Tests and the registered
``api_http_ingest`` query stand this server up on ``127.0.0.1:0``; a
production deployment points ``base_url`` at the live endpoint instead
and changes nothing else.

Determinism: rows are served in the same descending ``(ts, _id)`` order
``JsonlApiTransport`` uses, bounds are closed (``from <= ts <= to``),
and the result window is enforced by page reach (``page * pageSize``),
all mirroring the offline transport so the two backends are
interchangeable under the same planner/reader.

Failure injection (tests): ``expire_token_after`` forces a 401 on every
Nth+1 data request until the client re-logins (the reference's
token-refresh path); counters expose how often each path ran.
"""

from __future__ import annotations

import http.server
import json
import threading
import urllib.parse


class LocalCallioApiServer:
    """Threaded localhost server over an in-memory row list.

    ``rows``: list of dicts, each carrying ``time_field`` (epoch ms) and
    ``_id``. ``accounts``: {email: password} accepted by /auth/login.
    ``result_window``: max row reach (page * pageSize) before the 400
    refusal. ``expire_token_after``: issued tokens go stale after this
    many authenticated data requests (None = never) — exercises the
    client's 401 force-refresh."""

    def __init__(
        self,
        rows: list[dict],
        time_field: str = "ts_ms",
        accounts: dict[str, str] | None = None,
        result_window: int = 10_000,
        expire_token_after: int | None = None,
    ):
        tf = time_field
        self.rows = sorted(
            rows, key=lambda r: (-int(r[tf]), str(r.get("_id")))
        )
        self.time_field = tf
        self.accounts = accounts or {"etl@example.com": "pw"}
        self.result_window = result_window
        self.expire_token_after = expire_token_after
        self.logins = 0
        self.requests = 0
        self.refusals = 0
        self._lock = threading.Lock()
        self._live_tokens: dict[str, int] = {}  # token -> uses left (-1 = inf)
        self._httpd: http.server.ThreadingHTTPServer | None = None

    # ------------------------------------------------------------ lifecycle
    def start(self) -> str:
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj: dict | None = None,
                      text: str | None = None) -> None:
                body = (
                    text.encode("utf-8")
                    if text is not None
                    else json.dumps(obj).encode("utf-8")
                )
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if not self.path.rstrip("/").endswith("/auth/login"):
                    return self._json(404, {"error": "not found"})
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    creds = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "bad json"})
                email = creds.get("email")
                if outer.accounts.get(email) != creds.get("password"):
                    return self._json(401, {"error": "bad credentials"})
                with outer._lock:
                    outer.logins += 1
                    token = f"tok-{outer.logins}"
                    outer._live_tokens[token] = (
                        outer.expire_token_after
                        if outer.expire_token_after is not None
                        else -1
                    )
                return self._json(200, {"token": token})

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                q = {
                    k: v[0]
                    for k, v in urllib.parse.parse_qs(parsed.query).items()
                }
                token = self.headers.get("token")
                with outer._lock:
                    outer.requests += 1
                    left = outer._live_tokens.get(token or "")
                    if left is None or left == 0:
                        outer._live_tokens.pop(token or "", None)
                        return self._json(401, {"error": "token expired"})
                    if left > 0:
                        outer._live_tokens[token] = left - 1
                page = max(1, int(q.get("page", 1)))
                page_size = max(1, int(q.get("pageSize", 500)))
                if page * page_size > outer.result_window:
                    with outer._lock:
                        outer.refusals += 1
                    return self._json(
                        400, text='{"error": "Result window is too large"}'
                    )
                tf = outer.time_field
                lo = int(q["from"]) if "from" in q else None
                hi = int(q["to"]) if "to" in q else None
                rows = [
                    r
                    for r in outer.rows
                    if (lo is None or int(r[tf]) >= lo)
                    and (hi is None or int(r[tf]) <= hi)
                ]
                start = (page - 1) * page_size
                docs = rows[start : start + page_size]
                return self._json(
                    200,
                    {
                        "docs": docs,
                        "totalDocs": len(rows),
                        "hasNextPage": start + page_size < len(rows),
                    },
                )

        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="local-callio-api",
        ).start()
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
