"""Paginated-API source as a native Spark Python DataSource (SURVEY S1-S4, S7).

The reference ingests from a paginated HTTP API on a single thread: a
driver-side stack of time slices, each fetched page-by-page in descending
time order with early stop at the checkpoint cutoff, reactive bisection
when the server refuses a too-large result window, and a token cache with
a 25-minute TTL (reference ``api.py:43-68`` token cache, ``151-218``
``fetch_slice`` pagination + early stop, ``222-231`` backward slice walk,
``278-301`` resume/bisect on result-window errors).

This module re-expresses that contract in Spark's execution model instead
of translating the loop:

- **Slice planning is plan-time metadata** (``partitions()``): the driver
  probes each candidate slice's row count (the API's cheap ``totalDocs``
  header — one request, no docs) and bisects proactively until every slice
  fits the server's result window, down to ``min_slice_ms`` (the
  reference's S4 bisection, moved from reactive 400-handling to the
  planner so ALL partitions are known up front and fetch in parallel).
- **Pagination + early stop run per executor** (``read()``): each
  partition walks its own slice's pages in descending time order and
  stops at the first row at-or-under the cutoff — S1/S2 exactly, but N
  slices fetch concurrently instead of serially.
- **Reactive resume stays** as the fallback: if the transport still
  raises a result-window refusal mid-read (counts drifted between plan
  and fetch), the reader resumes from the oldest fetched timestamp - 1,
  the reference's recovery trick, sequentially within the partition.
- **First-wins keying** (reference ``add_docs`` doc_store): applied
  within a partition during the page walk; slices are disjoint time
  ranges, so cross-slice duplicates only exist for payloads re-emitted by
  the API across windows — exactly what the engine-level
  ``dedup.first_wins`` pass (D1) handles downstream, where it scales,
  instead of a driver-side dict.
- **Schema-driven projection**: ``read()`` emits only the fields in the
  caller's schema, so a pruned schema never deserializes untouched
  payload columns (the DataFrame-side column pruning reaches the source).

Transports: ``JsonlApiTransport`` is the deterministic offline backend
(a JSONL file stands in for the endpoint; same three calls a real client
needs). ``HttpApiTransport`` is the REAL urllib client speaking the
reference's wire surface (login POST, token header, 401 force-refresh,
result-window 400) — verified in-container against
``local_api_server.LocalCallioApiServer`` since this sandbox has no
external network; a deployment points ``base_url`` at the live endpoint
and changes nothing else.

The global ``limit_records`` cap (reference ``config.py:203-204``) is a
driver-side concern in Spark: apply ``.limit(n)`` on the returned
DataFrame; Spark pushes it into the scan and stops consuming partitions.
"""

from __future__ import annotations

import json
import time as _time
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

TOKEN_TTL_S = 25 * 60  # reference api.py:67
DEFAULT_PAGE_SIZE = 500  # reference config.py:32
DEFAULT_SLICE_MS = 24 * 60 * 60 * 1000  # reference config.py:36
DEFAULT_MIN_SLICE_MS = 60 * 60 * 1000  # reference config.py:45
DEFAULT_RESULT_WINDOW = 10_000  # ES-style result-window cap the API enforces

DEFAULT_SCHEMA = (
    "_id string, ts_ms long, user_id long, event_type string, value string"
)


class ResultWindowTooLarge(Exception):
    """The API refused the slice: more rows than its result window allows
    (reference api.py:170-180 maps the HTTP 400 text to this)."""


@dataclass
class TokenCache:
    """Per-tenant auth token cache with TTL — reference api.py:43-68.

    ``clock`` is injectable for tests; ``get`` refreshes on expiry or on
    ``force=True`` (the 401-retry path, reference api.py:137-142)."""

    login: "callable"
    ttl_s: float = TOKEN_TTL_S
    clock: "callable" = _time.monotonic
    _tokens: dict = field(default_factory=dict)

    def get(self, tenant: str, force: bool = False) -> str:
        now = self.clock()
        token, expiry = self._tokens.get(tenant, (None, 0.0))
        if force or token is None or now >= expiry:
            token = self.login(tenant)
            if not token:
                raise RuntimeError(f"[{tenant}] cannot obtain token")
            self._tokens[tenant] = (token, now + self.ttl_s)
        return self._tokens[tenant][0]


class JsonlApiTransport:
    """Deterministic offline endpoint: a JSONL file is the 'server'.

    Implements the three calls any real client needs — ``count`` (the
    totalDocs probe), ``fetch_page`` (descending-sorted page), ``login``.
    Enforces the same result-window behavior as the reference's server:
    a fetch whose page offset would reach past ``result_window`` raises
    ``ResultWindowTooLarge``. Picklable (path only) so it ships to
    executors; each task lazily loads and caches the rows."""

    def __init__(self, path: str, time_field: str = "ts_ms",
                 result_window: int = DEFAULT_RESULT_WINDOW):
        self.path = path
        self.time_field = time_field
        self.result_window = result_window
        self._rows = None

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_rows"] = None  # never ship the data; executors re-read
        return state

    def _load(self):
        if self._rows is None:
            with open(self.path) as f:
                rows = [json.loads(line) for line in f if line.strip()]
            rows.sort(key=lambda r: (-int(r[self.time_field]), str(r.get("_id"))))
            self._rows = rows
        return self._rows

    def login(self, tenant: str) -> str:
        return f"token-{tenant}"

    def _in_range(self, from_ms: int, to_ms: int):
        tf = self.time_field
        return [r for r in self._load() if from_ms <= int(r[tf]) <= to_ms]

    def count(self, from_ms: int, to_ms: int) -> int:
        self._rows = None  # driver-side plan probe: always a fresh view
        return len(self._in_range(from_ms, to_ms))

    def latest_ts(self) -> int:
        """Newest record timestamp — the stream's latestOffset probe (one
        cheap request against a descending-sorted endpoint: page 1, size 1).
        Always re-reads: the probe must observe newly landed data; executor
        page walks keep their per-task snapshot (the resume loop tolerates
        in-flight shift, like a live API)."""
        self._rows = None
        rows = self._load()
        return int(rows[0][self.time_field]) if rows else 0

    def fetch_page(self, token: str, from_ms: int, to_ms: int, page: int,
                   page_size: int):
        """1-based page of the descending-sorted range; returns
        (docs, has_next). Raises ResultWindowTooLarge past the window."""
        if not token:
            raise RuntimeError("unauthenticated")
        if page * page_size > self.result_window:
            raise ResultWindowTooLarge(
                f"page={page} x pageSize={page_size} exceeds "
                f"result window {self.result_window}"
            )
        rows = self._in_range(from_ms, to_ms)
        lo = (page - 1) * page_size
        return rows[lo : lo + page_size], lo + page_size < len(rows)


#: Process-wide token caches for HTTP transports, keyed by
#: (base_url, endpoint, tenant, email) — see HttpApiTransport._token.
_HTTP_TOKEN_CACHES: dict[tuple, TokenCache] = {}


class HttpApiTransport:
    """The REAL HTTP backend — stdlib urllib, no extra dependency —
    speaking the reference client's exact wire surface (reference
    api.py:81-90 ``_login``: POST {base}/auth/login {email,password} ->
    {"token"}; api.py:130-148 ``perform_request``: GET {base}/{endpoint}
    with header ``token`` and params page/pageSize/sort=<field>DESC/
    from/to, one forced re-login + retry on 401; api.py:170-180: HTTP
    400 whose body contains the literal "Result window is too large"
    maps to ``ResultWindowTooLarge``; payload fields docs / totalDocs |
    total / hasNextPage).

    Picklable (plain attrs; the token cache is per-process and rebuilt
    lazily on executors), so the SAME planner/reader run against this
    transport unchanged: ``count`` is a pageSize=1 probe reading
    totalDocs (the planner's bisection input), ``latest_ts`` a
    pageSize=1 descending probe (the stream's latestOffset). Verified
    end to end in-container against
    ``local_api_server.LocalCallioApiServer`` (this sandbox has no
    external network; a deployment only changes ``base_url``)."""

    def __init__(
        self,
        base_url: str,
        endpoint: str = "event",
        email: str | None = None,
        password: str | None = None,
        tenant: str = "default",
        time_field: str = "ts_ms",
        timeout_s: float = 90.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.endpoint = endpoint.strip("/")
        self.email = email
        self.password = password
        self.tenant = tenant
        self.time_field = time_field
        self.timeout_s = timeout_s
        self._cache = None  # per-process TokenCache, never pickled

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_cache"] = None
        return state

    # --------------------------------------------------------------- http
    #: The HTTP backend owns its token lifecycle (per-process cache, 401
    #: force-refresh inside _request) — readers must NOT pre-login on its
    #: behalf: the eager token would be discarded by fetch_page, firing
    #: one useless POST /auth/login per partition against the production
    #: auth endpoint.
    owns_auth = True

    def login(self, tenant: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/auth/login",
            data=json.dumps(
                {"email": self.email, "password": self.password}
            ).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            token = (json.load(resp) or {}).get("token")
        if not token:
            raise RuntimeError(f"[{tenant}] cannot obtain Callio token")
        return token

    def _token(self, force: bool = False) -> str:
        # the cache is PER PROCESS, keyed by endpoint+identity — not per
        # transport instance: Spark deserializes one instance per task,
        # so an instance-level cache would log in once per partition
        # (the reference keeps one client-level cache for the same
        # reason, api.py:43-68). Shared across tasks in a reused worker,
        # a token serves its whole TTL.
        if self._cache is None:
            key = (self.base_url, self.endpoint, self.tenant, self.email)
            self._cache = _HTTP_TOKEN_CACHES.setdefault(
                key, TokenCache(login=self.login)
            )
        return self._cache.get(self.tenant, force=force)

    def _get(self, params: dict, token: str) -> tuple[int, bytes]:
        import urllib.error
        import urllib.parse
        import urllib.request

        url = (
            f"{self.base_url}/{self.endpoint}?"
            f"{urllib.parse.urlencode(params)}"
        )
        req = urllib.request.Request(url, headers={"token": token})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    def _request(self, params: dict) -> dict:
        status, body = self._get(params, self._token())
        if status == 401:
            # token expired server-side before the client TTL: force
            # refresh and retry ONCE (reference api.py:137-148)
            status, body = self._get(params, self._token(force=True))
        if status == 400 and b"Result window is too large" in body:
            raise ResultWindowTooLarge(body.decode("utf-8", "replace")[:200])
        if status != 200:
            raise RuntimeError(
                f"API {status} on {self.endpoint}: "
                f"{body.decode('utf-8', 'replace')[:200]}"
            )
        return json.loads(body)

    def _params(self, page: int, page_size: int,
                from_ms: int | None = None, to_ms: int | None = None) -> dict:
        params: dict = {
            "page": page,
            "pageSize": page_size,
            "sort": f"{self.time_field}DESC",
        }
        if from_ms is not None:
            params["from"] = max(0, int(from_ms))
        if to_ms is not None:
            params["to"] = max(0, int(to_ms))
        return params

    # ---------------------------------------------------------- transport
    def count(self, from_ms: int, to_ms: int) -> int:
        payload = self._request(self._params(1, 1, from_ms, to_ms))
        return int(payload.get("totalDocs") or payload.get("total") or 0)

    def latest_ts(self) -> int:
        payload = self._request(self._params(1, 1))
        docs = payload.get("docs") or []
        return int(docs[0][self.time_field]) if docs else 0

    def fetch_page(self, token, from_ms, to_ms, page, page_size):
        # the token argument keeps the transport contract; the HTTP
        # backend owns its refresh cycle (401 -> force re-login) exactly
        # like the reference client, so a stale caller token never fails
        # a page
        payload = self._request(
            self._params(page, page_size, from_ms, to_ms)
        )
        return payload.get("docs") or [], bool(payload.get("hasNextPage"))


def plan_slices(
    count,  # callable (from_ms, to_ms) -> int
    cutoff_ms: int,
    window_end_ms: int,
    slice_ms: int = DEFAULT_SLICE_MS,
    min_slice_ms: int = DEFAULT_MIN_SLICE_MS,
    result_window: int = DEFAULT_RESULT_WINDOW,
) -> list[tuple[int, int]]:
    """Plan-time slice layout: the reference's backward fixed-width walk
    (api.py:222-231) followed by PROACTIVE bisection of any slice whose
    probed row count exceeds the result window (the reference bisects
    reactively on the 400 error, api.py:294-301 — same floor, same
    halving, but at plan time so the fetch stage is embarrassingly
    parallel). Returns newest-first [start, end] closed ranges."""
    slices: list[tuple[int, int]] = []
    cursor_end = window_end_ms
    while cursor_end > cutoff_ms:
        cursor_start = max(cutoff_ms, cursor_end - slice_ms)
        slices.append((cursor_start, cursor_end))
        cursor_end = cursor_start - 1
    if not slices:
        slices = [(cutoff_ms, window_end_ms)]

    planned: list[tuple[int, int]] = []
    stack = list(reversed(slices))
    while stack:
        start, end = stack.pop()
        if end <= start:
            continue
        span = end - start
        if span > min_slice_ms and count(start, end) > result_window:
            mid = start + span // 2
            stack.append((mid + 1, end))
            stack.append((start, mid))
            continue
        planned.append((start, end))
    return planned


class SlicePartition(InputPartition):
    """One fetch slice: closed time range plus the exclusive lower cutoff
    rows must stay strictly above (the checkpoint boundary for the slice
    that touches it; a no-op for younger slices)."""

    def __init__(self, start_ms: int, end_ms: int, cutoff_ms: int):
        self.start_ms = start_ms
        self.end_ms = end_ms
        self.cutoff_ms = cutoff_ms


def _walk_slice(transport, token, fields, time_field, partition, page_size):
    """Descending page walk over one slice: early stop at the cutoff (S2),
    first-wins keying across pages (reference add_docs), reactive
    resume-from-oldest on a result-window refusal (S4 fallback). Shared by
    the batch and streaming readers — the tick semantics are identical."""
    tf, cutoff = time_field, partition.cutoff_ms
    seen: set = set()
    range_start, range_end = partition.start_ms, partition.end_ms
    while True:  # resume loop (result-window recovery)
        page, stop, refused = 1, False, False
        oldest_ts = None
        while True:  # page walk, descending time
            try:
                docs, has_next = transport.fetch_page(
                    token, range_start, range_end, page, page_size
                )
            except ResultWindowTooLarge:
                refused = True
                break
            for doc in docs:
                ts = int(doc.get(tf) or 0)
                if ts <= cutoff:  # early stop: S2
                    stop = True
                    break
                key = doc.get("_id") or f"{ts}:{doc.get('id')}"
                if key in seen:  # first wins: reference add_docs
                    continue
                seen.add(key)
                oldest_ts = ts if oldest_ts is None else min(oldest_ts, ts)
                yield tuple(doc.get(f) for f in fields)
            if stop or not has_next:
                break
            page += 1
        if refused and oldest_ts is not None and oldest_ts - 1 > range_start:
            range_end = oldest_ts - 1  # resume older remainder
            continue
        return


class PagedApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict, transport):
        self.fields = schema.fieldNames()
        self.time_field = options.get("time_field", "ts_ms")
        self.cutoff_ms = int(options.get("cutoff_ms", 0))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.slice_ms = int(options.get("slice_ms", DEFAULT_SLICE_MS))
        self.min_slice_ms = int(options.get("min_slice_ms", DEFAULT_MIN_SLICE_MS))
        self.result_window = int(
            options.get("result_window", DEFAULT_RESULT_WINDOW)
        )
        self.window_end_ms = int(options["window_end_ms"])  # determinism: explicit
        self.tenant = options.get("tenant", "default")
        self.transport = transport

    def partitions(self):
        ranges = plan_slices(
            self.transport.count,
            self.cutoff_ms,
            self.window_end_ms,
            self.slice_ms,
            self.min_slice_ms,
            self.result_window,
        )
        return [SlicePartition(s, e, self.cutoff_ms) for s, e in ranges]

    def read(self, partition: SlicePartition):
        # transports that own their auth cycle (HTTP: per-process
        # cache + 401 refresh) must not be pre-logged-in per
        # partition — the token would be discarded by fetch_page
        token = (
            "owned"
            if getattr(self.transport, "owns_auth", False)
            else TokenCache(login=self.transport.login).get(self.tenant)
        )
        yield from _walk_slice(
            self.transport, token, self.fields, self.time_field, partition,
            self.page_size,
        )


class PagedApiStreamReader(DataSourceStreamReader):
    """The reference's incremental tick loop (C1/C4/C6: checkpoint cutoff
    -> scan window -> advance checkpoint, reference pipeline.py) as a
    Structured Streaming source. Offsets ARE the checkpoint watermark
    (`{"ts_ms": N}`): each micro-batch plans slices over (start, end] with
    the SAME proactive-bisection planner as the batch reader, fetches
    them in parallel on executors, and Spark's offset log replaces the
    reference's update_log table. A crashed batch replays from the last
    committed offset — exactly the reference's redo-from-checkpoint
    semantics, but exactly-once into transactional sinks."""

    def __init__(self, schema: StructType, options: dict, transport):
        self.fields = schema.fieldNames()
        self.time_field = options.get("time_field", "ts_ms")
        self.start_cutoff_ms = int(options.get("cutoff_ms", 0))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.slice_ms = int(options.get("slice_ms", DEFAULT_SLICE_MS))
        self.min_slice_ms = int(options.get("min_slice_ms", DEFAULT_MIN_SLICE_MS))
        self.result_window = int(
            options.get("result_window", DEFAULT_RESULT_WINDOW)
        )
        self.tenant = options.get("tenant", "default")
        self.transport = transport

    def initialOffset(self) -> dict:
        return {"ts_ms": self.start_cutoff_ms}

    def latestOffset(self) -> dict:
        latest = self.transport.latest_ts()
        return {"ts_ms": max(latest, self.start_cutoff_ms)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["ts_ms"]), int(end["ts_ms"])
        if hi <= lo:
            return []
        ranges = plan_slices(
            self.transport.count, lo, hi,
            self.slice_ms, self.min_slice_ms, self.result_window,
        )
        # each batch consumes (lo, hi]: the cutoff rides on every slice
        return [SlicePartition(s, e, lo) for s, e in ranges]

    def read(self, partition: SlicePartition):
        # transports that own their auth cycle (HTTP: per-process
        # cache + 401 refresh) must not be pre-logged-in per
        # partition — the token would be discarded by fetch_page
        token = (
            "owned"
            if getattr(self.transport, "owns_auth", False)
            else TokenCache(login=self.transport.login).get(self.tenant)
        )
        yield from _walk_slice(
            self.transport, token, self.fields, self.time_field, partition,
            self.page_size,
        )

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the checkpoint store

    def stop(self) -> None:
        pass


class CallioPagedDataSource(DataSource):
    """``spark.read.format("callio_paged_api")`` (batch) or
    ``spark.readStream.format("callio_paged_api")`` (incremental ticks).

    Backends (mutually exclusive options): ``base_url`` selects the real
    HTTP transport (plus ``endpoint``, ``email``, ``password``,
    ``timeout_s``); ``path`` selects the offline JSONL transport. Common
    options: ``window_end_ms`` (batch only, required: scan upper bound —
    the reference uses now(), pinned for determinism), ``cutoff_ms``,
    ``time_field``, ``page_size``, ``slice_ms``, ``min_slice_ms``,
    ``result_window``, ``tenant``."""

    @classmethod
    def name(cls) -> str:
        return "callio_paged_api"

    def schema(self) -> str:
        return self.options.get("api_schema", DEFAULT_SCHEMA)

    def _transport(self):
        if "base_url" in self.options:
            return HttpApiTransport(
                self.options["base_url"],
                endpoint=self.options.get("endpoint", "event"),
                email=self.options.get("email"),
                password=self.options.get("password"),
                tenant=self.options.get("tenant", "default"),
                time_field=self.options.get("time_field", "ts_ms"),
                timeout_s=float(self.options.get("timeout_s", 90.0)),
            )
        return JsonlApiTransport(
            self.options["path"],
            self.options.get("time_field", "ts_ms"),
            int(self.options.get("result_window", DEFAULT_RESULT_WINDOW)),
        )

    def reader(self, schema: StructType) -> PagedApiReader:
        return PagedApiReader(schema, dict(self.options), self._transport())

    def streamReader(self, schema: StructType) -> PagedApiStreamReader:
        return PagedApiStreamReader(schema, dict(self.options), self._transport())
