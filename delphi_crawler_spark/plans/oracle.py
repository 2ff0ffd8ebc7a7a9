"""Single-threaded pure-Python oracle of the scheduler semantics.

Independent implementation of F1 + F2 + P1 + P3 + P6 + F6 + link discovery
(dict-and-loop, no Spark, no windows) against which the engine's emitted
fetch ordering and final URL-seen set are asserted byte-equal — the
analogue of the reference's golden-value tests (SURVEY.md §5; the
scheduler-equivalence criterion in BASELINE.json).

Shares ONLY the scalar canonicalization function with the engine (that
function is itself pinned by golden vectors); every set/ordering/throttle
decision here is re-derived independently.
"""

from __future__ import annotations

import math
import zlib
from dataclasses import dataclass, field

from delphi_crawler_spark.functions.canonicalize import canonicalize_url_py

DEFAULT_RATE = 5.0
DEFAULT_BURST = 5


def _host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    host = rest.split("/", 1)[0]
    return host.rsplit(":", 1)[0] if ":" in host else host


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return "/" + rest.split("/", 1)[1] if "/" in rest else "/"


def _robots_allowed(rules_by_host: dict, host: str, path: str) -> bool:
    rules = rules_by_host.get(host)
    if not rules:
        return True
    best = None  # (prefix_len, is_allow)
    for prefix, is_allow in rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if best is None or ln > best[0] or (ln == best[0] and is_allow):
                best = (ln, is_allow)
    return True if best is None else best[1]


def compile_robots(rules_rows: list[dict]) -> dict:
    by_host: dict[str, list[tuple[str, bool]]] = {}
    for r in rules_rows:
        by_host.setdefault(r["host"], []).append(
            (r["path_prefix"], r["rule"] == "allow")
        )
    return by_host


def doc_key_for_url(url: str, n_docs: int) -> str:
    """Deterministic URL -> synthetic document mapping (the sandbox 'fetch').
    crc32 is computable identically in Spark (F.crc32) and Python (zlib)."""
    return f"doc-{zlib.crc32(url.encode('utf-8')) % n_docs:08d}"


@dataclass
class OracleResult:
    schedule: list[tuple]  # (round, emit_ms, host, priority, seq, url)
    seen: set[str] = field(default_factory=set)
    frontier_pending: list[tuple] = field(default_factory=list)


def run_oracle(
    seed_rows: list[dict],
    politeness: dict[str, tuple[float, int]],
    robots_rows: list[dict],
    docs_links: dict[str, list[str]] | None = None,
    n_rounds: int = 1,
    round_ms: int = 10_000,
    limit: int = 0,
    n_docs: int | None = None,
) -> OracleResult:
    """Replays the reference pipeline order (MavenDiscoveryProcess.scala:
    64-103: dedup -> exists-filter -> throttle -> limit) round by round.

    ``seed_rows``: dicts with url (raw), priority, discovery_ts, seq.
    ``docs_links``: doc_id -> [raw link urls in span order] (the fetch
    corpus); None disables discovery.
    """
    robots = compile_robots(robots_rows)
    seen: set[str] = set()
    schedule: list[tuple] = []

    # F1 first-occurrence dedup over canonical URL, in seq (arrival) order
    pending: list[dict] = []
    in_frontier: set[str] = set()

    def admit_candidates(rows: list[dict], assign_seq: bool = False) -> None:
        """rows in arrival order; canonicalize -> robots -> first-occurrence
        dedup -> frontier-membership filter. With ``assign_seq`` the global
        monotonic seq is assigned to SURVIVORS in discovery order (matching
        the engine's post-filter row_number)."""
        nonlocal next_seq
        for r in rows:
            url = canonicalize_url_py(r["url"])
            if url is None:
                continue
            host = _host_of(url)
            if not _robots_allowed(robots, host, _path_of(url)):
                continue
            if url in in_frontier:
                continue  # F1/F2: already pending or already crawled
            in_frontier.add(url)
            row = {**r, "url": url, "host": host}
            if assign_seq:
                row["seq"] = next_seq
                next_seq += 1
            pending.append(row)

    next_seq = 0
    admit_candidates(sorted(seed_rows, key=lambda r: r["seq"]))
    next_seq = (max((r["seq"] for r in pending), default=-1)) + 1

    emitted_total = 0
    for rnd in range(n_rounds):
        # P6/P3 scheduling order per host; P1 token bucket
        by_host: dict[str, list[dict]] = {}
        for r in pending:
            by_host.setdefault(r["host"], []).append(r)
        admitted: list[tuple] = []
        deferred: list[dict] = []
        for host, rows in by_host.items():
            rate, burst = politeness.get(host, (DEFAULT_RATE, DEFAULT_BURST))
            rows.sort(key=lambda r: (-r["priority"], r["discovery_ts"], r["seq"]))
            for k, r in enumerate(rows, start=1):
                emit_ms = 0 if k <= burst else math.ceil((k - burst) * 1000 / rate)
                if emit_ms < round_ms:
                    admitted.append((emit_ms, host, r["priority"], r["discovery_ts"], r["seq"], r["url"]))
                else:
                    deferred.append(r)
        # P3 global emission order (+ P2 limit)
        admitted.sort(key=lambda t: (t[0], -t[2], t[3], t[4]))
        if limit and limit > 0:
            overflow = [t for t in admitted[max(0, limit - emitted_total):]]
            admitted = admitted[: max(0, limit - emitted_total)]
            deferred.extend(
                {"url": t[5], "host": t[1], "priority": t[2], "discovery_ts": t[3], "seq": t[4]}
                for t in overflow
            )
        for emit_ms, host, prio, ts, seq, url in admitted:
            schedule.append((rnd, emit_ms, host, prio, seq, url))
            seen.add(url)
        emitted_total += len(admitted)
        pending = deferred

        # fetch + link discovery
        if docs_links is not None and admitted:
            nd = n_docs if n_docs is not None else len(docs_links)
            new_rows: list[dict] = []
            for emit_ms, host, prio, ts, seq, url in admitted:
                doc_id = doc_key_for_url(url, nd)
                for pos, raw in enumerate(docs_links.get(doc_id, [])):
                    new_rows.append(
                        {
                            "url": raw,
                            "priority": 0,
                            "discovery_ts": ts,
                            "_order": (seq, pos),
                        }
                    )
            new_rows.sort(key=lambda r: r["_order"])
            for r in new_rows:
                r.pop("_order")
            admit_candidates(new_rows, assign_seq=True)

    return OracleResult(
        schedule=schedule,
        seen=seen,
        frontier_pending=sorted(
            (r["url"], r["priority"], r["seq"]) for r in pending
        ),
    )
