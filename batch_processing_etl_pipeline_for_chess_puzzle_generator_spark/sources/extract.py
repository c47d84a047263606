"""Cursor-driven ND-JSON extraction — the reference's extract job,
generalized (reference: etl/extract.py:104-124).

The reference hard-wires one HTTP API (requests + env vars) and advances
its timestamp cursor as a side effect of the fetch. Here the fetcher is
INJECTED (any callable ``fetch(since, until) -> iterable[dict]``) so the
same orchestration covers REST pagination, DB snapshots, or a test fake
— and the cursor only advances after the batch is durably on disk
(the reference saves it before writing: a crash between the two silently
drops a window; see fetch_lichess_data's save at extract.py:72-73).

Extraction is driver-side by nature (one cursor = one logical stream);
the DATA volume lands in ND-JSON files that the distributed reader
(sources/ndjson.py) and the Structured Streaming file source consume.
Scale-out happens by running many extractors with independent cursors
(per user / per shard), not by parallelizing one cursor.
"""

from __future__ import annotations

import json
import logging
from collections.abc import Callable, Iterable
from pathlib import Path

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.incremental import Cursor, _atomic_write

log = logging.getLogger(__name__)

Fetcher = Callable[[str | None, str], Iterable[dict]]


def write_ndjson(rows: Iterable[dict], output_path: str | Path) -> int:
    """Write rows as ND-JSON (one compact JSON object per line),
    atomically — a partially-written batch file is never visible to the
    ledger/streaming source. Returns the row count."""
    path = Path(output_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    lines = [json.dumps(r, ensure_ascii=False) for r in rows]
    _atomic_write(path, "\n".join(lines) + ("\n" if lines else ""))
    return len(lines)


def extract_batch(fetch: Fetcher,
                  cursor: Cursor,
                  out_dir: str | Path,
                  name: str,
                  until: str) -> Path | None:
    """One incremental extraction step: fetch (cursor, until], write the
    batch file, then — only after a durable write — advance the cursor.
    Returns the written path, or None when the window was empty (the
    cursor still advances so quiet periods aren't re-polled)."""
    since = cursor.get()
    rows = list(fetch(since, until))
    if not rows:
        log.info("no new rows for %s since %s", name, since)
        cursor.set(until)
        return None
    out = Path(out_dir) / f"{name}_{until}.ndjson"
    n = write_ndjson(rows, out)
    cursor.set(until)
    log.info("wrote %d rows to %s", n, out)
    return out


def http_ndjson_fetcher(url: str,
                        params: dict | None = None,
                        headers: dict | None = None,
                        timeout: float = 30.0,
                        since_param: str = "since",
                        until_param: str = "until",
                        transport: Callable[..., str] | None = None
                        ) -> Fetcher:
    """Build a :data:`Fetcher` over an ND-JSON HTTP endpoint — the
    reference's requests-based extraction (etl/extract.py:41-88) as an
    adapter for :func:`extract_batch`, which fixes the reference's
    save-cursor-before-durable-write drop window by construction (the
    cursor here advances only after the batch file lands).

    ``transport(url, params, headers, timeout) -> str`` is injectable
    for tests and for non-requests stacks; the default uses
    ``requests`` with raise-for-status. The (since, until] window is
    passed through ``since_param``/``until_param`` (a None since is
    omitted — full-history first pull, like the reference's absent
    cursor file)."""
    def default_transport(u, p, h, t) -> str:
        import requests

        resp = requests.get(u, params=p, headers=h, timeout=t)
        resp.raise_for_status()
        return resp.text

    send = transport or default_transport

    def fetch(since: str | None, until: str) -> Iterable[dict]:
        p = dict(params or {})
        if since is not None:
            p[since_param] = since
        p[until_param] = until
        h = {"Accept": "application/x-ndjson", **(headers or {})}
        body = send(url, p, h, timeout)
        return [json.loads(line) for line in body.splitlines() if line.strip()]

    return fetch
