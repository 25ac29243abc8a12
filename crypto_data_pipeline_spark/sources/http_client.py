"""S1: rate-limited HTTP API source (driver-side).

Re-expression of the reference's CoinGecko client
(crypto_app/coingecko_client.py:36-92): GET /coins/{id}/history with
retry ×3 and HTTP-429 Retry-After backoff.

Spark design note (SURVEY §2.1 S1): an HTTP API at ~0.5s/request is
driver-side work — a custom Spark data source would add ceremony, not
throughput, because the rate limiter (not the cluster) is the
bottleneck. Fetching happens in a bounded thread pool (ST4,
crypto_app/cli.py:229-241), results land in ``spark.createDataFrame``
and from there the bronze parquet/JSON sink. The transport is
injectable so tests run hermetically (no network in this environment).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

# transport: (url, headers) -> (status_code, headers, body_text)
Transport = Callable[[str, dict[str, str]], tuple[int, dict[str, str], str]]


def _default_transport(url: str, headers: dict[str, str]) -> tuple[int, dict[str, str], str]:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, dict(resp.headers), resp.read().decode("utf-8")
    except urllib.error.HTTPError as err:
        return err.code, dict(err.headers), err.read().decode("utf-8", "replace")


@dataclass
class HistoryApiClient:
    """Minimal daily-history API client with retry/backoff semantics
    matching coingecko_client.py:55-92: up to ``max_retries`` attempts,
    429 honors Retry-After (default ``default_backoff`` seconds),
    5xx retries after a fixed pause, other errors raise."""

    base_url: str = "https://api.coingecko.com/api/v3"
    api_key: str | None = None
    max_retries: int = 3
    default_backoff: float = 60.0
    transport: Transport = field(default=_default_transport)
    sleep: Callable[[float], None] = field(default=time.sleep)

    def headers(self) -> dict[str, str]:
        h = {"Accept": "application/json"}
        if self.api_key:
            h["x-cg-demo-api-key"] = self.api_key
        return h

    def get_history(self, coin_id: str, date_ddmmyyyy: str) -> dict:
        """GET coins/{id}/history?date=dd-mm-yyyy → parsed JSON dict."""
        url = f"{self.base_url}/coins/{coin_id}/history?date={date_ddmmyyyy}"
        last_err: Exception | None = None
        for _ in range(self.max_retries):
            status, hdrs, body = self.transport(url, self.headers())
            if status == 200:
                return json.loads(body)
            if status == 429:
                retry_after = float(hdrs.get("Retry-After", self.default_backoff))
                self.sleep(retry_after)
                last_err = RuntimeError(f"rate limited fetching {coin_id} {date_ddmmyyyy}")
                continue
            if status >= 500:
                self.sleep(1.0)
                last_err = RuntimeError(f"server error {status} for {coin_id} {date_ddmmyyyy}")
                continue
            raise RuntimeError(f"HTTP {status} fetching {url}: {body[:200]}")
        raise RuntimeError(f"retries exhausted for {coin_id} {date_ddmmyyyy}") from last_err

    def get_coin_list(self) -> list[dict]:
        """GET coins/list → the catalog of (id, symbol, name) dicts,
        mirroring coingecko_client.py:94-130: up to ``max_retries``
        attempts with a fixed 2s pause between failures (the reference
        uses retry_delay=2 here, unlike the history endpoint)."""
        url = f"{self.base_url}/coins/list"
        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            status, hdrs, body = self.transport(url, self.headers())
            if status == 200:
                return json.loads(body)
            last_err = RuntimeError(f"HTTP {status} fetching {url}: {body[:200]}")
            if attempt < self.max_retries - 1:
                self.sleep(float(hdrs.get("Retry-After", 2.0)) if status == 429 else 2.0)
        raise RuntimeError("retries exhausted for coins/list") from last_err

    def fetch_many(
        self, requests: list[tuple[str, str]], max_workers: int = 4
    ) -> list[tuple[str, str, dict | None]]:
        """ST4: bounded concurrent fan-out over (coin_id, date) pairs,
        mirroring ThreadPoolExecutor.map in cli.py:229-241. Failures
        are returned as None payloads, not raised — a partial backfill
        must not kill the batch."""

        def one(req: tuple[str, str]) -> tuple[str, str, dict | None]:
            coin, date = req
            try:
                return coin, date, self.get_history(coin, date)
            except Exception:
                return coin, date, None

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return list(pool.map(one, requests))
