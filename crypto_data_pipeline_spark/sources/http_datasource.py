"""S1/ST4 at cluster scale: the HTTP history API as a Python
DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference fetches driver-side in a thread pool
(crypto_app/cli.py:229-241) and `sources/http_client.py` reproduces
that — the right shape when a public API's rate limiter is the
bottleneck. This module is the OTHER regime: a high-QPS internal
service or sharded mirror where fetch throughput should scale with the
cluster, not the driver. Each coin becomes an `InputPartition`, so the
fetch runs ON THE EXECUTORS — retry/backoff state stays per-task, the
driver never proxies a byte, and `spark.read.format("coin_history_api")`
composes with every downstream operator like any other scan.

The deterministic fake transport (no network in this container) makes
even the distributed path oracle-checkable as a VALUES literal; real
HTTP is one option away (`transport=real`).
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "coin_id string, fetch_date date, price_usd double, market_cap double, volume double"


def fake_transport(url: str, headers: dict[str, str]) -> tuple[int, dict[str, str], str]:
    """Deterministic CoinGecko-shaped payloads keyed on (coin, date) —
    the hermetic stand-in used by tests AND oracles (the price formula
    is replicated in the VALUES oracle of the http_ingest queries)."""
    if url.rstrip("/").endswith("/coins/list"):
        coins = ["bitcoin", "ethereum", "cardano", "solana", "dogecoin"]
        body = [{"id": c, "symbol": c[:3], "name": c.capitalize()} for c in sorted(coins)]
        return 200, {}, json.dumps(body)
    coin = url.split("/coins/")[1].split("/")[0]
    date = url.split("date=")[1]
    price = fake_price(coin, date)
    body = {
        "id": coin,
        "market_data": {
            "current_price": {"usd": price},
            "market_cap": {"usd": price * 1e9},
            "total_volume": {"usd": price * 1e7},
        },
    }
    return 200, {}, json.dumps(body)


def fake_price(coin: str, date_ddmmyyyy: str) -> float:
    seed = (sum(map(ord, coin)) * 31 + sum(map(ord, date_ddmmyyyy))) % 1000
    return round(100.0 + seed, 2)


def down_transport(url: str, headers: dict[str, str]) -> tuple[int, dict[str, str], str]:
    """Always-5xx transport: exercises the retry-exhaustion → null-row
    path of the scan (a partial backfill must not kill the job)."""
    return 503, {}, "service unavailable"


def _iso(date_ddmmyyyy: str) -> dt.date:
    d, m, y = date_ddmmyyyy.split("-")
    return dt.date(int(y), int(m), int(d))


class CoinHistoryDataSource(DataSource):
    """`spark.read.format("coin_history_api")` options:

    - ``coins``: comma-separated coin ids (one input partition each)
    - ``dates``: comma-separated dd-mm-yyyy dates fetched per coin
    - ``transport``: ``fake`` (default, hermetic) or ``real`` (urllib)
    - ``api_key`` / ``max_retries``: forwarded to the client
    - ``concurrent`` (+ ``max_workers``, default 8): also fan out over
      DATES — each coin's date list splits into up to max_workers
      round-robin chunks, one input partition each, mirroring the
      reference bulk-process --concurrent thread pool
      (/root/reference/crypto_app/cli.py:135-170) with Spark tasks as
      the workers. Default remains one partition per coin (a task
      retry refetches only its own slice either way).
    """

    @classmethod
    def name(cls) -> str:
        return "coin_history_api"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "CoinHistoryReader":
        return CoinHistoryReader(self.options)

    def simpleStreamReader(self, schema) -> "CoinHistoryStreamReader":
        return CoinHistoryStreamReader(self.options)


class CoinHistoryReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.coins = [c for c in options.get("coins", "").split(",") if c]
        self.dates = [d for d in options.get("dates", "").split(",") if d]
        self.transport = options.get("transport", "fake")
        self.api_key = options.get("api_key") or None
        self.max_retries = int(options.get("max_retries", "3"))
        self.concurrent = options.get("concurrent", "false").lower() == "true"
        self.max_workers = int(options.get("max_workers", "8"))
        if not self.coins or not self.dates:
            raise ValueError("coin_history_api requires non-empty 'coins' and 'dates' options")

    def partitions(self) -> list[InputPartition]:
        # one partition per coin: fetch parallelism == number of coins,
        # and a task retry refetches only its own coin's dates.
        # concurrent mode additionally splits each coin's dates into up
        # to max_workers round-robin chunks — the reference's
        # bulk-process thread pool, expressed as input partitions.
        if not self.concurrent:
            return [InputPartition((c, tuple(self.dates))) for c in self.coins]
        k = max(1, min(self.max_workers, len(self.dates)))
        chunks = [tuple(self.dates[i::k]) for i in range(k)]
        return [
            InputPartition((c, ch)) for c in self.coins for ch in chunks if ch
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        from crypto_data_pipeline_spark.sources.http_client import HistoryApiClient

        kwargs: dict = {"api_key": self.api_key, "max_retries": self.max_retries}
        if self.transport == "fake":
            kwargs["transport"] = fake_transport
            kwargs["sleep"] = lambda s: None
        elif self.transport == "down":
            kwargs["transport"] = down_transport
            kwargs["sleep"] = lambda s: None
        client = HistoryApiClient(**kwargs)
        coin, dates = partition.value
        for date in dates:
            try:
                payload = client.get_history(coin, date)
            except Exception:
                payload = None  # partial backfill must not kill the scan
            if payload is None:
                yield (coin, _iso(date), None, None, None)
            else:
                md = payload["market_data"]
                yield (
                    coin,
                    _iso(date),
                    md["current_price"]["usd"],
                    md["market_cap"]["usd"],
                    md["total_volume"]["usd"],
                )


class CoinHistoryStreamReader(SimpleDataSourceStreamReader):
    """ST1+ST4 as a true stream: `spark.readStream.format(
    "coin_history_api")` turns the reference's cron-driven daily fetch
    (crypto_app/daily_fetch.py cron at :89) into a Structured
    Streaming source. Each micro-batch advances one date through the
    configured window and fetches every coin for it — the offset IS
    the date index, so the checkpoint gives exactly-once fetch
    semantics across restarts (the crontab's flock + dedup-on-insert,
    for free).

    `SimpleDataSourceStreamReader` reads on the DRIVER — the right
    regime for a rate-limited public API (one polite client, not 1000
    executors hammering the endpoint); the batch `CoinHistoryReader`
    above is the executor-parallel regime for internal mirrors.
    Deterministic replay: `readBetweenOffsets` refetches through the
    same transport, and the fake transport is a pure function of
    (coin, date) — so a replayed batch is bit-identical."""

    def __init__(self, options: dict[str, str]) -> None:
        self.coins = [c for c in options.get("coins", "").split(",") if c]
        self.dates = [d for d in options.get("dates", "").split(",") if d]
        self.transport = options.get("transport", "fake")
        self.api_key = options.get("api_key") or None
        self.max_retries = int(options.get("max_retries", "3"))
        if not self.coins or not self.dates:
            raise ValueError("coin_history_api requires non-empty 'coins' and 'dates' options")

    def initialOffset(self) -> dict:
        return {"date_idx": 0}

    def _client(self):
        from crypto_data_pipeline_spark.sources.http_client import HistoryApiClient

        kwargs: dict = {"api_key": self.api_key, "max_retries": self.max_retries}
        if self.transport == "fake":
            kwargs["transport"] = fake_transport
            kwargs["sleep"] = lambda s: None
        elif self.transport == "down":
            kwargs["transport"] = down_transport
            kwargs["sleep"] = lambda s: None
        return HistoryApiClient(**kwargs)

    def _fetch_date(self, date: str) -> list[tuple]:
        client = self._client()
        rows = []
        for coin in self.coins:
            try:
                payload = client.get_history(coin, date)
            except Exception:
                payload = None  # partial outage -> null row, stream survives
            if payload is None:
                rows.append((coin, _iso(date), None, None, None))
            else:
                md = payload["market_data"]
                rows.append(
                    (
                        coin,
                        _iso(date),
                        md["current_price"]["usd"],
                        md["market_cap"]["usd"],
                        md["total_volume"]["usd"],
                    )
                )
        return rows

    def read(self, start: dict):
        # contract: (row ITERATOR, next offset) — Spark's prefetcher
        # consumes the rows with next(), a plain list breaks it
        i = int(start["date_idx"])
        if i >= len(self.dates):
            return iter(()), start  # caught up: no new date published yet
        return iter(self._fetch_date(self.dates[i])), {"date_idx": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for i in range(int(start["date_idx"]), int(end["date_idx"])):
            rows.extend(self._fetch_date(self.dates[i]))
        return iter(rows)
