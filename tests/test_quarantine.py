"""Corrupt-record quarantine: the permissive parse must route every
malformed payload (and only those) to the dead-letter side with full
provenance, while clean rows keep their parsed struct — and the
dead-letter parquet must accumulate across ingest runs."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources import quarantine


ROWS = [
    (1, '{"k": 1.5}'),        # clean
    (2, '{"k"'),              # truncated -> quarantine
    (3, "not json at all"),   # garbage -> quarantine
    (4, '{"k": null}'),       # clean: null value is not corruption
    (5, None),                # null payload: no payload, not corrupt
    (6, '{"other": 2}'),      # clean: missing key parses, k is null
]


def _frame(spark):
    return spark.createDataFrame(ROWS, "id long, payload string")


def test_split_routes_only_malformed(spark):
    clean, bad = quarantine.split_quarantine(_frame(spark), "payload", "k double")
    assert sorted(r.id for r in bad.collect()) == [2, 3]
    got = {r.id: (r.parsed.k if r.parsed is not None else None) for r in clean.collect()}
    # id 5's payload is NULL -> from_json yields a NULL struct (no
    # payload is not corruption); missing/null keys parse to null k
    assert got == {1: 1.5, 4: None, 5: None, 6: None}
    # quarantined rows keep ALL original columns for replay
    assert bad.columns == ["id", "payload"]
    # clean side's struct no longer carries the corrupt slot
    assert quarantine.CORRUPT_COL not in clean.schema["parsed"].dataType.fieldNames()


def test_dead_letter_appends_across_runs(spark):
    _, bad = quarantine.split_quarantine(_frame(spark), "payload", "k double")
    path = tempfile.mkdtemp(prefix="dead_letter_")
    quarantine.write_quarantine(bad, path)
    quarantine.write_quarantine(bad, path, reason="second_run")
    back = spark.read.parquet(path)
    assert back.count() == 4  # 2 corrupt rows x 2 runs
    reasons = {r._quarantine_reason for r in back.collect()}
    assert reasons == {"json_parse_error", "second_run"}
    # raw payloads survive verbatim for replay after a parser fix
    assert {r.payload for r in back.collect()} == {'{"k"', "not json at all"}


def test_purge_drops_only_expired_partitions(spark):
    _, bad = quarantine.split_quarantine(_frame(spark), "payload", "k double")
    path = tempfile.mkdtemp(prefix="dead_letter_purge_")
    quarantine.write_quarantine(bad, path, quarantine_date="2026-08-01")
    quarantine.write_quarantine(bad, path, quarantine_date="2026-08-10")
    quarantine.write_quarantine(bad, path, quarantine_date="2026-08-14")
    dropped = quarantine.purge_quarantine(spark, path, keep_after="2026-08-10")
    assert dropped == ["2026-08-01"]
    back = spark.read.parquet(path)
    assert back.count() == 4  # 2 corrupt rows x 2 surviving partitions
    kept = {str(r._quarantine_date) for r in back.select("_quarantine_date").collect()}
    assert kept == {"2026-08-10", "2026-08-14"}
    # purge of a nonexistent path is a no-op, not an error
    assert quarantine.purge_quarantine(spark, path + "_missing", "2026-01-01") == []


def test_streaming_split_matches_batch(spark):
    """The streaming dead-letter path must classify EXACTLY like the
    batch operator: run the availableNow stream over a bronze dir,
    then compare both sinks against split_quarantine on the same
    frame. Restarting with the same checkpoint must be a no-op
    (exactly-once: dead-letter never double-counts)."""
    from crypto_data_pipeline_spark.streaming.ingest import stream_with_quarantine

    df = _frame(spark)
    bronze = tempfile.mkdtemp(prefix="bronze_q_")
    clean_path = tempfile.mkdtemp(prefix="clean_q_") + "/out"
    dead_path = tempfile.mkdtemp(prefix="dead_q_") + "/out"
    ckpt = tempfile.mkdtemp(prefix="ckpt_q_") + "/cp"
    df.write.mode("overwrite").parquet(bronze)

    q = stream_with_quarantine(
        spark, bronze, "id long, payload string", "payload", "k double",
        clean_path, dead_path, ckpt,
    )
    q.awaitTermination(120)

    clean_b, bad_b = quarantine.split_quarantine(df, "payload", "k double")
    got_clean = {r.id for r in spark.read.parquet(clean_path).collect()}
    got_bad = {r.id for r in spark.read.parquet(dead_path).collect()}
    assert got_clean == {r.id for r in clean_b.collect()}
    assert got_bad == {r.id for r in bad_b.collect()}

    # replay with the same checkpoint: no new rows in either sink
    q2 = stream_with_quarantine(
        spark, bronze, "id long, payload string", "payload", "k double",
        clean_path, dead_path, ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(clean_path).count() == len(got_clean)
    assert spark.read.parquet(dead_path).count() == len(got_bad)


def test_cdc_tie_breaks_toward_change(spark):
    """A change with the SAME order_by value as the base row must win
    (replayed feeds must not flap), and a delete tombstone winning a
    key removes it entirely."""
    from crypto_data_pipeline_spark.sources.cdc import apply_changes

    base = spark.createDataFrame([(1, 10.0, 5), (2, 20.0, 5), (3, 30.0, 5)],
                                 "k long, v double, seq long")
    changes = spark.createDataFrame(
        [(1, 11.0, 5, "U"),   # tie on seq -> change must win
         (2, 0.0, 5, "D"),    # tie + tombstone -> key disappears
         (3, 33.0, 4, "U"),   # OLDER than base -> base wins
         (4, 44.0, 1, "U")],  # brand-new key -> insert
        "k long, v double, seq long, op string")
    out = {r.k: r.v for r in apply_changes(base, changes, ["k"], ["seq"]).collect()}
    assert out == {1: 11.0, 3: 30.0, 4: 44.0}


def test_quarantine_rate_is_observable(spark):
    """The ingest health metric a 100 TB feed alarms on: quarantine
    rate per batch, computable in the same single pass."""
    df = _frame(spark)
    parsed = df.withColumn(
        "p", quarantine.parse_json_permissive("payload", "k double")
    )
    rate = parsed.agg(
        F.round(
            F.sum(F.when(F.col(f"p.{quarantine.CORRUPT_COL}").isNotNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("rate")
    ).collect()[0].rate
    assert rate == round(2 / 6, 6)
