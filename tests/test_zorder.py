"""Z-order clustered layout: Morton math is right, and the written
files are selective on BOTH clustering dimensions (the property parquet
footer min/max pruning needs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.tables import load_table
from crypto_data_pipeline_spark.sources.zorder import with_zvalue, write_zordered, zvalue


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 256, 37) for y in range(0, 256, 41)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zvalue(F.col("x"), F.col("y"), bits=8)
    )
    for r in df.collect():
        assert r.z == _morton_ref(r.x, r.y, 8), (r.x, r.y)


def test_zvalue_monotone_per_dimension(spark):
    """Property: with one dimension fixed, the Morton value is strictly
    monotone in the other — the ordering guarantee that makes z-range
    files compact hyper-rectangles."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    )
    def prop(x1, x2, y1, y2):
        if x1 < x2:
            assert _morton_ref(x1, y1, 8) < _morton_ref(x2, y1, 8)
        if y1 < y2:
            assert _morton_ref(x1, y1, 8) < _morton_ref(x1, y2, 8)

    prop()


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Each written file must cover a narrow slice of BOTH user_id and
    value — a 10%-of-domain range predicate on either column may
    overlap only a minority of the 16 files. A single-column sort
    layout fails this for the other column (every file spans the full
    domain); z-order passes for both."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "zorder")
    back = write_zordered(events, out, "user_id", "value", n_files=16, bits=16)
    assert back.count() == events.count()

    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
            F.min("value").alias("vlo"), F.max("value").alias("vhi"),
        )
        .collect()
    )
    assert len(per_file) == 16
    stats = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    umin, umax, vmin, vmax = stats
    # a 10%-of-domain range query in the middle of each dimension
    uq = (umin + 0.45 * (umax - umin), umin + 0.55 * (umax - umin))
    vq = (vmin + 0.45 * (vmax - vmin), vmin + 0.55 * (vmax - vmin))
    u_overlap = sum(1 for r in per_file if r.ulo <= uq[1] and r.uhi >= uq[0])
    v_overlap = sum(1 for r in per_file if r.vlo <= vq[1] and r.vhi >= vq[0])
    assert u_overlap <= 8, f"user_id range hits {u_overlap}/16 files"
    assert v_overlap <= 8, f"value range hits {v_overlap}/16 files"


def test_with_zvalue_no_shuffle_before_write(spark, sf_dir):
    """The z-map stage is scan + broadcast-joined 1-row bounds + pure
    expressions: the only Exchange in the plan is the bounds
    aggregation's (1-row), never a repartition of the fact side."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    plan = with_zvalue(events, "user_id", "value")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
