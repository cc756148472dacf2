"""ML pipeline queries (M1-M7) — rows-only driver checks by design
(tree-ensemble training is not SQL-expressible); quality is gated by
tests/test_ml.py (accuracy floor, train/test-state reuse, persistence
round-trip).

Task: predict whether an order's *revenue* (sum of
l_extendedprice*(1-l_discount) over its lineitems) is above the global
mean, from order metadata + lineitem rollups — a learnable nonlinear
function of the features (the synthetic o_totalprice is independent
noise, unlearnable by construction). The *shape* mirrors the
reference's movie classifier — categorical indexing, numeric imputation,
assembled/scaled features, seeded RandomForest with the reference's exact
hyperparameters (reference movie_pipeline/classifier_model.py:49-61) —
re-targeted at the driver's testdata.

The fitted model is cached per (session, sf_dir): the three queries
below share one deterministic fit instead of re-training per query.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import pipeline as MLP
from ..sources.readers import load_table
from .registry import query

SPEC = MLP.ClassifierSpec(
    numeric_cols=["n_items", "sum_qty", "avg_discount", "max_extprice"],
    categorical_cols=["o_orderpriority", "o_orderstatus"],
    label_col="label",
)

_SPLIT_SEED = 42
_model_cache: dict[
    tuple[str, str], tuple[PipelineModel, DataFrame, DataFrame, DataFrame]
] = {}


def training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem rollup → features + binary label.

    The label threshold (global mean order revenue) is folded into the
    plan as a scalar-aggregate cross join — no driver round trip, same
    pattern as impute_mean_value.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rollup = li.groupBy("l_orderkey").agg(
        F.count("*").cast("double").alias("n_items"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_discount").alias("avg_discount"),
        F.max("l_extendedprice").alias("max_extprice"),
        F.sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("_revenue"),
    )
    mean_rev = rollup.agg(F.avg("_revenue").alias("_mean_rev"))
    return (
        orders.join(rollup, orders.o_orderkey == rollup.l_orderkey, "inner")
        .crossJoin(F.broadcast(mean_rev))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_orderstatus",
            "n_items",
            "sum_qty",
            "avg_discount",
            "max_extprice",
            (F.col("_revenue") > F.col("_mean_rev")).cast("double").alias("label"),
        )
    )


def _fitted(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _model_cache:
        df = training_frame(spark, sf_dir)
        train_df, test_df = df.randomSplit([0.8, 0.2], seed=_SPLIT_SEED)
        # RF fitting scans the training set once per tree depth level;
        # without a cache every scan re-executes the orders⋈lineitem
        # rollup. Standard MLlib practice: persist the input before fit.
        train_df = train_df.persist()
        model = MLP.train(SPEC, train_df)
        # The hold-out transform is the expensive shared step (the
        # 300-tree forest rides every task as a ~60 MB task binary and
        # the test lineage re-joins orders⋈lineitem): persist the
        # 2-column prediction frame ONCE so the metric/distribution/
        # confusion queries each aggregate cached rows instead of
        # re-running the forest. The repartition(8) bounds how many
        # concurrent tasks deserialize the forest at once — tree
        # ensembles serialize into the task closure, so peak heap is
        # n_concurrent_tasks × deserialized-model-size; 32-way local
        # parallelism on this hold-out OOMs an 8g heap for zero speedup
        # (the transform is model-deserialization-bound, not row-bound).
        # localCheckpoint (eager) rather than persist: it TRUNCATES the
        # lineage, so downstream jobs stop shipping the forest inside
        # their task binaries — with persist every cached-read job still
        # serialized the transform closure (~60 MB, seconds per action).
        preds = (
            model.transform(test_df.repartition(8))
            .select("label", "prediction")
            .localCheckpoint(eager=True)
        )
        _model_cache[key] = (model, train_df, test_df, preds)
    return _model_cache[key]


@query("ml_rf_train_metrics")  # rows-only: training is not SQL-expressible
def ml_rf_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit on the 80% split, evaluate accuracy on the 20% hold-out
    (M5+M7). One row: accuracy, split sizes, feature count."""
    model, train_df, test_df, preds = _fitted(spark, sf_dir)
    acc = (
        preds.agg(
            F.avg((F.col("label") == F.col("prediction")).cast("double"))
        ).first()[0]
    )
    return spark.createDataFrame(
        [
            (
                round(acc, 4),
                train_df.count(),
                test_df.count(),
                len(SPEC.feature_cols),
            )
        ],
        "accuracy double, n_train long, n_test long, n_features long",
    )


@query("ml_rf_feature_importances")  # rows-only
def ml_rf_feature_importances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RF featureImportances zipped with feature names, descending (M6)."""
    model, _, _, _ = _fitted(spark, sf_dir)
    pairs = MLP.feature_importances(model, SPEC)
    return spark.createDataFrame(
        [(f, round(imp, 4)) for f, imp in pairs],
        "feature string, importance double",
    )


@query("ml_rf_prediction_distribution")  # rows-only
def ml_rf_prediction_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction label distribution on the hold-out (A6 analog — the
    reference's commented-out True/False tally, data_utils.py:437-449)."""
    _, _, _, preds = _fitted(spark, sf_dir)
    return (
        preds.groupBy("prediction")
        .agg(F.count("*").alias("n"))
        .orderBy("prediction")
    )


@query(
    "ml_scaler_fit_stats",
    oracle="""
    WITH r AS (
      SELECT l_orderkey,
        count(*)::DOUBLE AS n_items,
        sum(l_quantity) AS sum_qty,
        avg(l_discount) AS avg_discount,
        max(l_extendedprice) AS max_extprice
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (SELECT r.* FROM orders o JOIN r ON o.o_orderkey = r.l_orderkey)
    SELECT feature, round(mean, 4) AS mean, round(std, 4) AS std FROM (
      SELECT 'n_items' AS feature, avg(n_items) AS mean,
             stddev_samp(n_items) AS std FROM j
      UNION ALL SELECT 'sum_qty', avg(sum_qty), stddev_samp(sum_qty) FROM j
      UNION ALL SELECT 'avg_discount', avg(avg_discount),
             stddev_samp(avg_discount) FROM j
      UNION ALL SELECT 'max_extprice', avg(max_extprice),
             stddev_samp(max_extprice) FROM j
    ) ORDER BY feature
    """,
)
def ml_scaler_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the StandardScaler's fitted statistics (per-feature mean and
    sample std), exposed from a real ``StandardScalerModel`` fit over the
    training features — oracle-checked against SQL avg/stddev_samp. This
    pins the scaler's math (Bessel-corrected std, no mean shift applied
    at transform when withMean=False) to the SQL definition."""
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    df = training_frame(spark, sf_dir)
    va = VectorAssembler(inputCols=SPEC.numeric_cols, outputCol="_f")
    model = StandardScaler(
        inputCol="_f", outputCol="_sf", withMean=True, withStd=True
    ).fit(va.transform(df))
    means = model.mean.toArray()
    stds = model.std.toArray()
    rows = sorted(
        (c, round(float(m), 4), round(float(s), 4))
        for c, m, s in zip(SPEC.numeric_cols, means, stds)
    )
    return spark.createDataFrame(rows, "feature string, mean double, std double")


@query(
    "ml_rf_quality_gate",
    oracle="""
    SELECT TRUE AS acc_ge_floor, TRUE AS both_classes_predicted,
           TRUE AS confusion_sums_to_holdout, TRUE AS importances_sum_to_one,
           CAST(6 AS BIGINT) AS n_features
    """,
)
def ml_rf_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated ML quality (same pattern as knn_ann_recall_gate):
    the trained-model outputs themselves are engine-specific (rows-only
    queries above/below), but their *invariants* are asserted in-query
    and hash-compared against constant-TRUE oracle columns, so a model
    regression — accuracy under the 0.8 pytest floor, a degenerate
    single-class predictor, a confusion matrix that lost rows, or
    importances that stopped normalizing — fails the driver's hash gate,
    not just the test suite. All four checks aggregate the one cached
    hold-out prediction frame; no extra model transforms."""
    model, _, _, preds = _fitted(spark, sf_dir)
    row = preds.agg(
        F.avg((F.col("label") == F.col("prediction")).cast("double")).alias("_acc"),
        F.count_distinct("prediction").alias("_npred"),
        F.count(F.lit(1)).alias("_n"),
    ).first()
    imps = [imp for _, imp in MLP.feature_importances(model, SPEC)]
    confusion_total = (
        preds.groupBy("label", "prediction").count().agg(F.sum("count")).first()[0]
    )
    return spark.createDataFrame(
        [
            (
                row["_acc"] >= 0.8,
                row["_npred"] == 2,
                confusion_total == row["_n"],
                abs(sum(imps) - 1.0) < 1e-6,
                len(SPEC.feature_cols),
            )
        ],
        "acc_ge_floor boolean, both_classes_predicted boolean, "
        "confusion_sums_to_holdout boolean, importances_sum_to_one boolean, "
        "n_features long",
    )


@query("ml_rf_confusion_matrix")  # rows-only: depends on the trained model
def ml_rf_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold-out confusion matrix (label × prediction counts) — the
    evaluator surface beyond a single accuracy scalar (M7/A6). Uses the
    per-session fitted model cache; one groupBy over the persisted
    hold-out predictions."""
    _, _, _, preds = _fitted(spark, sf_dir)
    return (
        preds.groupBy("label", "prediction")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "prediction")
    )


@query(
    "ml_lr_embedding_gate",
    oracle="""
    SELECT TRUE AS auc_ge_floor, TRUE AS acc_beats_majority,
           TRUE AS probs_are_probabilities,
           CAST(64 AS BIGINT) AS n_features
    """,
)
def ml_lr_embedding_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second model family under the driver gate: LOGISTIC REGRESSION
    over the embeddings table (64-dim float vectors, integer labels) —
    the GLM path of MLlib alongside the reference's tree ensemble
    (fast distributed GLM fitting is the standard MLlib workhorse;
    cf. 'MLlib*: Fast Training of GLMs Using Spark MLlib', ICDE'19).
    The table's label column is synthetic-random (nearest-neighbor
    same-label rate ≈ chance — measured 10.8% over 10 classes), so
    predictive floors against it would gate nothing; the target is
    instead DERIVED from the features (sign of the first embedding
    component) — deterministic, and genuinely learnable by a linear
    model. Deterministic hash split (same md5-bucket rule as
    sample_by_hash, 80/20), fit on train, invariants asserted in-query
    against constant-TRUE oracle columns: hold-out AUC ≥ 0.9 on the
    learnable target, accuracy beats the majority baseline, and
    predicted probabilities are valid [0, 1]. An LBFGS/feature-pipeline
    regression fails the driver's hash gate, not just pytest."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    data = emb.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
        (F.element_at("embedding", 1) > 0).cast("double").alias("label"),
        "vec_id",
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(10),
    )
    train = data.where(bucket < 8)
    test = data.where(bucket >= 8).persist()

    lr = LogisticRegression(maxIter=50, regParam=0.01, standardization=True)
    model = lr.fit(train)
    preds = model.transform(test).persist()

    auc = BinaryClassificationEvaluator(
        metricName="areaUnderROC"
    ).evaluate(preds)
    row = preds.agg(
        F.avg((F.col("label") == F.col("prediction")).cast("double")).alias(
            "_acc"
        ),
        F.greatest(F.avg("label"), 1 - F.avg("label")).alias("_maj"),
        F.count(
            F.when(
                (F.element_at(vector_to_array("probability"), 1) < 0)
                | (F.element_at(vector_to_array("probability"), 1) > 1),
                1,
            )
        ).alias("_bad_probs"),
    ).first()
    return spark.createDataFrame(
        [
            (
                auc >= 0.9,
                row["_acc"] >= row["_maj"] - 1e-9,
                row["_bad_probs"] == 0,
                model.numFeatures,
            )
        ],
        "auc_ge_floor boolean, acc_beats_majority boolean, "
        "probs_are_probabilities boolean, n_features long",
    )
