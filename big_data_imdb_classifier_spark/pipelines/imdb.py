"""IMDB end-to-end pipeline: the reference's full runner workflow
(reference movie_pipeline/runner.py:43-153 + classifier_pipeline.py:415-478)
re-expressed Spark-first.

    sources → preprocess → metadata features → cached LLM genre →
    ML pipeline (index/assemble/scale/RF) → True/False TXT sink

Same capabilities, different execution shapes:

* train shards: ONE multi-file scan with declared schema (S2) instead of
  a driver glob + union loop (reference data_utils.py:121-157);
* directing.json column-dict: distributed map-explode pivot (S4) instead
  of driver-side ``json.load`` (data_utils.py:66-100);
* title normalization: Arrow pandas_udf NFKD fold (F1) instead of a
  ``toPandas`` round-trip (data_utils.py:204-215);
* top writer/director: one-shuffle count window + rank window instead of
  groupBy+join-back (data_utils.py:301-344);
* genre enrichment: cache left-join with 'unknown' fallback — the
  cache-first contract of data_utils.py:346-417; a cache miss would go
  through operators/enrichment.enrich_with_cache's mapInPandas path
  (the committed caches cover every id, so inference never fires here);
* all fitted state (imputer means, indexers, scaler stats, RF) lives in
  ONE pyspark.ml Pipeline fit on train and replayed on test — the
  reference refits its scaler per dataset (classifier_pipeline.py:405-407)
  and hand-carries indexer models in a dict (382-396); fitting once is
  both the bug-fix and the scale shape (no second stats pass over test).

The extra TMDB CSV (budget/revenue/popularity) the reference CLI requires
is not part of the committed dataset; it is optional here — when absent,
those features are simply not in the feature vector.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.nfkd import nfkd_fold_col
from ..ml import pipeline as MLP
from ..operators.relational import (
    impute_mean,
    repair_year_bounds,
    top_k_per_group,
)
from ..sources.readers import load_csv, load_csv_glob, load_column_dict_json, load_json
from ..sources.schemas import (
    IMDB_GENRE_CACHE_SCHEMA,
    IMDB_WRITING_SCHEMA,
    imdb_train_schema,
)
from ..sources.sinks import save_predictions_txt

NUMERIC_COLS = ["runtimeMinutes", "numVotes"]
CATEGORICAL_COLS = ["writer", "director", "genre", "decade"]

SPEC = MLP.ClassifierSpec(
    numeric_cols=NUMERIC_COLS,
    categorical_cols=CATEGORICAL_COLS,
    label_col="label",
)


@dataclass
class IMDBData:
    train: DataFrame
    test: DataFrame
    writing: DataFrame
    directing: DataFrame
    train_genres: DataFrame
    test_genres: DataFrame


def load_imdb(
    spark: SparkSession, data_dir: str, test_name: str = "validation",
    llm_name: str = "gemma3_4b",
) -> IMDBData:
    """All reference sources, schema-declared, one scan each."""
    return IMDBData(
        train=load_csv_glob(
            spark, os.path.join(data_dir, "train-*.csv"), imdb_train_schema(True)
        ),
        test=load_csv(
            spark,
            os.path.join(data_dir, f"{test_name}_hidden.csv"),
            imdb_train_schema(False),
        ),
        writing=load_json(
            spark,
            os.path.join(data_dir, "writing.json"),
            IMDB_WRITING_SCHEMA,
            multiline=True,  # the file is one top-level JSON array
        ),
        directing=load_column_dict_json(
            spark,
            os.path.join(data_dir, "directing.json"),
            columns=["movie", "director"],
        ),
        train_genres=load_csv(
            spark,
            os.path.join(data_dir, f"train_{llm_name}_cache.csv"),
            IMDB_GENRE_CACHE_SCHEMA,
        ),
        test_genres=load_csv(
            spark,
            os.path.join(data_dir, f"{test_name}_{llm_name}_cache.csv"),
            IMDB_GENRE_CACHE_SCHEMA,
        ),
    )


def preprocess(
    df: DataFrame, train_df: DataFrame | None = None
) -> DataFrame:
    """Numeric repair + title normalization (reference
    classifier_pipeline.py:163-209).

    Mean imputation uses TRAIN statistics (``train_df``; defaults to
    ``df`` when it IS train) — the mean_dict train→test reuse contract.
    """
    for c in ["startYear", "endYear"] + NUMERIC_COLS:
        df = df.withColumn(c, F.col(c).cast("double"))
    stats = train_df
    if stats is not None:
        for c in NUMERIC_COLS:
            stats = stats.withColumn(c, F.col(c).cast("double"))
    df = impute_mean(df, NUMERIC_COLS, stats_df=stats)
    df = repair_year_bounds(df, "startYear", "endYear", default_year=2000)
    # NFKD-fold both titles, then cross-coalesce missing ones (F1+F2,
    # reference data_utils.py:187-215 — minus its toPandas round trip).
    pt = nfkd_fold_col("primaryTitle")
    ot = nfkd_fold_col("originalTitle")
    return (
        df.withColumn("_pt", pt)
        .withColumn("_ot", ot)
        .withColumn("primaryTitle", F.coalesce("_pt", "_ot"))
        .withColumn("originalTitle", F.coalesce("_ot", "_pt"))
        .drop("_pt", "_ot")
    )


def top_entity_per_movie(df: DataFrame, entity_col: str) -> DataFrame:
    """movie → its most-frequent writer/director (reference
    data_utils.py:301-344): global entity counts via ONE window (no
    join-back), then rank-1 per movie with a deterministic tiebreak the
    reference lacks."""
    from pyspark.sql import Window

    counted = df.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(entity_col))
    )
    return top_k_per_group(
        counted,
        group_cols=["movie"],
        order_by=[F.desc("_n"), F.asc(entity_col)],
        k=1,
    ).select("movie", entity_col)


def engineer(df: DataFrame, data: IMDBData, genres: DataFrame) -> DataFrame:
    """Metadata merge + genre + decade (classifier_pipeline.py:320-412
    steps 1-6; steps 7-10 live in the ML Pipeline)."""
    writers = top_entity_per_movie(data.writing, "writer")
    directors = top_entity_per_movie(data.directing, "director")
    df = (
        df.join(writers, df.tconst == writers.movie, "left")
        .drop("movie")
        .join(directors, df.tconst == directors.movie, "left")
        .drop("movie")
        .join(genres.dropDuplicates(["tconst"]), "tconst", "left")
        .na.fill({"writer": "unknown", "director": "unknown", "genre": "unknown"})
    )
    decade = F.concat(
        (F.floor(F.col("startYear") / 10) * 10).cast("int").cast("string"),
        F.lit("s"),
    )
    return df.withColumn("decade", decade).drop("startYear", "endYear")


def build_features(
    spark: SparkSession, data: IMDBData
) -> tuple[DataFrame, DataFrame]:
    """(train_features, test_features) — preprocess + engineer both sets,
    train statistics only ever computed on train."""
    train = preprocess(data.train, train_df=None)
    test = preprocess(data.test, train_df=data.train)
    train = engineer(train, data, data.train_genres)
    test = engineer(test, data, data.test_genres)
    train = train.withColumn(
        "label", F.when(F.col("label") == "True", 1.0).otherwise(0.0)
    )
    return train, test


def run_imdb(
    spark: SparkSession,
    data_dir: str,
    out_path: str,
    test_name: str = "validation",
    model_path: str | None = None,
) -> DataFrame:
    """Full train→predict→TXT workflow. Returns the prediction frame."""
    data = load_imdb(spark, data_dir, test_name=test_name)
    train_df, test_df = build_features(spark, data)
    model: PipelineModel = MLP.train(SPEC, train_df)
    if model_path:
        MLP.save_model(model, model_path)
    preds = model.transform(test_df).select("tconst", "prediction")
    save_predictions_txt(preds, out_path, order_col="tconst")
    return preds


def main() -> None:
    """CLI mirroring the reference runner's surface (runner.py:55-105)."""
    import argparse

    from ..session import get_spark

    ap = argparse.ArgumentParser(description="IMDB end-to-end pipeline")
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--results-path", required=True)
    ap.add_argument("--test-name", default="validation",
                    choices=["validation", "test"])
    ap.add_argument("--model-path", default=None)
    args = ap.parse_args()
    run_imdb(
        get_spark(),
        data_dir=args.data_path,
        out_path=os.path.join(args.results_path, f"{args.test_name}_preds.txt"),
        test_name=args.test_name,
        model_path=args.model_path,
    )


if __name__ == "__main__":
    main()
