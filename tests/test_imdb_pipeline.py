"""End-to-end IMDB parity: run the full reference workflow (train on the
8 committed shards with the committed LLM caches, predict the validation
set) and compare against the reference's committed result files.

Exact prediction equality is not a meaningful target — the reference's
own two committed validation runs disagree with each other on ~20% of
rows (478 vs 542 True out of 955) — so the contract checked here is the
one that is stable: row count, format, tconst ordering, and a True-rate
inside the envelope of the reference's own runs (±10pp slack).
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from big_data_imdb_classifier_spark.pipelines import imdb as P

DATA_DIR = "/root/reference/imdb"
REF_RESULTS = "/root/reference/results/imdb"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR), reason="reference IMDB data not present"
)


@pytest.fixture(scope="module")
def imdb_data(spark):
    return P.load_imdb(spark, DATA_DIR, test_name="validation")


def test_sources_load_shapes(spark, imdb_data):
    assert imdb_data.train.count() == 7959  # 8 shards minus headers
    assert imdb_data.test.count() == 955
    assert imdb_data.directing.columns == ["movie", "director"]
    assert imdb_data.writing.columns == ["movie", "writer"]
    # caches fully cover their sets → the LLM path never fires
    missing = imdb_data.test.join(
        imdb_data.test_genres, "tconst", "left_anti"
    ).count()
    assert missing == 0


def test_preprocess_contract(spark, imdb_data):
    train, test = P.build_features(spark, imdb_data)
    for df in (train, test):
        # numeric repaired: no nulls after train-mean imputation
        assert df.where(F.col("runtimeMinutes").isNull()).count() == 0
        assert df.where(F.col("numVotes").isNull()).count() == 0
        # categorical never null (unknown fallback)
        for c in ["writer", "director", "genre", "decade"]:
            assert df.where(F.col(c).isNull()).count() == 0, c
        assert "startYear" not in df.columns  # dropped after decade
    # label binarized on train only
    vals = {r.label for r in train.select("label").distinct().collect()}
    assert vals <= {0.0, 1.0}


def test_end_to_end_parity(spark, tmp_path):
    out = str(tmp_path / "validation_preds.txt")
    preds = P.run_imdb(
        spark, DATA_DIR, out, test_name="validation",
        model_path=str(tmp_path / "model"),
    )
    # The sink wrote exactly one part file with one True/False per row,
    # ordered by tconst.
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1
    lines = open(parts[0]).read().splitlines()
    assert len(lines) == 955
    assert set(lines) <= {"True", "False"}

    true_rate = lines.count("True") / len(lines)
    ref_rates = []
    for f in glob.glob(os.path.join(REF_RESULTS, "validation_*.txt")):
        ref = open(f).read().splitlines()
        assert len(ref) == 955
        ref_rates.append(ref.count("True") / len(ref))
    lo, hi = min(ref_rates) - 0.10, max(ref_rates) + 0.10
    assert lo <= true_rate <= hi, (true_rate, ref_rates)

    # persistence round-trip predicts identically (S8)
    from big_data_imdb_classifier_spark.ml.pipeline import load_model

    data = P.load_imdb(spark, DATA_DIR, test_name="validation")
    _, test_df = P.build_features(spark, data)
    again = load_model(str(tmp_path / "model")).transform(test_df)
    diff = (
        preds.select("tconst", "prediction")
        .join(
            again.select("tconst", F.col("prediction").alias("p2")), "tconst"
        )
        .where(F.col("prediction") != F.col("p2"))
        .count()
    )
    assert diff == 0


def _write_tmdb_fixture(tmp_path, tconsts):
    """Synthetic TMDB CSV in the real dump's shape: header-named columns,
    extra irrelevant columns, zero values marking 'missing', and ids
    covering only part of the corpus."""
    import csv

    p = tmp_path / "tmdb.csv"
    with open(p, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["id", "title", "imdb_id", "budget", "revenue",
             "popularity", "status"]
        )
        for i, t in enumerate(tconsts):
            # every third movie has zero budget/revenue (TMDB missing)
            budget = 0 if i % 3 == 0 else 1_000_000 * (i + 1)
            revenue = 0 if i % 3 == 0 else 2_500_000 * (i + 1)
            w.writerow([i, f"movie-{i}", t, budget, revenue,
                        round(1.5 * (i + 1), 2), "Released"])
    return str(p)


def test_tmdb_extra_data_join_and_nonzero_imputation(spark, tmp_path, imdb_data):
    ids = [r.tconst for r in imdb_data.train.select("tconst").limit(30).collect()]
    path = _write_tmdb_fixture(tmp_path, ids[:20])  # only 20 of 30 covered

    extra = P.load_tmdb(spark, path)
    assert extra.columns == ["tconst"] + P.TMDB_COLS
    means = P.tmdb_nonzero_means(extra)
    # non-zero mean: zeros excluded from the statistic
    import statistics

    budgets = [1_000_000 * (i + 1) for i in range(20) if i % 3 != 0]
    assert means["budget"] == pytest.approx(statistics.mean(budgets))

    data = P.IMDBData(
        train=imdb_data.train,
        test=imdb_data.test,
        writing=imdb_data.writing,
        directing=imdb_data.directing,
        train_genres=imdb_data.train_genres,
        test_genres=imdb_data.test_genres,
        extra=extra,
    )
    train, test = P.build_features(spark, data)
    for df in (train, test):
        for c in P.TMDB_COLS:
            assert c in df.columns, c
            # no nulls (absent movies) and no zeros (TMDB missing) survive
            assert df.where(F.col(c).isNull() | (F.col(c) == 0.0)).count() == 0, c
    # movies outside the fixture got the shared non-zero mean
    outside = train.join(
        extra.select("tconst"), "tconst", "left_anti"
    ).select("budget").first()
    assert outside.budget == pytest.approx(means["budget"])

    # and the TMDB metrics make it into the fitted feature vector
    from big_data_imdb_classifier_spark.ml import pipeline as MLP

    model = MLP.train(P.SPEC_WITH_TMDB, train)
    out = model.transform(test)
    n_features = len(P.SPEC_WITH_TMDB.numeric_cols) + len(
        P.SPEC_WITH_TMDB.categorical_cols
    )
    assert out.first().features.size == n_features
