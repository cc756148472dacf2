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
