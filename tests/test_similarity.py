"""Similarity search: exact-baseline sanity and ANN recall gates."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_imdb_classifier_spark.operators import similarity as SIM

from .conftest import SF_ORACLE


def _emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_dot_and_norm_basics(spark):
    df = spark.createDataFrame([([3.0, 4.0], [1.0, 0.0])], ["a", "b"])
    row = df.select(
        SIM.dot_col(F.col("a"), F.col("b")).alias("dot"),
        SIM.l2_norm_col(F.col("a")).alias("na"),
        SIM.cosine_col(F.col("a"), F.col("b")).alias("cos"),
    ).first()
    assert row.dot == 3.0
    assert row.na == 5.0
    assert math.isclose(row.cos, 0.6)


def test_knn_exact_self_excluded_and_ranked(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 3)
    out = SIM.knn_exact_cosine(emb, queries, k=5).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_ann_recall_at_10(spark):
    """Hyperplane-LSH candidates must recover >=85% of the exact top-10
    (deterministic: seeded planes + fixed testdata; measured 0.90)."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.knn_exact_cosine(emb, queries, k=10).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in SIM.knn_ann_hyperplane(emb, queries, k=10).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.85, f"ANN recall@10 too low: {recall}"


def test_ann_sims_are_exact_on_candidates(spark):
    """ANN reports *exact* cosine for every candidate it returns — the
    approximation is only in candidate generation."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 2)
    exact = {
        (r.query_id, r.neighbor_id): r.sim
        for r in SIM.knn_exact_cosine(emb, queries, k=50).collect()
    }
    for r in SIM.knn_ann_hyperplane(emb, queries, k=10).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert math.isclose(r.sim, exact[key], rel_tol=1e-9)


def test_semdedup_coverage_and_candidate_bound(spark):
    """Cluster-local semantic dedup (SemDeDup shape): every emitted
    pair must be a TRUE pair of the exact all-pairs baseline (the
    verify step is exact cosine, so precision is 1 by construction),
    coverage of the exact pair set must clear the measured floor for
    this corpus (0.93 at the oracle SF; floored at 0.85), and the
    candidate volume must stay well under the quadratic all-pairs count
    (the whole point of the cluster blocking)."""
    emb = _emb(spark)
    n = emb.count()
    k_cells, _, _ = SIM.ivf_params(n)
    got = {
        (r.vec_a, r.vec_b)
        for r in SIM.semantic_dedup_cell_pairs(
            emb, threshold=0.45, n_clusters=k_cells, n_soft=2
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in SIM.cosine_pairs_blocked(emb, threshold=0.45).collect()
    }
    assert got <= exact, f"false pairs: {got - exact}"
    coverage = len(got) / max(len(exact), 1)
    assert coverage >= 0.85, f"semdedup coverage too low: {coverage}"
    # candidate bound: same-cell pairs with soft=2 must stay far below
    # the all-pairs count
    sample = SIM.strided_sample_vectors(emb)
    centers = SIM.lloyd_centers_deterministic(sample, k_cells)
    cells = emb.select(
        "vec_id",
        F.explode(SIM.probe_cells_col(centers, 2, "embedding")).alias("c"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    n_cand = (
        a.join(b, F.col("a.c") == F.col("b.c"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    assert n_cand < 0.35 * n * (n - 1) / 2, n_cand


def test_ivf_recall_at_10(spark):
    """IVF multi-probe must recover most of the exact top-10. Random
    embeddings are the worst case for IVF (no cluster structure), so the
    floor is modest — the contract is 'candidates shrink, quality mostly
    survives', not exactness."""
    from big_data_imdb_classifier_spark.operators import similarity as SIM
    from big_data_imdb_classifier_spark.sources.readers import load_table
    from pyspark.sql import functions as F
    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = SIM.knn_exact_cosine(emb, queries, k=10)
    ivf = SIM.knn_ivf(emb, queries, k=10, n_clusters=8, n_probe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # and every IVF hit must carry the true cosine (verify step is exact)
    sims_exact = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    for r in ivf.collect():
        if (r.query_id, r.neighbor_id) in sims_exact:
            assert abs(r.sim - sims_exact[(r.query_id, r.neighbor_id)]) < 1e-9


def test_ivf_pq_recall_and_exact_rerank(spark):
    """IVF-PQ: 32x-compressed codes + ADC shortlist + exact re-rank must
    (a) recover most of the exact top-10 (floor matches plain IVF — the
    coarse probing, not the quantization, caps recall) and (b) report
    TRUE cosines on everything it returns (the re-rank stage is exact)."""
    from pyspark.sql import functions as F

    from big_data_imdb_classifier_spark.operators import similarity as SIM
    from big_data_imdb_classifier_spark.sources.readers import load_table

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = SIM.knn_exact_cosine(emb, queries, k=10)
    pq = SIM.knn_ivf_pq(emb, queries, k=10, n_clusters=8, n_probe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    rows = pq.collect()
    a = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # returned sims are exact cosines, not ADC approximations
    truth = {
        (r.query_id, r.neighbor_id): r.sim
        for r in SIM.knn_exact_cosine(emb, queries, k=len(rows) + 10).collect()
    }
    for r in rows:
        key = (r.query_id, r.neighbor_id)
        if key in truth:
            assert abs(r.sim - truth[key]) < 1e-9


def test_pq_codebooks_deterministic_and_shaped():
    """Codebook training is seeded and shape-stable; encoding maps every
    vector to m in-range codes."""
    import numpy as np

    from big_data_imdb_classifier_spark.operators import similarity as SIM

    rng = np.random.default_rng(7)
    sample = rng.normal(size=(200, 64))
    b1 = SIM.pq_train_codebooks(sample, m=8, n_codes=16, seed=42)
    b2 = SIM.pq_train_codebooks(sample, m=8, n_codes=16, seed=42)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)
    # RNG-free since round 5: the seed is signature-compat only, so a
    # different seed yields the SAME books (training is pure Lloyd on
    # the sample), and every coordinate sits on the rounding grid the
    # SQL oracle replays.
    b3 = SIM.pq_train_codebooks(sample, m=8, n_codes=16, seed=43)
    assert np.array_equal(b1, b3)
    assert np.array_equal(
        b1, np.round(b1, SIM.LLOYD_CENTER_DIGITS)
    )


def test_ivf_params_scaling():
    """Index sizing: √N cells (floored at the 16/4/8 demo values), 40%
    probe fraction, √N-proportional re-rank budget — all monotone in N
    and exactly the demo floor at tiny corpora."""
    from big_data_imdb_classifier_spark.operators.similarity import (
        ivf_params,
    )

    assert ivf_params(50) == (16, 6, 8)
    assert ivf_params(256) == (16, 6, 8)
    nc, np_, rf = ivf_params(20_000)
    assert nc == 141 and np_ == round(141 * 0.4) and rf == 141 // 4
    prev = (0, 0, 0)
    for n in [10, 100, 1_000, 10_000, 100_000, 1_000_000]:
        cur = ivf_params(n)
        assert all(c >= p for c, p in zip(cur, prev)), (n, cur, prev)
        prev = cur


def test_ann_auto_switch_fires_above_threshold(spark, monkeypatch):
    """VERDICT r6 task 4: the brute-force gates swap to the IVF
    shortlist IN CODE above the corpus threshold. Force the switch by
    lowering the threshold, then prove (a) the plan shape changed — no
    BroadcastNestedLoopJoin, Arrow cell-assignment present — and (b)
    recall vs the exact result holds a floor; with the default
    threshold the exact plan (and its oracle) is untouched."""
    from big_data_imdb_classifier_spark.plans import (
        queries_similarity as QS,
    )
    from .conftest import SF_SMOKE

    # Default threshold: exact path — BNLJ present (the broadcast scan).
    plan_exact = QS.knn_hard_negative_mining(
        spark, SF_SMOKE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan_exact

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QS.knn_hard_negative_mining(spark, SF_SMOKE).collect()
    }

    monkeypatch.setattr(SIM, "ANN_SWITCH_MIN_CORPUS", 1)
    df_ann = QS.knn_hard_negative_mining(spark, SF_SMOKE)
    plan_ann = df_ann._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_ann
    # Arrow cell assignment (MapInPandas/ArrowEvalPython) is the IVF
    # signature in the plan.
    assert ("ArrowEvalPython" in plan_ann) or ("MapInPandas" in plan_ann)

    ann = {(r["query_id"], r["neighbor_id"]) for r in df_ann.collect()}
    assert exact, "exact result unexpectedly empty"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.5, f"ANN-path recall {recall:.2f} below floor"

    # MaxSim and Matryoshka switch through the same helper: plans drop
    # the nested-loop scan too.
    for fn in (QS.sim_maxsim_multivector, QS.knn_matryoshka_dim_recall):
        p = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in p, fn.__name__
        assert fn(spark, SF_SMOKE).count() > 0, fn.__name__


def test_corpus_row_count_file_dir_and_missing(spark, tmp_path):
    """The switch predicate's metadata probe must handle every corpus
    layout the engine itself produces (round-7 ADVICE: a Spark-written
    directory of part files crashed it, so the ANN switch failed on
    exactly the at-scale corpora it was built for): single file → footer
    num_rows; directory → sum over part footers; missing/garbage → 0
    (callers keep the exact plan, never crash)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"vec_id": list(range(7))})
    single = tmp_path / "emb_single"
    single.mkdir()
    pq.write_table(tbl, single / "embeddings.parquet")
    assert SIM.corpus_row_count(str(single)) == 7

    # Spark-written layout: a DIRECTORY named embeddings.parquet.
    multi = tmp_path / "emb_multi"
    (
        spark.range(123)
        .withColumnRenamed("id", "vec_id")
        .repartition(4)
        .write.parquet(str(multi / "embeddings.parquet"))
    )
    assert SIM.corpus_row_count(str(multi)) == 123

    assert SIM.corpus_row_count(str(tmp_path / "nope")) == 0
    garbage = tmp_path / "emb_bad"
    garbage.mkdir()
    (garbage / "embeddings.parquet").write_bytes(b"not parquet")
    assert SIM.corpus_row_count(str(garbage)) == 0


def test_corpus_row_count_synthetic_uri():
    """synthetic:// corpora carry their row counts in the URI — the
    probe must parse them instead of falling through the filesystem
    branch to 0 (round-8 ADVICE: that silently disabled the ANN/SemDeDup
    switch for exactly the largest rehearsal corpora the scale path is
    built for)."""
    uri = (
        "synthetic://?rows=1000000&doc_rows=50000&doc_base=5000"
        "&emb_rows=2000000&emb_base=2000&seed=1&partitions=64"
    )
    assert SIM.corpus_row_count(uri, "embeddings") == 2_000_000
    assert SIM.corpus_row_count(uri, "documents") == 50_000
    assert SIM.corpus_row_count(uri, "events") == 1_000_000
    # a URI that doesn't size the table -> 0 (exact-plan fallback)
    assert SIM.corpus_row_count("synthetic://?rows=10", "embeddings") == 0
    # the switch itself fires off the parsed count
    assert (
        SIM.corpus_row_count(uri, "embeddings") >= SIM.ANN_SWITCH_MIN_CORPUS
    )


def test_switched_oracles_registered_with_corpus_scope():
    """The four plan-switching queries keep oracles that replay the
    BELOW-switch exact plan; each must carry the ORACLE_VALID_BELOW
    marker so sweep tools downgrade the hash compare to rows-only in
    the switched regime instead of failing by design (round-8
    ADVICE)."""
    from big_data_imdb_classifier_spark.plans import load_all
    from big_data_imdb_classifier_spark.plans.registry import (
        ORACLE_VALID_BELOW,
        ORACLES,
    )

    load_all()
    for name in (
        "dedup_embedding_cosine",
        "knn_hard_negative_mining",
        "sim_maxsim_multivector",
        "knn_matryoshka_dim_recall",
    ):
        assert ORACLE_VALID_BELOW.get(name) == (
            "embeddings",
            SIM.ANN_SWITCH_MIN_CORPUS,
        ), name
        assert name in ORACLES, name  # the oracle itself stays registered


def test_embedding_dedup_auto_switch_to_semdedup(spark, monkeypatch):
    """VERDICT r7 task 8: the exact blocked-GEMM all-pairs dedup yields
    to the cluster-local SemDeDup enumeration above the corpus
    threshold. Force the switch and prove (a) the plan shape changed —
    the block cross-join's non-equi self-join (BroadcastNestedLoopJoin)
    is gone, the soft-cell assignment's Arrow eval is present — and
    (b) the switched result is a subset of the exact pairs with high
    coverage; with the default threshold the exact plan (and its hash
    oracle) is untouched."""
    from big_data_imdb_classifier_spark.plans import (
        queries_similarity as QS,
    )
    from .conftest import SF_SMOKE

    plan_exact = QS.dedup_embedding_cosine(
        spark, SF_SMOKE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan_exact

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in QS.dedup_embedding_cosine(spark, SF_SMOKE).collect()
    }
    assert exact, "exact result unexpectedly empty"

    monkeypatch.setattr(SIM, "ANN_SWITCH_MIN_CORPUS", 1)
    df_ann = QS.dedup_embedding_cosine(spark, SF_SMOKE)
    plan_ann = df_ann._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_ann
    assert ("ArrowEvalPython" in plan_ann) or ("MapInPandas" in plan_ann)

    ann = {(r["vec_a"], r["vec_b"]) for r in df_ann.collect()}
    assert ann <= exact, "SemDeDup path produced a non-exact pair"
    coverage = len(ann & exact) / len(exact)
    assert coverage >= 0.5, f"cell-local coverage {coverage:.2f} below floor"


def test_semdedup_coverage_at_production_threshold(spark):
    """VERDICT r8 task 7: the 0.45-cosine demo threshold is where
    cluster-locality is WEAKEST (0.58 coverage at sf0.1, documented
    since r6) — real dedup runs use tight thresholds, where near-dup
    pairs are almost parallel vectors that quantize into the same
    Lloyd cell. Pin that regime: on a corpus with planted >=0.9-cosine
    near-duplicates (the stock test embeddings have none above 0.85),
    the cell-local enumeration must emit only true pairs, cover >=0.9
    of the exact >=0.9 pair set, and keep its candidate volume far
    below all-pairs."""
    import numpy as np

    base = _emb(spark).toPandas()
    dim = len(base["embedding"].iloc[0])
    rng = np.random.RandomState(11)
    rows = []
    # 80 planted near-dups: unit-scale jitter sized for ~0.93-0.99
    # cosine against the original.
    for i in range(80):
        src = np.asarray(base["embedding"].iloc[i * 5], dtype=np.float64)
        noise = rng.normal(0.0, 0.12 * np.linalg.norm(src) / np.sqrt(dim),
                           size=dim)
        rows.append((10_000 + i, (src + noise).astype(np.float32).tolist(),
                     "dup"))
    planted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    emb = (
        spark.createDataFrame(base[["vec_id", "embedding", "label"]])
        .select(
            F.col("vec_id").cast("long"),
            F.col("embedding").cast("array<float>"),
            "label",
        )
        .unionByName(planted)
    )
    n = emb.count()
    k_cells, _, _ = SIM.ivf_params(n)

    exact = {
        (r.vec_a, r.vec_b)
        for r in SIM.cosine_pairs_blocked(emb, threshold=0.9).collect()
    }
    assert len(exact) >= 60, f"too few planted pairs materialized: {len(exact)}"

    got = {
        (r.vec_a, r.vec_b)
        for r in SIM.semantic_dedup_cell_pairs(
            emb, threshold=0.9, n_clusters=k_cells, n_soft=2
        ).collect()
    }
    assert got <= exact, f"false pairs at 0.9: {got - exact}"
    coverage = len(got) / len(exact)
    assert coverage >= 0.9, (
        f"production-threshold coverage {coverage:.3f} below 0.9 floor"
    )

    # Candidate-volume bound: same-cell (soft=2) pair count stays far
    # below the all-pairs quadratic.
    sample = SIM.strided_sample_vectors(emb)
    centers = SIM.lloyd_centers_deterministic(sample, k_cells)
    cells = emb.select(
        "vec_id",
        F.explode(SIM.probe_cells_col(centers, 2, "embedding")).alias("c"),
    )
    cand = (
        cells.alias("a")
        .join(cells.alias("b"), "c")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    assert cand < 0.5 * all_pairs, (
        f"candidate volume {cand} not sub-quadratic vs {all_pairs}"
    )
