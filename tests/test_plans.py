"""Physical-plan audits: the declarative operators must compile to the plans
we designed for — column pruning reaching the parquet scan, predicate
pushdown, broadcastable small sides broadcast, and LSH joins planned as
equi-joins (never cartesian). These are the .explain() checks SURVEY.md §4
promises ("Catalyst contributes scan pruning … AQE")."""

import os

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_column_pruning_reaches_scan(spark, docs):
    """A 2-column aggregate must scan 2 columns, not the whole table."""
    from sketch_spark.pipeline.text import with_token_count

    q = with_token_count(docs).groupBy("source").agg(F.sum("n_tokens"))
    plan = _plan(q)
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    assert "text" in read[0] and "source" in read[0]
    assert "doc_id" not in read[0], f"doc_id not pruned: {read[0]}"


def test_predicate_pushdown_reaches_scan(spark, docs):
    q = docs.where(F.col("source") == "src0").select("doc_id")
    plan = _plan(q)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "EqualTo(source,src0)" in pushed or "EqualTo(source" in pushed, pushed


def test_lsh_candidate_join_is_equi_join_not_cartesian(spark, docs):
    """The near-dup candidate join must be a hash equi-join on
    (band_id, band_hash) — at 100 TB a cartesian plan would be fatal."""
    from sketch_spark.pipeline.dedup import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(docs.limit(50), num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan or "join" in plan


def test_simhash_join_is_equi_join(spark, docs):
    from sketch_spark.pipeline.dedup import simhash_neardups

    plan = _plan(simhash_neardups(docs.limit(50)))
    assert "CartesianProduct" not in plan


def test_ann_bucket_join_is_broadcast(spark, sf_dir):
    """The wanted-bucket semi-join broadcasts the tiny bucket list."""
    import numpy as np

    from sketch_spark.pipeline.similarity import ann_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = np.zeros((1, 64), dtype=np.float64)
    plan = _plan(ann_topk(emb, q, np.array([0]), k=3, n_planes=4, n_tables=2))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_sketch_partial_agg_scans_only_needed_columns(spark, fixtures):
    """partition_states must select only the sketched columns before the
    Arrow exchange (SURVEY.md §4: 'a scan that reads all columns for a
    2-column projection is wrong')."""
    from sketch_spark.spark.agg import SketchSpec, partition_states

    d, _ = fixtures
    df = spark.read.parquet(os.path.join(d, "uniform"))
    states = partition_states(df, [SketchSpec("h", "hll", "tokens", {"p": 10})])
    plan = _plan(states)
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    assert "tokens" in read[0]
    assert "doc_id" not in read[0] and "source" not in read[0], read[0]


def test_exact_dedup_no_cartesian(spark, docs):
    from sketch_spark.pipeline.dedup import exact_dedup

    plan = _plan(exact_dedup(docs))
    assert "CartesianProduct" not in plan


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_threshold_distinct_copartitions_on_value(spark, docs):
    """FilterHLL composition: the plan must hash-partition the PAIR stream
    on the gated value BEFORE the reduce-side Arrow exchange — without the
    co-location the per-partition CMS gate undercounts split values. (The
    shuffle moves (v, partial_count) pairs, not raw rows — the skew story.)"""
    from sketch_spark.spark.filterhll import partial_value_counts

    # threshold_distinct collects eagerly; audit the same pre-collect
    # pipeline it builds (map-side pairs + repartition on the value)
    src = partial_value_counts(docs, "doc_id").repartition("v")
    plan = _plan(src)
    assert "hashpartitioning(v" in plan, plan


def test_embedding_neardup_join_is_equi_join(spark, sf_dir):
    from sketch_spark.pipeline.similarity import embedding_neardups

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(50)
    plan = _plan(embedding_neardups(emb, n_planes=4, n_tables=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_bucket_stats_use_no_window(spark, docs, sf_dir):
    """Hot-bucket stats must come from groupBy(bucket)+join-back, never
    Window.partitionBy(bucket): a window funnels a mega-bucket's exploded
    rows through ONE task before the star guard can cap anything (the r3
    skew ceiling). groupBy map-side-combines to one row per bucket, and the
    join-back is AQE-skew-splittable. Assert no Window node in ANY bucketed
    candidate plan."""
    import numpy as np

    from sketch_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_neardups,
    )
    from sketch_spark.pipeline.similarity import embedding_neardups

    sigs = minhash_signatures(docs.limit(50), num_hashes=32)
    for df in (
        lsh_candidate_pairs(sigs, bands=8, rows_per_band=4),
        simhash_neardups(docs.limit(50)),
        embedding_neardups(
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(50),
            n_planes=4,
            n_tables=2,
        ),
    ):
        plan = _plan(df)
        assert "Window [" not in plan and "\nWindow " not in plan, plan
        # stats come from a partial_count-capable hash aggregate instead
        assert "HashAggregate" in plan or "partial_count" in plan, plan
    # and the band-key shuffle is still on the compact bucket key
    plan = _plan(lsh_candidate_pairs(sigs, bands=8, rows_per_band=4))
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning(bh" in l]
    assert len(exchanges) >= 1, plan


def test_simhash_hamming_join_is_equi_join_no_window(spark, docs):
    """Segment bucketing must plan as k+1 equi-joins on the folded segment
    key — no cartesian, no window, and exact-Hamming verify stays JVM-side
    (bit_count in the projection, no Python eval)."""
    from sketch_spark.pipeline.dedup import simhash_hamming_neardups

    pairs = simhash_hamming_neardups(docs.limit(50), k=3)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window [" not in plan and "\nWindow " not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "bit_count" in plan, plan


def test_signature_jaccard_broadcasts_pairs_side(spark, docs):
    """At production scale the candidate-pair set is small relative to the
    signature table — the verify join should broadcast the pairs side, not
    shuffle the full signature table (round-3 verdict item #7). We do NOT
    hard-code a broadcast hint in the library (pairs CAN be billions of
    rows at 100 TB; an unconditional broadcast would OOM the driver) — AQE
    converts the join at runtime from the pairs side's actual size, so the
    audit executes the query and inspects the final adaptive plan."""
    from pyspark.sql.functions import broadcast  # noqa: F401  (see docstring)

    from sketch_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        signature_jaccard,
    )

    sigs = minhash_signatures(docs.limit(200), num_hashes=32).persist()
    sigs.count()
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    out = signature_jaccard(sigs, pairs)
    out.collect()  # materialize so AQE finalizes the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    sigs.unpersist()


def test_connected_components_joins_are_equi_joins(spark):
    """Every round of min-label propagation is a key equi-join + groupBy —
    never a cartesian, and edges stay bidirectional-deduped. Pointer
    jumping plus localCheckpoint keeps the plan flat across rounds, so
    auditing the RESULT's plan (post-checkpoint) plus one round's shape
    suffices."""
    from sketch_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = connected_components(pairs, max_iters=4)
    rows = {r["id"]: r["component"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_builds_shuffle_once_states_only(spark, sf_dir):
    """Phase 2 of every grouped build (merge_keyed_states) must be ONE
    hash exchange of (key, name, state) rows — kilobyte states, never
    data rows — for both the DataFrame path and the per-key tensor-moment
    build. A second data-scale exchange here would be the 100 TB
    bottleneck."""
    from sketch_spark.pipeline.similarity import tensor_moments_by_key
    from sketch_spark.spark.agg import SketchSpec, sketch_by_key

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    g = sketch_by_key(ev, "event_type", [SketchSpec("h", "hll", "user_id", {"p": 10})])
    plan = _plan(g)
    assert plan.count("+- Exchange") == 1, plan
    assert "CartesianProduct" not in plan

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t = tensor_moments_by_key(emb, "label", d=64, d_out=512, degree=2, ns=2)
    tplan = _plan(t)
    assert tplan.count("+- Exchange") == 1, tplan
    assert "CartesianProduct" not in tplan
