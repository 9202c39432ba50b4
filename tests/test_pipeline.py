"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
n-gram), text analysis, similarity search, multimodal plumbing — each
checked against exact local oracles."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from sketch_spark.pipeline.dedup import (
    dedup_stats,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_lsh_neardups,
    minhash_signatures,
    ngram_jaccard_pairs,
    signature_jaccard,
    simhash_neardups,
)
from sketch_spark.pipeline.multimodal import extract_features, fake_decode, synth_media_df
from sketch_spark.pipeline.similarity import ann_topk, brute_force_topk, cosine_topk_sql
from sketch_spark.pipeline.text import (
    with_fingerprint,
    with_lang_scores,
    with_quality_features,
    with_token_count,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"
NEAR = BASE.replace("lazy", "sleepy")  # one word changed → high Jaccard
OTHER = "completely different content about spark clusters and parquet files here now"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id="d1", text=BASE),
        Row(doc_id="d2", text=BASE),           # exact duplicate of d1
        Row(doc_id="d3", text="  " + BASE + " "),  # whitespace-variant duplicate
        Row(doc_id="d4", text=NEAR),            # near-duplicate
        Row(doc_id="d5", text=OTHER),
        Row(doc_id="d6", text=OTHER.upper()),   # case-variant duplicate of d5
    ]
    return spark.createDataFrame(rows)


# ---------------- exact dedup -------------------------------------------------


def test_dedup_stats(docs):
    r = dedup_stats(docs).first()
    # normalized duplicates: {d1,d2,d3}, {d4}, {d5,d6} → 3 distinct of 6
    assert r["n_docs"] == 6 and r["n_distinct"] == 3 and r["n_dup_docs"] == 3


def test_exact_dedup_keeps_min_id(docs):
    kept = {r["doc_id"] for r in exact_dedup(docs).collect()}
    assert kept == {"d1", "d4", "d5"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([Row(doc_id="a", text="Hello  World"), Row(doc_id="b", text="hello world ")])
    fps = [r["fingerprint"] for r in with_fingerprint(df).collect()]
    assert fps[0] == fps[1]


# ---------------- MinHash-LSH near-dup ------------------------------------------


def test_minhash_signatures_shape_and_determinism(docs):
    sigs = minhash_signatures(docs, num_hashes=64)
    rows = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    assert all(len(s) == 64 for s in rows.values())
    rows2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=64).collect()}
    assert rows == rows2  # deterministic
    assert rows["d1"] == rows["d2"]  # identical text → identical signature


def test_lsh_finds_near_duplicates(docs):
    dups = minhash_lsh_neardups(docs, threshold=0.5, num_hashes=128, bands=32)
    pairs = {(r["id_a"], r["id_b"]) for r in dups.collect()}
    assert ("d1", "d2") in pairs          # exact dup always survives
    assert ("d1", "d4") in pairs or ("d2", "d4") in pairs  # near-dup caught
    assert not any("d5" in p and ("d1" in p or "d4" in p) for p in pairs)


def test_signature_jaccard_estimates(docs):
    sigs = minhash_signatures(docs, num_hashes=128)
    pairs = lsh_candidate_pairs(sigs, bands=32, rows_per_band=4)
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in signature_jaccard(sigs, pairs).collect()}
    assert est.get(("d1", "d2")) == pytest.approx(1.0)
    if ("d1", "d4") in est:
        # true shingle Jaccard of BASE vs NEAR is high but < 1
        assert 0.4 < est[("d1", "d4")] < 1.0


def test_simhash_buckets_identical_docs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_neardups(docs).collect()}
    assert ("d1", "d2") in pairs


def test_empty_doc_shingles_batch_independent():
    """Regression (round-2 advice): a zero-length doc's single shingle window
    must not read bytes of the NEXT doc in the batch — identical empty docs
    get identical signatures regardless of their neighbors."""
    from sketch_spark.pipeline.dedup import _char_shingles

    a = _char_shingles(np.array(["", "apple banana cherry"]), 5)
    b = _char_shingles(np.array(["", "zebra yak xylophone"]), 5)
    assert a[0].tolist() == b[0].tolist()
    # and short docs (< width) likewise only see their own bytes + padding
    c = _char_shingles(np.array(["ab", "SOMETHING ELSE"]), 5)
    d = _char_shingles(np.array(["ab", "other neighbor!"]), 5)
    assert c[0].tolist() == d[0].tolist()
    # non-degenerate docs keep full window counts
    assert len(a[1]) == len("apple banana cherry") - 5 + 1


def test_lsh_hot_bucket_guard_linear(spark):
    """Regression (round-2 verdict): a flood of identical docs lands every
    copy in the same bucket in every band; the star-pairing guard must keep
    candidate pairs O(n), not O(n²)."""
    n = 2000
    rows = [Row(doc_id=f"d{i:05d}", text="exactly the same web page content here") for i in range(n)]
    df = spark.createDataFrame(rows)
    sigs = minhash_signatures(df, num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, max_bucket_size=64)
    cnt = pairs.count()
    # star pattern: every non-min member pairs once with the bucket min
    assert cnt == n - 1


def test_simhash_hot_bucket_guard_linear(spark):
    n = 1000
    rows = [Row(doc_id=f"d{i:05d}", text="exactly the same web page content here") for i in range(n)]
    df = spark.createDataFrame(rows)
    assert simhash_neardups(df, max_bucket_size=64).count() == n - 1


def test_simhash_hamming_recovers_planted_flips(spark):
    """Planted signatures k'=0..3 bit flips from a base must pair with the
    base for every k' ≤ k (segment pigeonhole guarantees candidate
    recovery; verify is exact bit_count), and k' > k must NOT pair with it.
    Signature-level, fully deterministic."""
    from sketch_spark.pipeline.dedup import simhash_hamming_pairs

    def to_signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    base = 0x0123_4567_89AB_CDEF
    rows = []
    # distant deterministic background noise (far from base in every segment)
    for i in range(20):
        rows.append((100 + i, to_signed((base ^ ((i + 1) * 0x9E37_79B9_7F4A_7C15)) & ((1 << 64) - 1))))
    # planted: doc k' = base with exactly k' bits flipped (incl. bit 63 —
    # sign-bit handling must be correct end-to-end)
    flips = {0: [], 1: [3], 2: [7, 40], 3: [1, 22, 63], 4: [2, 17, 33, 59]}
    for k_planted, bits in flips.items():
        sig = base
        for b in bits:
            sig ^= 1 << b
        rows.append((k_planted, to_signed(sig)))
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(sigs, k=3).collect()
    }
    # doc 0 carries the exact base; docs 1..3 must pair with it at hamming k'
    for kp in (1, 2, 3):
        pair = (0, kp)
        assert pair in got, (kp, got)
    # doc 4 is 4 flips from base — never paired with doc 0
    assert (0, 4) not in got and (4, 0) not in got


def test_simhash_hamming_end_to_end_text(spark):
    """Text-level wrapper: exact copies pair at hamming 0; unrelated text
    does not pair."""
    from sketch_spark.pipeline.dedup import simhash_hamming_neardups

    rows = [
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=BASE),
        Row(doc_id=3, text=OTHER),
    ]
    df = spark.createDataFrame(rows)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_hamming_neardups(df, k=3).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_hamming_flood_star_guard(spark):
    """A flood of identical signatures must collapse to the linear star in
    each of the k+1 segment buckets → exactly n-1 verified pairs (hamming
    0), not O(n²)."""
    from sketch_spark.pipeline.dedup import simhash_hamming_pairs

    n = 1000
    sigs = spark.createDataFrame(
        [Row(doc_id=i, simhash=0x1234_5678_9ABC) for i in range(n)],
        "doc_id long, simhash long",
    )
    assert simhash_hamming_pairs(sigs, k=3, max_bucket_size=64).count() == n - 1


def test_lsh_small_buckets_still_all_pairs(docs):
    """The guard must not change semantics for normal-sized buckets: all
    within-bucket pairs survive when buckets are under the cap."""
    sigs = minhash_signatures(docs, num_hashes=128)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, bands=32, rows_per_band=4).collect()
    }
    assert ("d1", "d2") in pairs and ("d1", "d3") in pairs and ("d2", "d3") in pairs


def test_lsh_no_guard_returns_exact_all_pairs(spark):
    """max_bucket_size=None must restore exact all-pairs bucket semantics
    (the documented opt-out for direct pair consumers)."""
    n = 60
    rows = [Row(doc_id=f"d{i:05d}", text="exactly the same web page content here") for i in range(n)]
    df = spark.createDataFrame(rows)
    sigs = minhash_signatures(df, num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, max_bucket_size=None)
    assert pairs.count() == n * (n - 1) // 2
    assert simhash_neardups(df, max_bucket_size=None).count() == n * (n - 1) // 2


# ---------------- connected components + keep-list ---------------------------


def test_connected_components_chain_star_cycle(spark):
    """Exact transitive closure on hand-built shapes: a chain (the case LSH
    pairs alone cannot resolve), a cycle, a star (the hot-bucket guard's
    output shape), and an isolated pair — component = min id per group."""
    from sketch_spark.pipeline.dedup import connected_components

    edges = (
        [("a1", "a2"), ("a2", "a3"), ("a3", "a4")]            # chain
        + [("c1", "c2"), ("c2", "c3"), ("c1", "c3")]          # cycle
        + [("h0", "h1"), ("h0", "h2"), ("h0", "h3")]          # star
        + [("x1", "x2")]                                       # pair
    )
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1", "a4": "a1",
        "c1": "c1", "c2": "c1", "c3": "c1",
        "h0": "h0", "h1": "h0", "h2": "h0", "h3": "h0",
        "x1": "x1", "x2": "x1",
    }


def test_connected_components_long_chain_converges_log_rounds(spark):
    """Pointer jumping must collapse a length-60 path well inside 10 rounds
    (plain propagation would need 60)."""
    from sketch_spark.pipeline.dedup import connected_components

    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(60)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components(pairs, max_iters=10).collect()
    assert len(got) == 61
    assert {r["component"] for r in got} == {"n000"}


def test_connected_components_flood_star_converges_fast(spark):
    """Flood shape at skew (round-3 verdict item #6): the hot-bucket guard
    emits a star, so a 100k-member flood component must resolve in the
    minimum possible 2 rounds (1 propagation + 1 no-change confirmation) —
    and the label stages must stay key-partitioned joins/aggregates, never
    a window or single-partition stage over the edge set."""
    from sketch_spark.pipeline.dedup import connected_components

    n = 100_000
    star = spark.range(1, n).select(
        F.lit(0).alias("id_a"), F.col("id").alias("id_b")
    )
    rounds = []
    out = connected_components(star, max_iters=10, rounds_out=rounds)
    comps = out.groupBy("component").count().collect()
    assert len(comps) == 1 and comps[0]["count"] == n
    assert rounds == [2], rounds
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window [" not in plan
    assert "CartesianProduct" not in plan
    # chains hanging off the star still converge logarithmically
    chain = spark.createDataFrame(
        [(200_000 + i, 200_001 + i) for i in range(16)] + [(0, 200_000)],
        "id_a long, id_b long",
    )
    rounds2 = []
    out2 = connected_components(star.unionByName(chain), max_iters=10, rounds_out=rounds2)
    assert out2.select("component").distinct().count() == 1
    assert rounds2[0] <= 6, rounds2


def test_neardup_dedup_resolves_chains_end_to_end(spark):
    """A≈B≈C variant chains: keep exactly one doc per near-dup group (min
    id), pass unrelated docs through untouched — exact_dedup's contract
    extended to near-duplicates."""
    from sketch_spark.pipeline.dedup import neardup_dedup

    # non-repeating bases: repetition collapses the DISTINCT shingle set and
    # tanks Jaccard for small absolute edits
    base1 = (
        "the quick brown fox jumps over the lazy dog while seventeen curious "
        "penguins waddle across frozen antarctic ridges carrying bright orange "
        "fish toward hungry chicks waiting beside weathered granite boulders"
    )
    base2 = (
        "distributed query engines shuffle columnar parquet row groups through "
        "arrow record batches while adaptive planners rebalance skewed joins "
        "across thousands of executor cores without spilling intermediate state"
    )
    rows = [
        Row(doc_id="g1_0", text=base1),
        Row(doc_id="g1_1", text=base1 + " extra tail words appended here"),
        Row(doc_id="g1_2", text=base1 + " extra tail words appended here plus more drift"),
        Row(doc_id="g2_0", text=base2),
        Row(doc_id="g2_1", text=base2 + " slightly changed ending for group two"),
        Row(doc_id="solo", text="completely different short content about nothing similar at all"),
    ]
    df = spark.createDataFrame(rows)
    kept = sorted(r["doc_id"] for r in neardup_dedup(df).collect())
    assert kept == ["g1_0", "g2_0", "solo"]


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [Row(doc_id="x", text="a b c d"), Row(doc_id="y", text="a b c e")]
    )
    pairs = spark.createDataFrame([Row(id_a="x", id_b="y")])
    r = ngram_jaccard_pairs(df, pairs, n=2).first()
    # bigrams x: {a b, b c, c d}; y: {a b, b c, c e} → J = 2/4
    assert r["jaccard"] == pytest.approx(0.5)


# ---------------- text analysis ------------------------------------------------


def test_token_count(spark):
    df = spark.createDataFrame([Row(text="one  two   three "), Row(text="")])
    rows = with_token_count(df).collect()
    assert rows[0]["n_tokens"] == 3 and rows[1]["n_tokens"] == 0


def test_quality_features_hand_checked(spark):
    df = spark.createDataFrame([Row(text="Ab1. cd!")])
    r = with_quality_features(df).first()
    assert r["n_chars_calc"] == 8
    assert r["n_tokens"] == 2
    assert r["punct_ratio"] == pytest.approx(2 / 8)  # '.' and '!'... '!' not in class
    assert r["digit_ratio"] == pytest.approx(1 / 8)
    assert r["space_ratio"] == pytest.approx(1 / 8)
    assert r["upper_ratio"] == pytest.approx(1 / 8)
    assert r["mean_token_len"] == pytest.approx((4 + 3) / 2)


def test_lang_scores(spark):
    df = spark.createDataFrame(
        [
            Row(text="the cat and the dog in the house"),
            Row(text="der Hund und die Katze ist nicht da"),
            Row(text="xyzzy plugh"),
        ]
    )
    rows = with_lang_scores(df).collect()
    assert rows[0]["lang_guess"] == "en"
    assert rows[1]["lang_guess"] == "de"
    assert rows[2]["lang_guess"] == "unk"


# ---------------- similarity search ----------------------------------------------


@pytest.fixture(scope="module")
def emb_df(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _local_topk(emb_rows, qvecs, qids, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    m = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    qn = qvecs / np.maximum(np.linalg.norm(qvecs, axis=1, keepdims=True), 1e-30)
    sims = mn @ qn.T
    out = {}
    for j, qid in enumerate(qids):
        # tie-break by vec_id ascending, like the Spark window
        order = np.lexsort((ids, -sims[:, j]))[:k]
        out[int(qid)] = [int(ids[i]) for i in order]
    return out


def test_brute_force_topk_matches_local_oracle(spark, emb_df):
    rows = emb_df.collect()
    qrows = [r for r in rows if r["vec_id"] < 3]
    qvecs = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows])
    got = brute_force_topk(emb_df, qvecs, qids, k=5).collect()
    want = _local_topk(rows, qvecs, qids, k=5)
    for qid in want:
        mine = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == qid]
        assert mine == want[qid]


def test_self_is_top1(spark, emb_df):
    r0 = emb_df.where(F.col("vec_id") == 0).first()
    q = np.array([r0["embedding"]], dtype=np.float64)
    top = brute_force_topk(emb_df, q, np.array([0]), k=1).first()
    assert top["vec_id"] == 0 and top["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_cosine_topk_sql_agrees_with_arrow_path(spark, emb_df):
    qdf = (
        emb_df.where(F.col("vec_id") < 2)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    sql_rows = {(r["query_id"], r["rank"]): r["vec_id"] for r in cosine_topk_sql(emb_df, qdf, k=5).collect()}
    qrows = emb_df.where(F.col("vec_id") < 2).collect()
    qvecs = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows])
    arrow_rows = {(r["query_id"], r["rank"]): r["vec_id"] for r in brute_force_topk(emb_df, qvecs, qids, k=5).collect()}
    assert sql_rows == arrow_rows


def test_ann_topk_contains_self(spark, emb_df):
    r0 = emb_df.where(F.col("vec_id") == 1).first()
    q = np.array([r0["embedding"]], dtype=np.float64)
    got = ann_topk(emb_df, q, np.array([1]), k=3, n_planes=8).collect()
    assert any(r["vec_id"] == 1 and r["rank"] == 1 for r in got)


# ---------------- multimodal plumbing ----------------------------------------------


def test_fake_decode_deterministic():
    payload = bytes(range(64))
    a, b = fake_decode(payload, 8), fake_decode(payload, 8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8,) and a.dtype == np.float32
    assert fake_decode(b"", 8).tolist() == [0.0] * 8


def test_extract_features_plumbing(spark):
    media = synth_media_df(spark, n=32)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 32
    for r in feats:
        assert len(r["feature"]) == 8 and r["ok"] and r["n_bytes"] > 0
    # deterministic across runs
    feats2 = extract_features(synth_media_df(spark, n=32), dim=8).collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in feats2]


# ---------------- embedding near-dups + BPE counting + sources ----------------


def test_embedding_neardups_finds_planted_dup(spark):
    """Plant an exact duplicate vector; it must surface at cosine ≈ 1."""
    from sketch_spark.pipeline.similarity import embedding_neardups

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype("float32")
    vecs[7] = vecs[3]  # exact dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_neardups(df, threshold=0.99, n_planes=6, n_tables=8).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in got}
    assert (3, 7) in pairs and pairs[(3, 7)] == pytest.approx(1.0, abs=1e-5)
    # random 16-d vectors almost never reach cosine 0.99
    assert all(k == (3, 7) for k in pairs)


def test_bpe_token_count(spark):
    from sketch_spark.pipeline.text import with_bpe_token_count

    df = spark.createDataFrame([Row(text="Hello, world! x2"), Row(text="")])
    rows = with_bpe_token_count(df).collect()
    # Hello | , | world | ! | x | 2  → 6
    assert rows[0]["n_bpe_tokens"] == 6
    assert rows[1]["n_bpe_tokens"] == 0


def test_sources_parquet_and_iceberg_gate(spark, fixtures, tmp_path):
    import os

    from sketch_spark.sources import load_table, write_table

    d, _ = fixtures
    df = load_table(spark, os.path.join(d, "uniform"))
    assert df.count() == 10_000
    out = str(tmp_path / "sink")
    write_table(df.limit(5), out, mode="append")
    assert load_table(spark, out).count() == 5
    with pytest.raises(RuntimeError, match="Iceberg"):
        load_table(spark, "cat.db.t", fmt="iceberg")
    with pytest.raises(ValueError, match="unknown fmt"):
        load_table(spark, "x", fmt="orc")


def test_resize_images_plumbing(spark):
    from sketch_spark.pipeline.multimodal import resize_images, synth_media_df

    media = synth_media_df(spark, n=16)
    rows = resize_images(media, out_w=4, out_h=4).collect()
    assert len(rows) == 16
    for r in rows:
        assert len(r["pixels"]) == 16 and r["ok"]
        assert all(0.0 <= v <= 1.0 for v in r["pixels"])
    # deterministic
    rows2 = resize_images(synth_media_df(spark, n=16), out_w=4, out_h=4).collect()
    assert [r["pixels"] for r in rows] == [r["pixels"] for r in rows2]


def test_sample_frames_plumbing(spark):
    from sketch_spark.pipeline.multimodal import sample_frames, synth_media_df

    media = synth_media_df(spark, n=8)
    rows = sample_frames(media, n_frames=4, frame_bytes=8).collect()
    assert len(rows) == 8 * 4  # one row per (media, frame)
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
        assert len(bytes(r["frame"])) == 8 and r["n_frames"] == 4
    assert all(sorted(x["frame_idx"] for x in v) == [0, 1, 2, 3] for v in by_media.values())


def test_embedding_hot_bucket_guard_linear(spark):
    """A flood of identical vectors lands in one bucket of every table; the
    star guard must keep candidates O(n)."""
    from sketch_spark.pipeline.similarity import embedding_neardups

    rng = np.random.default_rng(4)
    v = rng.standard_normal(16).astype("float32")
    n = 600
    rows = [(i, [float(x) for x in v]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_neardups(df, threshold=0.99, n_planes=6, n_tables=4, max_bucket_size=64)
    assert got.count() == n - 1  # star: every non-min pairs once with the hub


def test_ivf_quantizer_and_cells(spark, emb_df):
    """Spherical k-means: deterministic for fixed (data, seed), unit-norm
    centroids, all cells live; distributed assignment matches a local
    argmax; empty-sample guard raises."""
    from sketch_spark.pipeline.similarity import ivf_cells, kmeans_centroids

    C = kmeans_centroids(emb_df, n_centroids=8, sample=512, seed=3)
    C2 = kmeans_centroids(emb_df, n_centroids=8, sample=512, seed=3)
    assert np.array_equal(C, C2)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    cells = {r["vec_id"]: r["cell"] for r in ivf_cells(emb_df, C).collect()}
    assert len(set(cells.values())) == 8
    rows = emb_df.where(F.col("vec_id") < 50).collect()
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        v /= np.linalg.norm(v)
        assert cells[r["vec_id"]] == int(np.argmax(v @ C.T))
    with pytest.raises(ValueError, match="sample"):
        kmeans_centroids(emb_df.limit(4), n_centroids=8)


def test_ivf_topk_full_probe_is_exact(spark, emb_df):
    """nprobe = n_centroids degenerates IVF to exact brute force — the
    correctness anchor for the candidate plumbing."""
    from sketch_spark.pipeline.similarity import brute_force_topk, ivf_topk, kmeans_centroids

    rows = emb_df.where(F.col("vec_id") < 2).collect()
    qv = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qi = np.array([r["vec_id"] for r in rows])
    C = kmeans_centroids(emb_df, n_centroids=8, sample=512, seed=3)
    exact = {(r["query_id"], r["vec_id"], r["rank"]) for r in brute_force_topk(emb_df, qv, qi, k=5).collect()}
    full = {(r["query_id"], r["vec_id"], r["rank"]) for r in ivf_topk(emb_df, C, qv, qi, k=5, nprobe=8).collect()}
    assert exact == full


def test_ivf_refine_fixes_skewed_sample(spark):
    """Distributed Lloyd refinement (kmeans_refine) vs sample-only init on a
    corpus whose HEAD is a single cluster — the exact failure mode the
    driver-sample quantizer has at 100× (limit(sample) lands on one shard
    of a partition-ordered corpus). Asserts: (a) the spherical-k-means
    objective (mean max-cosine) strictly improves, (b) the mega-cell
    deflates (better cell balance → real IVF pruning), (c) ivf_topk recall
    vs brute force does not regress, and (d) refine_iters=0 is a no-op
    passthrough of the sample-only centroids."""
    from sketch_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_cells,
        ivf_topk,
        kmeans_centroids,
        kmeans_refine,
    )

    rng = np.random.default_rng(42)
    d, per = 16, 300
    vecs, order_first = [], []
    # cluster c = axis e_{2c} + noise; cluster 0 occupies the corpus head
    for c in range(4):
        base = np.zeros(d)
        base[2 * c] = 1.0
        pts = base + 0.05 * rng.standard_normal((per, d))
        (order_first if c == 0 else vecs).append(pts)
    X = np.vstack(order_first + vecs)
    rows = [(i, X[i].astype(float).tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(4).cache()

    def objective(C):
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return float(np.max(Xn @ C.T, axis=1).mean())

    C_sample = kmeans_centroids(df, n_centroids=4, sample=per, seed=3)
    assert np.array_equal(
        kmeans_centroids(df, n_centroids=4, sample=per, seed=3, refine_iters=0), C_sample
    )
    C_ref = kmeans_refine(df, C_sample, iters=4)
    assert np.allclose(np.linalg.norm(C_ref, axis=1), 1.0)
    assert objective(C_ref) > objective(C_sample) + 0.01

    def max_cell(C):
        cells = [r["cell"] for r in ivf_cells(df, C).collect()]
        return max(np.bincount(cells, minlength=4))

    # sample-only cells are imbalanced (all centroids sit inside the head
    # cluster, far clusters land by noise ties); refined cells settle to
    # one-cluster-per-cell balance
    assert max_cell(C_sample) > per + 30
    assert max_cell(C_ref) <= per + 30
    assert max_cell(C_ref) < max_cell(C_sample)

    qv = np.stack([X[0], X[per], X[2 * per], X[3 * per]])
    qi = np.array([0, per, 2 * per, 3 * per])
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(df, qv, qi, k=5).collect()}

    def recall(C):
        got = {(r["query_id"], r["vec_id"]) for r in ivf_topk(df, C, qv, qi, k=5, nprobe=1).collect()}
        return len(got & exact) / len(exact)

    r_sample, r_ref = recall(C_sample), recall(C_ref)
    assert r_ref >= r_sample
    assert r_ref >= 0.9  # refined nprobe=1 resolves each planted cluster
    df.unpersist()


def test_tensor_moments_by_key_matches_local(spark, emb_df):
    """Distributed per-label tensor-moment sketches == a local single-pass
    build per label (merge linearity through the two-phase Spark path),
    and the estimated cross-label Gram energy tracks the exact
    Σᵢⱼ⟨xᵢ,yⱼ⟩² within the collision envelope."""
    from sketch_spark.pipeline.similarity import tensor_moments_by_key
    from sketch_spark.sketches.base import from_bytes
    from sketch_spark.sketches.rnla import TensorSketch

    out = tensor_moments_by_key(
        emb_df.repartition(8), "label", d=64, d_out=2048, degree=2, ns=4, seed=11
    )
    assert dict(out.dtypes)["label"] == "int"
    states = {r["label"]: from_bytes(bytes(r["state"])) for r in out.collect()}
    rows = emb_df.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    assert set(states) == set(by_label)
    X0 = np.array(by_label[0], dtype=np.float64)
    local0 = TensorSketch(d=64, d_out=2048, degree=2, ns=4, seed=11).update(X0)
    assert np.allclose(states[0].table, local0.table, rtol=1e-9, atol=1e-9)
    X1 = np.array(by_label[1], dtype=np.float64)
    exact = float(((X0 @ X1.T) ** 2).sum())
    assert states[0].dot(states[1]) == pytest.approx(exact, rel=0.25)


def test_decoder_backend_dispatch(spark):
    """The decode swap point dispatches on Pillow availability: whichever
    backend is active must drive extract_features end-to-end. In this
    container Pillow is absent (installs out of policy), so the stub path
    is the one exercised; on a cluster with Pillow the same test exercises
    the real path."""
    from sketch_spark.pipeline.multimodal import (
        decode_feature,
        decoder_backend,
        fake_decode,
    )

    backend = decoder_backend()
    assert backend in ("pillow", "stub")
    payload = bytes(range(64))
    feat = decode_feature(payload, dim=8)
    assert feat.shape == (8,)
    if backend == "stub":
        assert np.allclose(feat, fake_decode(payload, 8))
    df = synth_media_df(spark, n=16)
    out = extract_features(df, dim=8).collect()
    assert len(out) == 16 and all(r["ok"] for r in out)


def test_wav_decode_real_roundtrip():
    """The audio path is REAL in this container (stdlib wave): a synthesized
    16-bit sine WAV must decode to the exact sample count/rate, RMS
    amp/sqrt(2), zcr 2f/sr, and put all band energy at the tone's band."""
    from sketch_spark.pipeline.multimodal import audio_features, synth_wav_bytes, wav_decode

    sr, secs = 8000, 0.25
    b = synth_wav_bytes(1200.0, sr=sr, seconds=secs, amp=0.5)
    x, got_sr = wav_decode(b)
    assert got_sr == sr and len(x) == int(sr * secs)
    f = audio_features(x, got_sr, n_bands=8)
    assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    assert f["zcr"] == pytest.approx(2 * 1200 / sr, rel=0.05)
    # 1200 Hz → band floor(1200 / (nyquist/8)) = floor(1200/500) = 2
    assert int(np.argmax(f["band_energy"])) == 2
    assert sum(f["band_energy"]) == pytest.approx(1.0, abs=1e-5)


def test_wav_decode_downmix_and_8bit():
    from sketch_spark.pipeline.multimodal import wav_decode
    import io
    import wave

    # stereo 16-bit: L = +0.25, R = -0.25 constant → downmix ≈ 0
    pcm = np.empty(200, dtype=np.int16)
    pcm[0::2] = int(0.25 * 32767)
    pcm[1::2] = -int(0.25 * 32767)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    x, sr = wav_decode(buf.getvalue())
    assert sr == 16000 and len(x) == 100
    assert np.allclose(x, 0.0, atol=1e-4)
    # 8-bit unsigned silence at the 128 midpoint → all zeros
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128] * 64))
    x, _ = wav_decode(buf.getvalue())
    assert np.allclose(x, 0.0)


def test_extract_audio_features_mixed_backends(spark):
    """One DataFrame mixing real WAV payloads and opaque bytes: WAV rows
    must come back backend='wave' with true sample counts, non-WAV rows
    fall back to the stub with the same schema."""
    from sketch_spark.pipeline.multimodal import (
        AUDIO_SCHEMA,
        extract_audio_features,
        synth_wav_bytes,
    )

    rows = []
    for i in range(4):
        rows.append((i, bytearray(synth_wav_bytes(400.0 * (i + 1), sr=8000)), "audio/wav", 0, 0, 8000))
    rows.append((99, bytearray(b"not a wav at all" * 8), "application/octet-stream", 0, 0, 0))
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string, width int, height int, sample_rate int"
    )
    out = {r["media_id"]: r for r in extract_audio_features(df, n_bands=8).collect()}
    assert len(out) == 5
    for i in range(4):
        r = out[i]
        assert r["backend"] == "wave"
        assert r["n_samples"] == 2000 and r["sample_rate"] == 8000
        assert r["duration"] == pytest.approx(0.25)
        # tone at 400(i+1) Hz → band floor(freq/500)
        assert int(np.argmax(r["band_energy"])) == int(400 * (i + 1) // 500)
    assert out[99]["backend"] == "stub"
    assert len(out[99]["band_energy"]) == 8


def test_compress_embeddings_preserves_cosine_and_top1(spark, emb_df):
    """CountSketch embedding compression (rnla.h cs_compress on dense
    rows): 64 → 32 dims must keep pairwise cosines within the JL-style
    noise envelope and keep each vector its own top-1 under the UNCHANGED
    brute-force operator running on the compressed column."""
    from sketch_spark.pipeline.similarity import (
        brute_force_topk,
        compress_embeddings,
        cs_projection_matrix,
    )

    comp_df = compress_embeddings(emb_df, d_out=16, ns=2, seed=7)
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in comp_df.limit(200).collect()}
    orig = {r["vec_id"]: np.array(r["embedding"]) for r in emb_df.limit(200).collect()}
    ids = sorted(set(rows) & set(orig))[:40]
    # compressed dimension is ns*d_out
    assert all(len(rows[i]) == 32 for i in ids)

    def cos(u, v):
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-30))

    errs = [
        abs(cos(rows[a], rows[b]) - cos(orig[a], orig[b]))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 : ai + 4]
    ]
    # var ~ 2/(ns*d_out) per pair → sd ~ 0.25; mean abs err well under that
    assert np.mean(errs) < 0.25 and np.max(errs) < 0.8

    # transform equals the csvec sketch's own hashing (shared derivation)
    s = cs_projection_matrix(4, 8, ns=1, seed=3)
    from sketch_spark.sketches.rnla import CSVector

    t = CSVector(d_out=8, ns=1, seed=3)
    x = np.array([1.0, -2.0, 3.0, 0.5])
    manual = np.zeros(8)
    b, sg = t._bucket_sign(np.arange(4, dtype=np.uint64), 0)
    np.add.at(manual, b, sg * x)
    assert np.allclose(x @ s, manual)

    # self-recall on the compressed column through the unchanged operator
    qids = np.array(ids[:5])
    qvecs = np.stack([rows[i] for i in qids])
    got = brute_force_topk(comp_df, qvecs, qids, k=1).collect()
    assert {(r["query_id"], r["vec_id"]) for r in got} == {(int(i), int(i)) for i in qids}


def test_simhash_hamming_k0_exact_duplicates(spark):
    """k=0 (exact-signature duplicates, one 64-bit segment) must not crash
    on the full-width mask and must pair only identical signatures."""
    from sketch_spark.pipeline.dedup import simhash_hamming_pairs

    rows = [(1, 7), (2, 7), (3, -5), (4, -5), (5, 9)]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_hamming_pairs(sigs, k=0).collect()}
    assert got == {(1, 2): 0, (3, 4): 0}


def test_tensor_moments_null_key_group(spark):
    """Null group keys form their own group (the sketch_by_key contract),
    not silently dropped."""
    from sketch_spark.pipeline.similarity import tensor_moments_by_key
    from sketch_spark.sketches.base import from_bytes

    rows = [(None, [1.0, 0.0]), (None, [0.0, 1.0]), ("a", [1.0, 1.0])]
    df = spark.createDataFrame(rows, "grp string, embedding array<float>")
    out = tensor_moments_by_key(df, "grp", d=2, d_out=64, degree=2, ns=2)
    states = {r["grp"]: from_bytes(bytes(r["state"])) for r in out.collect()}
    assert set(states) == {None, "a"}
    # null group saw 2 unit vectors: self energy = sum_ij <xi,xj>^2 = 2
    assert states[None].frobenius_energy() == pytest.approx(2.0, rel=0.3)


def test_kmeans_reseeds_empty_clusters_distinctly(spark):
    """More centroids than natural clusters: reseeding must not duplicate
    centroid rows (distinct worst-fit points, not one argmin for all)."""
    from sketch_spark.pipeline.similarity import kmeans_centroids

    rng = np.random.default_rng(0)
    tight = np.vstack([
        rng.normal([5, 0, 0], 0.01, size=(40, 3)),
        rng.normal([0, 5, 0], 0.01, size=(40, 3)),
    ])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(tight)],
        "vec_id long, embedding array<float>",
    )
    C = kmeans_centroids(df, n_centroids=8, sample=80, iters=6, seed=1)
    assert len({tuple(np.round(c, 9)) for c in C}) == 8
