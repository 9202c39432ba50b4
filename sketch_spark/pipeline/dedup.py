"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design notes (100 TB / 1000 executors):
  * exact dedup: one shuffle on the fingerprint — Catalyst's hash
    aggregation with map-side partial combine; no driver state.
  * MinHash-LSH near-dup: signatures computed per-row inside a single
    mapInArrow pass (vectorized NumPy, no per-row Python), then candidate
    pairs come from a self-equi-join on (band_id, band_hash) — a co-located
    shuffle join on a compact key, never an O(n²) crossJoin. Banding theory:
    P(candidate) = 1 - (1 - s^r)^b for Jaccard s, r rows/band, b bands.
  * SimHash: 64-bit signature; near-dups = equal signature buckets (or
    Hamming ≤ k via rotations — k rotations × 1 join each).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from sketch_spark.hashing import splitmix64, wanghash
from sketch_spark.pipeline.buckets import guarded_bucket_pairs
from sketch_spark.pipeline.text import with_fingerprint

_U64 = np.uint64


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per normalized-text fingerprint (min id wins —
    deterministic). One hash-shuffle; survives any scale."""
    fp = with_fingerprint(df, text_col)
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, ["fingerprint", id_col], "inner").drop("fingerprint")


def dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_docs, n_distinct, n_dup_docs) under normalized-text equality."""
    fp = with_fingerprint(df, text_col)
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_distinct"),
        (F.count("*") - F.countDistinct("fingerprint")).alias("n_dup_docs"),
    )


# ---------------- MinHash signatures + LSH banding ---------------------------


def _char_shingles_flat(texts, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashed character shingles for a whole batch of documents at once.

    Returns (flat_hashes uint64, starts int64) where doc i's shingles are
    ``flat[starts[i]:starts[i+1]]``. No per-document Python in the math:
    all docs are concatenated (zero-padded by `width` bytes between docs so
    no window — including a short/empty doc's single window — crosses a
    boundary), the rolling polynomial hash is one windowed matmul over the
    whole blob, and per-doc window index ranges come from a segmented
    arange. Docs shorter than the window get one shingle (their
    zero-padded window) so every doc has ≥ 1, and that window reads only
    the doc's own bytes + its padding, never the next doc (a short doc of
    length L has L + width bytes before the next doc starts)."""
    enc = [t.encode("utf-8") if t else b"" for t in texts]
    pad = b"\x00" * width
    # trailing width zeros guarantee every window index is in range even for
    # empty/short final docs
    blob = np.frombuffer(pad.join(enc) + b"\x00" * width, dtype=np.uint8)
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(lens[:-1] + width)])
    counts = np.maximum(lens - width + 1, 1)
    starts = np.concatenate([[0], np.cumsum(counts)])
    total = int(starts[-1])
    # segmented arange: window offset within each doc
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], counts)
    pos = np.repeat(doc_starts, counts) + intra
    pows = np.power(_U64(257), np.arange(width, dtype=np.uint64), dtype=np.uint64)
    blob64 = blob.astype(np.uint64)
    vals = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):  # width (~5) strided gathers beat a u64 matmul
            vals += blob64[pos + j] * pows[j]
    return wanghash(vals), starts


def _char_shingles(texts: np.ndarray, width: int) -> list[np.ndarray]:
    """Per-doc view of the batch shingle hashes (compat helper)."""
    flat, starts = _char_shingles_flat(texts, width)
    return [flat[starts[i] : starts[i + 1]] for i in range(len(texts))]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_width: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>) — per-doc MinHash signature over char shingles.

    One vectorized pass: for each doc, sig_i = min over shingles of
    (a_i * h + b_i mod 2^64) — the classic affine hash family, computed as a
    (num_hashes × n_shingles) NumPy broadcast per document batch.
    """
    a = splitmix64(seed, num_hashes) | _U64(1)  # odd multipliers
    b = splitmix64(seed ^ 0xABCD, num_hashes)

    def sign(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col)).to_numpy(zero_copy_only=False)
            if len(texts) == 0:
                continue
            flat, starts = _char_shingles_flat(texts, shingle_width)
            n_docs = len(texts)
            sig = np.empty((n_docs, num_hashes), dtype=np.uint64)
            seg = starts[:-1]
            with np.errstate(over="ignore"):
                # one vectorized pass per hash function over ALL shingles,
                # per-doc min via a segmented reduction — no per-doc Python
                for j in range(num_hashes):
                    sig[:, j] = np.minimum.reduceat(a[j] * flat + b[j], seg)
            flat_sig = sig.reshape(-1).astype(np.int64)  # two's-complement for bigint
            offsets = pa.array(np.arange(n_docs + 1, dtype=np.int32) * num_hashes)
            arr = pa.ListArray.from_arrays(offsets, pa.array(flat_sig, pa.int64()))
            yield pa.RecordBatch.from_arrays([ids, arr], names=[id_col, "sig"])

    id_type = dict(df.dtypes)[id_col]
    src = df.select(id_col, text_col)
    # signature work is CPU-bound per doc: spread single-file inputs over the
    # cluster before the Arrow exchange
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInArrow(sign, f"{id_col} {id_type}, sig array<bigint>")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 8,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH — a self-join on band buckets.

    Explode each signature into `bands` (band_id, band_hash) keys, then
    equi-join bucket members. The join key is a single 64-bit hash of
    (band_id, band rows), so this is a plain shuffle join Catalyst can plan;
    at 100 TB the bucket join replaces the impossible O(n²) similarity matrix.

    Hot-bucket guard: a web crawl routinely has 10k+ byte-identical docs,
    which land in the same bucket in EVERY band — an unguarded self-join
    emits ~n²/2 pairs per band from that one bucket and kills the job at
    scale. Buckets larger than `max_bucket_size` therefore switch from
    all-pairs to a star pattern: each member pairs only with the bucket's
    minimum id (linear in bucket size). The star keeps every member
    connected to a representative, which is exactly what connected-component
    dedup needs; only direct non-representative pairs inside oversized
    buckets are elided (they remain reachable through the hub). Running
    :func:`exact_dedup` first is the documented pre-step that keeps
    byte-identical floods out of LSH entirely.

    CONTRACT NOTE — the guard changes the pair semantics: above
    `max_bucket_size` the output is a SUBSET of the true candidate pairs
    (hub→member only). That is exactly what connected-component resolution
    needs (:func:`connected_components` / :func:`neardup_dedup`), but a
    caller consuming pairs directly gets incomplete member↔member pairs
    under identical-doc floods — and if a hub pair later fails a Jaccard
    threshold filter, member↔member connectivity is lost with it. Pass
    ``max_bucket_size=None`` to disable the guard and get exact all-pairs
    buckets (O(bucket²) — only safe after exact dedup or on bounded data).
    """
    band_exprs = [
        # single 64-bit key folding band_id into the hash — one long column
        # shuffles cheaper than a (int, long) struct; xxhash64 consumes the
        # array slice directly (the old cast-to-string round-trip was ~8
        # string materializations per doc for nothing)
        F.xxhash64(
            F.lit(i), F.slice("sig", i * rows_per_band + 1, rows_per_band)
        ).alias(f"bh{i}")
        for i in range(bands)
    ]
    exploded = sigs.select(id_col, F.explode(F.array(*band_exprs)).alias("bh"))
    if max_bucket_size is None:
        l = exploded.alias("l")
        r = exploded.alias("r")
        return (
            l.join(r, "bh")
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
            .distinct()
        )
    # skew-safe guard: bucket stats via groupBy+join-back (see buckets.py for
    # why not Window.partitionBy — a mega-bucket would funnel through 1 task)
    return guarded_bucket_pairs(exploded, ["bh"], id_col, max_bucket_size).distinct()


def signature_jaccard(sigs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal signature
    slots (zip_with, JVM-side)."""
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size("sig_a"),
        )
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_lsh_neardups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 128,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """End-to-end near-duplicate pairs at estimated Jaccard ≥ threshold.

    At corpus scale, run :func:`exact_dedup` FIRST: byte-identical document
    floods (the common web-crawl case) otherwise form giant LSH buckets.
    The `max_bucket_size` star-pairing guard in :func:`lsh_candidate_pairs`
    keeps candidate growth linear even without the pre-step, but exact
    dedup is cheaper (one hash shuffle) and removes the flood outright.

    Under the guard the result is a SUBSET of true near-dup pairs for
    buckets above `max_bucket_size` (hub→member only; and a hub pair that
    fails the threshold drops its members' connectivity too) — complete for
    connected-component dedup (:func:`neardup_dedup`), incomplete for
    direct pair consumers. ``max_bucket_size=None`` restores exact
    all-pairs semantics at O(bucket²) cost."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes=num_hashes, seed=seed)
    sigs = sigs.persist()
    sigs.count()  # materialize before the self-join: otherwise both join
    # sides race to compute the signature stage and it runs twice
    pairs = lsh_candidate_pairs(
        sigs, id_col, bands=bands, rows_per_band=num_hashes // bands,
        max_bucket_size=max_bucket_size,
    )
    return signature_jaccard(sigs, pairs, id_col).where(F.col("est_jaccard") >= threshold)


# ---------------- SimHash ------------------------------------------------------


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_width: int = 5
) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of shingle hashes."""

    def sign(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col)).to_numpy(zero_copy_only=False)
            if len(texts) == 0:
                continue
            flat, starts = _char_shingles_flat(texts, shingle_width)
            seg = starts[:-1]
            counts = np.diff(starts)
            sig = np.zeros(len(texts), dtype=np.uint64)
            with np.errstate(over="ignore"):
                # per-bit: segmented popcount over all shingles, majority vote
                for bit in range(64):
                    ones = np.add.reduceat((flat >> _U64(bit)) & _U64(1), seg)
                    sig |= (2 * ones > counts).astype(np.uint64) << _U64(bit)
            out = sig.astype(np.int64)
            yield pa.RecordBatch.from_arrays([ids, pa.array(out, pa.int64())], names=[id_col, "simhash"])

    id_type = dict(df.dtypes)[id_col]
    src = df.select(id_col, text_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInArrow(sign, f"{id_col} {id_type}, simhash bigint")


def simhash_neardups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Pairs with identical SimHash (bucket join). For Hamming distance ≤ k
    use :func:`simhash_hamming_neardups`.

    Same hot-bucket guard as :func:`lsh_candidate_pairs`: buckets above
    `max_bucket_size` use star pairing against the bucket-min id so a flood
    of identical docs yields O(n) pairs, not O(n²) — i.e. the output is a
    SUBSET of true same-signature pairs for oversized buckets (complete for
    connected-component consumers). ``max_bucket_size=None`` disables the
    guard for exact-pair consumers."""
    sigs = simhash_signatures(df, text_col, id_col)
    if max_bucket_size is None:
        l = sigs.alias("l")
        r = sigs.alias("r")
        return (
            l.join(r, "simhash")
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        )
    return guarded_bucket_pairs(
        sigs.select(id_col, "simhash"), ["simhash"], id_col, max_bucket_size
    )


def simhash_hamming_neardups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Pairs whose 64-bit SimHash signatures differ in at most ``k`` bits —
    the standard web-crawl near-dup setting (Manku, Jain & Das Sarma,
    WWW'07, "Detecting near-duplicates for web crawling"; k ∈ {2,3}).

    Segment bucketing (the multi-table pigeonhole trick): split the 64-bit
    signature into ``k+1`` contiguous segments. Two signatures within
    Hamming distance k must agree EXACTLY on at least one segment (k flipped
    bits can dirty at most k of the k+1 segments), so candidates are the
    union over segments of same-(segment_id, segment_value) buckets — k+1
    compact-key equi-joins in one plan, never a cross product. Exact
    verification is then JVM-side: ``bit_count(sig_a ^ sig_b) <= k``.

    Candidate volume: a random 64-bit signature population of n docs spreads
    each ~⌈64/(k+1)⌉-bit segment over 2^16 values (k=3), so expected bucket
    size is n/65536 per segment — the same linear-growth profile as
    MinHash-LSH banding, and the same hot-bucket star guard applies (true
    identical-signature floods collapse to hub→member pairs; run
    :func:`exact_dedup` first to keep byte-identical floods out entirely).

    Returns (id_a, id_b, hamming). No reference counterpart (the reference
    has no SimHash; training-pipeline brief item) — the bar is the published
    algorithm.
    """
    sigs = simhash_signatures(df, text_col, id_col).persist()
    sigs.count()  # materialize once: the k+1 segment buckets + verify join all reuse it
    return simhash_hamming_pairs(sigs, id_col=id_col, k=k, max_bucket_size=max_bucket_size)


def simhash_hamming_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Hamming-≤k pair recovery over a precomputed (id, simhash) table —
    the signature-level core of :func:`simhash_hamming_neardups`, exposed
    so planted-bit-flip tests and signature-reusing callers skip the text
    pass. Semantics and scale notes in the wrapper's docstring; under the
    star guard, an oversized EXACT-signature bucket collapses to hub→member
    pairs (Hamming 0, always kept), matching the LSH guard contract.
    """
    if k < 0 or k > 16:
        raise ValueError("k must be in [0, 16]")
    n_seg = k + 1
    widths = [64 // n_seg + (1 if i < 64 % n_seg else 0) for i in range(n_seg)]
    offsets = [sum(widths[:i]) for i in range(n_seg)]
    def seg_bits(i: int):
        # k=0 → one 64-bit segment: the mask (1<<64)-1 would overflow a
        # Java long, and shift>>0 & full-mask is the identity anyway
        bits = F.shiftrightunsigned(F.col("simhash"), offsets[i])
        if widths[i] < 64:
            bits = bits.bitwiseAND(F.lit((1 << widths[i]) - 1))
        return bits

    seg_exprs = [
        # fold (segment_id, segment_bits) into one 64-bit key — same
        # compact-key shuffle shape as lsh_candidate_pairs' band hash
        F.xxhash64(F.lit(i), seg_bits(i)).alias(f"seg{i}")
        for i in range(n_seg)
    ]
    membership = sigs.select(id_col, F.explode(F.array(*seg_exprs)).alias("seg"))
    if max_bucket_size is None:
        l = membership.alias("l")
        r = membership.alias("r")
        cand = (
            l.join(r, "seg")
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
            .distinct()
        )
    else:
        cand = guarded_bucket_pairs(membership, ["seg"], id_col, max_bucket_size).distinct()
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .where(F.col("hamming") <= k)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


# ---------------- near-dup group resolution (pairs → components → keep) ------


def connected_components(
    pairs: DataFrame,
    max_iters: int = 25,
    rounds_out: list | None = None,
) -> DataFrame:
    """Resolve near-dup pair edges into duplicate groups: (id, component)
    where ``component`` is the minimum id in the vertex's connected
    component. The last step of every real dedup — LSH emits *pairs*
    (A≈B, B≈C); "which docs do I keep" needs the transitive closure.

    Algorithm: iterative min-label propagation with pointer jumping.
    Each round every vertex takes the min label over itself and its
    neighbors (one shuffle join + one groupBy), then shortcuts
    ``label ← label(label)`` (one more self-join), which collapses chains
    logarithmically — a length-d path resolves in O(log d) rounds instead
    of O(d). Labels only decrease and are bounded below by the component
    min, so the fixpoint is exact. This is the standard Spark CC recipe
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    simplified to the label-propagation + shortcut form).

    Scale design (100 TB corpus): the edge set is the *near-dup pair*
    output — orders of magnitude smaller than the corpus — and every step
    is a key-partitioned join/groupBy AQE can replan. The hot-bucket star
    guard upstream (lsh_candidate_pairs) guarantees flood components
    arrive star-shaped, which this resolves in ONE round. Per-round
    ``localCheckpoint`` truncates the iterative lineage so the plan stays
    flat; on a real cluster with a checkpoint dir, swap for
    ``checkpoint()`` to also survive executor loss.

    Not in the reference (its similarity story ends at pairwise Jaccard,
    caldiskstest.cpp:38-45); required by the training-pipeline dedup brief.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        msgs = edges.join(labels.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "label"
        )
        new = labels.unionByName(msgs).groupBy("id").agg(F.min("label").alias("label"))
        # pointer jump: label ← label(label). Every label value is a vertex
        # id (labels start as ids and min() only selects existing ones), so
        # the lookup always hits; left+coalesce keeps it total regardless.
        hop = new.select(F.col("id").alias("label"), F.col("label").alias("_l2"))
        new = new.join(hop, "label", "left").select(
            "id", F.coalesce("_l2", "label").alias("label")
        )
        new = new.localCheckpoint()
        changed = (
            labels.withColumnRenamed("label", "_old")
            .join(new, "id")
            .where(F.col("_old") != F.col("label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    if rounds_out is not None:
        # instrumentation hook for convergence tests (rounds actually run,
        # including the final no-change confirmation round)
        rounds_out.append(rounds)
    edges.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def neardup_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 128,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 64,
    max_iters: int = 25,
) -> DataFrame:
    """End-to-end near-duplicate dedup: keep one document per near-dup
    GROUP (min id wins — deterministic), mirroring :func:`exact_dedup`'s
    contract. Pipeline: MinHash signatures → banded-LSH candidate pairs →
    signature-Jaccard threshold → connected components → anti-join losers.

    Docs in no near-dup pair keep themselves; docs in a component survive
    iff their id is the component minimum. One pass over the corpus for
    signatures; everything after operates on the (small) pair/label set.
    """
    pairs = minhash_lsh_neardups(
        df,
        text_col,
        id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
        max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    comp = connected_components(pairs, max_iters=max_iters).withColumnRenamed("id", id_col)
    return (
        df.join(comp, id_col, "left")
        .where(F.col("component").isNull() | (F.col("component") == F.col(id_col)))
        .drop("component")
    )


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exact word-n-gram Jaccard for given pairs — JVM-side array ops
    (the exact counterpart LSH approximates; use on candidate pairs only)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    g = df.select(F.col(id_col), grams.alias("grams"))
    ga = g.select(F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"))
    gb = g.select(F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return (
        pairs.join(ga, "id_a").join(gb, "id_b")
        .withColumn("jaccard", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)))
        .select("id_a", "id_b", "jaccard")
    )
