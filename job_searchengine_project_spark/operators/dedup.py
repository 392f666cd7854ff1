"""Deduplication operators for large-scale training-data pipelines.

Four families, each a (Spark DataFrame fn, ANSI-SQL oracle) pair over
the ``documents`` test table. All hash choices are md5/sha2-based so
the DuckDB oracle reproduces them bit-for-bit (xxhash would not be).

Scale notes (the part that matters at 100 TB):
- exact dedup is one hash-shuffle with map-side combine;
- MinHash+LSH is the scale path for near-dup: cost is O(docs x K
  hashes) map-side + a shuffle on (band, band_hash) buckets — never
  the O(n^2) pair space. Exact Jaccard verification touches only
  LSH candidates (banding makes the candidate set tiny);
- the all-pairs n-gram Jaccard op is the *correctness baseline* for
  LSH recall; it is quadratic by design and gated to small inputs;
- SimHash packs a doc into 60 bits; near-dup = small Hamming
  distance, joinable on bit-band prefixes (same LSH trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from job_searchengine_project_spark.iolayout import read_spread

# ---- shared tokenization (must match the SQL fragments verbatim) -----------

def TOKS():
    """Lazy: Column creation needs an active SparkContext."""
    return F.split(F.col("text"), " ")

_SQL_TOKS = "string_split(text, ' ')"


def _shingles(col_tokens) -> "F.Column":
    """Word 3-gram shingles: positions i..i+2 joined by one space.

    Guarded for <3 tokens: Spark's sequence(1, 0) would DESCEND
    (DuckDB's generate_series returns empty) — the when() keeps the
    two sides agreeing.
    """
    # slice-then-transform-with-index: ~5x faster than indexing via a
    # generated sequence (catalyst re-evaluates the tokens expression
    # per element_at on a sequence; the slice feeds elements directly)
    return F.when(
        F.size(col_tokens) >= 3,
        F.transform(
            F.slice(col_tokens, 1, F.size(col_tokens) - 2),
            lambda x, i: F.concat_ws(
                " ",
                x,
                F.element_at(col_tokens, i + 2),
                F.element_at(col_tokens, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# NB: references a CTE column named `ts` (the token list); every SQL
# using this fragment first computes `ts` via _SQL_TOKS.
_SQL_SHINGLES = (
    "list_transform(generate_series(1, greatest(len(ts) - 2, 0)), "
    "i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])"
)


# ---- 1. exact dedup ----------------------------------------------------------

def dedup_exact(spark, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over a corpus with planted duplicates.

    The input is documents UNION a shifted copy of its first 100 docs
    (deterministic planted dups). Output: one canonical row per
    distinct text: (content_hash, canonical_id, n_dups).
    Reference analog: msgid SADD dedup (collector/collector.py:149-187)
    as a hash-shuffle groupBy instead of a Redis set.
    """
    # plain read: one sha2 per row is cheaper than the spread
    # shuffle (A/B'd at sf1.0 — the groupBy repartitions anyway)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = docs.filter(F.col("doc_id") < 100).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    both = docs.unionByName(dup)
    return (
        both.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("canonical_id")
    )


DEDUP_EXACT_SQL = """
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 100
)
SELECT sha256(text) AS content_hash,
       min(doc_id) AS canonical_id,
       count(*) AS n_dups
FROM unioned
GROUP BY sha256(text)
HAVING count(*) > 1
ORDER BY canonical_id
"""


# ---- 2. MinHash + LSH near-dup ----------------------------------------------

MINHASH_K = 12
LSH_BANDS = 4  # 3 rows per band
JACCARD_THRESHOLD = 0.8


def dedup_minhash_lsh(spark, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs, exact-Jaccard verified.

    shingle -> K minhashes -> band buckets (md5 of the band's hashes)
    -> bucket self-join for candidates -> exact Jaccard over distinct
    shingle sets -> keep >= 0.8. Output (doc_a, doc_b, jaccard).

    Plan shape: signatures are computed entirely MAP-SIDE as per-doc
    array expressions — sig[i] = array_min over the doc's shingle ids
    of md5(i#h), identical values to a min over the corpus-wide
    distinct-shingle table (min over a multiset == min over its set;
    likewise array_intersect/array_union dedup their inputs, so the
    exact-Jaccard step needs no per-doc distinct either) — the old
    explode->distinct->join->fold pipeline (two full shuffles of the
    shingle rows plus an interpreted per-doc fold) collapses to zero
    shuffles before the tiny band self-join. The shingle-less-doc
    gate is the CHEAP token-count predicate (pushable to the scan
    without dragging the md5 tree below the exchange — a size(ss)
    filter was being pushed under the repartition and re-evaluated
    the whole shingle expression serially). The per-doc shingle-id
    table and the band table are localCheckpoint'ed once per
    invocation so the self-join sides and both verify sides reuse
    them instead of re-deriving the md5 transforms 2-4x. (Trade
    documented: map-side recomputes duplicate shingles' md5s — K
    hashes per shingle INSTANCE instead of per distinct shingle — in
    exchange for removing two corpus-wide shuffles; the md5s are
    embarrassingly parallel while the shuffles are the bottleneck.)
    """
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # (doc_id, ss): 16-hex shingle ids per doc — the one derived
    # table every later step (bands, both verify sides) reads.
    # < 3 tokens -> no shingles -> never banded (same as before).
    base = (
        docs.filter(F.size(TOKS()) >= 3)
        .withColumn("toks", TOKS())
        .select(
            "doc_id",
            F.transform(
                _shingles(F.col("toks")),
                lambda sgl: F.substring(F.md5(sgl), 1, 16),
            ).alias("ss"),
        )
        .localCheckpoint()
    )
    # signature stage (r6 batch 3): the K minhashes were computed as
    # nested higher-order transforms — K md5s per shingle INSTANCE in
    # *interpreted* Catalyst lambdas (HOFs are CodegenFallback), the
    # dominant wall-clock of the whole query. Exploding the (already
    # hashed) shingle ids off the checkpointed base and projecting the
    # K md5s as ordinary codegen expressions + K map-side-combined
    # min() aggregates computes the IDENTICAL values (min over the
    # exploded multiset == array_min over the array; string min uses
    # the same binary comparator) with whole-stage codegen doing the
    # hashing and only (doc_id, K x 16-hex) partials crossing the one
    # small exchange. Band hashes then derive map-side from the K
    # columns (concat_ws over the 3 columns == concat_ws over the
    # array slice).
    rows_per_band = MINHASH_K // LSH_BANDS
    sh = base.select("doc_id", F.explode("ss").alias("h"))
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.md5(F.concat(F.lit(f"{i}#"), F.col("h"))), 1, 16)
            ).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"m{b * rows_per_band + j}") for j in range(rows_per_band)]
            )
        )
        for b in range(LSH_BANDS)
    ]
    bands = (
        mh.select("doc_id", F.posexplode(F.array(*band_cols)).alias("band", "bh"))
        .localCheckpoint()  # both self-join sides read it; sig computed once
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), (F.col("x.band") == F.col("y.band")) & (F.col("x.bh") == F.col("y.bh")))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return (
        cand.join(base.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa")), "doc_a")
        .join(base.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_MINHASH_SQL = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS ts FROM documents),
sh AS (SELECT DISTINCT doc_id, substr(md5(unnest({_SQL_SHINGLES})), 1, 16) AS s FROM toks),
sig AS (
  SELECT doc_id, i, min(substr(md5(i::VARCHAR || '#' || s), 1, 16)) AS mh
  FROM sh, range({MINHASH_K}) t(i) GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, (i // {MINHASH_K // LSH_BANDS})::INT AS band,
         md5(string_agg(mh, '|' ORDER BY i)) AS bh
  FROM sig GROUP BY doc_id, (i // {MINHASH_K // LSH_BANDS})::INT
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
  WHERE x.doc_id < y.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
  GROUP BY c.doc_a, c.doc_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT c.doc_a, c.doc_b,
       round(coalesce(i.n_inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.n_inter, 0)), 4) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE round(coalesce(i.n_inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.n_inter, 0)), 4) >= {JACCARD_THRESHOLD}
ORDER BY c.doc_a, c.doc_b
"""


# ---- 3. exact all-pairs n-gram Jaccard (LSH recall baseline) -----------------

def dedup_ngram_jaccard(spark, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs by 3-gram-shingle Jaccard >= 0.8.

    Quadratic-in-candidates by design — the correctness baseline that
    measures LSH recall. The join is on shared shingles (inverted-
    index style), not a blind cross join, so only docs sharing at
    least one shingle pair up.
    """
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sh = (
        docs.withColumn("ss", TOKS())
        .select("doc_id", F.explode(_shingles(F.col("ss"))).alias("s"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_NGRAM_SQL = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS ts FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({_SQL_SHINGLES}) AS s FROM toks),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT doc_a, doc_b,
       round(n_inter::DOUBLE / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter::DOUBLE / (sa.n + sb.n - n_inter), 4) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---- 4. SimHash --------------------------------------------------------------

SIMHASH_BITS = 60  # two 30-bit halves keep all SQL arithmetic in BIGINT range


def dedup_simhash(spark, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc over distinct tokens, md5-derived bits.

    bit_j(token) = j-th bit of the token's md5 (4 bits per hex char);
    signature bit j = majority sign of sum over tokens of (2*bit-1).
    Output (doc_id, simhash_hi, simhash_lo): bits 30-59 / 0-29.

    Plan shape: the signature is pure per-doc math (sum of the doc's
    DISTINCT tokens' md5-derived ±1 bit vectors — integer sums, so
    order-free and exact), so it runs entirely MAP-SIDE in one
    vectorized Arrow kernel: tokens dedup per doc in the kernel,
    digests unpack to bit matrices with numpy, no token explode, no
    corpus-wide distinct shuffle, no vocabulary join. bit_j(token) is
    the j-th bit of md5(token) MSB-first — numerically identical to
    the hex-nibble arithmetic the SQL oracle spells out. (The old
    explode->distinct->join->sum plan paid two shuffles of the token
    rows; the md5 recomputation for repeated tokens is embarrassingly
    parallel and far cheaper than the shuffles at any scale.)
    """
    import pandas as pd

    docs = read_spread(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def _simhash_kernel(batches):
        import hashlib

        import numpy as np

        weights = 1 << np.arange(SIMHASH_BITS, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # batch-level vectorization (r6): md5 each DISTINCT token
            # of the whole batch once (Zipfian text shares most tokens
            # across docs — ~40x fewer digests than per-doc hashing),
            # then scatter-add the ±1 bit vectors back per doc with
            # reduceat. Integer sums are order-free, so the per-doc
            # totals — and every emitted signature bit — are identical
            # to the per-doc loop.
            tok_sets = [
                sorted(set((t or "").split(" "))) for t in pdf["text"]
            ]
            counts = np.fromiter(
                (len(s) for s in tok_sets), dtype=np.int64, count=len(tok_sets)
            )
            flat = [t for s in tok_sets for t in s]
            uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
            digest = b"".join(
                hashlib.md5(t.encode("utf-8")).digest()[:8] for t in uniq
            )
            arr = np.frombuffer(digest, dtype=np.uint8).reshape(-1, 8)
            # md5 hex chars are the digest's nibbles MSB-first, so
            # bit j == unpacked bit j of the raw digest
            bits_u = np.unpackbits(arr, axis=1)[:, :SIMHASH_BITS]
            contrib = bits_u.astype(np.int64) * 2 - 1
            offsets = np.zeros(len(tok_sets), dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            sums = np.add.reduceat(contrib[inv], offsets, axis=0)
            sums[counts == 0] = 0  # reduceat repeats rows on empty slices
            packed = (sums > 0) * weights[None, :]
            his = (packed[:, 30:60].sum(axis=1) >> 30).astype(np.int64)
            los = packed[:, :30].sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash_hi": his, "simhash_lo": los}
            )

    return docs.mapInPandas(
        _simhash_kernel, schema="doc_id long, simhash_hi long, simhash_lo long"
    ).orderBy("doc_id")


DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest({_SQL_TOKS}) AS t(tok)
),
bits AS (
  SELECT doc_id, j,
         CASE WHEN sum(
           (((strpos('0123456789abcdef', substr(md5(tok), (j // 4)::INT + 1, 1)) - 1)
             >> (3 - (j % 4))::INT) % 2) * 2 - 1
         ) > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS b
  FROM tok, range({SIMHASH_BITS}) t(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       sum(CASE WHEN j >= 30 THEN b << (j - 30)::INT ELSE 0 END)::BIGINT AS simhash_hi,
       sum(CASE WHEN j < 30 THEN b << j::INT ELSE 0 END)::BIGINT AS simhash_lo
FROM bits GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
}


# ---- 5. SimHash Hamming near-dup join ----------------------------------------

HAMMING_MAX = 6
SIMHASH_BANDS = 8  # 4 bands per 30-bit half, widths 8/8/7/7
# per-half band layout: (bit offset within the half, modulus = 2^width).
# 8 bands over 60 bits guarantee by pigeonhole that any pair within
# Hamming distance 7 (> HAMMING_MAX = 6) shares at least one unflipped
# band — the banding recall guarantee strictly covers the contract.
_BAND_LAYOUT = [(0, 256), (8, 256), (16, 128), (23, 128)]


def _band_val_spark() -> str:
    cases = []
    for i, (off, mod) in enumerate(_BAND_LAYOUT):
        cases.append(f"WHEN band = {i} THEN shiftright(simhash_lo, {off}) % {mod}")
        cases.append(f"WHEN band = {i + 4} THEN shiftright(simhash_hi, {off}) % {mod}")
    return "CASE " + " ".join(cases) + " END"


def _band_val_duckdb(lo: str = "lo", hi: str = "hi") -> str:
    cases = []
    for i, (off, mod) in enumerate(_BAND_LAYOUT):
        cases.append(f"WHEN band = {i} THEN ({lo} >> {off}) % {mod}")
        cases.append(f"WHEN band = {i + 4} THEN ({hi} >> {off}) % {mod}")
    return "CASE " + " ".join(cases) + " END"


def hamming_band_pairs(sig: DataFrame) -> DataFrame:
    """Banded candidate join + exact Hamming filter over a signature
    DataFrame (doc_id, simhash_hi, simhash_lo). Factored out so the
    pigeonhole guarantee is unit-testable on planted signatures."""
    bands = sig.select(
        "doc_id", "simhash_hi", "simhash_lo",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn("band_val", F.expr(_band_val_spark()))
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash_hi").alias("ha"), F.col("x.simhash_lo").alias("la"),
            F.col("y.simhash_hi").alias("hb"), F.col("y.simhash_lo").alias("lb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr("bit_count(ha ^ hb) + bit_count(la ^ lb)").cast("int"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def simhash_hamming_pairs(spark, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= 6, found via
    bit-band LSH: the 60-bit signature splits into 8 bands (4 per
    30-bit half, widths 8/8/7/7); pairs sharing any band are
    candidates — pigeonhole: <= 7 flipped bits cannot touch all 8
    bands, so every pair within HAMMING_MAX = 6 is caught — then
    exact Hamming = bit_count(xor) filters."""
    return hamming_band_pairs(dedup_simhash(spark, sf_dir))


DEDUP_SIMHASH_HAMMING_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest({_SQL_TOKS}) AS t(tok)
),
bits AS (
  SELECT doc_id, j,
         CASE WHEN sum(
           (((strpos('0123456789abcdef', substr(md5(tok), (j // 4)::INT + 1, 1)) - 1)
             >> (3 - (j % 4))::INT) % 2) * 2 - 1
         ) > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS b
  FROM tok, range({SIMHASH_BITS}) t(j)
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN j >= 30 THEN b << (j - 30)::INT ELSE 0 END)::BIGINT AS hi,
         sum(CASE WHEN j < 30 THEN b << j::INT ELSE 0 END)::BIGINT AS lo
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, hi, lo, band,
         {_band_val_duckdb()} AS band_val
  FROM sig, range({SIMHASH_BANDS}) t(band)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.hi AS ha, x.lo AS la, y.hi AS hb, y.lo AS lb
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       (bit_count(xor(ha, hb)) + bit_count(xor(la, lb)))::INT AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= {HAMMING_MAX}
ORDER BY doc_a, doc_b
"""

QUERIES["simhash_hamming_pairs"] = (simhash_hamming_pairs, DEDUP_SIMHASH_HAMMING_SQL)


# ---- embedding near-dup clustering (connected components) --------------------


def embedding_dup_clusters(spark, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup CLUSTERING: the ≥-threshold pair
    graph (operators/similarity.py ann_threshold_pairs' exact cosine
    edges) resolved into connected components — the step a
    training-data pipeline runs after near-dup pair mining, so "keep
    one doc per duplicate cluster" is one filter
    (vec_id == component) away. Returns every vector with its
    component id = the MINIMUM vec_id reachable through the near-dup
    graph (singletons map to themselves).

    Distributed shape: hash-min label propagation — each round every
    vertex takes min(own label, neighbors' labels) via one join +
    groupBy, and the loop stops when a round changes nothing. Rounds
    are bounded by the component diameter (near-dup clusters are
    shallow — duplicates of a page link to each other); each round is
    ONE shuffle join over the edge list, the Pegasus/GraphFrames CC
    recipe, with localCheckpoint per round so the plan's lineage
    stays O(1) instead of O(rounds). At 10^12 docs the same loop runs
    unchanged — the edge list is the LSH/ANN candidate output, never
    the cross join (the exact pair join here is the oracle-scale
    form; ann_lsh_bucketed is the scale path for mining the edges).

    Oracle: DuckDB recursive CTE computing min reachable id over the
    same edges — iterative Spark algebra checked against a
    declarative transitive closure."""
    from job_searchengine_project_spark.operators.similarity import (
        COS_THRESHOLD,
        _pair_cos,
        _sides,
    )

    emb = read_spread(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ea, eb = _sides(emb)
    pairs = (
        ea.join(eb, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _pair_cos())
        .filter(F.col("cos") >= COS_THRESHOLD)
        .select("id_a", "id_b")
    )
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint()  # the edge list is reused every round: cut lineage
    labels = emb.select(
        F.col("vec_id"), F.col("vec_id").alias("component")
    ).localCheckpoint()
    while True:
        nb_min = (
            edges.join(
                labels.select(
                    F.col("vec_id").alias("id_b"),
                    F.col("component").alias("nb_comp"),
                ),
                "id_b",
            )
            .groupBy(F.col("id_a").alias("vec_id"))
            .agg(F.min("nb_comp").alias("nb_min"))
        )
        new_labels = (
            labels.join(nb_min, "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.col("component"), F.coalesce("nb_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nb_min", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.orderBy("vec_id")


EMBEDDING_CLUSTERS_SQL = """
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(list_transform(a.embedding, x -> x::DOUBLE),
                                     list_transform(b.embedding, x -> x::DOUBLE)), 4) >= 0.4
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS vec_id, min(dst)::BIGINT AS component
FROM reach GROUP BY src ORDER BY vec_id
"""

QUERIES["embedding_dup_clusters"] = (embedding_dup_clusters, EMBEDDING_CLUSTERS_SQL)
