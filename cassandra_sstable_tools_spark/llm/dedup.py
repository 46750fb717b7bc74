"""Deduplication operators for LLM training-data pipelines.

Four families, all expressed relationally (joins/groupBy over exploded
shingle tables) so the exact same computation runs in Spark and the DuckDB
oracle -- no opaque library calls, no Python in the hot path:

- dedup_exact:      hash-groupBy on the normalized-text fingerprint.
- minhash_lsh_pairs: word-trigram shingles -> 8 minhashes (lexicographic min
  of salted md5 -- a valid minwise permutation family) -> 4 bands x 2 rows ->
  band-bucket self-join emits candidate pairs -> exact trigram-Jaccard
  verification (>= threshold ppm). This is the classic MinHash+LSH pipeline;
  at 100 TB the band join shuffles only (band_id, band_hash) keys and the
  verify join touches only candidates -- never the full N^2.
- ngram_jaccard_pairs: exact Jaccard for pairs sharing >= 1 shingle (smaller
  corpora / ground-truth for LSH recall).
- simhash_signature: 16-bit SimHash demo signature (string form);
  simhash_neardup_pairs runs 64-bit signatures (two 32-bit halves) with
  4x16-bit pigeonhole banding, melted into one (band_id, band_value)
  self-join.

Determinism notes: md5 is identical everywhere; lexicographic MIN over hex
strings is engine-independent; all ratios are integer ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.operators.banding import (
    capped_band_pairs,
    capped_band_pairs_sql,
)
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

# MinHash+LSH tuning. N_HASHES signatures banded as N_BANDS x BAND_SIZE;
# the sf-test config is 8 = 4x2. The 100 TB config is a flip of these
# constants (e.g. 128 hashes as 16x8: collision prob s^8 per band keeps
# candidate volume sane at higher doc counts while 16 bands hold recall).
N_HASHES = 8
BAND_SIZE = 2
N_BANDS = N_HASHES // BAND_SIZE
JACCARD_THRESHOLD_PPM = 300_000
# ngram_jaccard_pairs df-cap: shingles appearing in more than this many docs
# are dropped before the pair join (stopword n-grams carry no dedup signal;
# a shingle with document frequency f contributes f^2 pair rows). Static
# config -- never derived from data at runtime (that would cost an extra
# job per call at scale).
NGRAM_MAX_DF = 250
# Per-bucket caps for the banded candidate joins (operators/banding.py):
# buckets at or under the cap emit all pairs (bit-identical to the uncapped
# join); bigger buckets emit star edges to the bucket-min doc, bounding the
# join at cap^2 rows per bucket at ANY duplication level. Measured fixture
# occupancy maxima: minhash 12 (sf0.1); simhash 404 (sf0.1, with the
# 64-bit/16-bit-band config -- the earlier 32-bit/8-bit-band config packed
# 3253 docs into one sf0.1 bucket, which is what motivated both the wider
# bands and the cap). Caps sit above every fixture occupancy, so they are
# pure mass-duplication safety valves at certification scale.
MINHASH_MAX_BUCKET = 256
SIMHASH_MAX_BUCKET = 1024


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").alias("norm"),
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one row per distinct normalized text with count + canonical
    doc (min doc_id) -- the keep-list of an exact-dedup pass."""
    n = _normalized(spark, sf_dir)
    return n.groupBy(F.md5("norm").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-trigram shingles per document. Single scan: the trigram
    window is a higher-order `transform` over the split array (no positional
    self-join -- the oracle keeps the equivalent relational formulation, the
    shingle SETS are identical). Only shuffle: the per-doc `distinct`.
    Persisted via the adapter cache registry: minhash, exact-Jaccard and the
    cleaning pipeline all reuse one shingling pass."""
    from cassandra_sstable_tools_spark.sources.tpch_adapter import _cached

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        tri = F.when(
            F.size("w") >= 3,
            F.expr(
                "transform(sequence(0, size(w) - 3),"
                " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))
        return (
            d.withColumn("w", F.split(F.trim(F.col("text")), r"\s+"))
            .select("doc_id", F.explode(tri).alias("shingle"))
            .distinct()
        )

    return _cached(spark, sf_dir, "doc_shingles", build)


def _signatures(sh: DataFrame) -> DataFrame:
    """8 minhashes = min(md5(salt || shingle)) per salt; banded into 4 keys.
    The shingle count rides along in the SAME fused aggregation (one pass
    over the shingle rows serves both banding and Jaccard verification)."""
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{j}#"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(
        *mins, F.count(F.lit(1)).alias("n_shingles")
    )
    bands = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]))
        .alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    return sig.select("doc_id", *bands, "n_shingles")


def _band_candidates(sig: DataFrame) -> DataFrame:
    """Candidate pairs from banded signatures via ONE self-join: bands are
    melted to (doc_id, band_id, band_hash) rows and joined on the composite
    key. Equivalent to per-band joins unioned, but a single shuffle -- at
    scale this is 1 exchange of 4x rows instead of 4 exchanges + union.
    The join is bucket-capped (operators/banding.py): a mass-duplicated
    page at 100 TB puts f near-identical docs in one bucket, and an
    uncapped join plans f^2 rows; above MINHASH_MAX_BUCKET members pair
    with the bucket representative instead."""
    n_bands = len([c for c in sig.columns if c.startswith("band")])
    long = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("bk"))
                for b in range(n_bands)
            ])
        ).alias("e"),
    ).select("doc_id", "e.band_id", "e.bk")
    return capped_band_pairs(long, "doc_id", "doc_a", "doc_b", MINHASH_MAX_BUCKET)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from LSH banding, verified with exact trigram Jaccard."""
    sh = _shingles(spark, sf_dir)
    sig = _signatures(sh).cache()
    cands = _band_candidates(sig)

    sizes = sig.select("doc_id", "n_shingles")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_shingles", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "nb"), "doc_b")
        .withColumn(
            "jaccard_ppm",
            F.floor(F.col("inter") * 1000000 / (F.col("na") + F.col("nb") - F.col("inter"))),
        )
        .where(F.col("jaccard_ppm") >= JACCARD_THRESHOLD_PPM)
        .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard_ppm")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified
    minhash-LSH near-dup pair graph; cluster_id = min doc_id of the
    component. The step a real dedup pipeline needs between "pairs" and
    "keep one per group" -- pairwise output alone can't tell A-B, B-C is one
    group of three. Algorithm + scale posture: operators/graph.py
    (iterative distributed min-label propagation; the registry's only
    iterative operator besides Lloyd)."""
    from cassandra_sstable_tools_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard pairs (no LSH): every pair sharing >= 1 shingle,
    kept when jaccard >= threshold. Ground truth for LSH recall measurement.

    Scale posture: the shingle self-join shuffles on the shingle string; a
    frequent shingle with document frequency f contributes f^2 pair rows, so
    at 100 TB this operator REQUIRES the df-cap below (drop shingles appearing
    in > max_df docs -- stopword n-grams carry no dedup signal anyway). The
    cap keys the join on rare shingles only, bounding the blowup; the LSH
    variant (minhash_lsh_pairs) remains the true scale path."""
    sh = _shingles(spark, sf_dir).cache()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= NGRAM_MAX_DF)
        .select("shingle")
    )
    capped = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    sa = capped.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = capped.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_shingles", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "nb"), "doc_b")
        .withColumn(
            "jaccard_ppm",
            F.floor(F.col("inter") * 1000000 / (F.col("na") + F.col("nb") - F.col("inter"))),
        )
        .where(F.col("jaccard_ppm") >= JACCARD_THRESHOLD_PPM)
        .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard_ppm")
    )


# Hex chars whose nibble has the TOP bit set (value & 8) / the SECOND bit
# set (value & 4): each md5 hex char yields two independent vote directions,
# giving 64 simhash bits from one 32-char digest.
_HEX_TOP = tuple("89abcdef")
_HEX_SECOND = tuple("4567cdef")


def _simhash_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash as two 32-bit integer halves (sim_lo, sim_hi).

    Bit i of sim_lo = sign of the vote over md5-char i's TOP nibble bit;
    bit i of sim_hi = the same char's SECOND nibble bit -- 64 independent
    hyperplanes from one digest, all 64 votes in ONE fused groupBy scan.
    Two halves instead of one 64-bit value keep every bit operation in
    unambiguous positive-BIGINT territory in both engines (bit 63 of a
    single value would be the sign bit). 64 bits is the Manku WWW'07
    production width: it buys 4 x 16-bit pigeonhole bands (65536 buckets
    per band -- measured max occupancy 404 at sf0.1, vs 3253 with the old
    32-bit/8-bit-band config) AND a selective hamming<=3 ball (the 32-bit
    config certified 4411 "pairs" at sf0.01, mostly short-doc noise; the
    64-bit one certifies 36 genuinely-similar ones)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    ).withColumn("h", F.md5("word"))
    votes = []
    for i in range(32):
        ch = F.substring("h", i + 1, 1)
        votes.append(
            F.sum(F.when(ch.isin(*_HEX_TOP), 1).otherwise(-1)).alias(f"v{i}")
        )
        votes.append(
            F.sum(F.when(ch.isin(*_HEX_SECOND), 1).otherwise(-1)).alias(f"w{i}")
        )
    agg = words.groupBy("doc_id").agg(*votes)
    lo, hi = None, None
    for i in range(32):
        lob = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        hib = F.when(F.col(f"w{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        lo = lob if lo is None else (lo + lob)
        hi = hib if hi is None else (hi + hib)
    return agg.select(
        "doc_id",
        lo.cast("bigint").alias("sim_lo"),
        hi.cast("bigint").alias("sim_hi"),
    )


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by SimHash: hamming(a, b) <= 3 over 64-bit
    signatures. EXACT via pigeonhole banding: 4 bands x 16 bits -- any pair
    within hamming 3 differs in at most 3 bands, so at least one band
    matches; candidates from ONE melted (band_id, band_value) self-join,
    verified with bit_count(xor) over both halves.

    Scale posture: shuffles only (band_id, band_value) keys -- the Manku
    WWW'07 production layout at its production width: 16-bit bands give
    65536 buckets per band, so bucket occupancy STAYS small as the corpus
    grows (the previous 32-bit/8-bit-band config concentrated 3253 docs
    into one sf0.1 bucket = 5.3M candidate pairs; this config's max is
    404). The join is still bucket-capped at SIMHASH_MAX_BUCKET
    (operators/banding.py) as the mass-duplication safety valve -- above
    it, members pair with the bucket representative (pigeonhole exactness
    inside over-cap buckets is the documented trade)."""
    # cached via the shared derived-frame registry (built once per corpus,
    # evicted/unpersisted with the other derived frames): the words-explode
    # 64-vote aggregation is the expensive stage and the plan references
    # sig several times (band melt via the capped join's stats/left
    # branches + the two candidate-grain value gathers)
    from cassandra_sstable_tools_spark.sources.tpch_adapter import _cached

    sig = _cached(
        spark, sf_dir, "simhash_sig", lambda: _simhash_val(spark, sf_dir)
    )
    halves = [("sim_lo", 0), ("sim_lo", 16), ("sim_hi", 0), ("sim_hi", 16)]
    long = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftright(F.col(col), sh)
                    .bitwiseAND(F.lit(65535))
                    .alias("bk"),
                )
                for b, (col, sh) in enumerate(halves)
            ])
        ).alias("e"),
    ).select("doc_id", "e.band_id", "e.bk")
    cands = capped_band_pairs(long, "doc_id", "doc_a", "doc_b", SIMHASH_MAX_BUCKET)
    a_sig = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sim_lo").alias("lo_a"), F.col("sim_hi").alias("hi_a"),
    )
    b_sig = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sim_lo").alias("lo_b"), F.col("sim_hi").alias("hi_b"),
    )
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("bigint")
    return (
        cands.join(a_sig, "doc_a")
        .join(b_sig, "doc_b")
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc: bit i votes +1 when the i-th md5 hex nibble of a
    word has its high bit set ('89abcdef'), -1 otherwise; sign of the sum."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    ).withColumn("h", F.md5("word"))
    votes = [
        F.sum(
            F.when(
                F.substring("h", i + 1, 1).isin(*"89abcdef"), 1
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    agg = words.groupBy("doc_id").agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v{i}") > 0, "1").otherwise("0") for i in range(16)]
    )
    return agg.select("doc_id", bits.alias("simhash_bits"))


_SHINGLES_SQL = r"""
words AS (
    SELECT doc_id,
           generate_subscripts(string_split_regex(trim(text), '\s+'), 1) - 1 AS pos,
           unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
),
shingles AS (
    SELECT DISTINCT w1.doc_id,
           concat(w1.word, ' ', w2.word, ' ', w3.word) AS shingle
    FROM words w1
    JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
    JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
)"""

_SIG_SQL = (
    "signatures AS (\n    SELECT doc_id,\n           "
    + ",\n           ".join(
        f"min(md5(concat('{j}#', shingle))) AS mh{j}" for j in range(N_HASHES)
    )
    + "\n    FROM shingles GROUP BY 1\n),\nbands AS (\n    SELECT doc_id,\n           "
    + ",\n           ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"mh{b * BAND_SIZE + r}" for r in range(BAND_SIZE))
        + f")) AS band{b}"
        for b in range(N_BANDS)
    )
    + "\n    FROM signatures\n)"
)

# Melt the wide bands CTE to (doc_id, band_id, bk) rows, then apply the
# SAME bucket-capped pair rule as the Spark side (operators/banding.py) --
# the cap branch is part of the certified contract, not a Spark-only detail.
_CAND_SQL = (
    "blong AS (\n"
    + "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band_id, band{b} AS bk FROM bands"
        for b in range(N_BANDS)
    )
    + "\n),\n"
    + capped_band_pairs_sql("blong", "doc_id", "doc_a", "doc_b", MINHASH_MAX_BUCKET)
)

# 64-bit simhash as (sim_lo, sim_hi) halves -- char i's top nibble bit
# votes bit i of lo, its second nibble bit votes bit i of hi (the same
# rule as _simhash_val, same integers).
_SIMHASH_VAL_SQL = (
    "words AS (\n"
    "    SELECT doc_id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h\n"
    "    FROM documents\n"
    "),\nvotes AS (\n    SELECT doc_id,\n           "
    + ",\n           ".join(
        f"sum(CASE WHEN substr(h, {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{i},\n           "
        f"sum(CASE WHEN substr(h, {i + 1}, 1) IN "
        f"('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END) AS w{i}"
        for i in range(32)
    )
    + "\n    FROM words GROUP BY 1\n),\nsig AS (\n    SELECT doc_id, CAST("
    + " + ".join(f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32))
    + " AS BIGINT) AS sim_lo, CAST("
    + " + ".join(f"CASE WHEN w{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32))
    + " AS BIGINT) AS sim_hi\n    FROM votes\n)"
)

# Shared CTE chain ending in `verified_pairs` (the minhash-LSH verified
# near-dup pairs) -- composed by the pairs oracle and the clusters oracle.
_MINHASH_PAIRS_CTES = f"""{_SHINGLES_SQL.lstrip()},
{_SIG_SQL},
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shingles GROUP BY 1),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter
    FROM cands c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
),
verified_pairs AS (
    SELECT i.doc_a, i.doc_b, i.inter, za.n_shingles AS na, zb.n_shingles AS nb,
           CAST(floor(i.inter * 1000000
                      / (za.n_shingles + zb.n_shingles - i.inter))
                AS BIGINT) AS jaccard_ppm
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE floor(i.inter * 1000000 / (za.n_shingles + zb.n_shingles - i.inter))
          >= {JACCARD_THRESHOLD_PPM}
)"""

ORACLES = {
    "ngram_jaccard_pairs": f"""
WITH {_SHINGLES_SQL.lstrip()},
rare AS (
    SELECT shingle FROM shingles
    GROUP BY shingle
    HAVING count(*) <= {NGRAM_MAX_DF}
),
capped AS (SELECT s.* FROM shingles s JOIN rare r ON r.shingle = s.shingle),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shingles GROUP BY 1),
inter AS (
    SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS inter
    FROM capped sa
    JOIN capped sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter, za.n_shingles AS na, zb.n_shingles AS nb,
       CAST(floor(i.inter * 1000000 / (za.n_shingles + zb.n_shingles - i.inter))
            AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE floor(i.inter * 1000000 / (za.n_shingles + zb.n_shingles - i.inter))
      >= {JACCARD_THRESHOLD_PPM}
""",
    "simhash_neardup_pairs": f"""
WITH {_SIMHASH_VAL_SQL},
blong AS (
    SELECT doc_id, 0 AS band_id, (sim_lo >> 0) & 65535 AS bk FROM sig
    UNION ALL
    SELECT doc_id, 1, (sim_lo >> 16) & 65535 FROM sig
    UNION ALL
    SELECT doc_id, 2, (sim_hi >> 0) & 65535 FROM sig
    UNION ALL
    SELECT doc_id, 3, (sim_hi >> 16) & 65535 FROM sig
),
{capped_band_pairs_sql("blong", "doc_id", "doc_a", "doc_b", SIMHASH_MAX_BUCKET)}
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(a.sim_lo, b.sim_lo))
            + bit_count(xor(a.sim_hi, b.sim_hi)) AS BIGINT) AS hamming
FROM cands c
JOIN sig a ON a.doc_id = c.doc_a
JOIN sig b ON b.doc_id = c.doc_b
WHERE bit_count(xor(a.sim_lo, b.sim_lo))
      + bit_count(xor(a.sim_hi, b.sim_hi)) <= 3
""",
    "dedup_exact": r"""
SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS content_hash,
       count(*) AS copies,
       min(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
""",
    "minhash_lsh_pairs": f"""
WITH {_MINHASH_PAIRS_CTES}
SELECT doc_a, doc_b, inter, na, nb, jaccard_ppm FROM verified_pairs
""",
    # connected components over the verified near-dup pair graph: recursive
    # min-label closure (DuckDB WITH RECURSIVE) mirrors Spark's iterative
    # min-propagation exactly -- both converge to min reachable doc_id.
    "dedup_clusters": f"""
WITH RECURSIVE {_MINHASH_PAIRS_CTES},
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM verified_pairs
    UNION ALL
    SELECT doc_b, doc_a FROM verified_pairs
),
cnodes AS (SELECT DISTINCT src FROM edges),
reach(src, lbl) AS (
    SELECT src, src FROM cnodes
    UNION
    SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.src = e.dst
)
SELECT src AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY 1
""",
    "simhash_signature": (
        "WITH words AS (\n"
        "    SELECT doc_id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h\n"
        "    FROM documents\n"
        "),\nvotes AS (\n    SELECT doc_id,\n           "
        + ",\n           ".join(
            f"sum(CASE WHEN substr(h, {i + 1}, 1) IN "
            f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{i}"
            for i in range(16)
        )
        + "\n    FROM words GROUP BY 1\n)\nSELECT doc_id, concat("
        + ", ".join(
            f"CASE WHEN v{i} > 0 THEN '1' ELSE '0' END" for i in range(16)
        )
        + ") AS simhash_bits\nFROM votes"
    ),
}

QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "dedup_clusters": dedup_clusters,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "simhash_signature": simhash_signature,
    "simhash_neardup_pairs": simhash_neardup_pairs,
}


# --- sub-document (chunk-level) dedup ---------------------------------------
# Exact-dedup at document grain misses boilerplate REPEATED ACROSS documents
# (headers, license blocks, templated passages). The standard large-scale
# approximation of substring dedup (suffix arrays don't distribute) is
# fixed-size chunk fingerprinting: split each normalized document into
# consecutive CHUNK_WORDS-word chunks, hash each, and measure what fraction
# of a document's chunks also occur elsewhere in the corpus.
CHUNK_WORDS = 10


def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-passage stats over corpus-wide chunk hashes.

    Plan: the shared ROW-GRAIN chunker (see chunk_occurrences -- the
    array-expression formulation was quadratic per document) emits chunk
    hashes; a groupBy on the chunk hash counts corpus-wide copies (linear,
    hash-partitioned); a join back on the hash marks each occurrence
    duplicated/unique; a final groupBy(doc_id) rolls up. Linear shuffles
    only, nothing quadratic -- the shape survives 100 TB because chunk
    volume is ~words/CHUNK_WORDS and every exchange is keyed on a
    high-cardinality hash. (The duplicated-hash side is usually small
    enough to broadcast instead; the shuffle join is kept because "most of
    the corpus is duplicated" is exactly the adversarial case this query
    exists to detect.)"""
    return chunk_dedup_over(_normalized(spark, sf_dir))


def chunk_dedup_over(n: DataFrame) -> DataFrame:
    """Core over any (doc_id, norm) frame -- split out so the randomized
    differential test can drive it with generated corpora."""
    return _chunk_rollup(chunk_occurrences(n, "fixed", "doc_id"))


def chunk_occurrences(n: DataFrame, grain: str, *keep_cols: str) -> DataFrame:
    """(keep_cols..., h) chunk-hash occurrence rows over a (doc_id, norm,
    ...) frame, at ``grain`` 'fixed' (CHUNK_WORDS grid) or 'cdc'
    (content-defined boundaries). THE shared chunker -- every chunk-grain
    consumer (dedup stats, overlap matrix, durable index) routes here.

    Chunking is ROW-GRAIN on purpose: posexplode to (pos, word) rows, a
    codegen chunk-id per word (fixed: pos div C; cdc: windowed cumsum of
    preceding boundary flags), then a doc-co-partitioned groupBy rebuilds
    each chunk's text in pos order. The array-expression alternative
    (transform+slice over the words array -- this module's original shape)
    is QUADRATIC per document for BOTH grains: higher-order-function
    lambdas are interpreted and re-evaluate the inlined split() once per
    chunk element (fixed grain measured 7s/one 32k-word doc, timeout at
    64k; cdc measured 42s at 1k). Fixture-sized docs hid it; real corpora
    have 10k+-word documents. The row-grain plan keeps every per-word
    expression in whole-stage codegen and is measured linear to 128k-word
    docs, at the price of one word-grain exchange (fixed grain: the
    groupBy; cdc: the window, whose doc_id partitioning the groupBy then
    reuses)."""
    from pyspark.sql import Window

    extra = [c for c in keep_cols if c != "doc_id"]
    wordrows = n.select(
        "doc_id", *extra,
        F.posexplode(F.split(F.col("norm"), " ")).alias("pos", "w"),
    )
    if grain == "fixed":
        with_cid = wordrows.withColumn(
            "cid", F.floor(F.col("pos") / CHUNK_WORDS)
        )
    elif grain == "cdc":
        flagged = wordrows.withColumn(
            "b",
            F.when(
                F.substring(F.md5("w"), 1, 1).isin(*CDC_BOUNDARY_NIBBLES), 1
            ).otherwise(0),
        )
        preceding = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        with_cid = flagged.withColumn(
            "cid", F.coalesce(F.sum("b").over(preceding), F.lit(0))
        )
    else:
        raise ValueError(f"unknown chunk grain {grain!r}")
    chunks = with_cid.groupBy("doc_id", *extra, "cid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("chunk")
    )
    return chunks.select(*keep_cols, F.md5("chunk").alias("h"))


ORACLES["chunk_dedup_stats"] = rf"""
WITH n AS (
    SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
    FROM documents
),
w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
idx AS (
    SELECT doc_id,
           unnest(generate_series(
               0, CAST(ceil(len(ws) / {CHUNK_WORDS}.0) AS BIGINT) - 1)) AS i
    FROM w
),
occ AS (
    SELECT idx.doc_id,
           md5(array_to_string(
               list_slice(w.ws, i * {CHUNK_WORDS} + 1,
                          i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')) AS h
    FROM idx JOIN w ON w.doc_id = idx.doc_id
),
freq AS (SELECT h, count(*) AS copies FROM occ GROUP BY 1)
SELECT occ.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN freq.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_chunks,
       CAST(floor(sum(CASE WHEN freq.copies > 1 THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*)) AS BIGINT) AS dup_ppm
FROM occ JOIN freq ON freq.h = occ.h
GROUP BY 1
"""

QUERIES["chunk_dedup_stats"] = chunk_dedup_stats


# --- content-defined chunking (CDC) -----------------------------------------
# Fixed-size chunking misses duplicated passages that don't align to the
# CHUNK_WORDS grid: the same 30-word paragraph starting at word 3 of one doc
# and word 7 of another lands in different fixed chunks and never collides.
# Content-defined chunking places boundaries where the CONTENT says so
# (rolling-fingerprint condition on the word itself), so a shifted copy of a
# passage re-derives the identical boundaries and the identical chunk hashes
# -- the word-grain analogue of Rabin-fingerprint CDC in dedup storage
# systems (LBFS/Venti lineage). A word ends a chunk iff the first hex nibble
# of md5(word) falls in CDC_BOUNDARY_NIBBLES (P = 1/8 -> geometric chunk
# lengths, mean ~8 words) or it is the document's last word. No min/max
# bounds: P(len > 64) < 0.1%, and the shared predicate stays one expression
# in both engines.
CDC_BOUNDARY_NIBBLES = ("0", "1")


def chunk_dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``chunk_dedup_stats`` at content-defined chunk grain: per-document
    duplicated-passage stats where chunk boundaries are shift-invariant.

    Plan: identical shape to the fixed-size path -- boundaries, chunks and
    hashes are all array expressions inside ONE corpus scan (filter over
    word positions -> slice between consecutive boundaries -> md5), then
    the same hash-grain groupBy + join-back + doc-grain rollup. Three
    linear hash-keyed shuffles; per-row CPU is O(words); nothing quadratic,
    so the 100 TB argument of chunk_dedup_stats carries over unchanged."""
    return chunk_dedup_cdc_over(_normalized(spark, sf_dir))


def chunk_dedup_cdc_over(n: DataFrame) -> DataFrame:
    """Core over any (doc_id, norm) frame (differential-testable)."""
    occurrences = _cdc_occurrences(n, "doc_id")
    return _chunk_rollup(occurrences)


def _cdc_occurrences(n: DataFrame, *keep_cols: str) -> DataFrame:
    """(keep_cols..., h) rows at CDC grain (see chunk_occurrences)."""
    return chunk_occurrences(n, "cdc", *keep_cols)


def _chunk_rollup(occurrences: DataFrame) -> DataFrame:
    """Shared tail of both chunk-dedup paths: corpus-wide copy counts per
    hash, then per-document duplicated-chunk rollup."""
    freq = occurrences.groupBy("h").agg(F.count(F.lit(1)).alias("copies"))
    return (
        occurrences.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("copies") > 1, 1).otherwise(0)).alias(
                "dup_chunks"
            ),
        )
        .select(
            "doc_id",
            "n_chunks",
            "dup_chunks",
            F.floor(F.col("dup_chunks") * 1000000 / F.col("n_chunks")).alias(
                "dup_ppm"
            ),
        )
    )


_CDC_NIBS_SQL = ", ".join(f"'{c}'" for c in CDC_BOUNDARY_NIBBLES)

ORACLES["chunk_dedup_cdc"] = rf"""
WITH n AS (
    SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
    FROM documents
),
w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
b AS (
    SELECT doc_id, ws,
           list_filter(generate_series(1, len(ws)),
                       i -> substr(md5(ws[i]), 1, 1) IN ({_CDC_NIBS_SQL})
                            OR i = len(ws)) AS bpos
    FROM w
),
jx AS (
    SELECT doc_id, ws, bpos,
           unnest(generate_series(1, len(bpos))) AS j
    FROM b
),
occ AS (
    SELECT doc_id,
           md5(array_to_string(list_slice(ws,
               CASE WHEN j = 1 THEN 1 ELSE bpos[j - 1] + 1 END,
               bpos[j]), ' ')) AS h
    FROM jx
),
freq AS (SELECT h, count(*) AS copies FROM occ GROUP BY 1)
SELECT occ.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN freq.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_chunks,
       CAST(floor(sum(CASE WHEN freq.copies > 1 THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*)) AS BIGINT) AS dup_ppm
FROM occ JOIN freq ON freq.h = occ.h
GROUP BY 1
"""

QUERIES["chunk_dedup_cdc"] = chunk_dedup_cdc


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of near-dup cluster sizes: how many connected
    components of each size the minhash graph contains -- the report that
    tells you whether dedup is removing twins or collapsing whole template
    families. Two aggregate-grain groupBys over the clusters frame (tiny
    vs corpus: one row per clustered doc)."""
    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("clusters")
    )


ORACLES["dedup_cluster_sizes"] = (
    "SELECT cluster_size, count(*) AS clusters FROM (\n"
    "  SELECT cluster_id, count(*) AS cluster_size FROM (\n"
    + ORACLES["dedup_clusters"]
    + ") GROUP BY 1\n) GROUP BY 1"
)
QUERIES["dedup_cluster_sizes"] = dedup_cluster_sizes


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as ``dedup_clusters`` via the small-star/large-star
    operator (O(log n) rounds -- the deep-graph formulation). Registered
    against the SAME recursive-closure oracle: the driver hash-match
    certifies both connected-components implementations independently."""
    from cassandra_sstable_tools_spark.operators.graph import (
        connected_components_star,
    )

    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components_star(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
    )


ORACLES["dedup_clusters_star"] = ORACLES["dedup_clusters"]
QUERIES["dedup_clusters_star"] = dedup_clusters_star


# --- cross-source duplicate overlap matrix ----------------------------------
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every (source_a, source_b) pair, how many distinct duplicated
    passages (``CHUNK_WORDS``-word chunk hashes, the same grain as
    ``chunk_dedup_stats``) appear in BOTH sources -- the provenance matrix
    that tells a corpus owner which crawls mirror each other's boilerplate
    (and therefore which dedup boundaries matter before mixture weighting).

    Scale shape: chunks are built in-scan by the shared array-expression
    chunker, then the corpus collapses to DISTINCT (chunk hash, source)
    rows -- duplicated-passage grain, orders of magnitude smaller than the
    corpus -- then a self-equi-join on the hash. Per-hash fanout is bounded
    by (#sources choose 2), a deployment constant (tens), never N^2 in
    documents: a chunk present in s sources contributes s*(s-1)/2 pairs
    regardless of how many occurrences carry it. One shuffle for the
    distinct, one co-partitioned hash join, one pair-grain groupBy.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    normed = d.select("doc_id", "source", norm.alias("norm"))
    hs = chunk_occurrences(normed, "fixed", "source").distinct()
    return (
        hs.alias("a")
        .join(hs.alias("b"), "h")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )


ORACLES["source_overlap_matrix"] = rf"""
WITH n AS (
    SELECT source, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
    FROM documents
),
w AS (SELECT source, string_split(norm, ' ') AS ws FROM n),
idx AS (
    SELECT source, ws,
           unnest(generate_series(
               0, CAST(ceil(len(ws) / {CHUNK_WORDS}.0) AS BIGINT) - 1)) AS i
    FROM w
),
hs AS (
    SELECT DISTINCT source,
           md5(array_to_string(
               list_slice(ws, i * {CHUNK_WORDS} + 1,
                          i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')) AS h
    FROM idx
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS shared_chunks
FROM hs a JOIN hs b ON b.h = a.h AND a.source < b.source
GROUP BY 1, 2
"""
QUERIES["source_overlap_matrix"] = source_overlap_matrix


def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cost report of near-dup dedup: how many documents and
    words each source keeps once every minhash-LSH duplicate cluster
    collapses to one representative (keep = unclustered, or the cluster's
    min-doc_id member -- cluster_id IS that min by construction). The
    rollup every curation run reads before shipping a dedup: "which
    sources is this erasing?". Integer-DIV ppm ratios keep the
    certificate float-free; an all-blank source's word ratio is NULL
    (never a divide-by-zero).

    Scale posture: the clusters input is the registered dedup_clusters
    pipeline (bucket-capped band join + O(log n) CC); this adds one
    LEFT join at doc grain (clusters frame is near-dup-only, so the join
    is small-side) and one per-source aggregate with map-side combine."""
    from cassandra_sstable_tools_spark.llm.text import _word_count

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _word_count(F.col("text")).alias("nw")
    )
    clusters = dedup_clusters(spark, sf_dir)
    keep = F.col("cluster_id").isNull() | (
        F.col("doc_id") == F.col("cluster_id")
    )
    return (
        d.join(clusters, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_docs"),
            F.sum(keep.cast("int")).cast("bigint").alias("kept_docs"),
            F.sum("nw").cast("bigint").alias("total_words"),
            F.sum(F.when(keep, F.col("nw")).otherwise(F.lit(0)))
            .cast("bigint").alias("kept_words"),
        )
        .withColumn(
            "kept_docs_ppm",
            F.expr("(kept_docs * 1000000) DIV total_docs").cast("bigint"),
        )
        .withColumn(
            "kept_words_ppm",
            F.when(
                F.col("total_words") == 0, F.lit(None).cast("bigint")
            ).otherwise(
                F.expr("(kept_words * 1000000) DIV total_words")
                .cast("bigint")
            ),
        )
    )


_NW_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)
_KEEP_SQL = "(c.cluster_id IS NULL OR d.doc_id = c.cluster_id)"

STAGED_QUERIES = {"dedup_survivorship": dedup_survivorship}
STAGED_ORACLES = {
    "dedup_survivorship": f"""
SELECT d.source,
       CAST(count(*) AS BIGINT) AS total_docs,
       CAST(sum(CASE WHEN {_KEEP_SQL} THEN 1 ELSE 0 END) AS BIGINT)
           AS kept_docs,
       CAST(sum(d.nw) AS BIGINT) AS total_words,
       CAST(sum(CASE WHEN {_KEEP_SQL} THEN d.nw ELSE 0 END) AS BIGINT)
           AS kept_words,
       CAST((CAST(sum(CASE WHEN {_KEEP_SQL} THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000) // count(*) AS BIGINT) AS kept_docs_ppm,
       CASE WHEN sum(d.nw) = 0 THEN NULL
            ELSE CAST((CAST(sum(CASE WHEN {_KEEP_SQL} THEN d.nw ELSE 0 END)
                            AS BIGINT) * 1000000)
                      // CAST(sum(d.nw) AS BIGINT) AS BIGINT)
       END AS kept_words_ppm
FROM (SELECT doc_id, source, {_NW_SQL} AS nw FROM documents) d
LEFT JOIN ({{CLUSTERS}}) c ON c.doc_id = d.doc_id
GROUP BY 1
""".replace("{CLUSTERS}", ORACLES["dedup_clusters"])
}
