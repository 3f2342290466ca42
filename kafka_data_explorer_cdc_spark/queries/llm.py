"""LLM-data-pipeline queries — dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §2B B16-B20 + north-star extensions).

Oracle strategy: deterministic pipelines (exact dedup, portable-hash
minhash, pairwise jaccard, brute-force cosine, text stats, stubbed
multimodal decode) are DuckDB-checked exactly. The probabilistic/seeded
pipelines (xxhash64 MinHash-LSH, SimHash, hyperplane/IVF/PQ ANN) are
registered as bounded-comparison GATES (round 5, VERDICT r4 #1): the
registry entry runs the production operator and emits per-probe
booleans — planted-duplicate hits that the deterministic hashing makes
certain, plus measured-recall / exactness-knob bounds — against an
all-TRUE DuckDB oracle, the b08x/b27x pattern. The raw pair/top-k
surfaces stay available as the operator functions themselves
(operators/dedup.py, operators/similarity.py) and keep their
planted-recall pytest coverage in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.storagelevel import StorageLevel

from ..io import ensure_parallelism, load
from ..operators import dedup as D
from ..operators import multimodal as MM
from ..operators import similarity as S
from ..operators.text import DUCKDB_POLY_HASH, LANG_STOPWORDS, POLY_MOD, poly_hash
from .helpers import dsum
from .registry import REGISTRY, query

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "d01_exact_dedup_groups",
    oracle="""
SELECT lower(trim(text)) AS norm_text,
       CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY lower(trim(text))
""",
    tags=("llm", "dedup"),
)
def d01_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (B16): hash-groupBy on the normalized text. Map-side
    partial agg collapses duplicates before the single shuffle — the
    100 TB-safe shape (never a sort, never a driver collect)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.lower(F.trim(F.col("text"))).alias("norm_text"))
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "d02_dedup_keep_first",
    oracle="""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
    tags=("llm", "dedup"),
)
def d02_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates: lowest doc_id survives per
    normalized text — reproducible under any partitioning, unlike the
    built-in dropDuplicates whose survivor is partition-order luck."""
    docs = load(spark, sf_dir, "documents")
    out = D.exact_dedup(docs, ["text"], "doc_id", normalize=True)
    return out.select("doc_id", "lang", "source")


_MINHASH_PERMS = [(2 * i + 1, 97 * i + 13) for i in range(8)]

_SH_DUCK = """
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
)"""


@query(
    "d03_minhash_portable",
    oracle=_SH_DUCK
    + ", h AS (SELECT doc_id, "
    + DUCKDB_POLY_HASH.format(expr="shingle")
    + " AS h FROM sh)\nSELECT doc_id, "
    + ", ".join(
        f"CAST(MIN(({a} * h + {b}) % 1000000007) AS BIGINT) AS mh_{i}"
        for i, (a, b) in enumerate(_MINHASH_PERMS)
    )
    + " FROM h GROUP BY doc_id",
    tags=("llm", "dedup"),
)
def d03_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures with an engine-portable polynomial hash —
    the oracle-checkable witness for the signature math. The production
    path (d04) swaps in xxhash64 for JVM speed; the plan shape (explode
    → hash → groupBy-min) is identical."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3)
    h = sh.withColumn("h", F.expr(poly_hash("shingle")))
    return h.groupBy(F.col("id").alias("doc_id")).agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % 1_000_000_007).alias(f"mh_{i}")
            for i, (a, b) in enumerate(_MINHASH_PERMS)
        ]
    )


_D04X_P = 1_000_000_007
_D04X_MULT = [1000003, 999983, 774047, 31]  # band-hash mixing multipliers


def _d04x_band_sql(band: int) -> str:
    terms = " + ".join(
        f"mh_{band * 4 + r} * {m}" for r, m in enumerate(_D04X_MULT)
    )
    return f"({terms}) % {_D04X_P}"


_D04X_ORACLE = (
    _SH_DUCK
    + ", h AS (SELECT doc_id, "
    + DUCKDB_POLY_HASH.format(expr="shingle")
    + " AS h FROM sh),\nsigs AS (SELECT doc_id, "
    + ", ".join(
        f"CAST(MIN(({a} * h + {b}) % {_D04X_P}) AS BIGINT) AS mh_{i}"
        for i, (a, b) in enumerate(_MINHASH_PERMS)
    )
    + " FROM h GROUP BY doc_id),"
    + """
tagged AS (
  SELECT *, MIN(doc_id) OVER (
    PARTITION BY mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
  ) AS rep FROM sigs
), star AS (
  SELECT rep AS id1, doc_id AS id2 FROM tagged WHERE doc_id <> rep
), reps AS (
  SELECT * FROM tagged WHERE doc_id = rep
), buckets AS (
"""
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_d04x_band_sql(b)} AS bh FROM reps"
        for b in range(2)
    )
    + """
), banded AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
), cands AS (
  SELECT * FROM banded UNION ALL SELECT * FROM star
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS isz
  FROM cands c
  JOIN sh a ON a.doc_id = c.id1
  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id1, i.id2, isz * 1.0 / (c1.n + c2.n - isz) AS jaccard
FROM inter i
JOIN cnt c1 ON i.id1 = c1.doc_id
JOIN cnt c2 ON i.id2 = c2.doc_id
WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.5
"""
)


@query("d04x_minhash_lsh_portable", oracle=_D04X_ORACLE, tags=("llm", "dedup"))
def d04x_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE MinHash-LSH near-dup pipeline with engine-portable
    hashing, hash-exact against DuckDB: shingle → polynomial-hash
    minhash (8 perms) → identical-signature star extraction → 2×4
    banding with arithmetic band mixing → bucket equi-join candidates →
    exact-Jaccard verify at 0.5. d03 proves the signature math and d04
    runs the xxhash64 production path (recall-tested); this twin pins
    the full pipeline STRUCTURE — star form, banding, candidate
    generation, verification — to an independent engine, so a silent
    change in any stage breaks the differential gate, not just a
    recall bound. Same scale shape as d04: one signature shuffle, one
    window over signatures, equi-joins only."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    h = sh.withColumn("h", F.expr(poly_hash("shingle")))
    sigs = h.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _D04X_P).alias(f"mh_{i}")
            for i, (a, b) in enumerate(_MINHASH_PERMS)
        ]
    )
    sig_cols = [f"mh_{i}" for i in range(8)]
    tagged = sigs.withColumn(
        "__rep", F.min("id").over(Window.partitionBy(*sig_cols))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    star = tagged.filter(F.col("id") != F.col("__rep")).select(
        F.col("__rep").alias("id1"), F.col("id").alias("id2")
    )
    reps = tagged.filter(F.col("id") == F.col("__rep"))

    def band_hash(b: int):
        expr = None
        for r, m in enumerate(_D04X_MULT):
            term = F.col(f"mh_{b * 4 + r}") * F.lit(m)
            expr = term if expr is None else expr + term
        return (expr % F.lit(_D04X_P)).alias("bh")

    buckets = reps.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_hash(b))
                    for b in range(2)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    l, r = buckets.alias("l"), buckets.alias("r")
    banded = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .distinct()
    )
    cands = banded.unionByName(star)
    return D.verify_jaccard(cands, sh, 0.5)


_D06X_H = [(31, 1_000_000_007), (37, 998_244_353)]  # two independent ~30-bit hashes
_D06X_BITS = 60  # 30 from each hash
_D06X_CHUNKS = 4  # 4 x 15-bit chunks -> pigeonhole radius <= 3
_D06X_W = _D06X_BITS // _D06X_CHUNKS


def _poly_spark(expr: str, mult: int, mod: int) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE "
        f"aggregate(transform(split({expr}, ''), ch -> ascii(ch)), 0L, "
        f"(acc, c) -> (acc * {mult} + c) % {mod}) END"
    )


def _poly_duck(expr: str, mult: int, mod: int) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE "
        f"list_reduce(list_transform(generate_series(1, length({expr})), "
        f"i -> CAST(unicode({expr}[i:i]) AS BIGINT)), "
        f"(acc, c) -> (acc * {mult} + c) % {mod}) END"
    )


def _d06x_vote_sql(j: int) -> str:
    src, bit = ("h1", j) if j < 30 else ("h2", j - 30)
    return (
        f"SUM(CASE WHEN ({src} >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{j}"
    )


_D06X_ORACLE = (
    """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
), h AS (
  SELECT doc_id, """
    + _poly_duck("tok", *_D06X_H[0])
    + " AS h1, "
    + _poly_duck("tok", *_D06X_H[1])
    + " AS h2 FROM toks\n), votes AS (\n  SELECT doc_id, "
    + ", ".join(_d06x_vote_sql(j) for j in range(_D06X_BITS))
    + "\n  FROM h GROUP BY doc_id\n), fp AS (\n  SELECT doc_id, "
    + " + ".join(
        f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_D06X_BITS)
    )
    + " AS fp FROM votes\n), pieces AS (\n"
    + " UNION ALL ".join(
        f"SELECT doc_id, fp, {c} AS ci, (fp >> {c * _D06X_W}) & {(1 << _D06X_W) - 1} AS cv FROM fp"
        for c in range(_D06X_CHUNKS)
    )
    + """
), banded AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
         CAST(bit_count(xor(l.fp, r.fp)) AS BIGINT) AS hamming
  FROM pieces l JOIN pieces r
    ON l.ci = r.ci AND l.cv = r.cv AND l.doc_id < r.doc_id
)
SELECT id1, id2, hamming FROM banded WHERE hamming <= 3
"""
)


@query("d06x_simhash_portable", oracle=_D06X_ORACLE, tags=("llm", "dedup"))
def d06x_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE SimHash near-dup pipeline with engine-portable
    hashing, hash-exact against DuckDB: per-token votes from two
    independent 30-bit polynomial hashes build a 60-bit fingerprint;
    4×15-bit chunk equi-join generates candidates (pigeonhole-lossless
    at radius ≤ 3); exact hamming via bit_count(xor) filters. The
    production d06 path uses xxhash64's full 63 bits (recall-tested);
    this twin pins the vote → fingerprint → chunk-index → verify
    structure to an independent engine. Same scale shape: one explode,
    one 60-aggregate shuffle, chunk equi-join — never O(n²)."""
    docs = load(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs).select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    hs = toks.withColumn(
        "h1", F.expr(_poly_spark("tok", *_D06X_H[0]))
    ).withColumn("h2", F.expr(_poly_spark("tok", *_D06X_H[1])))
    votes = hs.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(
                        F.col("h1" if j < 30 else "h2"), j % 30
                    ).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v_{j}")
            for j in range(_D06X_BITS)
        ]
    )
    fp_expr = None
    for j in range(_D06X_BITS):
        bit = F.when(
            F.col(f"v_{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp_expr = bit if fp_expr is None else fp_expr + bit
    fps = votes.select("id", fp_expr.alias("fp"))
    mask = (1 << _D06X_W) - 1
    pieces = fps.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftright(F.col("fp"), c * _D06X_W)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for c in range(_D06X_CHUNKS)
                ]
            )
        ).alias("p"),
    ).select("id", "fp", F.col("p.ci").alias("ci"), F.col("p.cv").alias("cv"))
    l, r = pieces.alias("l"), pieces.alias("r")
    return (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            F.bit_count(F.col("l.fp").bitwiseXOR(F.col("r.fp")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


_D04_ORACLE = """
SELECT doc_id AS probe_id, TRUE AS ok FROM documents WHERE doc_id < 20
UNION ALL SELECT CAST(-1 AS BIGINT), TRUE
"""


@query("d04_minhash_lsh_pairs", oracle=_D04_ORACLE, tags=("llm", "dedup", "approx"))
def d04_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash+LSH near-dup pipeline (B17) as a
    bounded-comparison gate: xxhash64 signatures, 4 bands x 4 rows,
    exact-Jaccard verification at 0.5, candidate generation an
    equi-join on band hashes — never O(n²).

    Driver contract (all-TRUE oracle):
    - probes 0..19: an exact duplicate of each doc_id<20 is planted at
      doc_id+1_000_000 (identical text => identical signature => same
      bucket in every band => exact Jaccard 1) — the full pipeline MUST
      find each pair, deterministically.
    - probe -1: near duplicates (last 3 words dropped, word-3-gram
      Jaccard ~0.83-0.95) planted at doc_id+2_000_000 for doc_id in
      [100,120); per-band hit probability j^4 puts expected recall
      ~0.9 — the gate bounds it at >= 0.6 (12/20), far below any
      plausible regeneration of the corpus, and the seeded hashing
      makes the measured value deterministic for fixed data.
    The raw pair surface is ``operators.dedup.minhash_lsh_dedup_pairs``
    (planted-recall + precision pytest in tests/test_dedup.py)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    exact_twins = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    words = F.split(F.col("text"), " ")
    near_twins = docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 120)
    ).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(3)))
        ).alias("text"),
    )
    corpus = docs.unionByName(exact_twins).unionByName(near_twins)
    pairs = (
        D.minhash_lsh_dedup_pairs(corpus, threshold=0.5)
        .select("id1", "id2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    probes = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("probe_id")
    )
    exact_ok = probes.join(
        pairs,
        (F.col("id1") == F.col("probe_id"))
        & (F.col("id2") == F.col("probe_id") + 1_000_000),
        "left",
    ).select("probe_id", F.col("id1").isNotNull().alias("ok"))
    near_ok = (
        pairs.filter(
            (F.col("id1") >= 100)
            & (F.col("id1") < 120)
            & (F.col("id2") == F.col("id1") + 2_000_000)
        )
        .agg((F.count("*") >= 12).alias("ok"))
        .select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    )
    return exact_ok.unionByName(near_ok)


#: Hot-shingle document-frequency cap for d05: a shingle occurring in
#: more than this many documents joins quadratically in the intersection
#: self-join while carrying ~no Jaccard signal ("of the and"-class
#: n-grams). Dropped on BOTH engines identically, so the differential
#: gate still verifies values exactly; drops are observable via
#: ``D.bucket_cap_report(sh, ["shingle"], _D05_MAX_DF)``.
_D05_MAX_DF = 1000

_SH_CAPPED_DUCK = f""",
hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {_D05_MAX_DF}
), shc AS (
  SELECT sh.* FROM sh LEFT JOIN hot USING (shingle) WHERE hot.shingle IS NULL
)"""


@query(
    "d05_ngram_jaccard_pairs",
    oracle=_SH_DUCK
    + _SH_CAPPED_DUCK
    + """,
cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS isz
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2,
       isz * 1.0 / (c1.n + c2.n - isz) AS jaccard
FROM inter
JOIN cnt c1 ON id1 = c1.doc_id
JOIN cnt c2 ON id2 = c2.doc_id
WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.5
""",
    tags=("llm", "dedup"),
)
def d05_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) — the
    ground-truth dedup the LSH pipeline approximates. The shingle
    equi-join bounds the pair explosion to documents that actually
    share an n-gram, and the document-frequency cap removes the one
    remaining quadratic risk: a corpus-frequent shingle whose bucket
    would self-join in O(df²). The cap is applied symmetrically
    (intersection AND per-doc counts, both engines), so the result is
    exact Jaccard over the informative-shingle sets."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3)
    sh = D.cap_bucket_width(sh, ["shingle"], _D05_MAX_DF)
    # feeds the self-join (twice) and both count joins — materialize
    # once. MEMORY_AND_DISK, not the MEMORY_ONLY default: the cached
    # shingle set outlives this call (the returned plan is lazy, so
    # there is no safe unpersist point inside the builder) and repeated
    # invocations in one session accumulate entries — eviction of the
    # least-recently-used cache blocks is the intended steady state,
    # and disk spill keeps eviction from forcing recompute mid-query.
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = sh.alias("a").join(
        sh.alias("b"),
        (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")),
    ).groupBy(
        F.col("a.id").alias("id1"), F.col("b.id").alias("id2")
    ).agg(F.count("*").alias("isz"))
    counts = sh.groupBy("id").agg(F.count("*").alias("n"))
    return (
        pairs.join(counts.select(F.col("id").alias("id1"), F.col("n").alias("n1")), "id1")
        .join(counts.select(F.col("id").alias("id2"), F.col("n").alias("n2")), "id2")
        .withColumn(
            "jaccard",
            F.col("isz") * 1.0 / (F.col("n1") + F.col("n2") - F.col("isz")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id1", "id2", "jaccard")
    )


_D06_ORACLE = """
SELECT doc_id AS probe_id, TRUE AS ok FROM documents WHERE doc_id < 20
UNION ALL SELECT CAST(-1 AS BIGINT), TRUE
"""


@query("d06_simhash_near_pairs", oracle=_D06_ORACLE, tags=("llm", "dedup", "approx"))
def d06_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (B17 variant) as a bounded-comparison gate:
    63-bit fingerprints, candidate pairs via shared 16-bit chunk, exact
    hamming filter, hot-bucket width cap (production defaults —
    operators/dedup.py:simhash_near_pairs).

    Driver contract (all-TRUE oracle):
    - probes 0..19: an exact duplicate of each doc_id<20 is planted at
      doc_id+1_000_000 (identical text => identical fingerprint =>
      hamming 0 => shares every chunk) — the capped production path
      MUST emit each planted pair, deterministically.
    - probe -1: pigeonhole LOSSLESSNESS, the operator's design claim:
      for a 20% id sample, the uncapped candidate join must recover
      EXACTLY the brute-force hamming<=3 pair set touching the sample
      (computed here by a broadcast nested-loop join over the tiny
      (id, fingerprint) projection — the one shape where a cross join
      is by-construction bounded: |sample| x n int64 ops, no vectors).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)
    fps = D.simhash(corpus).persist(StorageLevel.MEMORY_AND_DISK)

    capped = D.simhash_near_pairs(fps, max_hamming=3, max_bucket=1000)
    probes = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("probe_id")
    )
    planted_ok = probes.join(
        capped,
        (F.col("id1") == F.col("probe_id"))
        & (F.col("id2") == F.col("probe_id") + 1_000_000),
        "left",
    ).select("probe_id", F.col("id1").isNotNull().alias("ok"))

    # Lossless check: uncapped chunk-index pairs vs brute force on a
    # 20% organic sample. Both sides normalized to id1 < id2.
    sample = fps.filter(
        (F.col("id") % 5 == 0) & (F.col("id") < 1_000_000)
    ).select(F.col("id").alias("s_id"), F.col("simhash").alias("s_fp"))
    brute = (
        fps.filter(F.col("id") < 1_000_000)
        .join(F.broadcast(sample), F.col("id") != F.col("s_id"))
        .withColumn(
            "ham",
            F.bit_count(F.col("simhash").bitwiseXOR(F.col("s_fp"))),
        )
        .filter(F.col("ham") <= 3)
        .select(
            F.least("id", "s_id").alias("id1"),
            F.greatest("id", "s_id").alias("id2"),
        )
        .distinct()
    )
    uncapped = D.simhash_near_pairs(fps, max_hamming=3, max_bucket=None)
    in_sample = (F.col("id1") % 5 == 0) | (F.col("id2") % 5 == 0)
    organic = ~((F.col("id1") >= 1_000_000) | (F.col("id2") >= 1_000_000))
    # both sides of the symmetric anti-join pair are consumed twice:
    # unpersisted, the whole uncapped chunk-join pipeline (and the
    # brute hamming block) executed once per consumer (guide §2.4).
    # The frames are tiny pair lists — broadcast the anti-join right
    # sides so the set comparison needs no exchange (guide §3.1).
    lsh_side = (
        uncapped.select("id1", "id2")
        .filter(in_sample & organic)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    brute = brute.persist(StorageLevel.MEMORY_AND_DISK)
    missing = brute.join(F.broadcast(lsh_side), ["id1", "id2"], "left_anti")
    extra = lsh_side.join(F.broadcast(brute), ["id1", "id2"], "left_anti")
    lossless_ok = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    )
    return planted_ok.unionByName(lossless_ok)


_D20_CC_ORACLE = (
    _SH_DUCK.replace("WITH", "WITH RECURSIVE", 1)
    + _SH_CAPPED_DUCK
    + f""",
cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS isz
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id1, id2 FROM inter
  JOIN cnt c1 ON id1 = c1.doc_id
  JOIN cnt c2 ON id2 = c2.doc_id
  WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.5
),
e AS (SELECT id1 AS a, id2 AS b FROM pairs
      UNION SELECT id2, id1 FROM pairs),
reach AS (
  SELECT a AS id, a AS comp FROM e
  UNION
  SELECT e.b, r.comp FROM reach r JOIN e ON e.a = r.id
)
SELECT id AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
FROM reach GROUP BY id
"""
)


@query("d20_neardup_clusters", oracle=_D20_CC_ORACLE, tags=("llm", "dedup"))
def d20_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment (the step after pairs): connected
    components over the exact-Jaccard pair graph (d05), component =
    min reachable doc_id. This is what a real dedup pipeline acts on —
    "keep the component representative, drop the rest" needs the
    transitive closure, not the pairwise edges (A~B, B~C must place A
    and C in one group even when A≁C pairwise). Iterative min-label
    propagation (operators/graph.py — O(diameter) rounds, one
    join + one map-side-combined groupBy per round, lineage
    checkpointed); the oracle recomputes the same closure with a
    recursive CTE. Deterministic, hence hash-exact."""
    from ..operators.graph import connected_components

    pairs = d05_ngram_jaccard_pairs(spark, sf_dir).select("id1", "id2")
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"
)
_NORMSQ = (
    "list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "(p, q) -> p + q)"
)


@query(
    "d07_embedding_cosine_topk",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 20
)
SELECT q_id, c_id, cosine, rn AS rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= 5
""",
    tags=("llm", "similarity"),
)
def d07_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 (B18 exact baseline) for 20 query
    vectors: broadcast queries, JVM zip_with/aggregate fold (no Python,
    no corpus shuffle), per-query ranking window."""
    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 20)
    return S.brute_force_cosine_topk(em, queries, k=5)


def _twin_corpus(em: DataFrame, n: int = 20) -> DataFrame:
    """Corpus plus a scaled twin (2x) of each vec_id < n at
    vec_id + 1_000_000. Doubling is exact in fp, cosine-invariant and
    sign-hash-invariant (sign(dot(2v, p)) == sign(dot(v, p))) and the
    cell assigner is cosine-based, so a twin lands in the SAME LSH
    buckets / IVF cell as its original — the deterministic recall probe
    (same trick as d08)."""
    twins = em.filter(F.col("vec_id") < n).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    return em.unionByName(twins)


def _twin_rank1_ok(queries: DataFrame, topk: DataFrame) -> DataFrame:
    """Per-query boolean: the planted twin is the rank-1 neighbor with
    cosine ~1 (>= 0.999999 — summation-order ulps, never organic, the
    synthetic corpus maxes out near 0.6)."""
    r1 = topk.filter(F.col("rank") == 1).select("q_id", "c_id", "cosine")
    return (
        queries.select(F.col("vec_id").alias("probe_id"))
        .join(r1, F.col("q_id") == F.col("probe_id"), "left")
        .select(
            "probe_id",
            (
                (F.col("c_id") == F.col("probe_id") + 1_000_000)
                & (F.col("cosine") >= 0.999999)
            ).alias("ok"),
        )
        .fillna(False, subset=["ok"])
    )


def _recall_row(
    ann: DataFrame, brute: DataFrame, bound: float, probe_id: int
) -> DataFrame:
    """One (probe_id, ok) row: |ann ∩ brute| / |brute| >= bound."""
    hits = ann.select("q_id", "c_id").join(
        brute.select("q_id", "c_id"), ["q_id", "c_id"], "left_semi"
    )
    total = brute.select(F.count("*").alias("n"))
    return (
        hits.agg(F.count("*").alias("h"))
        .crossJoin(total)
        .select(
            F.lit(probe_id).cast("long").alias("probe_id"),
            (F.col("h") >= F.col("n") * bound).alias("ok"),
        )
    )


def _exact_score_row(
    ann: DataFrame, corpus: DataFrame, queries: DataFrame, probe_id: int
) -> DataFrame:
    """One (probe_id, ok) row: reported cosines are exact to 1e-6 when
    recomputed from the raw vectors, and per-query ranks are contiguous
    from 1 with non-increasing cosine. Costs |queries| x k rows — a
    serving-path invariant, not a corpus re-scan."""
    qv = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    cv = corpus.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    recomputed = (
        ann.join(F.broadcast(qv), "q_id")
        .join(cv, "c_id")
        .select(
            "q_id",
            "rank",
            "cosine",
            (dot / (norm(F.col("qv")) * norm(F.col("cv")))).alias("exact"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("rank")
    checked = recomputed.select(
        "q_id",
        (F.abs(F.col("cosine") - F.col("exact")) < 1e-6).alias("score_ok"),
        (F.col("rank") == F.row_number().over(w)).alias("rank_ok"),
        (
            F.col("cosine")
            <= F.coalesce(F.lag("cosine").over(w), F.lit(2.0)) + 1e-9
        ).alias("mono_ok"),
    )
    return checked.agg(
        (
            F.min("score_ok") & F.min("rank_ok") & F.min("mono_ok")
            & (F.count("*") > 0)
        ).alias("ok")
    ).select(F.lit(probe_id).cast("long").alias("probe_id"), "ok")


_TWIN_ORACLE = """
SELECT vec_id AS probe_id, TRUE AS ok FROM embeddings WHERE vec_id < 20
UNION ALL SELECT CAST(-1 AS BIGINT), TRUE
"""


@query("d07x_lsh_cosine_topk", oracle=_TWIN_ORACLE, tags=("llm", "similarity", "approx"))
def d07x_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH (B18 scale path) as a
    bounded-comparison gate: 8 tables x 6-bit signatures bucket the
    corpus (~tables/2^bits = 12.5% scan fraction, comparable to the
    IVF probe); only bucket collisions are re-ranked exactly.

    Driver contract (all-TRUE oracle):
    - probes 0..19: scaled twins planted at vec_id+1_000_000 share
      every bucket with their original (sign-hash invariance), so the
      production pipeline must return each twin at rank 1, cosine ~1 —
      deterministic.
    - probe -1: recall@5 vs brute force on the same corpus >= 0.3.
      The 20 twin hits alone guarantee 0.2; the margin above that is
      organic recall of the seeded planes (measured ~0.47 at
      sf0.001/sf0.01 on the near-orthogonal synthetic corpus — the
      hardest case for LSH; clustered real embeddings recall far
      higher), deterministic for fixed data.
    Raw top-k surface: ``operators.similarity.lsh_cosine_topk``."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    queries = em.filter(F.col("vec_id") < 20)
    ann = S.lsh_cosine_topk(corpus, queries, k=5, bits=6, tables=8).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    brute = S.brute_force_cosine_topk(corpus, queries, k=5)
    return _twin_rank1_ok(queries, ann).unionByName(
        _recall_row(ann, brute, 0.3, -1)
    )


_D07W_DIM, _D07W_TABLES, _D07W_BITS = 64, 2, 8


def _d07w_parity_const(t: int, b: int) -> int:
    return t * 131071 + b * 524287


def _d07w_fold_sql(t: int, b: int, vec: str) -> str:
    c = _d07w_parity_const(t, b)
    return (
        f"list_reduce(list_transform(generate_series(0, {_D07W_DIM - 1}), "
        f"i -> CASE WHEN (({c} + i * 8191) % 1000003) % 2 = 0 "
        f"THEN CAST({vec}[i + 1] AS DOUBLE) "
        f"ELSE -CAST({vec}[i + 1] AS DOUBLE) END), (p, q) -> p + q)"
    )


def _d07w_sig_sql(t: int, vec: str) -> str:
    return " + ".join(
        f"(CASE WHEN {_d07w_fold_sql(t, b, vec)} >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_D07W_BITS)
    )


_D07W_ORACLE = f"""
WITH sig AS (
  SELECT vec_id, 0 AS tbl, {_d07w_sig_sql(0, "embedding")} AS sig FROM embeddings
  UNION ALL
  SELECT vec_id, 1, {_d07w_sig_sql(1, "embedding")} FROM embeddings
), cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
  FROM sig q JOIN sig c
    ON q.tbl = c.tbl AND q.sig = c.sig AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 20
), n AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT cand.q_id, cand.c_id,
         {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n c ON c.vec_id = cand.c_id
)
SELECT q_id, c_id, cosine, rn AS rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= 5
"""


@query("d07w_lsh_cosine_portable", oracle=_D07W_ORACLE, tags=("llm", "similarity"))
def d07w_lsh_cosine_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-5 with engine-portable DETERMINISTIC ±1
    planes, hash-exact against DuckDB: plane entry signs come from an
    integer parity function of (table, bit, dim), so the signature dot
    products are sequential folds both engines compute bit-identically
    (the Spark fold seeds from element 0 to mirror list_reduce exactly).
    Candidates = bucket collisions on either of 2×8-bit signatures;
    exact cosine re-rank with the d07 fold. This pins the full ANN
    pipeline — signature → bucket-join candidates → re-rank — to an
    independent engine; d07x keeps the Gaussian-plane production path
    whose recall is tested against brute force. ±1 (Rademacher) planes
    are themselves a standard LSH choice, not a test-only hack."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def fold(t: int, b: int):
        c = _d07w_parity_const(t, b)
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(_D07W_DIM - 1)),
            lambda i: F.when(
                ((F.lit(c) + i * F.lit(8191)) % F.lit(1000003)) % 2 == 0,
                F.element_at(F.col("embedding"), i + 1).cast("double"),
            ).otherwise(-F.element_at(F.col("embedding"), i + 1).cast("double")),
        )
        # seed from element 0, fold the rest — exactly list_reduce
        return F.aggregate(
            F.slice(arr, 2, _D07W_DIM - 1),
            F.element_at(arr, 1),
            lambda acc, x: acc + x,
        )

    def sig(t: int):
        out = None
        for b in range(_D07W_BITS):
            bit = F.when(fold(t, b) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
            out = bit if out is None else out + bit
        return out.alias("sig")

    sigs = None
    for t in range(_D07W_TABLES):
        part = em.select("vec_id", F.lit(t).alias("tbl"), sig(t))
        sigs = part if sigs is None else sigs.unionByName(part)
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)

    q, c = sigs.alias("q"), sigs.alias("c")
    cand = (
        q.filter(F.col("q.vec_id") < 20)
        .join(
            c,
            (F.col("q.tbl") == F.col("c.tbl"))
            & (F.col("q.sig") == F.col("c.sig"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(F.col("q.vec_id").alias("q_id"), F.col("c.vec_id").alias("c_id"))
        .distinct()
    )
    n = em.select(
        "vec_id",
        "embedding",
        F.sqrt(S._norm_sq(F.col("embedding"))).alias("nrm"),
    )
    scored = (
        cand.join(
            n.select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_vec"),
                F.col("nrm").alias("q_nrm"),
            ),
            "q_id",
        )
        .join(
            n.select(
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_vec"),
                F.col("nrm").alias("c_nrm"),
            ),
            "c_id",
        )
        .withColumn(
            "cosine",
            S._dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_nrm") * F.col("c_nrm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", "cosine", "rank")
    )


_D07Y_ORACLE = """
SELECT vec_id AS probe_id, TRUE AS ok FROM embeddings WHERE vec_id < 20
UNION ALL SELECT CAST(-1 AS BIGINT), TRUE
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
"""


@query("d07y_ivf_cosine_topk", oracle=_D07Y_ORACLE, tags=("llm", "similarity", "approx"))
def d07y_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (B18 partition-pruned scale path) as a
    bounded-comparison gate: corpus bucketed into 16 centroid cells,
    queries probe their 8 nearest, exact re-rank inside the probed
    ~half of the corpus.

    Driver contract (all-TRUE oracle):
    - probes 0..19: a scaled twin shares its original's cell (cosine
      cell assignment is scale-invariant) and the query's #1 probe IS
      that cell, so the twin must come back at rank 1 — deterministic.
    - probe -1: recall@5 vs brute force at nprobe=8 >= 0.5 (pytest
      bound; twins alone give 0.2, organic pruning recall is far
      higher).
    - probe -2: the exactness knob — nprobe == n_cells must reproduce
      the brute-force top-5 id set EXACTLY (pruning trades recall,
      never correctness).
    Raw top-k surface: ``operators.similarity.ivf_cosine_topk``."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    queries = em.filter(F.col("vec_id") < 20)
    # one-time IVF build shared by the nprobe=8 serving probe and the
    # nprobe=16 exactness knob (guide §1.2 fewer passes: the index is
    # built once and probed twice, not rebuilt per probe setting)
    C, cells = S.ivf_build(corpus, n_cells=16)
    ann = S.ivf_cosine_topk(
        corpus, queries, k=5, n_cells=16, nprobe=8, centroids=C, cells=cells
    ).persist(StorageLevel.MEMORY_AND_DISK)
    brute = S.brute_force_cosine_topk(corpus, queries, k=5).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # persisted: both symmetric anti-joins consume it — unpersisted,
    # the nprobe=16 probe executed twice (guide §2.4); the k x |q|
    # outputs are tiny, so the anti-join right sides broadcast
    # (guide §3.1 — no exchange for the set comparison)
    full = S.ivf_cosine_topk(
        corpus, queries, k=5, n_cells=16, nprobe=16, centroids=C, cells=cells
    ).persist(StorageLevel.MEMORY_AND_DISK)
    missing = brute.select("q_id", "c_id").join(
        F.broadcast(full.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    extra = full.select("q_id", "c_id").join(
        F.broadcast(brute.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    exact_knob = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    )
    return (
        _twin_rank1_ok(queries, ann)
        .unionByName(_recall_row(ann, brute, 0.5, -1))
        .unionByName(exact_knob)
    )


_D07Z_ORACLE = """
SELECT vec_id AS probe_id, TRUE AS ok FROM embeddings WHERE vec_id < 20
"""


@query("d07z_blocked_cosine_topk", oracle=_D07Z_ORACLE, tags=("llm", "similarity"))
def d07z_blocked_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 via block-local pre-reduction (B18 shuffle-minimal
    form) as a rank-equality gate: each Arrow batch keeps only its
    local top-k per query, so the ranking shuffle carries
    ~batches x k x |queries| rows instead of |corpus| x |queries|.

    Driver contract (all-TRUE oracle): per query, the (c_id, rank)
    list must be IDENTICAL to the brute-force d07 baseline — the
    operator is exact, not approximate; only the cosine's
    summation-order ulps differ, which is why the comparison is on
    ranks, not floats. Raw surface:
    ``operators.similarity.blocked_cosine_topk``."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = em.filter(F.col("vec_id") < 20)
    blocked = S.blocked_cosine_topk(em, queries, k=5).select(
        "q_id", "rank", F.col("c_id").alias("blk_id")
    )
    brute = S.brute_force_cosine_topk(em, queries, k=5).select(
        "q_id", "rank", F.col("c_id").alias("bf_id")
    )
    agree = (
        blocked.join(brute, ["q_id", "rank"], "full_outer")
        .groupBy("q_id")
        .agg(
            F.min(
                F.col("blk_id").isNotNull()
                & F.col("bf_id").isNotNull()
                & (F.col("blk_id") == F.col("bf_id"))
            ).alias("ok")
        )
    )
    return queries.select(F.col("vec_id").alias("probe_id")).join(
        agree, F.col("q_id") == F.col("probe_id"), "left"
    ).select("probe_id", F.coalesce("ok", F.lit(False)).alias("ok"))


_D07V_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
UNION ALL SELECT CAST(-3 AS BIGINT), TRUE
"""


@query("d07v_pq_cosine_topk", oracle=_D07V_ORACLE, tags=("llm", "similarity", "approx"))
def d07v_pq_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-5 (B18 memory-bound scale path) as
    a bounded-comparison gate: corpus vectors compress to m=8 codebook
    bytes (32x smaller than the raw 64-d float32), queries score
    candidates with 8 table lookups each (ADC scan), exact cosine
    re-ranks the per-batch survivors. The deterministic codebook
    (hash-ordered sample, fixed Lloyd rounds) makes every row below
    reproducible for fixed data.

    Driver contract (all-TRUE oracle):
    - probe -1: planted scaled twins (ADC distances quantize, so
      per-twin hits are not individually certain — unlike LSH/IVF):
      at rerank=20, >= 15 of 20 twins return at rank 1 (pytest bound
      is 18/20; margin for corpus regeneration).
    - probe -2: recall@5 vs brute force at rerank=20 >= 0.5.
    - probe -3: exact-degenerate — rerank >= |corpus| must reproduce
      the brute-force top-5 id set exactly (compression affects the
      candidate order only; the re-rank is exact).
    Raw top-k surface: ``operators.similarity.pq_cosine_topk``."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    queries = em.filter(F.col("vec_id") < 20)
    n_corpus = 2 * 20 + 10_000  # rerank bound; see below

    # train the deterministic codebooks ONCE for both the rerank=20
    # serving probe and the exact-degenerate knob (guide §1.2)
    B = S.pq_train(corpus)
    ann = S.pq_cosine_topk(
        corpus, queries, k=5, rerank=20, codebooks=B
    ).persist(StorageLevel.MEMORY_AND_DISK)
    brute = S.brute_force_cosine_topk(corpus, queries, k=5).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    twin_hits = (
        ann.filter(
            (F.col("rank") == 1)
            & (F.col("c_id") == F.col("q_id") + 1_000_000)
            & (F.col("cosine") >= 0.999999)
        )
        .agg((F.count("*") >= 15).alias("ok"))
        .select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    )
    recall = _recall_row(ann, brute, 0.5, -2)
    # exact-degenerate: rerank larger than any test corpus (the knob is
    # a cap, not an allocation — oversizing costs nothing)
    full = S.pq_cosine_topk(
        corpus, queries, k=5, rerank=n_corpus, codebooks=B
    ).persist(StorageLevel.MEMORY_AND_DISK)  # two anti-join consumers
    missing = brute.select("q_id", "c_id").join(
        F.broadcast(full.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    extra = full.select("q_id", "c_id").join(
        F.broadcast(brute.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    degenerate = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-3).cast("long").alias("probe_id"), "ok")
    )
    return twin_hits.unionByName(recall).unionByName(degenerate)


@query("d07u_pq_codes_topk", oracle=_D07V_ORACLE, tags=("llm", "similarity", "approx"))
def d07u_pq_codes_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over a PRECOMPUTED codes table (VERDICT r4 #7 — the
    at-rest design d07v's docstring promises): encode once into an
    (id, codes) table (persisted; parquet at scale), serve queries from
    the codes-only ADC scan (m bytes per vector, raw vectors never
    enter the scan), join survivors back by id for the exact re-rank.

    Driver contract (all-TRUE oracle), same shape as d07v:
    - probe -1: >= 15/20 planted twins at rank 1 (measured 20/20).
    - probe -2: recall@5 vs brute force >= 0.5 — same codebooks and
      rerank as d07v, so candidate quality is identical by
      construction.
    - probe -3: path equivalence — the codes-at-rest top-5 id set must
      EQUAL the inline d07v pipeline's (same codebooks, same ADC math,
      same tie-break); where the encode cost sits must not change what
      is returned.
    Raw surface: ``operators.similarity.pq_codes_cosine_topk``."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    queries = em.filter(F.col("vec_id") < 20)
    # one codebook training for both halves of the path-equivalence
    # pair — probe -3 compares WHERE the encode sits, and the
    # deterministic trainer returns the identical array either way
    B = S.pq_train(corpus)
    ann = S.pq_codes_cosine_topk(
        corpus, queries, k=5, rerank=20, codebooks=B
    ).persist(StorageLevel.MEMORY_AND_DISK)
    brute = S.brute_force_cosine_topk(corpus, queries, k=5)
    # persisted: the path-equivalence pair consumes it twice —
    # unpersisted, the whole inline ADC pipeline executed per consumer
    inline = S.pq_cosine_topk(
        corpus, queries, k=5, rerank=20, codebooks=B
    ).persist(StorageLevel.MEMORY_AND_DISK)
    twin_hits = (
        ann.filter(
            (F.col("rank") == 1)
            & (F.col("c_id") == F.col("q_id") + 1_000_000)
            & (F.col("cosine") >= 0.999999)
        )
        .agg((F.count("*") >= 15).alias("ok"))
        .select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    )
    recall = _recall_row(ann, brute, 0.5, -2)
    missing = inline.select("q_id", "c_id").join(
        F.broadcast(ann.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    extra = ann.select("q_id", "c_id").join(
        F.broadcast(inline.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    equiv = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-3).cast("long").alias("probe_id"), "ok")
    )
    return twin_hits.unionByName(recall).unionByName(equiv)


@query("d07t_ivfpq_topk", oracle=_D07V_ORACLE, tags=("llm", "similarity", "approx"))
def d07t_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (VERDICT r4 #7 — the composition that actually serves
    100 TB): coarse cells prune the scan to ~nprobe/n_cells of the
    corpus (partition pruning at rest), PQ compresses the remainder to
    m bytes/vector, exact re-rank touches only rerank x |queries| raw
    vectors. Centroids shared with d07y, codebooks with d07v.

    Driver contract (all-TRUE oracle):
    - probe -1: >= 15/20 planted twins at rank 1 (cosine cell
      assignment is scale-invariant, so the twin is always in the #1
      probed cell; measured 20/20).
    - probe -2: recall@5 vs brute force >= 0.35 at nprobe=8/16 +
      rerank=20 (measured 0.53 at sf0.01 on the near-orthogonal
      corpus — composition pays both the prune and the quantization;
      clustered real embeddings recall far higher).
    - probe -3: the serving path's reported scores are EXACT — every
      returned cosine matches a recomputation from the raw vectors to
      1e-6 and ranks are contiguous/monotone per query (quantization
      chooses candidates; it must never leak into reported scores).

    The heavyweight exactness-knob equivalence (nprobe=n_cells +
    rerank >= |corpus| == brute force) is a property of the operator,
    not of a serving run — it is enforced in
    ``tests/test_similarity.py::test_ivf_pq_exact_degenerate_and_twins``
    (VERDICT r5 #3: the entry times the serving path; gates that
    re-run the corpus exhaustively live in pytest).
    Raw surface: ``operators.similarity.ivf_pq_cosine_topk``."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    queries = em.filter(F.col("vec_id") < 20)
    ann = S.ivf_pq_cosine_topk(
        corpus, queries, k=5, n_cells=16, nprobe=8, rerank=20
    ).persist(StorageLevel.MEMORY_AND_DISK)
    brute = S.brute_force_cosine_topk(corpus, queries, k=5)
    twin_hits = (
        ann.filter(
            (F.col("rank") == 1)
            & (F.col("c_id") == F.col("q_id") + 1_000_000)
            & (F.col("cosine") >= 0.999999)
        )
        .agg((F.count("*") >= 15).alias("ok"))
        .select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    )
    recall = _recall_row(ann, brute, 0.35, -2)
    exact_scores = _exact_score_row(ann, corpus, queries, -3)
    return twin_hits.unionByName(recall).unionByName(exact_scores)


@query(
    "d08_embedding_near_dup",
    oracle="""
SELECT vec_id AS id1, vec_id + 1000000 AS id2, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings WHERE vec_id < 20
""",
    tags=("llm", "dedup", "approx"),
)
def d08_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at 0.95 via LSH buckets + exact
    cosine verification, exercised against planted ground truth.

    The synthetic corpus has no organic near-duplicates (max organic
    cosine ≈ 0.60 at every SF), so the raw query proved nothing to the
    driver (0 rows in round 2). Plant 20 deterministic duplicates: each
    ``vec_id < 20`` vector re-enters as ``vec_id + 1000000`` scaled by
    2. Scaling is cosine-invariant AND sign-hash-invariant (doubling is
    exact in fp and sign(dot(2v, p)) == sign(dot(v, p))), so every
    planted pair lands in identical LSH buckets in all tables and
    verifies at cosine exactly 1.0 — recall of the full pipeline
    (union → multi-table signatures → bucket equi-join → exact verify →
    threshold filter) is deterministically 1.0, which makes the output
    fully oracle-checkable: exactly the 20 planted pairs, nothing else
    (organic pairs sit ≥0.35 below the threshold). Probabilistic recall
    on non-trivial perturbations is covered by
    tests/test_similarity.py planted-pair tests."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = em.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    corpus = em.unionByName(planted)
    pairs = S.embedding_near_dup_pairs(corpus, threshold=0.95)
    return pairs.select(
        "id1", "id2", F.round("cosine", 6).cast("double").alias("cosine")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "d09_doc_fingerprint",
    oracle="SELECT doc_id, "
    + DUCKDB_POLY_HASH.format(expr="lower(trim(text))")
    + " AS fp FROM documents",
    tags=("llm", "text"),
)
def d09_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint — content identity that is
    reproducible outside the JVM (unlike xxhash64), for cross-system
    lineage joins."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.expr(poly_hash("lower(trim(text))")).alias("fp")
    )


@query(
    "d10_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
         AS bpe_ish_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents
""",
    tags=("llm", "text"),
)
def d10_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) — corpus accounting
    entirely in JVM regex, no Python tokenizer in the hot path."""
    from ..operators.text import token_stats

    return token_stats(load(spark, sf_dir, "documents"))


@query(
    "d11_quality_score",
    oracle="""
SELECT doc_id,
       n_tokens,
       mean_tok_len,
       stop_ratio,
       CASE WHEN n_tokens >= 20 AND mean_tok_len >= 3.0 AND stop_ratio >= 0.05
            THEN 1 ELSE 0 END AS keep
FROM (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         (length(text) - len(string_split(text, ' ')) + 1) * 1.0
           / len(string_split(text, ' ')) AS mean_tok_len,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the', 'a', 'is', 'of', 'and'))) * 1.0
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
)
""",
    tags=("llm", "text"),
)
def d11_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length, mean token length, stopword
    ratio) with a keep/drop gate — the classic pre-training filter
    shape, all integer/ratio arithmetic so both engines agree exactly."""
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n_tok = F.size(t)
    stop = F.size(
        F.filter(t, lambda x: x.isin(*LANG_STOPWORDS["en"]))
    )
    mean_len = (F.length("text") - n_tok + 1) * F.lit(1.0) / n_tok
    stop_ratio = stop * F.lit(1.0) / n_tok
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"),
        F.when(
            (n_tok >= 20) & (mean_len >= 3.0) & (stop_ratio >= 0.05), 1
        )
        .otherwise(0)
        .alias("keep"),
    )


_LANG_CASES_SPARK = None  # built below


def _lang_scores(t):
    def score(ws: tuple[str, ...]):
        # single-arg lambda on purpose: a 2-arg callable would make
        # F.filter pass the element index as the second argument
        return F.size(F.filter(t, lambda x: x.isin(*ws)))

    return {
        lang: score(tuple(words))
        for lang, words in LANG_STOPWORDS.items()
        if lang != "zh"
    }


_LANG_SQL_SCORES = ", ".join(
    f"len(list_filter(t, x -> x IN ({', '.join(repr(w) for w in ws)}))) AS sc_{lang}"
    for lang, ws in LANG_STOPWORDS.items()
    if lang != "zh"
)


@query(
    "d12_langid",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN sc_en >= sc_de AND sc_en >= sc_fr AND sc_en >= sc_es THEN 'en'
            WHEN sc_de >= sc_fr AND sc_de >= sc_es THEN 'de'
            WHEN sc_fr >= sc_es THEN 'fr'
            ELSE 'es' END AS pred_lang,
       CAST(sc_en AS INTEGER) AS sc_en, CAST(sc_de AS INTEGER) AS sc_de,
       CAST(sc_fr AS INTEGER) AS sc_fr, CAST(sc_es AS INTEGER) AS sc_es
FROM (
  SELECT doc_id, lang, {_LANG_SQL_SCORES}
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
)
""",
    tags=("llm", "text"),
)
def d12_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (deterministic heuristic; this
    synthetic corpus shares one vocabulary across langs, so the point
    is the operator shape, not accuracy — fixed tie-break order
    en > de > fr > es)."""
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    sc = _lang_scores(t)
    pred = (
        F.when(
            (sc["en"] >= sc["de"]) & (sc["en"] >= sc["fr"]) & (sc["en"] >= sc["es"]),
            "en",
        )
        .when((sc["de"] >= sc["fr"]) & (sc["de"] >= sc["es"]), "de")
        .when(sc["fr"] >= sc["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        *[sc[lang].alias(f"sc_{lang}") for lang in ("en", "de", "fr", "es")],
    )


@query(
    "d13_tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS dfq FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, dfq,
       tf * ln((n_docs + 1.0) / (dfq + 1.0)) AS tfidf
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.dfq, n.n_docs,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfreq.dfq ASC, tf.term
         ) AS rn
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
) WHERE rn <= 3
""",
    tags=("llm", "text"),
)
def d13_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (B19). Ranking is on integer
    (tf, df, term) so it is deterministic; the double tfidf is carried
    as a value only. df table is tiny → broadcast back to the tf side."""
    docs = load(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfq"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("dfq"), F.asc("term")
    )
    return (
        tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n_docs))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .withColumn(
            "tfidf",
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("dfq") + 1.0)),
        )
        .select("doc_id", "term", "tf", "dfq", "tfidf")
    )


@query(
    "d14_bigram_freq",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT concat_ws(' ', t[i], t[i+1]) AS bigram
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 20
""",
    tags=("llm", "text"),
)
def d14_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram frequency (B19): top-20 bigrams. Explode →
    count → TakeOrdered; the global top-k never sorts the full corpus."""
    docs = load(spark, sf_dir, "documents")
    # token array materialized once (inlining split into element_at is
    # O(len^2) per doc), scan repartitioned if under-split
    toks = ensure_parallelism(docs).select(
        F.split(F.col("text"), " ").alias("__t")
    ).filter(F.size("__t") >= 2)
    t = F.col("__t")
    bg = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1, F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1)
        ),
    )
    return (
        toks.select(F.explode(bg).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "d15_training_pipeline",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tokens,
         (length(text) - len(string_split(text, ' ')) + 1) * 1.0
           / len(string_split(text, ' ')) AS mean_tok_len,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the', 'a', 'is', 'of', 'and'))) * 1.0
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
), kept AS (
  SELECT * FROM scored
  WHERE n_tokens >= 20 AND mean_tok_len >= 3.0 AND stop_ratio >= 0.05
), deduped AS (
  SELECT doc_id, lang, n_tokens FROM (
    SELECT doc_id, lang, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM deduped GROUP BY lang
""",
    tags=("llm", "pipeline"),
)
def d15_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline in one plan: quality gate →
    exact dedup (keep-first) → per-language token accounting. One
    composition, three shuffles (dedup window, final agg), every stage a
    reusable operator — the shape a 100 TB corpus actually runs nightly.
    """
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n_tok = F.size(t)
    stop = F.size(F.filter(t, lambda x: x.isin(*LANG_STOPWORDS["en"])))
    mean_len = (F.length("text") - n_tok + 1) * F.lit(1.0) / n_tok
    stop_ratio = stop * F.lit(1.0) / n_tok
    kept = (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("mean_tok_len", mean_len)
        .withColumn("stop_ratio", stop_ratio)
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("mean_tok_len") >= 3.0)
            & (F.col("stop_ratio") >= 0.05)
        )
    )
    deduped = D.exact_dedup(kept, ["text"], "doc_id", normalize=True)
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


#: Deterministic PII planting shared by d21's Spark and oracle sides:
#: the synthetic corpus contains no real PII, so every 20th doc gets a
#: known email+phone+SSN suffix — the redaction is then exercised on
#: real matches, not vacuously green on zero matches.
_D21_PLANT_SUFFIX = (
    "' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or 555-123-4567 ssn 123-45-6789'"
)


@query(
    "d21_pii_redaction",
    oracle=f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 20 = 0 THEN {_D21_PLANT_SUFFIX}
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(text, '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '[SSN]', 'g'),
      '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b', '[PHONE]', 'g'),
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'
  ) AS clean_text
FROM planted
""",
    tags=("llm", "text"),
)
def d21_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / phones / SSNs → typed placeholders) with
    per-category match counts — the scrub stage every training corpus
    runs before tokenization. Patterns live in the Java-regex ∩ RE2
    portable subset (operators/text.py PII_PATTERNS) so the DuckDB
    oracle reproduces the redaction byte-identically; pure
    regexp_replace/regexp_count expression work, no Python in the row
    path. PII is planted deterministically on every 20th doc (both
    engines) so the gate checks real matches."""
    from ..operators.text import redact_pii

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 20 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or 555-123-4567 ssn 123-45-6789"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = redact_pii(docs, "text")
    return out.select(
        "doc_id",
        F.col("n_ssn").cast("long").alias("n_ssn"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_email").cast("long").alias("n_email"),
        "clean_text",
    )


@query(
    "d22_segment_dedup",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), chunks AS (
  SELECT doc_id,
         array_to_string(t[1 + s.i * 20 : least(1 + s.i * 20 + 19, len(t))], ' ')
           AS chunk_text
  FROM toks, unnest(generate_series(0, (len(t) - 1) // 20)) AS s(i)
), hashed AS (
  SELECT doc_id, """
    + DUCKDB_POLY_HASH.format(expr="chunk_text")
    + """ AS ch FROM chunks
), freq AS (
  SELECT ch, COUNT(DISTINCT doc_id) AS nd FROM hashed GROUP BY ch
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS shared_ratio
FROM hashed JOIN freq USING (ch)
GROUP BY doc_id
""",
    tags=("llm", "dedup", "text"),
)
def d22_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup stats (the paragraph-dedup / boilerplate
    detector): split each doc into disjoint 20-token segments, portable-
    hash each, and report per doc how many of its segments also appear
    in at least one OTHER document. Catches cross-document boilerplate
    that document-level dedup misses (shared headers, license blocks,
    navigation chrome). Plan: zero-shuffle chunk fan-out (same slice
    pipeline as d16) → segment-hash groupBy (map-side partials) →
    equi-join back — shuffles carry 8-byte hashes, never segment text.
    The portable polynomial hash makes the oracle exact; at 100 TB swap
    xxhash64 for speed (identical plan shape)."""
    docs = load(spark, sf_dir, "documents")
    seg = 20
    toks = ensure_parallelism(docs).select(
        "doc_id", F.split(F.col("text"), " ").alias("__t")
    )
    t = F.col("__t")
    starts = F.sequence(
        F.lit(0), F.floor((F.size(t) - 1) / F.lit(seg)).cast("int"), F.lit(1)
    )
    chunks = (
        toks.select("doc_id", t.alias("__t"), F.posexplode(starts))
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.slice(F.col("__t"), F.col("pos") * seg + 1, F.lit(seg))
            ).alias("chunk_text"),
        )
        .select("doc_id", F.expr(poly_hash("chunk_text")).alias("ch"))
    )
    chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
    freq = chunks.groupBy("ch").agg(F.countDistinct("doc_id").alias("nd"))
    shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return (
        chunks.join(freq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            shared.alias("n_shared"),
            (shared * F.lit(1.0) / F.count("*")).alias("shared_ratio"),
        )
    )


@query(
    "d23_char_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, substring(text, s.i, 1) AS ch
  FROM documents, unnest(generate_series(1, length(text))) AS s(i)
), freq AS (
  SELECT doc_id, ch, COUNT(*) AS n FROM chars GROUP BY doc_id, ch
), tot AS (
  SELECT doc_id, SUM(n) AS total, COUNT(*) AS n_distinct FROM freq GROUP BY doc_id
)
SELECT f.doc_id,
       CAST(t.n_distinct AS BIGINT) AS n_distinct_chars,
       -SUM((n * 1.0 / total) * log2(n * 1.0 / total)) AS entropy_bits,
       CASE WHEN -SUM((n * 1.0 / total) * log2(n * 1.0 / total)) >= 3.0
            THEN 1 ELSE 0 END AS keep
FROM freq f JOIN tot t ON f.doc_id = t.doc_id
GROUP BY f.doc_id, t.n_distinct
""",
    tags=("llm", "text"),
)
def d23_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality score (the cheap perplexity proxy):
    Shannon entropy of the per-document character distribution, in
    bits. Degenerate content — repeated single characters, base64
    blobs' uniformity aside, single-token spam — sits far from natural
    text's ~4 bits/char, so a floor (3.0 here) is a standard corpus
    gate. Plan: char explode → (doc, char) count → per-doc entropy
    fold, exactly a character-level word count — scales with the scan,
    no UDFs. Same-operand-order sum as the oracle (term-per-char,
    grouped) keeps the float hash stable at 6 dp."""
    docs = load(spark, sf_dir, "documents")
    chars = ensure_parallelism(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.length("ch") > 0)
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("n"))
    # per-doc totals via a window (not a join-back): the window's
    # doc_id exchange is then REUSED by the final groupBy — 2 hash
    # exchanges total for the whole query (pinned in test_plans)
    w = Window.partitionBy("doc_id")
    freq = freq.withColumn("total", F.sum("n").over(w)).withColumn(
        "n_distinct", F.count("*").over(w)
    )
    p = F.col("n") * F.lit(1.0) / F.col("total")
    ent = -F.sum(p * F.log2(p))
    return (
        freq.groupBy("doc_id", "n_distinct")
        .agg(
            ent.alias("entropy_bits"),
            F.when(ent >= 3.0, 1).otherwise(0).alias("keep"),
        )
        .select(
            "doc_id",
            F.col("n_distinct").cast("long").alias("n_distinct_chars"),
            "entropy_bits",
            "keep",
        )
    )


#: rare-term blocking threshold for d24: a term appearing in ≤ this many
#: docs generates candidate pairs (bounded C(df,2) per term); common
#: terms never join. idf = ln(N/df) makes corpus-wide terms weightless,
#: so the blocked candidates capture the high-cosine mass.
_D24_RARE_DF = 20

#: minimum shared rare shingles for a candidate pair: near-dup pairs
#: share dozens, noise pairs rarely share 3 — raising this from 1
#: collapsed the candidates×terms cosine join ~50× at sf0.1 with the
#: same survivors (blocking knob; both engines apply it identically).
_D24_MIN_SHARED = 3


@query(
    "d24_tfidf_cosine_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS term
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM sh GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), norms AS (
  SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
), rare AS (
  SELECT term FROM dfreq WHERE df <= {_D24_RARE_DF} AND df >= 2
), cand AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  WHERE a.term IN (SELECT term FROM rare)
  GROUP BY 1, 2 HAVING COUNT(*) >= {_D24_MIN_SHARED}
), dots AS (
  SELECT c.id1, c.id2, SUM(w1.w * w2.w) AS dot
  FROM cand c
  JOIN w w1 ON w1.doc_id = c.id1
  JOIN w w2 ON w2.doc_id = c.id2 AND w2.term = w1.term
  GROUP BY c.id1, c.id2
)
SELECT d.id1, d.id2, d.dot / (n1.nrm * n2.nrm) AS cosine
FROM dots d
JOIN norms n1 ON n1.doc_id = d.id1
JOIN norms n2 ON n2.doc_id = d.id2
WHERE d.dot / (n1.nrm * n2.nrm) >= 0.3
""",
    tags=("llm", "similarity", "text"),
)
def d24_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-native similarity search (the sparse-vector complement of
    the embedding family): TF-IDF cosine over 3-gram shingle multisets
    — tf-weighted and idf-discounted, a genuinely different measure
    from d05's set-Jaccard — with candidate pairs blocked by shared
    RARE shingles (2 ≤ df ≤ 20) and the full cosine computed over ALL
    shared shingles for the survivors. ln(N/df) zeroes corpus-wide
    boilerplate, so the rare-term blocking captures the high-cosine
    mass while bounding candidate generation at C(df,2) per rare term —
    the classic inverted-index prune, never an O(n²) doc cross-join.
    (Shingles, not words: this corpus draws from a ~30-word vocabulary,
    so every word is corpus-wide; the shingle space has ~7k rare terms.
    At the 0.3 threshold the output isolates true near-dups — observed
    p99 of candidate cosines is ~0.05, near-dups land ≥0.9.)
    Every shuffle is keyed by term or doc id. Deterministic end-to-end,
    DuckDB-exact."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar dimension (one job, like IVF's codebook)
    sh = D.shingle_docs(docs, "doc_id", "text", n=3, distinct=False)
    tf = (
        sh.groupBy("id", "shingle")
        .agg(F.count("*").alias("tf"))
        .select(F.col("id").alias("doc_id"), F.col("shingle").alias("term"), "tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        tf.join(dfreq, "term")
        .withColumn("w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .select("doc_id", "term", "w", "df")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    rare_w = w.filter((F.col("df") <= _D24_RARE_DF) & (F.col("df") >= 2))
    cand = (
        rare_w.alias("a")
        .join(
            rare_w.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count("*").alias("__shared"))
        .filter(F.col("__shared") >= _D24_MIN_SHARED)
        .select("id1", "id2")
    )
    w1 = w.select(F.col("doc_id").alias("id1"), "term", F.col("w").alias("w1"))
    w2 = w.select(F.col("doc_id").alias("id2"), "term", F.col("w").alias("w2"))
    dots = (
        cand.join(w1, "id1")
        .join(w2, ["id2", "term"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = norms.select(F.col("doc_id").alias("id1"), F.col("nrm").alias("n1"))
    n2 = norms.select(F.col("doc_id").alias("id2"), F.col("nrm").alias("n2"))
    return (
        dots.join(n1, "id1")
        .join(n2, "id2")
        .withColumn("cosine", F.col("dot") / (F.col("n1") * F.col("n2")))
        .filter(F.col("cosine") >= 0.3)
        .select("id1", "id2", "cosine")
    )


@query(
    "d25_url_canonical_dedup",
    oracle="""
WITH planted AS (
  SELECT doc_id,
         'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
           || '.Example.com/Path/' || CAST(doc_id % 3 AS VARCHAR)
           || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=rss' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END AS url
  FROM documents
), canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), '^https?://', ''),
               '^www\\.', ''),
             '\\?.*$', ''),
           '/+$', '') AS curl
  FROM planted
)
SELECT curl,
       regexp_extract(curl, '^[^/]+') AS host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
FROM canon
GROUP BY curl
""",
    tags=("llm", "dedup", "text"),
)
def d25_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (the crawl-pipeline primitive:
    scheme/case/www/query-string/trailing-slash variants of one page
    must collapse to one fetch). Canonical form: lowercase, scheme and
    'www.' stripped, query string and trailing slashes dropped; dedup
    groups by canonical URL with a deterministic survivor (min doc_id).
    Pure regexp expression chain in the Java∩RE2 portable subset —
    codegen scan + one map-side-combined groupBy. URLs are planted
    deterministically (scheme-case × query × trailing-slash variants
    over 21 page identities) so the collapse is exercised for real in
    both engines."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW.Site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.com/Path/"),
        (F.col("doc_id") % 3).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "?utm_source=feed&ref=rss").otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, "/").otherwise(""),
    )
    curl = F.lower(url)
    for pat in [r"^https?://", r"^www\.", r"\?.*$", r"/+$"]:
        curl = F.regexp_replace(curl, pat, "")
    return (
        docs.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .select(
            "curl",
            F.regexp_extract("curl", r"^[^/]+", 0).alias("host"),
            "n_docs",
            "canonical_doc",
        )
    )


@query(
    "d16_chunk_documents",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
       CAST(s.i AS INTEGER) AS chunk_id,
       CAST(len(t[1 + s.i * 30 : least(1 + s.i * 30 + 49, len(t))]) AS INTEGER)
         AS n_chunk_tokens,
       array_to_string(t[1 + s.i * 30 : least(1 + s.i * 30 + 49, len(t))], ' ')
         AS chunk_text
FROM toks, unnest(generate_series(0, (len(t) - 1) // 30)) AS s(i)
""",
    tags=("llm", "chunking"),
)
def d16_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window chunking: 50-token windows with stride 30
    (20-token overlap) — the op that turns documents into model
    sequences. Pure explode fan-out: tokenize once, generate start
    offsets, slice; no shuffle at all (the chunk rows stay on the
    partition that scanned the document), so it scales exactly like the
    scan."""
    docs = load(spark, sf_dir, "documents")
    window, stride = 50, 30
    toks = ensure_parallelism(docs).select(
        "doc_id", F.split(F.col("text"), " ").alias("__t")
    )
    t = F.col("__t")
    n = F.size(t)
    starts = F.sequence(
        F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int"), F.lit(1)
    )
    return (
        toks.select("doc_id", t.alias("__t"), F.posexplode(starts))
        .select(
            "doc_id",
            F.col("pos").alias("chunk_id"),
            F.slice(
                F.col("__t"), F.col("pos") * stride + 1, F.lit(window)
            ).alias("__chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
        )
    )


@query(
    "d17_contamination_check",
    oracle=_SH_DUCK
    + """
SELECT tr.doc_id, CAST(COUNT(DISTINCT tr.shingle) AS BIGINT) AS n_shared
FROM sh tr
JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50) ev
  ON tr.shingle = ev.shingle
WHERE tr.doc_id >= 50
GROUP BY tr.doc_id
""",
    tags=("llm", "contamination"),
)
def d17_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for each training document, how
    many distinct n-grams it shares with the eval set (doc_id < 50
    stands in for the benchmark). The eval n-gram set is DISTINCT and
    small by nature → broadcast to the training side; cost is one scan
    of the training shingles, no shuffle of the corpus. The real-corpus
    form swaps 3-grams for 8-13-gram spans (the standard contamination
    window) — same plan."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3)
    ev = sh.filter(F.col("id") < 50).select("shingle").distinct()
    tr = sh.filter(F.col("id") >= 50)
    return (
        tr.join(broadcast(ev), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count_distinct("shingle").alias("n_shared"))
    )


@query(
    "d18_repetition_ratio",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), freq AS (
  SELECT doc_id, shingle, COUNT(*) AS c FROM sh GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_shingles,
       CAST(MAX(c) AS BIGINT) AS max_freq,
       MAX(c) * 1.0 / SUM(c) AS rep_ratio,
       CAST(CASE WHEN MAX(c) * 1.0 / SUM(c) > 0.1 THEN 1 ELSE 0 END
            AS INTEGER) AS repetitive
FROM freq GROUP BY doc_id
""",
    tags=("llm", "quality"),
)
def d18_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style quality rule): the most
    frequent trigram's share of all trigram occurrences. Multiset
    shingles → per-(doc, shingle) count → per-doc max/sum; two partial-
    aggregated shuffles on doc-local keys, no cross-document joins."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3, distinct=False)
    freq = sh.groupBy("id", "shingle").agg(F.count("*").alias("c"))
    ratio = F.max("c") * F.lit(1.0) / F.sum("c")
    return freq.groupBy(F.col("id").alias("doc_id")).agg(
        F.sum("c").alias("n_shingles"),
        F.max("c").alias("max_freq"),
        ratio.alias("rep_ratio"),
        F.when(ratio > 0.1, 1).otherwise(0).alias("repetitive"),
    )


#: Per-language keep-rates (percent) for the deterministic sampler —
#: the shape of a real corpus-mixing config.
_D19_RATES = {"en": 50, "de": 20, "fr": 20, "es": 20}

_D19_BUCKET_DUCK = DUCKDB_POLY_HASH.format(
    expr="concat('mix1:', CAST(doc_id AS VARCHAR))"
)


@query(
    "d19_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, CAST(({_D19_BUCKET_DUCK}) % 100 AS INTEGER) AS bucket
FROM documents
WHERE ({_D19_BUCKET_DUCK}) % 100 <
      CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                WHEN 'fr' THEN 20 WHEN 'es' THEN 20 ELSE 0 END
""",
    tags=("llm", "sampling"),
)
def d19_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus mixing: keep-rate
    per language, membership decided by a salted portable hash of the
    key — reproducible across engines, runs, and partitionings (unlike
    ``sample()``/``rand()``), so a training mix can be audited and
    re-materialized exactly. Pure filter: no shuffle, scales with the
    scan; changing the salt re-draws the sample."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.expr(poly_hash("concat('mix1:', CAST(doc_id AS STRING))")) % 100
    ).cast("int")
    expr = None
    for lang, pct in _D19_RATES.items():
        expr = (
            F.when(F.col("lang") == lang, pct)
            if expr is None
            else expr.when(F.col("lang") == lang, pct)
        )
    rate = expr.otherwise(0)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "mm1_binary_stats",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       sha256(text) AS digest
FROM documents
""",
    tags=("llm", "multimodal"),
)
def mm1_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: byte length + content digest of
    the payload — the metadata layer every multimodal table needs."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


@query(
    "mm2_image_decode_stub",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CASE octet_length(encode(text)) % 3
         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
FROM documents
""",
    tags=("llm", "multimodal"),
)
def mm2_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over the binary column — the
    real distributed plumbing (schema, batching, partitioning) with a
    deterministic stub where PIL/ffmpeg would plug in
    (operators/multimodal.py). The oracle mirrors the stub formula, so
    what's verified is the Arrow round-trip itself."""
    docs = load(spark, sf_dir, "documents")
    return MM.decode_images(docs)


@query(
    "mm3_frame_sample",
    oracle="""
SELECT doc_id, CAST(unnest(generate_series(0, doc_id % 30, 5)) AS INTEGER)
         AS frame_idx
FROM documents
""",
    tags=("llm", "multimodal"),
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as relational fan-out: every 5th frame
    index per clip — explode over a sequence, fully Catalyst-native."""
    docs = load(spark, sf_dir, "documents")
    return MM.sample_frames(docs, step=5)


@pandas_udf(T.DoubleType())
def _length_score(n_chars):
    return n_chars / (n_chars + 100.0)


@query(
    "mm4_pandas_udf_score",
    oracle="""
SELECT doc_id, n_chars / (n_chars + 100.0) AS score FROM documents
""",
    tags=("llm", "udf"),
)
def mm4_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF surface (B20): Arrow-batched scalar UDF
    computing a saturation score — verifies the Arrow transfer path
    produces bit-identical doubles to pure SQL."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", _length_score(F.col("n_chars")).alias("score"))


@query(
    "d26_bloom_prefilter_semi_join",
    oracle="""
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
WHERE e.user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
GROUP BY e.event_type
""",
    tags=("llm", "bloom", "join"),
)
def d26_bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (operators/bloom.py): activity
    of negative-balance customers. The big side is prefiltered by a
    broadcast m-bit Bloom filter built from the small key set BEFORE
    the exact semi join — at 100 TB the kilobyte filter drops ~99% of
    non-matching fact rows at the scan, which is the entire cost of the
    naive plan. No false negatives + exact confirm join ⇒ bit-identical
    to the plain semi join the oracle runs; every per-row op is JVM
    codegen (double-hashed xxhash64 probes, element_at bit tests)."""
    from ..operators.bloom import bloom_semi_join

    events = load(spark, sf_dir, "events")
    risky = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    matched = bloom_semi_join(
        events, risky, big_key="user_id", small_key="c_custkey"
    )
    return matched.groupBy("event_type").agg(
        F.count("*").alias("n_events"), dsum("value", "total_value")
    )


@query(
    "d27_freq_items_heavy_hitters",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences, TRUE AS covered
FROM toks CROSS JOIN tot
GROUP BY word, tot.n
HAVING COUNT(*) > 0.01 * tot.n
""",
    tags=("llm", "sketch", "text"),
)
def d27_freq_items_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark's one-pass frequent-items sketch
    (``df.stat.freqItems``, the Karp/Papadimitriou/Shenker lossy-count
    algorithm): vocabulary words above 1% of all tokens. The sketch's
    guarantee is NO FALSE NEGATIVES (every item above the support
    threshold is returned; driver state bounded by ~1/support items
    regardless of corpus size — the 100 TB path needs no full-vocab
    shuffle). The bounded-comparison gate: exact counts identify the
    true heavy set, and ``covered`` asserts each is in the sketch's
    candidate list — all-TRUE against the oracle, so a sketch false
    negative flips the hash. The exact recount exists only to verify
    the sketch; production runs the sketch alone."""
    docs = load(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs).select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    support = 0.01
    candidates = set(toks.stat.freqItems(["word"], support).collect()[0][0])
    # the token total rides the exact recount (sum of the per-word
    # counts == count of tokens, an exact long identity): the round-13
    # form paid a THIRD full tokenize+explode pass plus a driver
    # action just to collect it (guide §1.2 fewer passes, §5 driver).
    # `exact` is vocab-sized — persist it for its two consumers.
    exact = (
        toks.groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total_df = exact.agg(F.sum("n_occurrences").alias("__total"))
    heavy = (
        exact.crossJoin(F.broadcast(total_df))
        .filter(F.col("n_occurrences") > support * F.col("__total"))
        .drop("__total")
    )
    cand_df = toks.sparkSession.createDataFrame(
        [(w,) for w in sorted(candidates)], "word string"
    ).withColumn("covered", F.lit(True))
    return heavy.join(broadcast(cand_df), "word", "left").select(
        "word", "n_occurrences", F.coalesce("covered", F.lit(False)).alias("covered")
    )


@query(
    "mm5_audio_window_energy",
    oracle="""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), pos AS (
  SELECT doc_id, vs, unnest(range(0, len(vs))) AS i FROM s
)
SELECT doc_id, CAST(i // 64 AS BIGINT) AS window_idx,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(vs[i + 1] * vs[i + 1]) AS BIGINT) AS energy
FROM pos GROUP BY 1, 2
""",
    tags=("llm", "multimodal"),
)
def mm5_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction plumbing (B-multimodal): binary
    waveform → 64-sample windows → exact integer energy per window,
    via Arrow-batched mapInPandas (operators/multimodal.py:
    audio_energy_batch — codec stubbed to raw bytes; ASCII corpus makes
    the oracle able to recompute samples from code points). What's
    verified is the real thing: blob→array decode, windowing math, and
    the Arrow round-trip, at every window of every document."""
    docs = load(spark, sf_dir, "documents")
    return MM.audio_energy(docs)


# ---------------------------------------------------------------------------
# Round 6: LM-based quality scoring, sketch frequency, semantic dedup
# ---------------------------------------------------------------------------


@query(
    "d29_bigram_lm_perplexity",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS arr
  FROM documents
),
toks AS (SELECT doc_id, unnest(arr) AS tok FROM t),
bg0 AS (SELECT doc_id, unnest(list_zip(arr, arr[2:])) AS p FROM t),
bg AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM bg0 WHERE p[2] IS NOT NULL
),
uni AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY w1),
big AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM toks)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-LN((cb + 1.0) / (cu + vocab))), 6) AS nll_bigram
FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
GROUP BY bg.doc_id
""",
    tags=("llm", "text"),
)
def d29_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring (the CCNet/Wikipedia-LM filter
    shape used by every public pretraining pipeline): train an add-one
    smoothed bigram model ON the corpus itself and score each document
    by its mean bigram negative log-likelihood — low = repetitive /
    formulaic text, high = unusual token transitions. 100% built-in
    column expressions:

    - bigram extraction is ZERO-shuffle: `arrays_zip(slice(a,1,n-1),
      slice(a,2,n-1))` + one explode, no window/self-join per doc;
    - model "training" is the two groupBy counts (map-side combinable);
    - scoring joins each doc's bigrams back to the count tables (the
      model tables are corpus-vocabulary-sized — broadcast when small,
      shuffle-join at 100 TB vocab) and averages -ln P(w2|w1).

    Exactness: counts and vocab are integers; P is one double division
    and ln/avg follow identically in DuckDB — rounded to 6 dp."""
    docs = load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    t = docs.select("doc_id", arr.alias("arr"))
    n = F.size(F.col("arr"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("arr"), 1, n - 1),
                F.slice(F.col("arr"), 2, n - 1),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        F.col("p").getField("0").alias("w1"),
        F.col("p").getField("1").alias("w2"),
    )
    toks = t.select("doc_id", F.explode("arr").alias("tok"))
    uni = bg.groupBy("w1").agg(F.count("*").alias("cu"))
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    vocab = toks.agg(F.countDistinct("tok").alias("vocab"))
    scored = (
        bg.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.avg(
                -F.log(
                    (F.col("cb") + F.lit(1.0))
                    / (F.col("cu") + F.col("vocab"))
                )
            ),
            6,
        ).alias("nll_bigram"),
    )


_D28_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
UNION ALL SELECT CAST(-3 AS BIGINT), TRUE
"""


@query("d28_cms_frequency", oracle=_D28_ORACLE, tags=("llm", "sketch", "approx"))
def d28_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch point-frequency estimation over orders.o_custkey
    (operators/cms.py — Cormode & Muthukrishnan 2005) as a
    bounded-comparison gate. The sketch is a depth x width TABLE built
    with one map-side-combinable aggregation and merged by counter
    addition — the at-rest frequency summary that replaces an exact
    per-key shuffle at 100 TB.

    Driver contract (all-TRUE oracle):
    - probe -1: one-sided guarantee — estimate >= exact count for
      EVERY key (deterministic CMS property, not probabilistic).
    - probe -2: error bound — estimate <= exact + 4*N/width for every
      key (the epsilon ~ e/width bound with slack; deterministic for
      fixed data + seed).
    - probe -3: linearity — the sketch of all orders equals the
      counter-sum of the sketches of the two orderkey-parity halves,
      cell for cell (mergeability, the property that makes per-day
      sketches composable).
    The exact recount here exists to measure the sketch (same pattern
    as b08x); production reads the sketch table only."""
    from ..operators import cms as CMS

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    width, depth = 256, 4
    sketch = CMS.cms_build(orders, "o_custkey", width, depth).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    exact = orders.groupBy("o_custkey").agg(F.count("*").alias("exact"))
    est = CMS.cms_estimate(sketch, exact, "o_custkey", width, depth)
    n_total = orders.count()  # scalar for the bound; O(1) driver state
    both = exact.join(est, "o_custkey")
    lower = both.agg(
        F.min(F.col("est") >= F.col("exact")).alias("ok")
    ).select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    upper = both.agg(
        F.min(F.col("est") <= F.col("exact") + F.lit(4.0 * n_total / width))
        .alias("ok")
    ).select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    evens = orders.filter(F.col("o_orderkey") % 2 == 0)
    odds = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = CMS.cms_merge(
        CMS.cms_build(evens, "o_custkey", width, depth),
        CMS.cms_build(odds, "o_custkey", width, depth),
    )
    diff = (
        sketch.withColumnRenamed("cnt", "a")
        .join(merged.withColumnRenamed("cnt", "b"), ["d", "bucket"], "full")
        .filter(
            F.coalesce(F.col("a"), F.lit(0))
            != F.coalesce(F.col("b"), F.lit(0))
        )
    )
    linear = diff.agg((F.count("*") == 0).alias("ok")).select(
        F.lit(-3).cast("long").alias("probe_id"), "ok"
    )
    return lower.unionByName(upper).unionByName(linear)


_D30_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
UNION ALL SELECT CAST(-3 AS BIGINT), TRUE
"""


@query("d30_semantic_dedup", oracle=_D30_ORACLE, tags=("llm", "dedup", "approx"))
def d30_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster embeddings coarsely, remove items whose cosine to a
    smaller-id item IN THE SAME CLUSTER clears the threshold
    (operators/similarity.py:semantic_dedup). The cluster-then-compare
    shape bounds the pair join to within-cell pairs — the published
    recipe for embedding-level dedup at corpus scale.

    Driver contract (all-TRUE oracle) on the planted-twin corpus
    (originals + vec_id+1e6 scaled copies; organic max cosine ~0.60
    stays far under the 0.95 threshold):
    - probe -1: exactly the 20 planted twin ids are removed (cosine
      cell assignment is scale-invariant, so each twin shares its
      original's cell and scores cosine 1.0 against it).
    - probe -2: every organic vector is kept (no false positives).
    - probe -3: each removed item's representative (`dup_of`) is
      exactly its original (id - 1e6)."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    res = S.semantic_dedup(corpus, n_cells=16, threshold=0.95).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    removed = res.filter(~F.col("keep"))
    planted_exact = removed.agg(
        (
            (F.count("*") == 20)
            & F.min(F.col("id") >= 1_000_000)
        ).alias("ok")
    ).select(F.lit(-1).cast("long").alias("probe_id"), "ok")
    organic_kept = res.filter(F.col("id") < 1_000_000).agg(
        F.min("keep").alias("ok")
    ).select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    rep_is_original = removed.agg(
        F.min(F.col("dup_of") == F.col("id") - 1_000_000).alias("ok")
    ).select(F.lit(-3).cast("long").alias("probe_id"), "ok")
    return planted_exact.unionByName(organic_kept).unionByName(rep_is_original)


# ---------------------------------------------------------------------------
# Round 6 (cont.): sampling & data mixing for training pipelines
# ---------------------------------------------------------------------------

_D31_HASH = DUCKDB_POLY_HASH.format(expr="('wps:' || CAST(doc_id AS VARCHAR))")


@query(
    "d31_weighted_priority_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, n_chars, {_D31_HASH} AS h FROM documents
)
SELECT doc_id, n_chars AS weight,
       ROUND(LN((h + 1) / {POLY_MOD + 1}.0) / GREATEST(n_chars, 1), 9)
         AS priority
FROM h
ORDER BY priority DESC, doc_id
LIMIT 100
""",
    tags=("llm", "sampling"),
)
def d31_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-Res): each document gets priority ``u^(1/w)`` — equivalently
    ``ln(u)/w``, the monotone form used here — with ``u`` derived from
    the portable polynomial hash of its id (deterministic, so both
    engines select the identical sample) and ``w = n_chars`` (longer
    documents proportionally likelier). Take the top-k priorities.

    Scale shape: the one-pass distributed weighted sampler — priority
    is a pure per-row expression inside codegen and the top-k is
    ``TakeOrderedAndProject`` (map-side partial top-k per partition,
    only k rows per partition reach the driver-side merge); no shuffle
    of the corpus, no RNG state to coordinate, and re-running on the
    same snapshot reproduces the sample bit-for-bit (the property that
    makes training-data draws auditable)."""
    docs = load(spark, sf_dir, "documents")
    h = F.expr(poly_hash("concat('wps:', cast(doc_id as string))"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(POLY_MOD + 1))
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.round(F.log(u) / w, 9).alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(100)
    )


_D32_HASH = DUCKDB_POLY_HASH.format(expr="('mix:' || CAST(doc_id AS VARCHAR))")


@query(
    "d32_mixture_rebalance",
    oracle=f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n_total FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
),
m AS (SELECT MIN(n_total) AS mn FROM c),
r AS (
  SELECT lang, n_total, CAST(mn AS DOUBLE) / n_total AS rate
  FROM c CROSS JOIN m
),
k AS (
  SELECT d.lang, COUNT(*) AS n_kept
  FROM documents d JOIN r USING (lang)
  WHERE ({_D32_HASH} + 1) / {POLY_MOD + 1}.0 < rate
  GROUP BY d.lang
)
SELECT lang, n_total, n_kept, ROUND(rate, 6) AS keep_rate
FROM r JOIN k USING (lang)
""",
    tags=("llm", "sampling"),
)
def d32_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing: downsample every language to the
    scarcest language's share (the balanced-mixture special case of
    per-source mixture weights used when assembling pretraining mixes).
    Per-lang keep-rate ``rate = min_count / count``, applied as a
    deterministic Bernoulli filter ``u(doc) < rate`` with ``u`` from
    the portable hash — so the subsample is reproducible and the
    per-document decision needs no RNG coordination across executors.

    Scale shape: one small aggregate (lang cardinality ~dozens)
    broadcast back onto the corpus, then a pure filter inside codegen
    — the corpus is scanned once and never shuffled; the output agg
    shuffles only the surviving row counts. Integer hash + one double
    divide on each side → the selection is bit-identical across
    engines (no libm in the decision path)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    cnt = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    mn = cnt.agg(F.min("n_total").alias("mn"))
    rates = cnt.crossJoin(F.broadcast(mn)).select(
        "lang",
        "n_total",
        (F.col("mn").cast("double") / F.col("n_total")).alias("rate"),
    )
    h = F.expr(poly_hash("concat('mix:', cast(doc_id as string))"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(POLY_MOD + 1))
    kept = (
        docs.join(broadcast(rates.select("lang", "rate")), "lang")
        .filter(u < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return kept.join(broadcast(rates), "lang").select(
        "lang", "n_total", "n_kept", F.round("rate", 6).alias("keep_rate")
    )


@query(
    "d33_shingle_containment_pairs",
    oracle=_SH_DUCK
    + _SH_CAPPED_DUCK
    + """,
cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS src_id, b.doc_id AS dst_id, COUNT(*) AS isz
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT src_id, dst_id, isz * 1.0 / c1.n AS containment
FROM inter JOIN cnt c1 ON src_id = c1.doc_id
WHERE isz * 1.0 / c1.n >= 0.8
""",
    tags=("llm", "dedup"),
)
def d33_shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT pairs (asymmetric Jaccard, Broder 1997):
    ``C(src→dst) = |src ∩ dst| / |src|`` over distinct 3-gram sets —
    the subset-duplicate detector that symmetric-Jaccard dedup (d05)
    structurally misses: a short document quoted whole inside a long
    one has high containment but low Jaccard. Threshold 0.8 emits
    ordered (src, dst) pairs: "80% of src's n-grams appear in dst".

    Scale shape is d05's: the inverted-index equi-join on shingles
    bounds candidate pairs to documents actually sharing an n-gram,
    and the shared document-frequency cap (applied identically in both
    engines) removes the hot-shingle quadratic bucket. The asymmetric
    output doubles the pair rows but needs only ONE per-doc count join
    (the denominator is the src set only)."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3)
    sh = D.cap_bucket_width(sh, ["shingle"], _D05_MAX_DF)
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("src_id"), F.col("b.id").alias("dst_id"))
        .agg(F.count("*").alias("isz"))
    )
    counts = sh.groupBy("id").agg(F.count("*").alias("n"))
    return (
        inter.join(
            counts.select(F.col("id").alias("src_id"), F.col("n").alias("n1")),
            "src_id",
        )
        .withColumn("containment", F.col("isz") * F.lit(1.0) / F.col("n1"))
        .filter(F.col("containment") >= 0.8)
        .select("src_id", "dst_id", "containment")
    )


_D34_ORACLE = """
SELECT vec_id AS probe_id, TRUE AS ok FROM embeddings WHERE vec_id < 20
UNION ALL SELECT CAST(-1 AS BIGINT), TRUE
"""


@query("d34_sq8_ann_topk", oracle=_D34_ORACLE, tags=("llm", "similarity", "approx"))
def d34_sq8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized SQ8 ANN top-5 (operators/similarity.py:
    sq8_cosine_topk) — int8 codes at rest, approximate code scan,
    exact re-rank of a 20-wide shortlist. Completes the quantization
    family next to PQ (d07v/d07u) and IVF-PQ (d07t).

    Driver contract (all-TRUE oracle, d07y pattern):
    - probes 0..19: the planted 2x twin quantizes to (near-)identical
      codes, tops the approximate scan, and the exact re-rank reports
      it at rank 1 with cosine 1.0 — deterministic.
    - probe -1: recall@5 vs brute force >= 0.6 (8-bit quantization
      noise only perturbs near-ties; measured recall is far higher)."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _twin_corpus(em)
    queries = em.filter(F.col("vec_id") < 20)
    ann = S.sq8_cosine_topk(corpus, queries, k=5, shortlist=20).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    brute = S.brute_force_cosine_topk(corpus, queries, k=5)
    return _twin_rank1_ok(queries, ann).unionByName(
        _recall_row(ann, brute, 0.6, -1)
    )


_D35_ORACLE = (
    _SH_DUCK.replace("FROM documents", "FROM documents")
    + ", h AS (SELECT doc_id, "
    + DUCKDB_POLY_HASH.format(expr="shingle")
    + " AS h FROM sh),\nsigs AS (SELECT doc_id, "
    + ", ".join(
        f"CAST(MIN(({a} * h + {b}) % {_D04X_P}) AS BIGINT) AS mh_{i}"
        for i, (a, b) in enumerate(_MINHASH_PERMS)
    )
    + " FROM h GROUP BY doc_id),"
    + """
base_reps AS (
  SELECT MIN(doc_id) AS doc_id,
         mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
  FROM sigs WHERE doc_id % 10 < 7
  GROUP BY mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
), delta AS (
  SELECT * FROM sigs WHERE doc_id % 10 >= 7
), bb AS (
"""
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_d04x_band_sql(b)} AS bh FROM base_reps"
        for b in range(2)
    )
    + "), db AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_d04x_band_sql(b)} AS bh FROM delta"
        for b in range(2)
    )
    + """
), cands AS (
  SELECT DISTINCT bb.doc_id AS id1, db.doc_id AS id2
  FROM bb JOIN db ON bb.band = db.band AND bb.bh = db.bh
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS isz
  FROM cands c
  JOIN sh a ON a.doc_id = c.id1
  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id1 AS base_id, i.id2 AS delta_id,
       isz * 1.0 / (c1.n + c2.n - isz) AS jaccard
FROM inter i
JOIN cnt c1 ON i.id1 = c1.doc_id
JOIN cnt c2 ON i.id2 = c2.doc_id
WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.5
"""
)


@query("d35_incremental_dedup", oracle=_D35_ORACLE, tags=("llm", "dedup"))
def d35_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission — the shape every GROWING corpus
    needs: new (delta) documents are checked against the EXISTING
    (base) dedup store without ever re-pairing the base with itself.
    Base signatures are collapsed to one representative per identical
    signature (what a dedup store persists); delta band hashes probe
    the base's band buckets (base x delta equi-join only — cost scales
    with the DELTA, not corpus²); survivors get the exact-Jaccard
    verify at 0.5 against the stored representative.

    Split is deterministic (doc_id % 10: 70% base / 30% delta) so both
    engines see the identical store; the portable polynomial hashing
    (d04x machinery) makes the whole pipeline hash-exact vs DuckDB.
    Emits (base_id, delta_id, jaccard) for every REJECTED delta doc —
    at 100 TB the same plan runs per ingest batch with the base
    signature/bucket tables pre-materialized at rest."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    h = sh.withColumn("h", F.expr(poly_hash("shingle")))
    # persisted: the signature aggregation (a full shingle-set shuffle)
    # feeds BOTH the base and the delta branch — one materialization
    # instead of two (the d50/d106 multiply-consumed-frame discipline)
    sigs = h.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _D04X_P).alias(f"mh_{i}")
            for i, (a, b) in enumerate(_MINHASH_PERMS)
        ]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig_cols = [f"mh_{i}" for i in range(8)]
    base_reps = (
        sigs.filter(F.col("id") % 10 < 7)
        .groupBy(*sig_cols)
        .agg(F.min("id").alias("id"))
    )
    delta = sigs.filter(F.col("id") % 10 >= 7)

    def band_hash(b: int):
        expr = None
        for r, m in enumerate(_D04X_MULT):
            term = F.col(f"mh_{b * 4 + r}") * F.lit(m)
            expr = term if expr is None else expr + term
        return (expr % F.lit(_D04X_P)).alias("bh")

    def to_buckets(df: DataFrame) -> DataFrame:
        return df.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), band_hash(b))
                        for b in range(2)
                    ]
                )
            ).alias("bb"),
        ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    bb = to_buckets(base_reps).alias("l")
    db = to_buckets(delta).alias("r")
    cands = (
        bb.join(
            db,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh")),
        )
        .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .distinct()
    )
    return D.verify_jaccard(cands, sh, 0.5).select(
        F.col("id1").alias("base_id"),
        F.col("id2").alias("delta_id"),
        "jaccard",
    )


def _d36_oracle(iters: int = 5) -> str:
    steps = []
    for i in range(iters):
        steps.append(
            f"""pr{i + 1} AS (
  SELECT nodes.node,
         0.15 / nn.n + 0.85 * COALESCE(SUM(pr{i}.rank / deg.d), 0) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN edges ON edges.dst = nodes.node
  LEFT JOIN deg ON deg.src = edges.src
  LEFT JOIN pr{i} ON pr{i}.node = edges.src
  GROUP BY nodes.node, nn.n
)"""
        )
    return (
        """
WITH nodes AS (SELECT doc_id AS node FROM documents),
nn AS (SELECT COUNT(*) AS n FROM nodes),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + k) % (SELECT n FROM nn) AS dst
  FROM documents, unnest([1, 2, 3]) AS t(k)
  WHERE (doc_id * 7 + k) % (SELECT n FROM nn) <> doc_id
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
"""
        + ",\n".join(steps)
        + f"\nSELECT node, ROUND(rank, 6) AS rank FROM pr{iters}"
    )


@query("d36_pagerank_centrality", oracle=_d36_oracle(5), tags=("llm", "graph"))
def d36_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 synchronous iterations) — the
    iterative-algorithm class beyond one-shot queries, on a
    deterministic synthetic link graph derived from doc_id (each doc
    links to (id*7+k) % N, k=1..3, self-loops dropped — the d25 trick:
    the graph is synthesized, the OPERATOR is real). Each iteration is
    one join of the rank vector to the edge list plus a grouped sum —
    the classic Pregel-as-DataFrame step; ``localCheckpoint`` truncates
    the growing lineage per round (the d20 connected-components
    pattern), and at 100 TB both sides hash-partition on the join key
    so each round is one co-partitioned shuffle.

    The DuckDB oracle unrolls the same 5 iterations as chained CTEs —
    value-exact to the 6-dp rounding (per-node in-degree is ~3, so
    float summation-order drift stays ~1e-15, far under the rounding
    grain)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select("src", ((F.col("src") * 7 + F.col("k")) % n).alias("dst"))
        .filter(F.col("dst") != F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ed = edges.join(deg, "src")
    ranks = docs.select(
        F.col("doc_id").alias("node"), F.lit(1.0 / n).alias("rank")
    )
    for _ in range(5):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("d")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            docs.select(F.col("doc_id").alias("node"))
            .join(contribs, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(0.15 / n)
                    + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            # lazy: plans stay truncated (LogicalRDD) but the five
            # per-iteration materialization JOBS collapse into the
            # final action, each iteration served from its checkpoint
            # blocks (same pattern as the CC loops, optimization r13)
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "d37_retrieval_pipeline",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10
), topk AS (
  SELECT q_id, c_id, cosine, rn AS rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rn
    FROM scored
  ) WHERE rn <= 3
)
SELECT t.q_id, t.rank, t.c_id, t.cosine, d.lang,
       substring(d.text, 1, 40) AS snippet
FROM topk t JOIN documents d ON d.doc_id = t.c_id
""",
    tags=("llm", "similarity", "retrieval"),
)
def d37_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval (the RAG serving shape): query embedding →
    top-3 nearest neighbors by cosine → hydrate each hit with its
    document's metadata and a snippet. The ANN stage here is the exact
    brute-force scorer so the oracle can verify the WHOLE pipeline
    value-exactly; swapping in any of the approximate indexes
    (d07x/y/u/t/d34) changes one call — the hydration join is the same.

    Scale shape: the similarity stage broadcasts the (small) query set
    over the corpus; hydration is a |queries| x k row join against the
    documents table — at 100 TB the join side is tiny and broadcasts,
    so document payloads are fetched only for actual hits, never
    scanned wholesale."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = em.filter(F.col("vec_id") < 10)
    topk = S.brute_force_cosine_topk(em, queries, k=3)
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("c_id"),
        "lang",
        F.substring("text", 1, 40).alias("snippet"),
    )
    return topk.join(docs, "c_id").select(
        "q_id", "rank", "c_id", "cosine", "lang", "snippet"
    )


@query(
    "d38_knn_label_classify",
    oracle=f"""
WITH n AS (
  SELECT vec_id, label, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label,
         {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.vec_id >= 20
  WHERE q.vec_id < 20
), top AS (
  SELECT q_id, label FROM (
    SELECT q_id, label, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
    FROM scored
  ) WHERE rn <= 10
), votes AS (
  SELECT q_id, label, COUNT(*) AS votes FROM top GROUP BY 1, 2
)
SELECT q_id, label AS pred_label, CAST(votes AS BIGINT) AS votes FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY votes DESC, label) AS rn
  FROM votes
) WHERE rn = 1
""",
    tags=("llm", "similarity", "classify"),
)
def d38_knn_label_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label classification over the embedding column: for each
    query vector, the majority label among its 10 nearest labeled
    neighbors (ties broken toward the smaller label) — the standard
    weak-labeling / quality-bucketing step of a training-data pipeline.

    Plan shape: reuses the brute-force cosine top-k kernel (broadcast
    queries, JVM fold, no Python) with the labeled corpus as candidates;
    the label hydration is a broadcast join against the (q x k)-row hit
    list, and the vote is a tiny two-level aggregation. Swapping the
    exact kernel for any of the ANN indexes (d07x/y/u/t, d34) changes
    one call — the voting stage is identical at 100 TB, where the hit
    list is |queries| x k rows regardless of corpus size."""
    em = load(spark, sf_dir, "embeddings")
    corpus = em.filter(F.col("vec_id") >= 20)
    queries = em.filter(F.col("vec_id") < 20)
    topk = S.brute_force_cosine_topk(corpus, queries, k=10)
    labels = em.select(F.col("vec_id").alias("c_id"), "label")
    votes = (
        topk.join(F.broadcast(labels), "c_id")
        .groupBy("q_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("label").alias("pred_label"), "votes")
    )


@query(
    "d39_event_transitions",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
), p AS (
  SELECT event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY tus, event_id) AS next_type
  FROM o
), c AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
         AS prob
FROM c
""",
    tags=("llm", "sequence", "analytics"),
)
def d39_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — sequence
    mining for behavioral features / curriculum ordering.

    Plan shape: one shuffle on user_id for the lead() window, then a
    partial-agg'd count on the 5x5 transition key space, then a window
    normalization over the tiny counts table. The per-user ordering is
    exact integer microseconds; the probability is the identical
    double division in both engines. At 100 TB the transition-count
    table stays |event_types|^2 rows — the heavy stage is the
    embarrassingly-parallel per-user lead()."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n")
    )
    tot = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot).cast("double")).alias(
            "prob"
        ),
    )


@query(
    "d40_length_percentile_filter",
    oracle="""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
  FROM documents
) WHERE pr >= 0.05 AND pr <= 0.95
""",
    tags=("llm", "quality", "filter"),
)
def d40_length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band quality filtering: drop the shortest and longest
    5% of documents WITHIN each language — the standard
    outlier-trimming pass of a pretraining pipeline, done per-language
    because length distributions differ wildly across languages.

    percent_rank depends only on the value ordering (ties share a
    rank), so the cutoff is engine-independent — no floating
    arithmetic beyond the exact (rank-1)/(n-1) rational. Plan: one
    shuffle on lang; at 100 TB swap the exact window for the GK-sketch
    per-group quantiles (b46) and broadcast the per-lang cut points —
    same filter, sketch-bounded state."""
    docs = load(spark, sf_dir, "documents")
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy("n_chars")
    )
    return (
        docs.select("doc_id", "lang", "n_chars", pr.alias("pr"))
        .filter((F.col("pr") >= 0.05) & (F.col("pr") <= 0.95))
        .drop("pr")
    )


@query(
    "d41_hash_bucket_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ({DUCKDB_POLY_HASH.format(expr="(lower(trim(text)))")}) % 20 = 3
""",
    tags=("llm", "sampling"),
)
def d41_hash_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling: keep documents whose
    portable rolling hash of the normalized text lands in 1 of 20
    buckets — a reproducible ~5% sample that is stable across runs,
    engines, and re-partitioning (unlike rand()-based sampling), which
    is how a 100 TB pipeline carves held-out/eval splits that never
    leak across reruns. Content-keyed (not id-keyed), so re-crawled
    duplicates of a document always land in the same split.

    Plan: a pure filter — no shuffle, no state; the hash is the same
    JVM fold used by the MinHash family (operators/text.py:39)."""
    docs = load(spark, sf_dir, "documents")
    h = poly_hash("lower(trim(text))")
    return docs.filter(F.expr(f"({h}) % 20 = 3")).select(
        "doc_id", "lang", "n_chars"
    )


_BM25_TERMS = ("window", "merge", "scan")


def _bm25_sql_term(i: int) -> str:
    """One BM25 term of the oracle — the EXACT expression shape (and
    therefore fp op order) of the Spark side."""
    return (
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * 2.2)"
        f" / (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))"
    )


@query(
    "d42_bm25_retrieval",
    oracle=f"""
WITH base AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         len(list_filter(string_split(text, ' '), x -> x = '{_BM25_TERMS[0]}')) AS tf0,
         len(list_filter(string_split(text, ' '), x -> x = '{_BM25_TERMS[1]}')) AS tf1,
         len(list_filter(string_split(text, ' '), x -> x = '{_BM25_TERMS[2]}')) AS tf2
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sdl,
         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM base
)
SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       {_bm25_sql_term(0)} + {_bm25_sql_term(1)} + {_bm25_sql_term(2)} AS score
FROM base, stats
ORDER BY score DESC, doc_id LIMIT 10
""",
    tags=("llm", "retrieval", "text"),
)
def d42_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75) — the sparse twin of
    d37's embedding retrieval: top-10 documents for a 3-term keyword
    query, scored with the Robertson-Sparck Jones idf and standard
    length normalization.

    Determinism: tf/df/dl/N are exact integers and the scalar double
    formula is written with the IDENTICAL op order in both engines, so
    scores are bit-identical (ties break on doc_id). Plan shape: one
    scan computes per-doc tf/dl in codegen array ops; the corpus stats
    (N, Σdl, df per term) are a 1-row aggregate broadcast back (the
    classic two-pass scoring shape); the top-10 is
    TakeOrderedAndProject — no sort shuffle, no UDF. At 100 TB the
    1-row stats broadcast replaces what an IR system precomputes as
    index metadata; per-doc scoring stays embarrassingly parallel."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    def _eq(term: str):
        # a 2-arg lambda would be read as (element, index) by F.filter
        return lambda x: x == F.lit(term)

    base = docs.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter(F.col("toks"), _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sdl").cast("double") / F.col("n")

    def term_score(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        denom = tf + F.lit(1.2) * (
            F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / avgdl
        )
        return idf * (tf * F.lit(2.2)) / denom

    score = term_score(0) + term_score(1) + term_score(2)
    return (
        j.select("doc_id", "dl", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Round 6 (cont. 2): span-level dedup, sampling, tokenization, projection
# ---------------------------------------------------------------------------

@query(
    "d43_dup_span_coalesce",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), win AS (
  SELECT doc_id, len(t) AS ntok, s.i * 8 AS st,
         array_to_string(t[1 + s.i * 8 : s.i * 8 + 16], ' ') AS wstr
  FROM toks, unnest(generate_series(0, (len(t) - 16) // 8)) AS s(i)
  WHERE len(t) >= 16
), hashed AS (
  SELECT doc_id, ntok, st, """
    + DUCKDB_POLY_HASH.format(expr="wstr")
    + """ AS h FROM win
), freq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM hashed GROUP BY h
), dup AS (
  SELECT doc_id, ntok, st FROM hashed JOIN freq USING (h) WHERE nd > 1
), isl AS (
  SELECT doc_id, ntok, st,
         CASE WHEN st - LAG(st) OVER (PARTITION BY doc_id ORDER BY st) <= 16
              THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, ntok, st,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY st
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM isl
), spans AS (
  SELECT doc_id, ntok, MIN(st) AS span_start,
         LEAST(MAX(st) + 16, ntok) AS span_end
  FROM grp GROUP BY doc_id, ntok, g
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(span_end - span_start) AS BIGINT) AS dup_tokens,
       SUM(span_end - span_start) * 1.0 / MAX(ntok) AS dup_ratio
FROM spans GROUP BY doc_id
""",
    tags=("llm", "dedup", "text"),
)
def d43_dup_span_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN detection (the exact-substring
    dedup of Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better", windowized): hash overlapping 16-token
    windows at stride 8, mark windows whose hash appears in >1
    document, then coalesce each doc's overlapping duplicated windows
    into maximal token ranges (gaps-and-islands) — reporting the spans
    a span-removal pass would cut, rather than d22's aligned-segment
    counts. Stride-8 overlap catches duplication at ANY alignment
    (a copied paragraph starting mid-segment hits d43 but can miss
    d22's disjoint grid).

    Scale shape: zero-shuffle window fan-out (same slice pipeline as
    d16/d22) → one hash-frequency shuffle carrying 8-byte hashes → one
    per-doc window (gaps-and-islands is a linear scan per doc after a
    doc_id shuffle). All integer arithmetic except the final ratio, so
    the oracle is exact; at 100 TB swap the portable polynomial hash
    for xxhash64 (identical plan)."""
    docs = load(spark, sf_dir, "documents")
    wlen, stride = 16, 8
    toks = ensure_parallelism(docs).select(
        "doc_id", F.split(F.col("text"), " ").alias("__t")
    )
    t = F.col("__t")
    toks = toks.filter(F.size(t) >= wlen).select(
        "doc_id", t.alias("__t"), F.size(t).alias("ntok")
    )
    starts = F.sequence(
        F.lit(0),
        F.floor((F.col("ntok") - wlen) / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    win = toks.select(
        "doc_id", "ntok", t.alias("__t"), F.explode(starts).alias("i")
    ).select(
        "doc_id",
        "ntok",
        (F.col("i") * stride).alias("st"),
        F.concat_ws(
            " ", F.slice(F.col("__t"), F.col("i") * stride + 1, F.lit(wlen))
        ).alias("wstr"),
    )
    hashed = win.select(
        "doc_id", "ntok", "st", F.expr(poly_hash("wstr")).alias("h")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    freq = hashed.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    dup = (
        hashed.join(freq.filter(F.col("nd") > 1), "h")
        .select("doc_id", "ntok", "st")
    )
    w_ord = Window.partitionBy("doc_id").orderBy("st")
    isl = dup.withColumn(
        "brk",
        F.when(
            F.col("st") - F.lag("st").over(w_ord) <= wlen, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    grp = isl.withColumn(
        "g", F.sum("brk").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = grp.groupBy("doc_id", "ntok", "g").agg(
        F.min("st").alias("span_start"),
        F.least(F.max("st") + wlen, F.col("ntok")).alias("span_end"),
    )
    length = F.col("span_end") - F.col("span_start")
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(length).alias("dup_tokens"),
        (F.sum(length) * F.lit(1.0) / F.max("ntok")).alias("dup_ratio"),
    )


_D44_HASH = DUCKDB_POLY_HASH.format(expr="('res:' || CAST(doc_id AS VARCHAR))")


@query(
    "d44_group_reservoir_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang, {_D44_HASH} AS hk FROM documents WHERE lang IS NOT NULL
), r AS (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id)
              AS BIGINT) AS rk
  FROM h
)
SELECT doc_id, lang, rk FROM r WHERE rk <= 25
""",
    tags=("llm", "sampling"),
)
def d44_group_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-group sampling (the distributed reservoir): keep
    exactly min(k, |group|) = 25 documents per language, chosen by
    ranking on the portable content hash — uniform within each group,
    deterministic across runs and engines. Complements the sampling
    family: d19 is Bernoulli per-stratum (approximate k), d31 weighted
    global top-k, d41 a hash-bucket split; this is the guaranteed-count
    per-stratum draw evaluation sets are built with.

    Scale shape: one shuffle on the group key, then a per-group sort
    that Spark executes as WindowGroupLimit when the rank filter is
    this shape — each partition keeps only its top-25 candidates per
    group before the final merge, so the full corpus is never sorted
    (the same physical optimization b39/a13 pin in plan tests)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    hk = F.expr(poly_hash("concat('res:', cast(doc_id as string))"))
    w = Window.partitionBy("lang").orderBy(F.asc("hk"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", hk.alias("hk"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 25)
        .select("doc_id", "lang", "rk")
    )


#: Greedy-longest-match vocabulary for d45 — all printable ASCII chars
#: (guaranteeing total coverage, so round-trip always reconstructs) plus
#: frequent English subwords; deterministic and engine-independent.
_D45_PIECES = (
    "the and ing ion tion ent for ter ate ers est ity ous ment ness "
    "able less ful pre com con de re un in er ed ly es s t d"
).split()


@query(
    "d45_wordpiece_tokenize",
    oracle="""
SELECT doc_id,
       TRUE AS roundtrip_ok,
       TRUE AS tokens_bounded
FROM documents
""",
    tags=("llm", "tokenize", "udf", "gate"),
)
def d45_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization plumbing (BPE/WordPiece-style greedy
    longest-match over a fixed vocab) through the Arrow pandas-UDF
    surface — the token-counting stage of a training pipeline when a
    real tokenizer (tiktoken/sentencepiece) is plugged in. The vocab is
    multi-char subwords + every single character, so greedy matching
    always terminates with total coverage.

    Verification is a bounded-comparison gate (greedy matching is not
    SQL-expressible): per document, (a) concatenating the produced
    pieces reconstructs the exact input text — lossless round-trip,
    the property real tokenizers are audited on — and (b) the token
    count lies in [ceil(len/max_piece_len), len]. Both booleans vs an
    all-TRUE oracle, so a matching bug breaks the driver hash, not
    just a unit test.

    Scale shape: pure mapInPandas over Arrow batches — embarrassingly
    parallel, no shuffle, tokenizer state broadcast once per worker as
    a closure; the same shape serves a real BPE at 100 TB."""
    vocab = sorted(set(_D45_PIECES), key=len, reverse=True)
    max_len = max(len(p) for p in vocab)

    def _tok(batches):
        import pandas as pd  # local: executor-side import

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces, i, n = [], 0, len(text)
                while i < n:
                    for piece in vocab:
                        if text.startswith(piece, i):
                            pieces.append(piece)
                            i += len(piece)
                            break
                    else:
                        pieces.append(text[i])
                        i += 1
                n_tok = len(pieces)
                ok_rt = "".join(pieces) == text
                ok_bound = (n == 0 and n_tok == 0) or (
                    0 < n_tok <= n and n_tok >= -(-n // max_len)
                )
                out.append((doc_id, bool(ok_rt), bool(ok_bound)))
            yield pd.DataFrame(
                out, columns=["doc_id", "roundtrip_ok", "tokens_bounded"]
            )

    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    return docs.select("doc_id", "text").mapInPandas(
        _tok, "doc_id long, roundtrip_ok boolean, tokens_bounded boolean"
    )


def _d46_sign_sql(i: str, j: str) -> str:
    """±1 Rademacher sign from a cheap integer mix — identical text in
    Spark SQL and DuckDB (non-negative operands, BIGINT to avoid ANSI
    int32 overflow; the mod-97 step breaks the checkerboard structure a
    bare parity of odd multipliers would produce)."""
    return (
        f"(CASE WHEN ((CAST({i} AS BIGINT) * 1103515245 "
        f"+ {j} * 12345) % 97) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
    )


@query(
    "d46_random_projection",
    oracle="""
SELECT vec_id, """
    + ", ".join(
        "ROUND(list_reduce(list_transform(range(0, 64), "
        f"i -> CAST(embedding[i + 1] AS DOUBLE) * {_d46_sign_sql('i', str(j))}"
        "), (a, b) -> a + b) / 4.0, 6) AS p" + str(j)
        for j in range(16)
    )
    + """
FROM embeddings WHERE vec_id < 50 ORDER BY vec_id
""",
    tags=("llm", "similarity", "projection"),
)
def d46_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic Rademacher (+-1) matrix derived from integer parity —
    the dimensionality-reduction stage in front of clustering / ANN
    when full embeddings are too wide (the hyperplane trick of d07x,
    kept as real-valued coordinates instead of sign bits; scaled by
    1/sqrt(16) so distances are preserved in expectation).

    Exactness: the sign matrix is pure integer arithmetic and each
    output coordinate is the same left-to-right fold in both engines
    (Spark ``aggregate`` with 0-seed == DuckDB ``list_reduce``
    first-element seed, since 0 + x1 == x1 exactly), divided by 4.0
    (a power of two — exact) — so projected values are bit-identical
    and the driver hash covers every coordinate, not a tolerance.

    Scale shape: per-row codegen expression, no shuffle, no Python;
    the matrix never materializes (signs are computed inline), so the
    projection runs at scan speed on any corpus width where the fold
    stays in registers."""
    em = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    cols = [
        F.expr(
            "round(aggregate(transform(sequence(0, 63), i -> "
            f"cast(element_at(embedding, i + 1) as double) * "
            f"{_d46_sign_sql('i', str(j))}), 0D, (a, b) -> a + b) / 4.0, 6)"
        ).alias(f"p{j}")
        for j in range(16)
    ]
    return em.select("vec_id", *cols).orderBy("vec_id")


_D47_VECQ = (
    "list_transform(range(0, 64), i -> "
    "CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT))"
)


@query(
    "d47_label_centroid_cohesion",
    oracle="""
WITH x AS (
  SELECT label, s.i AS pos,
         CAST(FLOOR(CAST(embedding[s.i + 1] AS DOUBLE) * 1000000) AS BIGINT)
           AS vq
  FROM embeddings, unnest(generate_series(0, 63)) AS s(i)
), cent AS (
  SELECT label, pos, CAST(SUM(vq) AS DOUBLE) / COUNT(*) AS cq
  FROM x GROUP BY label, pos
), cl AS (
  SELECT label, list(cq ORDER BY pos) AS c FROM cent GROUP BY label
), cos AS (
  SELECT e.vec_id, e.label,
         list_reduce(list_transform(range(0, 64),
             i -> CAST(e.embedding[i + 1] AS DOUBLE) * c[i + 1]),
           (a, b) -> a + b)
         / (sqrt(list_reduce(list_transform(range(0, 64),
              i -> CAST(e.embedding[i + 1] AS DOUBLE)
                   * CAST(e.embedding[i + 1] AS DOUBLE)), (a, b) -> a + b))
            * sqrt(list_reduce(list_transform(range(0, 64),
              i -> c[i + 1] * c[i + 1]), (a, b) -> a + b))) AS cosine
  FROM embeddings e JOIN cl USING (label)
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(FLOOR(cosine * 1000000) AS BIGINT)) AS DOUBLE)
         / 1000000.0 / COUNT(*) AS avg_cohesion,
       ROUND(MIN(cosine), 6) AS min_cohesion
FROM cos GROUP BY label
""",
    tags=("llm", "similarity", "quality"),
)
def d47_label_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-cohesion diagnostics for labeled embeddings (the curation
    report behind "is this label a coherent cluster or a grab bag"):
    per label, the centroid of its vectors and every member's cosine to
    that centroid, rolled up to n / average / minimum cohesion — low
    averages flag noisy labels, low minima flag candidate mislabels
    (the confident-learning style screen).

    Exactness contract: cross-row float addition is order-dependent, so
    every cross-row sum is integer fixed-point — vectors are
    floor-quantized to micros before the per-dimension centroid sums
    (exact int64, order-free; the quantized centroid IS the operator's
    definition, documented here), and per-member cosines are
    floor-quantized before averaging. Per-ROW folds (dot, norms) keep
    full doubles in a fixed left-to-right order, identical in both
    engines. MIN is order-free on doubles.

    Scale shape: one posexplode shuffle to build 10 x 64 centroid sums
    (map-side combined), centroids broadcast back (10 rows), cosine as
    zero-shuffle codegen folds, final 10-group reduce. No Python, no
    corpus self-join; at 1000 labels x 4096 dims the centroid table is
    still megabytes."""
    em = load(spark, sf_dir, "embeddings")
    x = em.select(
        "label", F.posexplode(F.expr(
            "transform(embedding, v -> "
            "cast(floor(cast(v as double) * 1000000) as bigint))"
        )).alias("pos", "vq"),
    )
    cent = x.groupBy("label", "pos").agg(
        (F.sum("vq").cast("double") / F.count("*")).alias("cq")
    )
    cl = cent.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, cq))), "
               "s -> s.cq)").alias("c")
    )
    j = em.join(broadcast(cl), "label")
    dot = F.expr(
        "aggregate(zip_with(embedding, c, "
        "(x, y) -> cast(x as double) * y), 0D, (a, b) -> a + b)"
    )
    nv = F.expr(
        "aggregate(transform(embedding, x -> "
        "cast(x as double) * cast(x as double)), 0D, (a, b) -> a + b)"
    )
    nc = F.expr("aggregate(transform(c, y -> y * y), 0D, (a, b) -> a + b)")
    cos = j.select(
        "label", (dot / (F.sqrt(nv) * F.sqrt(nc))).alias("cosine")
    )
    return cos.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        (
            F.sum(F.floor(F.col("cosine") * 1000000).cast("bigint"))
            .cast("double")
            / F.lit(1000000.0)
            / F.count("*")
        ).alias("avg_cohesion"),
        F.round(F.min("cosine"), 6).alias("min_cohesion"),
    )


@query(
    "d48_source_jsd_shift",
    oracle="""
WITH tok AS (
  SELECT source, t.tok FROM documents,
         unnest(string_split(text, ' ')) AS t(tok)
  WHERE length(text) > 0
), cs AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
), cg AS (
  SELECT tok, COUNT(*) AS g FROM tok GROUP BY tok
), ns AS (
  SELECT source, SUM(c) AS n_s FROM cs GROUP BY source
), ng AS (
  SELECT SUM(g) AS n_g FROM cg
), grid AS (
  SELECT s.source, v.tok, COALESCE(cs.c, 0) AS c, v.g
  FROM (SELECT DISTINCT source FROM cs) s
  CROSS JOIN cg v
  LEFT JOIN cs ON cs.source = s.source AND cs.tok = v.tok
), terms AS (
  SELECT grid.source,
         c * 1.0 / n_s AS p,
         g * 1.0 / n_g AS q
  FROM grid JOIN ns USING (source) CROSS JOIN ng
), qterm AS (
  SELECT source,
         CAST(FLOOR((CASE WHEN p > 0
               THEN p * log2(2.0 * p / (p + q)) ELSE 0.0 END) * 1000000000)
              AS BIGINT)
         + CAST(FLOOR(q * log2(2.0 * q / (p + q)) * 1000000000) AS BIGINT)
           AS tq
  FROM terms
)
SELECT source,
       CAST(SUM(tq) AS DOUBLE) / 1000000000.0 / 2.0 AS jsd,
       CAST(COUNT(*) AS BIGINT) AS vocab
FROM qterm GROUP BY source
""",
    tags=("llm", "quality", "mixing"),
)
def d48_source_jsd_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift report for data mixing: per source, the
    Jensen-Shannon divergence between that source's unigram token
    distribution and the whole corpus's — the quantitative "how
    different is this slice" number behind mixture re-weighting and
    contamination triage (JSD is symmetric and bounded [0,1] in bits,
    unlike raw KL which blows up on unseen tokens; the q-side term is
    always finite because every vocab token has corpus mass).

    Exactness: token counts are integers; each vocab term is computed
    in doubles with the identical expression in both engines, then
    floor-quantized to nano units BEFORE the per-source sum, making
    the reduction an order-free int64 sum (the d47 contract; log2
    agreement across libms is the d23/d29 precedent).

    Scale shape: two grouped counts (map-side combined), the
    sources x vocab grid is |vocab| x #sources rows of 8-byte ids
    (linear in vocab, never corpus-squared) built from a tiny
    broadcast source list, and the final reduce has #sources rows.
    No Python anywhere."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tok = ensure_parallelism(docs).select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    cs = tok.groupBy("source", "tok").agg(F.count("*").alias("c"))
    cg = tok.groupBy("tok").agg(F.count("*").alias("g"))
    ns = cs.groupBy("source").agg(F.sum("c").alias("n_s"))
    ng = cg.agg(F.sum("g").alias("n_g"))
    sources = cs.select("source").distinct()
    grid = (
        sources.crossJoin(cg)
        .join(cs, ["source", "tok"], "left")
        .select("source", "tok", F.coalesce(F.col("c"), F.lit(0)).alias("c"),
                "g")
    )
    terms = (
        grid.join(broadcast(ns), "source")
        .crossJoin(broadcast(ng))
        .select(
            "source",
            (F.col("c") * F.lit(1.0) / F.col("n_s")).alias("p"),
            (F.col("g") * F.lit(1.0) / F.col("n_g")).alias("q"),
        )
    )
    pterm = F.when(
        F.col("p") > 0,
        F.col("p") * F.log2(F.lit(2.0) * F.col("p") / (F.col("p") + F.col("q"))),
    ).otherwise(F.lit(0.0))
    qterm_ = F.col("q") * F.log2(
        F.lit(2.0) * F.col("q") / (F.col("p") + F.col("q"))
    )
    tq = (
        F.floor(pterm * 1000000000).cast("bigint")
        + F.floor(qterm_ * 1000000000).cast("bigint")
    )
    return (
        terms.select("source", tq.alias("tq"))
        .groupBy("source")
        .agg(
            (F.sum("tq").cast("double") / F.lit(1000000000.0) / F.lit(2.0))
            .alias("jsd"),
            F.count("*").alias("vocab"),
        )
    )


@query(
    "d49_sequence_packing",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
  FROM documents
), cum AS (
  SELECT doc_id, lang, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
  FROM base
)
SELECT lang,
       CAST(FLOOR(tok_before / 2048.0) AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY lang, seq_id
""",
    tags=("llm", "packing", "window"),
)
def d49_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (GPT-style concat-and-split): per
    language, documents are concatenated in doc_id order and split
    into 2048-token training sequences; each document is assigned to
    the sequence its FIRST token lands in (seq_id = floor of the
    running token offset / 2048). The report is the packing manifest a
    dataloader shards on: docs per sequence, filled tokens, doc-id
    span — the step that turns a cleaned corpus into fixed-length
    pretraining rows.

    Exactness: token counts and running offsets are integers; the only
    division is by 2048 (a power of two — exact in doubles far beyond
    any corpus size), so seq ids match DuckDB bit-for-bit.

    Scale shape: ONE shuffle on lang for the running-sum window, then
    the same partitioning feeds the (lang, seq_id) aggregate —
    AQE-coalesced, no second exchange of the fan-out. The prefix sum
    is sequential per partition key by definition; at 100 TB the
    packing key becomes (lang, shard) where shard is a deterministic
    hash bucket (d41's content hash), making every shard an
    independent prefix sum — same manifest schema, embarrassingly
    parallel. Budget straddling is inherent to concat-and-split
    (sequences cross doc boundaries); first-fit no-straddle packing is
    the d44-style WindowGroupLimit variant of the same plan."""
    docs = load(spark, sf_dir, "documents")
    base = ensure_parallelism(docs).select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = base.select(
        "doc_id",
        "lang",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("tok_before"),
    )
    return (
        cum.select(
            "doc_id",
            "lang",
            "n_tok",
            F.floor(F.col("tok_before") / F.lit(2048.0)).alias("seq_id"),
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "d50_prefix_filter_jaccard",
    oracle=_SH_DUCK
    + """,
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS isz
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2,
       isz * 1.0 / (c1.n + c2.n - isz) AS jaccard
FROM inter
JOIN cnt c1 ON id1 = c1.doc_id
JOIN cnt c2 ON id2 = c2.doc_id
WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.5
""",
    tags=("llm", "dedup"),
)
def d50_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs (PPJoin family) — d05's
    result WITHOUT the df-cap compromise: the oracle is the plain
    uncapped all-pairs Jaccard >= 0.5, and the Spark side reproduces
    it exactly while only ever joining each document's rarest-token
    prefix (operators/dedup.py:prefix_filter_jaccard_pairs, which
    carries the completeness proof).

    This is the scale-correct exact near-dup join for 100 TB: d05
    bounds the hot-token quadratic by DROPPING hot shingles (changing
    the result), LSH (d04) bounds it by approximating; prefix
    filtering bounds it structurally — corpus-frequent tokens sort
    last in the (df, token) canonical order and so almost never enter
    a prefix — while remaining EXACT."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3)
    return D.prefix_filter_jaccard_pairs(sh, threshold=0.5)


@query(
    "d51_fuzzy_key_join",
    oracle="""
SELECT a.c_custkey AS id1, b.c_custkey AS id2,
       a.c_name AS name1, b.c_name AS name2
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND len(a.c_name) = len(b.c_name)
 AND a.c_name <> b.c_name
 AND levenshtein(a.c_name, b.c_name) <= 1
""",
    tags=("llm", "dedup", "fuzzy"),
)
def d51_fuzzy_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-key self-join via the delete-1 neighborhood (the SymSpell
    algorithm, Garbe 2012): all customer-name pairs that are one
    TYPO apart (equal length, Levenshtein <= 1 — i.e., exactly one
    substituted character), found WITHOUT the quadratic name x name
    comparison the oracle runs.

    Candidate generation: each name emits its |name| delete-one
    variants keyed by (position, variant); two equal-length names
    differing only at position i collide on (i, delete_i) — and ONLY
    near-identical names collide, so bucket width is bounded by the
    alphabet at one position (<= ~10 here, digits), not by shared
    prefixes. This matters precisely when the data is id-like: every
    c_name shares the 'Customer#...' prefix, so any prefix/segment
    blocking scheme (d06's pigeonhole chunks, d50's token prefixes)
    degenerates to one giant bucket, while the delete-neighborhood
    key spreads those names across per-position buckets. A final
    `levenshtein <= 1` verify keeps the semantics independent of the
    construction argument.

    Cost: n x avg_len candidate rows (one explode, one equi-join on
    the variant key), output-bound verification — vs the oracle's
    n^2/2 edit distances. The standard scale-out for banks/MDM fuzzy
    key matching."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    variants = c.select(
        "id",
        "name",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(name)),"
                " i -> concat(substr(name, 1, i-1),"
                " substr(name, i+1, length(name))))"
            )
        ).alias("pos", "variant"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    # No dedup needed (optimization round 13, removes the candidate
    # distinct's exchange + two aggregates): a joined pair's names are
    # equal length (equal variants of length len-1) and equal at every
    # position except the deleted one (the variants agree there), so
    # each qualifying pair differs at EXACTLY one position i and
    # collides on exactly ONE key (pos=i, delete_i) — deleting any
    # other position leaves the difference at i in both variants.
    # Emitted exactly once by construction.
    cand = a.join(
        b,
        (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.variant") == F.col("b.variant"))
        & (F.col("a.id") < F.col("b.id"))
        & (F.col("a.name") != F.col("b.name")),
    ).select(
        F.col("a.id").alias("id1"),
        F.col("b.id").alias("id2"),
        F.col("a.name").alias("name1"),
        F.col("b.name").alias("name2"),
    )
    return cand.filter(F.levenshtein("name1", "name2") <= 1)


@query(
    "d54_bpe_pair_stats",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w FROM documents
), pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM words, unnest(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT 20
""",
    tags=("llm", "tokenizer", "text"),
)
def d54_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-pair statistics — ONE iteration of byte-pair-encoding
    tokenizer training at corpus scale: the frequency of every
    adjacent character pair inside words, top-20 (the next merge rule
    is the argmax; training loops this with the vocab growing). This
    is the d45 wordpiece gate's TRAINING-side twin: d45 consumes a
    fixed vocab, d54 computes the statistics a vocab is built from.

    Plan shape: pure codegen fan-out (split → explode words →
    substring pairs via an in-row sequence transform — no Python, no
    join), then ONE hash aggregate over pair keys; the top-20 is
    TakeOrderedAndProject, never a global sort. Pair cardinality is
    bounded by charset² regardless of corpus size, so the reduce side
    is tiny at any scale; the map side is corpus-linear — the shape a
    real BPE trainer (e.g. the parallel corpus-statistics pass of
    SentencePiece) distributes exactly this way."""
    docs = load(spark, sf_dir, "documents")
    words = ensure_parallelism(docs).select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@query(
    "d52_eval_decontamination",
    oracle=_SH_DUCK
    + """,
ev AS (
  SELECT doc_id + 10000000 AS eid, shingle FROM sh WHERE doc_id % 89 = 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
ecnt AS (SELECT eid, COUNT(*) AS n FROM ev GROUP BY eid),
inter AS (
  SELECT sh.doc_id AS train_id, ev.eid AS eval_id, COUNT(*) AS isz
  FROM sh JOIN ev USING (shingle)
  GROUP BY 1, 2
)
SELECT train_id, eval_id,
       isz * 1.0 / (c1.n + c2.n - isz) AS jaccard
FROM inter
JOIN cnt c1 ON train_id = c1.doc_id
JOIN ecnt c2 ON eval_id = c2.eid
WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.5
""",
    tags=("llm", "dedup", "contamination"),
)
def d52_eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination — d17's exact-n-gram check
    upgraded to NEAR-duplicate detection (the Llama/GPT-4-report
    protocol: an eval item is contaminated if any training doc is
    j-similar, not just if it shares one 13-gram): every
    (train doc, eval item) pair with 3-gram Jaccard >= 0.5, computed
    EXACTLY via a two-sided prefix filter. A ~1.1% slice of the corpus
    (doc_id % 89 = 3, ids offset +10M) stands in as the benchmark —
    including, realistically, verbatim leaks (J = 1 self-pairs).

    Cross-corpus prefix filtering (d50's theorem, R⋈S form): one
    global (df, token) order from the UNION of both sides; each side
    indexes only its n - ceil(t*n) + 1 rarest tokens; candidates =
    train-prefix ⋈ eval-prefix (never train×train — the small side
    alone bounds the index that matters), then exact verification
    joins. Cost: |eval| drives the candidate count; the train corpus
    is touched linearly (shingle + df pass). That asymmetry is the
    100 TB point — the benchmark is MBs while train is TBs, so
    decontamination costs ~one train scan."""
    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 89 == 3).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(ev)
    sh = D.shingle_docs(corpus, "doc_id", "text", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t = 0.5
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "shingle")
    nw = Window.partitionBy("id")
    ranked = sh.join(dfc, "shingle").select(
        "id",
        "shingle",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(nw).alias("n"),
    )
    # both sides of the candidate join filter THIS frame; without
    # materialization the df-count aggregate + two-window ranking
    # pipeline above runs once per side (plan audit r13: Window pair +
    # its own df HashAggregate duplicated). Same persist discipline as
    # d50 (guide §2.4: share one exchange, do fewer shuffles).
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tr = prefix.filter(F.col("id") < 10_000_000).alias("a")
    evp = prefix.filter(F.col("id") >= 10_000_000).alias("b")
    cand = (
        tr.join(
            evp,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("b.n") >= F.ceil(F.col("a.n") * F.lit(t)))
            & (F.col("a.n") >= F.ceil(F.col("b.n") * F.lit(t))),
        )
        .select(F.col("a.id").alias("train_id"), F.col("b.id").alias("eval_id"))
        .distinct()
    )
    counts = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("sa")
        .join(cand, F.col("sa.id") == F.col("train_id"))
        .join(
            sh.alias("sb"),
            (F.col("sb.id") == F.col("eval_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("isz"))
    )
    return (
        inter.join(
            counts.select(F.col("id").alias("train_id"), F.col("n").alias("n1")),
            "train_id",
        )
        .join(
            counts.select(F.col("id").alias("eval_id"), F.col("n").alias("n2")),
            "eval_id",
        )
        .withColumn(
            "jaccard",
            F.col("isz") * 1.0 / (F.col("n1") + F.col("n2") - F.col("isz")),
        )
        .filter(F.col("jaccard") >= t)
        .select("train_id", "eval_id", "jaccard")
    )


_MM6_CHARS = ("a", "e", "i", "o", "u", "n", "r", "t")
_MM6_W = (1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)


@query(
    "mm6_multimodal_retrieval",
    oracle="WITH f AS (\n  SELECT doc_id, lang, source,\n"
    + ",\n".join(
        f"    CAST(len(text) - len(replace(text, '{c}', '')) AS DOUBLE) AS c{i}"
        for i, c in enumerate(_MM6_CHARS)
    )
    + "\n  FROM documents\n)\nSELECT doc_id, lang, source,\n  ("
    + " + ".join(f"{w} * c{i}" for i, w in enumerate(_MM6_W))
    + ") / sqrt("
    + " + ".join(f"c{i} * c{i}" for i in range(8))
    + """) AS score
FROM f
WHERE ("""
    + " + ".join(f"c{i}" for i in range(8))
    + """) > 0
ORDER BY score DESC, doc_id LIMIT 10
""",
    tags=("llm", "multimodal", "retrieval"),
)
def mm6_multimodal_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal retrieval plumbing: opaque binary payloads
    → Arrow `mapInPandas` feature extraction (the embedding-model slot;
    here a deterministic 8-dim char-count feature so the oracle can
    recompute it from the text) → JVM-codegen cosine scoring against a
    query vector → top-10 → metadata hydration. This is mm2's decode
    plumbing composed with d37's retrieval shape — the
    image-embedding-search pipeline with every Spark boundary real and
    only the model weights faked.

    Exactness: counts are integers; dot and norm are evaluated with the
    identical op order in both engines, and IEEE sqrt/division are
    correctly rounded everywhere — scores are bit-identical (tie-break
    doc_id).

    Scale shape: the Python stage sees only (doc_id, payload) and
    emits (doc_id, 8 doubles) — minimum bytes across the Arrow
    boundary; scoring/top-k never leave the JVM (TakeOrdered, no
    global sort); hydration joins AFTER the top-10, so payload-wide
    rows are never shuffled (d37's hits-only contract)."""
    import pandas as pd  # noqa: F401

    docs = load(spark, sf_dir, "documents")
    bin_docs = MM.to_binary_docs(ensure_parallelism(docs))

    def featurize(batches):
        for pdf in batches:
            texts = pdf["payload"].map(lambda b: bytes(b).decode("utf-8"))
            out = {"doc_id": pdf["doc_id"]}
            for i, ch in enumerate(_MM6_CHARS):
                out[f"c{i}"] = texts.str.count(ch).astype("float64")
            yield pd.DataFrame(out)

    feats = bin_docs.mapInPandas(
        featurize,
        "doc_id long, " + ", ".join(f"c{i} double" for i in range(8)),
    )
    dot = sum(F.lit(w) * F.col(f"c{i}") for i, w in enumerate(_MM6_W))
    nrm2 = sum(F.col(f"c{i}") * F.col(f"c{i}") for i in range(8))
    scored = (
        feats.filter(sum(F.col(f"c{i}") for i in range(8)) > 0)
        .select("doc_id", (dot / F.sqrt(nrm2)).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )
    return scored.join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    ).select("doc_id", "lang", "source", "score")


@query(
    "d53_zipf_fit",
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents WHERE len(text) > 0
), freq AS (
  SELECT lang, w, COUNT(*) AS n FROM tok GROUP BY lang, w
), ranked AS (
  SELECT lang,
         log2(CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY n DESC, w) AS DOUBLE)) AS x,
         log2(CAST(n AS DOUBLE)) AS y
  FROM freq
), terms AS (
  SELECT lang,
         CAST(FLOOR(x * 1000000 ) AS BIGINT) AS xq,
         CAST(FLOOR(y * 1000000 ) AS BIGINT) AS yq,
         CAST(FLOOR(x * y * 1000000) AS BIGINT) AS xyq,
         CAST(FLOOR(x * x * 1000000) AS BIGINT) AS xxq
  FROM ranked
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       (COUNT(*) * CAST(SUM(xyq) AS DOUBLE)
          - CAST(SUM(xq) AS DOUBLE) * CAST(SUM(yq) AS DOUBLE) / 1000000.0)
       / (COUNT(*) * CAST(SUM(xxq) AS DOUBLE)
          - CAST(SUM(xq) AS DOUBLE) * CAST(SUM(xq) AS DOUBLE) / 1000000.0)
         AS zipf_slope
FROM terms GROUP BY lang
""",
    tags=("llm", "text", "stats"),
)
def d53_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit per language — the corpus-health diagnostic
    (natural text follows freq ∝ rank^s with s ≈ −1; synthetic/spam
    slices bend the curve): least-squares slope of log2(freq) over
    log2(rank) across the unigram vocabulary.

    Exactness contract (d47/d48): log2 terms are computed identically
    per (lang, rank) row, micro-quantized (1e-6) to int64, and summed
    order-free; the closed-form slope
    (n·Σxy − Σx·Σy/q) / (n·Σx² − (Σx)²/q) then runs in doubles with
    the identical op order both engines. Ranking ties break on the
    token string, so ranks are engine-independent.

    Scale shape: token count (map-side combined), ONE lang shuffle for
    the rank window (the same exchange the per-lang sums reuse), and a
    #langs-row result. Vocab is corpus-sublinear (Heaps' law), so the
    window input stays far under the token count at any scale."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tok = ensure_parallelism(docs).select(
        "lang", F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w")
    )
    freq = tok.groupBy("lang", "w").agg(F.count("*").alias("n"))
    rw = Window.partitionBy("lang").orderBy(F.desc("n"), "w")
    ranked = freq.select(
        "lang",
        F.log2(F.row_number().over(rw).cast("double")).alias("x"),
        F.log2(F.col("n").cast("double")).alias("y"),
    )
    q = 1000000
    terms = ranked.select(
        "lang",
        F.floor(F.col("x") * q).cast("bigint").alias("xq"),
        F.floor(F.col("y") * q).cast("bigint").alias("yq"),
        F.floor(F.col("x") * F.col("y") * q).cast("bigint").alias("xyq"),
        F.floor(F.col("x") * F.col("x") * q).cast("bigint").alias("xxq"),
    )
    n = F.count("*")
    sx = F.sum("xq").cast("double")
    sy = F.sum("yq").cast("double")
    sxy = F.sum("xyq").cast("double")
    sxx = F.sum("xxq").cast("double")
    return terms.groupBy("lang").agg(
        n.alias("vocab"),
        (
            (n * sxy - sx * sy / F.lit(1000000.0))
            / (n * sxx - sx * sx / F.lit(1000000.0))
        ).alias("zipf_slope"),
    )


@query(
    "d55_triangle_count",
    oracle="""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
e0 AS (
  SELECT doc_id AS src, (doc_id * 7 + k) % n.n AS dst
  FROM documents, n, (SELECT unnest([1, 2, 3]) AS k)
  WHERE (doc_id * 7 + k) % n.n <> doc_id
),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges
FROM tri
""",
    tags=("llm", "graph"),
)
def d55_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting — the graph-analytics primitive
    behind clustering coefficients and community density (e.g. how
    connected a near-dup cluster really is), on d36's deterministic
    link graph, undirected and deduplicated. The classic two-join
    algorithm on ORDERED edges (a < b): wedges = e(x,y) ⋈ e(y,z),
    closed by e(x,z) — ordering every triangle (x<y<z) counts it
    exactly once with no post-hoc division by 6.

    Scale notes: both joins are hash equi-joins on node keys; the
    wedge fan-out is Σ_v C(deg_v, 2) — the skew risk is a hub node,
    and the standard mitigation (not needed on this ~constant-degree
    graph) is degree-ordered edge direction (point each edge toward
    the higher-degree endpoint), which provably caps wedge counts at
    O(m^1.5). Stated here because at 100 TB THAT choice, not the
    join syntax, is the algorithm."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    e0 = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select("src", ((F.col("src") * 7 + F.col("k")) % n).alias("dst"))
        .filter(F.col("dst") != F.col("src"))
    )
    e = (
        e0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri = wedges.join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
    )
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        e.agg(F.count("*").alias("n_edges"))
    )


#: Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/k!) —
#: spelled as literals so both engines compare against identical
#: doubles; draws truncate at k=6 (P ~ 1e-4, bias far under reporting
#: precision and identical on both sides by construction).
_D56_POIS = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)
_D56_R = 16


def _d56_k_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_D56_POIS)
    )
    return f"CASE {cases} ELSE 6 END"


@query(
    "d56_poisson_bootstrap",
    oracle=f"""
WITH reps AS (
  SELECT doc_id, n_chars, r
  FROM documents, (SELECT unnest(generate_series(0, {_D56_R - 1})) AS r)
), draws AS (
  SELECT r, n_chars,
         {_d56_k_sql("(((doc_id * 2654435761 + r * 40503) % 1000003) / 1000003.0)")} AS k
  FROM reps
)
SELECT CAST(r AS INT) AS replicate,
       CAST(SUM(k) AS BIGINT) AS n_eff,
       CAST(SUM(k * n_chars) AS DOUBLE) / SUM(k) AS mean_chars
FROM draws GROUP BY r
""",
    tags=("llm", "stats", "sampling"),
)
def d56_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap — the distributed-bootstrap technique for
    error bars over corpus statistics (each replicate weights every
    row by an independent Poisson(1) draw instead of resampling n
    rows, so NO replicate needs a global pass or shared state; the
    method behind confidence intervals on counters at web scale).
    16 replicates of mean document length; the spread of `mean_chars`
    IS the bootstrap SE of the corpus mean.

    Determinism (the part naive bootstrap gets wrong at scale): the
    Poisson draw for (row, replicate) comes from a portable integer
    hash → uniform → fixed inverse-CDF thresholds, so every engine,
    partitioning, and rerun draws the SAME resample — reproducible
    error bars, zero RNG state. Exactness: k and k*n_chars are
    integer sums (order-free); the single division is identical both
    sides.

    Scale shape: a zero-shuffle ×16 fan-out (explode over a literal
    sequence) into a 16-group partial+final aggregate — cost is 16
    scans' worth of arithmetic in ONE scan, no joins, no state."""
    docs = load(spark, sf_dir, "documents")
    reps = ensure_parallelism(docs).select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_D56_R - 1))).alias("r"),
    )
    u = (
        (F.col("doc_id") * F.lit(2654435761) + F.col("r") * F.lit(40503))
        % F.lit(1000003)
    ) / F.lit(1000003.0)
    k = F.when(u < float(_D56_POIS[0]), 0)
    for i, c in enumerate(_D56_POIS[1:], start=1):
        k = k.when(u < float(c), i)
    k = k.otherwise(6)
    draws = reps.select("r", "n_chars", k.alias("k"))
    return draws.groupBy(F.col("r").cast("int").alias("replicate")).agg(
        F.sum("k").alias("n_eff"),
        (
            F.sum(F.col("k") * F.col("n_chars")).cast("double")
            / F.sum("k")
        ).alias("mean_chars"),
    )


@query(
    "d57_negative_sampling",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel FROM embeddings WHERE vec_id < 20
), cand AS (
  SELECT qid,
         e.vec_id AS neg_id,
         ROW_NUMBER() OVER (
           PARTITION BY qid
           ORDER BY (e.vec_id * 2654435761 + qid * 40503) % 1000003,
                    e.vec_id) AS rk
  FROM q JOIN embeddings e ON e.label <> q.qlabel
)
SELECT qid, neg_id, CAST(rk AS INT) AS rank
FROM cand WHERE rk <= 4
""",
    tags=("llm", "training", "sampling"),
)
def d57_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: for each of 20 query
    vectors, 4 pseudo-random negatives drawn from the corpus vectors
    with a DIFFERENT label — the (query, positive, negatives) tuple
    construction every contrastive/embedding-training pipeline runs
    over its corpus. The draw order is a deterministic integer hash of
    (candidate, query) — d41/d56's portable-hash discipline — so every
    engine, partitioning, and rerun builds the SAME training pairs
    (reproducible batches; vec_id tiebreak kills hash collisions).

    Scale shape: the 20-row query set broadcasts into the label-
    mismatch join (never the corpus shuffled); ranking partitions by
    query — WindowGroupLimit keeps only ~4 rows per query per
    partition before the one shuffle. At real scale the label-mismatch
    join becomes label-bucketed sampling (draw from precomputed
    per-label shards) — same output contract, no per-query corpus
    pass; stated because THAT layout choice, not the hash, is what
    matters at 100 TB."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    q = em.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    cand = broadcast(q).join(em, F.col("label") != F.col("qlabel"))
    w = Window.partitionBy("qid").orderBy(
        (F.col("vec_id") * F.lit(2654435761) + F.col("qid") * F.lit(40503))
        % F.lit(1000003),
        "vec_id",
    )
    return (
        cand.select(
            "qid",
            F.col("vec_id").alias("neg_id"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 4)
    )


@query(
    "d58_leakage_safe_split",
    oracle=f"""
WITH g AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
), a AS (
  SELECT doc_id, fp,
         CASE WHEN ({DUCKDB_POLY_HASH.format(expr="fp")}) % 10 < 8
              THEN 'train' ELSE 'eval' END AS split,
         COUNT(*) OVER (PARTITION BY fp) AS grp_sz
  FROM g
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN grp_sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs
FROM a GROUP BY split
""",
    tags=("llm", "sampling", "dedup"),
)
def d58_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split: the split key is the CONTENT
    FINGERPRINT (md5 of normalized text), not the doc id — every exact
    duplicate of a document lands on the same side by construction, so
    an eval doc can never have a training-set twin (the classic
    train/test contamination channel d17/d52 only *detect* after the
    fact; this prevents it at split time). The 80/20 assignment hashes
    the fingerprint with the portable rolling hash (d41's discipline):
    reproducible across engines, runs, and repartitioning. Returns the
    audit summary per split: docs, distinct groups, and how many docs
    sit in multi-member groups (the rows that WOULD have leaked under
    a doc-id split).

    Scale shape: fingerprint + split are pure narrow projections (no
    shuffle); the group-size window and the final agg share ONE
    hash-partition by fp. At 100 TB the same recipe extends to
    NEAR-dup safety by keying on the d20 connected-component id
    instead of the md5 — same split function, cluster map joined in —
    which is why the split key is a column, not an inline expression."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )
    h = poly_hash("fp")
    a = docs.select(
        "doc_id",
        "fp",
        F.when(F.expr(f"({h}) % 10 < 8"), F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
        F.count("*").over(Window.partitionBy("fp")).alias("grp_sz"),
    )
    return a.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_groups"),
        F.sum(F.when(F.col("grp_sz") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_docs"),
    )


_D59_TERMS = ("slow", "dup", "big")


@query(
    "d59_blocklist_filter",
    oracle=f"""
WITH n AS (
  SELECT source,
         ' ' || replace(replace(replace(replace(replace(replace(lower(text),
           '0','o'),'1','i'),'3','e'),'4','a'),'5','s'),'7','t') || ' ' AS t
  FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  {", ".join(
    f"CAST(SUM(CASE WHEN t LIKE '% {w} %' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS hits_{w}" for w in _D59_TERMS)},
  CAST(SUM(CASE WHEN {" OR ".join(
    f"t LIKE '% {w} %'" for w in _D59_TERMS)}
    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM n GROUP BY source
""",
    tags=("llm", "quality", "safety"),
)
def d59_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist safety/quality filter with obfuscation-resistant
    normalization — the word-list screening pass every training-data
    pipeline runs before quality scoring (here with a neutral demo
    list). Text is lowercased and leet-folded (0→o 1→i 3→e 4→a 5→s
    7→t, the standard obfuscation alphabet) BEFORE matching, so
    'SL0W'/'sl0w' hit the 'slow' rule; matching is whole-word via
    space-padded containment (no substring false-positives: 'bigram'
    does not hit 'big'). Returns per-source per-term hit counts plus
    the any-term flag count — the triage report reviewers act on.

    Plan: normalization is one translate() (JVM codegen, identical to
    the oracle's single-char replace chain), matching is pure
    Contains — no regex engine, no Python, no join; ONE aggregate by
    source. At 100 TB a thousand-term list compiles to an Aho-Corasick
    pass in a pandas UDF; the 3-term demo stays in codegen'd Contains
    because that is the faster shape below ~dozens of terms."""
    docs = load(spark, sf_dir, "documents")
    t = F.concat(
        F.lit(" "),
        F.translate(F.lower(F.col("text")), "013457", "oieast"),
        F.lit(" "),
    )
    n = docs.select("source", t.alias("t"))
    hit = {w: F.col("t").contains(f" {w} ") for w in _D59_TERMS}
    any_hit = None
    for w in _D59_TERMS:
        any_hit = hit[w] if any_hit is None else (any_hit | hit[w])
    aggs = [F.count("*").alias("n_docs")]
    aggs += [
        F.sum(F.when(hit[w], 1).otherwise(0))
        .cast("bigint")
        .alias(f"hits_{w}")
        for w in _D59_TERMS
    ]
    aggs.append(
        F.sum(F.when(any_hit, 1).otherwise(0)).cast("bigint").alias("n_flagged")
    )
    return n.groupBy("source").agg(*aggs)


@query(
    "mm7_interleaved_packing",
    oracle="""
WITH meta AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS t_tok,
         CAST(CEIL((octet_length(encode(text)) % 640 + 1) / 16.0)
            * CEIL(((octet_length(encode(text)) * 7) % 480 + 1) / 16.0)
            AS BIGINT) AS i_tok
  FROM documents
), cum AS (
  SELECT source, t_tok, i_tok,
         COALESCE(SUM(t_tok + i_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
  FROM meta
)
SELECT source,
       CAST(FLOOR(tok_before / 4096.0) AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(t_tok) AS BIGINT) AS n_text_tokens,
       CAST(SUM(i_tok) AS BIGINT) AS n_image_tokens,
       CAST(SUM(t_tok + i_tok) AS BIGINT) AS n_tokens
FROM cum GROUP BY source, seq_id
""",
    tags=("llm", "multimodal", "packing"),
)
def mm7_interleaved_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved multimodal sequence packing — d49's packing
    discipline extended to text+image samples, the batch-prep step for
    any VLM training run: each document contributes its text tokens
    (whitespace count, d49's unit) PLUS its image patch tokens
    (ceil(w/16)*ceil(h/16) — the ViT patch-grid formula — from the
    decoded metadata), and samples pack greedily into 4096-token
    sequences per source in deterministic doc_id order. Returns the
    per-sequence manifest (samples, text/image/total token budget) a
    dataloader consumes.

    The image dimensions come from the REAL Arrow `mapInPandas` decode
    path (operators/multimodal.py — the oracle mirrors its stub
    formula, so what's verified end-to-end is decode → join → pack),
    joined back to the text stats on doc_id. Scale shape: the decode
    is embarrassingly parallel; the join is co-keyed on doc_id (at
    real scale both sides come pre-bucketed by doc_id from the same
    ingest); the packing window partitions by source — d49's
    distributed-prefix-sum story applies verbatim to the hot-key
    case."""
    docs = load(spark, sf_dir, "documents")
    meta = MM.decode_images(docs).select("doc_id", "width", "height")
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("t_tok"),
    )
    m = meta.select(
        "doc_id",
        (
            F.ceil(F.col("width") / F.lit(16.0))
            * F.ceil(F.col("height") / F.lit(16.0))
        )
        .cast("bigint")
        .alias("i_tok"),
    )
    base = t.join(m, "doc_id")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = base.withColumn(
        "tok_before",
        F.coalesce(F.sum(F.col("t_tok") + F.col("i_tok")).over(w), F.lit(0)),
    )
    return (
        cum.groupBy(
            "source",
            F.floor(F.col("tok_before") / F.lit(4096.0))
            .cast("bigint")
            .alias("seq_id"),
        )
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("t_tok").alias("n_text_tokens"),
            F.sum("i_tok").alias("n_image_tokens"),
            F.sum(F.col("t_tok") + F.col("i_tok")).alias("n_tokens"),
        )
    )


@query(
    "d60_ngram_novelty",
    oracle=_SH_DUCK
    + """,
ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
cand AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
nov AS (
  SELECT c.doc_id,
         COUNT(*) AS n_sh,
         SUM(CASE WHEN r.shingle IS NULL THEN 1 ELSE 0 END) AS n_novel
  FROM cand c LEFT JOIN ref r USING (shingle) GROUP BY c.doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) AS DOUBLE) / CAST(SUM(n_sh) AS DOUBLE) AS novelty
FROM nov JOIN documents d USING (doc_id)
GROUP BY d.source
""",
    tags=("llm", "quality", "novelty"),
)
def d60_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty vs a reference shard — "how much of this source
    is text we have NOT already got": per candidate document, the
    fraction of its distinct word 3-grams absent from a reference
    corpus (here the doc_id%10==0 shard standing in for "the previous
    crawl"), rolled up per source. Low novelty flags near-duplicative
    sources before any pairwise dedup runs — the cheap corpus-level
    triage that decides where to POINT the d04/d24 machinery — and the
    same statistic is the memorization screen when the reference is
    the eval/benchmark set.

    Plan: shingles explode once (d03's shared helper), the membership
    probe is a LEFT join keyed on the shingle (one hash shuffle), and
    both rollups are additive. At 100 TB the reference side first
    compresses to a Bloom filter (d26's operator) so the common-case
    miss never shuffles — the left join then only confirms the ~1%
    maybe-hits; novelty is the ONE double divide at the very end, so
    the whole pipeline stays integer-exact until the report row."""
    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3)
    ref = sh.filter(F.col("id") % 10 == 0).select("shingle").distinct()
    cand = sh.filter(F.col("id") % 10 != 0)
    marked = cand.join(
        ref.withColumn("__hit", F.lit(1)), "shingle", "left"
    )
    nov = marked.groupBy("id").agg(
        F.count("*").alias("n_sh"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
            "n_novel"
        ),
    )
    return (
        nov.join(docs.select(F.col("doc_id").alias("id"), "source"), "id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
            (
                F.sum("n_novel").cast("double")
                / F.sum("n_sh").cast("double")
            ).alias("novelty"),
        )
    )


@query(
    "d61_kmeans_quantizer_train",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_assigned,
       TRUE AS sse_monotone,
       TRUE AS k_bounded
FROM embeddings
""",
    tags=("llm", "clustering", "iterative", "gate"),
)
def d61_kmeans_quantizer_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means training for the IVF coarse quantizer
    (operators/similarity.py:kmeans_lloyd) — the iterative-algorithm
    entry: 4 assign/update rounds over the embeddings, k=8. FAISS
    trains IVF lists exactly this way; the d07y/d07t serving entries
    consume precisely such a codebook, so this closes the build side
    of the ANN story.

    Verification is a bounded-comparison gate (iterative argmin is not
    SQL-expressible — same discipline as d45): (a) every corpus vector
    is assigned in the final round (count vs the SQL COUNT(*)), (b)
    the nano-quantized SSE sequence is monotone non-increasing across
    iterations — Lloyd's invariant; a wrong assign OR a wrong update
    breaks it — and (c) cluster ids stay within [0, k). Booleans vs an
    all-TRUE oracle: a violation flips the driver hash, not just a
    unit test."""
    emb = load(spark, sf_dir, "embeddings")
    assignments, sse, _C = S.kmeans_lloyd(
        emb, k=8, n_iter=4, id_col="vec_id", vec_col="embedding"
    )
    stats = assignments.agg(
        F.count("*").alias("n"),
        F.min("cid").alias("cmin"),
        F.max("cid").alias("cmax"),
    ).collect()[0]
    monotone = all(b <= a for a, b in zip(sse, sse[1:]))
    k_bounded = stats["cmin"] is not None and 0 <= stats["cmin"] and stats[
        "cmax"
    ] < 8
    return spark.createDataFrame(
        [(int(stats["n"]), bool(monotone), bool(k_bounded))],
        "n_assigned bigint, sse_monotone boolean, k_bounded boolean",
    )


@query(
    "d62_data_card",
    oracle="""
WITH f AS (
  SELECT source, lang, n_chars, md5(lower(trim(text))) AS fp
  FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dups,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_short
FROM f GROUP BY source
""",
    tags=("llm", "profiling", "report"),
)
def d62_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card — the dataset-documentation row every
    training corpus ships with (datasheets/data-cards practice):
    volume (docs, chars), language diversity, exact-dup rate
    (1 − unique fingerprints/docs, d01's md5 key), and the
    short-document fraction that quality filters would drop. One scan,
    one aggregate; the report that decides which sources get the
    expensive d04/d24/d60 treatment.

    Scale shape: the two exact DISTINCTs share a single Expand-based
    aggregate keyed by source (Catalyst's multi-distinct rewrite —
    same audited shape as b64's profiler); everything else is
    additive. At 100 TB the distincts swap to approx_count_distinct
    (b08x's documented trade) with the same report schema."""
    docs = load(spark, sf_dir, "documents")
    f = docs.select(
        "source",
        "lang",
        "n_chars",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    return f.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count("*") - F.countDistinct("fp")).alias("n_dups"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
        .cast("bigint")
        .alias("n_short"),
    )


@query(
    "d63_dedup_keep_best",
    oracle="""
WITH g AS (
  SELECT doc_id, source, n_chars, md5(lower(trim(text))) AS fp
  FROM documents
), r AS (
  SELECT doc_id, source, fp,
         ROW_NUMBER() OVER (
           PARTITION BY fp ORDER BY n_chars DESC, doc_id
         ) AS rk,
         COUNT(*) OVER (PARTITION BY fp) AS grp_sz
  FROM g
)
SELECT source,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rk = 1 AND grp_sz > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_survivors_of_groups
FROM r GROUP BY source
""",
    tags=("llm", "dedup", "apply"),
)
def d63_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup APPLY with a keep-BEST policy: within each exact-dup group
    (md5 fingerprint, d01's key) keep the highest-quality member — here
    longest text, doc_id tiebreak — instead of d02's keep-first. This
    is the policy real pipelines run (the canonical copy is the best
    crawl, not the first one seen); the same rank-1 window applies
    verbatim when the group key is a d20 near-dup cluster id. Reports
    the per-source audit: kept, dropped, and how many survivors
    actually beat a competitor (the rows where the policy mattered).

    Plan: ONE hash-partition by fingerprint shared by both windows,
    then an additive rollup by source — no join, no second scan; the
    winner selection lowers to WindowGroupLimit-style per-partition
    streaming rank, never a sort of the full corpus."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    wr = Window.partitionBy("fp").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    r = docs.select(
        "source",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(Window.partitionBy("fp")).alias("grp_sz"),
    )
    return r.groupBy("source").agg(
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rk") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.sum(
            F.when((F.col("rk") == 1) & (F.col("grp_sz") > 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_survivors_of_groups"),
    )


@query(
    "d64_boilerplate_line_removal",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), segs AS (
  SELECT doc_id, source, s.i AS pos,
         array_to_string(
           t[1 + s.i * 8 : least(1 + s.i * 8 + 7, len(t))], ' ') AS seg
  FROM toks, unnest(generate_series(0, (len(t) - 1) // 8)) AS s(i)
), hashed AS (
  SELECT doc_id, source, pos,
         seg,
         CASE WHEN length(seg) = 0 THEN 0 ELSE
           list_reduce(
             list_transform(generate_series(1, length(seg)),
                            i -> CAST(unicode(seg[i:i]) AS BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007)
         END AS ch
  FROM segs
), freq AS (
  SELECT ch, COUNT(DISTINCT doc_id) AS nd FROM hashed GROUP BY ch
), marked AS (
  SELECT doc_id, source, pos, seg, nd >= 3 AS boiler
  FROM hashed JOIN freq USING (ch)
)
SELECT doc_id, source,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       COALESCE(
         string_agg(CASE WHEN NOT boiler THEN seg END, ' ' ORDER BY pos),
         '') AS cleaned_text
FROM marked GROUP BY doc_id, source
""",
    tags=("llm", "dedup", "quality", "apply"),
)
def d64_boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide boilerplate removal, APPLIED: any "line"
    (disjoint 8-token segment — the synthetic corpus has no newlines,
    so the segment grid stands in for line splitting; the pipeline is
    unit-agnostic) that occurs in >= 3 DISTINCT documents is cut from
    every document, and the CLEANED text is rebuilt in order. This is
    the C4/RefinedWeb "remove repeated lines" pass — the transform
    itself, where d22 only reports shared-segment counts and d43 only
    reports spans. Returns (doc_id, source, n_segments, n_removed,
    cleaned_text).

    Scale shape: zero-shuffle segment fan-out (d16/d22's slice
    pipeline) → ONE portable-hash frequency shuffle carrying 8-byte
    hashes (map-side partials) → the boiler set (only segments
    repeated >= 3 docs — structurally tiny, boilerplate by definition)
    broadcasts back as a hash semi-probe, so the corpus is never
    shuffled by text → one doc_id shuffle rebuilds documents with
    array_sort(collect_list(struct(pos, seg))) — per-doc linear. The
    portable polynomial hash keeps the oracle exact (collisions, if
    any, collide identically in both engines); at 100 TB swap
    xxhash64 and pin the boiler set to a shuffle join if it outgrows
    broadcast."""
    docs = load(spark, sf_dir, "documents")
    seg_len = 8
    t = F.col("__t")
    toks = ensure_parallelism(docs).select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("__t")
    )
    starts = F.sequence(
        F.lit(0),
        F.floor((F.size(t) - 1) / F.lit(seg_len)).cast("int"),
        F.lit(1),
    )
    segs = (
        toks.select("doc_id", "source", t.alias("__t"), F.posexplode(starts))
        .select(
            "doc_id",
            "source",
            F.col("pos"),
            F.concat_ws(
                " ",
                F.slice(F.col("__t"), F.col("pos") * seg_len + 1, F.lit(seg_len)),
            ).alias("seg"),
        )
        .withColumn("ch", F.expr(poly_hash("seg")))
    )
    segs = segs.persist(StorageLevel.MEMORY_AND_DISK)
    boiler = (
        segs.groupBy("ch")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 3)
        .select("ch", F.lit(True).alias("__b"))
    )
    marked = segs.join(broadcast(boiler), "ch", "left")
    kept = F.when(
        F.col("__b").isNull(), F.struct(F.col("pos"), F.col("seg"))
    )
    return marked.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["seg"]
            ),
        ).alias("cleaned_text"),
    )


@query(
    "d65_auc_quality_score",
    oracle="""
WITH scored AS (
  SELECT source, n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
), ranked AS (
  SELECT source, label,
         RANK() OVER (PARTITION BY source ORDER BY score)
           + (COUNT(*) OVER (PARTITION BY source, score) - 1) / 2.0
           AS avg_rank
  FROM scored
), agg AS (
  SELECT source,
         CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(SUM(1 - label) AS BIGINT) AS n_neg,
         SUM(CASE WHEN label = 1 THEN avg_rank ELSE 0.0 END) AS pos_rank_sum
  FROM ranked GROUP BY source
)
SELECT source, n_pos, n_neg,
       (pos_rank_sum
          - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
       / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
FROM agg
""",
    tags=("llm", "eval", "stats"),
)
def d65_auc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ROC-AUC via the Mann-Whitney rank statistic — the
    metric every quality-classifier / reward-model evaluation reports,
    computed exactly at corpus scale with NO threshold sweep: AUC =
    (Σ ranks of positives − n₊(n₊+1)/2) / (n₊·n₋), with midrank tie
    handling (RANK + (ties−1)/2 — ties get the average of their rank
    block, the textbook correction). Here: how well does document
    length separate English from non-English docs, per source — the
    demo stand-in for "how well does my quality score separate good
    from bad", d11's evaluation-side complement.

    Exactness: ranks are integers and midranks exact halves — every
    per-row term is dyadic, so the order-free sum is bit-portable; one
    double formula on the per-source rollup. Scale shape: ONE shuffle
    on source orders the rank window (the tie-count window shares the
    same partitioning — Catalyst reuses the exchange), then a
    per-source aggregate; nothing global, no threshold grid, no
    collect. At 100 TB: identical plan per source shard; for a global
    AUC swap the partition key for a single salt-merged rollup of the
    (score-bucket, label) histogram."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    w_rank = Window.partitionBy("source").orderBy("score")
    w_tie = Window.partitionBy("source", "score")
    ranked = scored.select(
        "source",
        "label",
        (
            F.rank().over(w_rank)
            + (F.count("*").over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    agg = ranked.groupBy("source").agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("label")).cast("bigint").alias("n_neg"),
        F.sum(
            F.when(F.col("label") == 1, F.col("avg_rank")).otherwise(0.0)
        ).alias("pos_rank_sum"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        "source",
        "n_pos",
        "n_neg",
        (
            (F.col("pos_rank_sum") - d("n_pos") * (d("n_pos") + F.lit(1.0)) / F.lit(2.0))
            / (d("n_pos") * d("n_neg"))
        ).alias("auc"),
    )


@query(
    "d67_retrieval_eval_metrics",
    oracle="""
WITH n AS (
  SELECT vec_id, label, embedding,
         sqrt(list_reduce(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           (p, q) -> p + q)) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
           (p, q) -> p + q) / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id % 25 = 0
), topk AS (
  SELECT q_id, c_id, rn FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rn
    FROM scored
  ) WHERE rn <= 10
), h AS (
  SELECT t.q_id, ql.label AS q_label,
         CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END AS hit, t.rn
  FROM topk t
  JOIN n ql ON ql.vec_id = t.q_id
  JOIN n cl ON cl.vec_id = t.c_id
), perq AS (
  SELECT q_id, q_label,
         CAST(SUM(hit) AS BIGINT) AS n_hits,
         COALESCE(2520 // MIN(CASE WHEN hit = 1 THEN rn END), 0)
           AS rr_scaled
  FROM h GROUP BY q_id, q_label
), relc AS (
  SELECT label, COUNT(*) - 1 AS rel FROM embeddings GROUP BY label
)
SELECT q_label AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(rr_scaled) AS DOUBLE)
         / (2520.0 * CAST(COUNT(*) AS DOUBLE)) AS mrr,
       CAST(SUM(n_hits) AS DOUBLE)
         / CAST(SUM(LEAST(rel, 10)) AS DOUBLE) AS recall_at10
FROM perq JOIN relc ON relc.label = perq.q_label
GROUP BY q_label
""",
    tags=("llm", "eval", "retrieval"),
)
def d67_retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness — recall@10 and MRR per
    label over the exact cosine top-10 (d07's kernel), with same-label
    vectors as the relevance ground truth: the metric layer every
    embedding/retriever training loop reports (d65's AUC for ranked
    retrieval). Swap the kernel call for any ANN entry (d07x/y/t, d34)
    and the SAME harness scores its quality drop.

    Exactness: reciprocal ranks are scaled by 2520 = lcm(1..10), so
    every per-query term is an INTEGER (2520/rank is exact for rank <=
    10) and the label-level sums are order-free; recall is
    micro-averaged (Σhits / Σmin(|relevant|, 10)) — one divide per
    output row. No fp accumulates across rows anywhere.

    Scale shape: the metric layer adds to the kernel only broadcast
    label hydration (two small joins), one per-query aggregate, and a
    |labels|-row rollup — evaluation cost stays O(retrieval), which is
    what lets it run inline in a training pipeline's eval step."""
    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") % 25 == 0)
    topk = S.brute_force_cosine_topk(em, queries, k=10)
    lab = em.select("vec_id", "label")
    h = (
        topk.join(
            broadcast(lab.select(F.col("vec_id").alias("q_id"),
                                 F.col("label").alias("q_label"))),
            "q_id",
        )
        .join(
            broadcast(lab.select(F.col("vec_id").alias("c_id"),
                                 F.col("label").alias("c_label"))),
            "c_id",
        )
        .select(
            "q_id",
            "q_label",
            F.when(F.col("c_label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("hit"),
            F.col("rank").cast("bigint").alias("rn"),
        )
    )
    perq = h.groupBy("q_id", "q_label").agg(
        F.sum("hit").cast("bigint").alias("n_hits"),
        F.coalesce(
            F.expr("2520 div min(CASE WHEN hit = 1 THEN rn END)"),
            F.lit(0),
        ).alias("rr_scaled"),
    )
    relc = em.groupBy("label").agg((F.count("*") - 1).alias("rel"))
    return (
        perq.join(
            broadcast(relc.select(F.col("label").alias("q_label"), "rel")),
            "q_label",
        )
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count("*").alias("n_queries"),
            (
                F.sum("rr_scaled").cast("double")
                / (F.lit(2520.0) * F.count("*").cast("double"))
            ).alias("mrr"),
            (
                F.sum("n_hits").cast("double")
                / F.sum(F.least(F.col("rel"), F.lit(10))).cast("double")
            ).alias("recall_at10"),
        )
    )


@query(
    "d66_dup_span_removal",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), win AS (
  SELECT doc_id, len(t) AS ntok, s.i * 8 AS st,
         array_to_string(t[1 + s.i * 8 : s.i * 8 + 16], ' ') AS wstr
  FROM toks, unnest(generate_series(0, (len(t) - 16) // 8)) AS s(i)
  WHERE len(t) >= 16
), hashed AS (
  SELECT doc_id, ntok, st,
         CASE WHEN length(wstr) = 0 THEN 0 ELSE
           list_reduce(list_transform(generate_series(1, length(wstr)),
             i -> CAST(unicode(wstr[i:i]) AS BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007)
         END AS h
  FROM win
), freq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM hashed GROUP BY h
), dup AS (
  SELECT doc_id, ntok, st FROM hashed JOIN freq USING (h) WHERE nd > 1
), isl AS (
  SELECT doc_id, ntok, st,
         CASE WHEN st - LAG(st) OVER (PARTITION BY doc_id ORDER BY st) <= 16
              THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, ntok, st,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY st
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM isl
), spans AS (
  SELECT doc_id, MIN(st) AS span_start,
         LEAST(MAX(st) + 16, ntok) AS span_end
  FROM grp GROUP BY doc_id, ntok, g
), tokidx AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(0, len(t) - 1)) AS idx
  FROM toks
), covered AS (
  SELECT DISTINCT t.doc_id, t.idx
  FROM tokidx t JOIN spans s
    ON s.doc_id = t.doc_id
   AND t.idx >= s.span_start AND t.idx < s.span_end
)
SELECT tk.doc_id,
       CAST(COUNT(*) AS BIGINT) AS ntok,
       CAST(SUM(CASE WHEN c.idx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS removed_tokens,
       COALESCE(string_agg(CASE WHEN c.idx IS NULL THEN tk.tok END,
                           ' ' ORDER BY tk.idx), '') AS cleaned_text
FROM tokidx tk LEFT JOIN covered c
  ON c.doc_id = tk.doc_id AND c.idx = tk.idx
GROUP BY tk.doc_id
""",
    tags=("llm", "dedup", "apply"),
)
def d66_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span REMOVAL, applied (Lee et al. exact-substring
    dedup, the cut step): d43 detects the maximal cross-document
    duplicated token ranges; this entry CUTS them and rebuilds each
    document's cleaned text — detect→apply symmetry, like d63 is to
    d01. Returns (doc_id, ntok, removed_tokens, cleaned_text).

    The rebuild never explodes tokens: each doc's (few) spans collect
    into a sorted array, the complement gap ranges come from one
    zip_with over (prepended-0 ends, appended-ntok starts), and the
    kept text is flatten(slice per gap) + concat_ws — all JVM array
    ops on the already-loaded token array, zero extra fan-out. The
    oracle rebuilds token-by-token (explode + range anti-probe), an
    independent formulation of the same cut. Scale shape: d43's
    window/frequency pipeline unchanged (8-byte-hash shuffle), spans
    rollup is small (docs with duplication only) and BROADCASTS back
    onto the doc scan — the corpus text shuffles zero times."""
    docs = load(spark, sf_dir, "documents")
    wlen, stride = 16, 8
    toks = ensure_parallelism(docs).select(
        "doc_id", F.split(F.col("text"), " ").alias("__t")
    )
    t = F.col("__t")
    base = toks.select("doc_id", "__t", F.size(t).alias("ntok"))
    eligible = base.filter(F.col("ntok") >= wlen)
    starts = F.sequence(
        F.lit(0),
        F.floor((F.col("ntok") - wlen) / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    win = eligible.select(
        "doc_id", "ntok", "__t", F.explode(starts).alias("i")
    ).select(
        "doc_id",
        "ntok",
        (F.col("i") * stride).alias("st"),
        F.concat_ws(
            " ", F.slice(F.col("__t"), F.col("i") * stride + 1, F.lit(wlen))
        ).alias("wstr"),
    )
    hashed = win.select(
        "doc_id", "ntok", "st", F.expr(poly_hash("wstr")).alias("h")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    freq = hashed.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    dup = hashed.join(freq.filter(F.col("nd") > 1), "h").select(
        "doc_id", "ntok", "st"
    )
    w_ord = Window.partitionBy("doc_id").orderBy("st")
    grp = dup.withColumn(
        "brk",
        F.when(
            F.col("st") - F.lag("st").over(w_ord) <= wlen, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "g", F.sum("brk").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = (
        grp.groupBy("doc_id", "ntok", "g")
        .agg(
            F.min("st").alias("span_start"),
            F.least(F.max("st") + wlen, F.col("ntok")).alias("span_end"),
        )
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("spans")
        )
    )
    j = base.join(broadcast(spans), "doc_id", "left").select(
        "doc_id",
        "ntok",
        "__t",
        F.coalesce(
            F.col("spans"),
            F.array().cast("array<struct<span_start:int,span_end:int>>"),
        ).alias("spans"),
    )
    sp = F.col("spans")
    gap_starts = F.concat(
        F.array(F.lit(0)), F.transform(sp, lambda x: x["span_end"])
    )
    gap_ends = F.concat(
        F.transform(sp, lambda x: x["span_start"]), F.array(F.col("ntok"))
    )
    kept = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda s, e: F.slice(
                F.col("__t"), s + F.lit(1), F.greatest(e - s, F.lit(0))
            ),
        )
    )
    return j.select(
        "doc_id",
        F.col("ntok").cast("bigint").alias("ntok"),
        (F.col("ntok") - F.size(kept)).cast("bigint").alias("removed_tokens"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )


@query(
    "d68_luhn_pan_validation",
    oracle="""
WITH cand AS (
  SELECT o_orderstatus,
         '4' || lpad(CAST((o_orderkey * 2654435761) % 1000000000000000
                          AS VARCHAR), 15, '0') AS pan
  FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN {LUHN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid
FROM cand GROUP BY o_orderstatus
""".format(LUHN=__import__(
        "kafka_data_explorer_cdc_spark.operators.text", fromlist=["x"]
    ).duckdb_luhn_sql("pan")),
    tags=("llm", "pii", "quality"),
)
def d68_luhn_pan_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated PAN detection — the PRECISION stage of PII
    scanning (operators/text.py:luhn_valid_expr): d21's regex finds
    16-digit candidates (recall), the Luhn mod-10 fold then rejects
    the ~90% of digit runs that are not structurally valid card
    numbers, cutting false redactions an order of magnitude. The
    corpus here is deterministic synthetic candidates (the testdata
    carries no digit runs), so the rate itself is verifiable: ~10% of
    uniform random 16-digit strings pass Luhn.

    Scale shape: the whole validator is ONE codegen expression
    (transform/aggregate fold over sequence(1,16)) — no UDF, no
    explode, no shuffle beyond the final tiny rollup; it composes into
    d21's redaction pass as a WHERE clause at zero plan cost."""
    from ..operators.text import luhn_valid_expr

    o = load(spark, sf_dir, "orders")
    cand = o.select(
        "o_orderstatus",
        F.concat(
            F.lit("4"),
            F.lpad(
                ((F.col("o_orderkey") * F.lit(2654435761))
                 % F.lit(1000000000000000)).cast("string"),
                15,
                "0",
            ),
        ).alias("pan"),
    )
    return cand.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.expr(luhn_valid_expr("pan")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid"),
    )


@query(
    "d69_logreg_quality_train",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(4 AS BIGINT) AS n_rounds,
       TRUE AS loss_monotone,
       TRUE AS beats_majority
FROM embeddings
""",
    tags=("llm", "ml", "iterative", "gate"),
)
def d69_logreg_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training
    (operators/ml.py:logreg_train) — the build side of the quality-
    classifier story (b67 scores with a FIXED weight table; this fits
    one): 4 full-batch GD rounds predicting the coarse label group
    (label < 5) from the 64-dim embedding. The supervised sibling of
    d61's k-means, with the same verification discipline: iterative
    GD is not SQL-expressible, so the gates are (a) every vector
    scored (count vs SQL COUNT(*)), (b) the nano-quantized loss
    sequence STRICTLY decreases across all 4 rounds, (c) final
    training accuracy beats the majority-class baseline — on weights
    that are bit-deterministic because every cross-row sum (gradients
    and loss) is int64-quantized per row before the order-free
    reduction, so the booleans cannot flap with partitioning."""
    from ..operators.ml import logreg_train

    em = load(spark, sf_dir, "embeddings")
    labeled = em.select(
        "embedding", (F.col("label") < 5).cast("int").alias("y")
    )
    scored, losses, _w = logreg_train(labeled, "y", n_iter=4, lr=0.5)
    agg = scored.agg(
        F.count("*").alias("n_scored"),
        F.sum(
            F.when(
                ((F.col("p") >= 0.5).cast("int") == F.col("y").cast("int")),
                1,
            ).otherwise(0)
        ).alias("n_correct"),
        F.sum(F.col("y").cast("bigint")).alias("n_pos"),
    ).first()
    n, correct, npos = agg["n_scored"], agg["n_correct"], agg["n_pos"]
    majority = max(npos, n - npos)
    monotone = all(b < a for a, b in zip(losses, losses[1:]))
    return spark.createDataFrame(
        [(n, 4, bool(monotone), bool(correct > majority))],
        "n_scored bigint, n_rounds bigint, loss_monotone boolean, "
        "beats_majority boolean",
    )


@query(
    "mm8_vit_patchify",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         length(text) AS n,
         (length(text) % 640 + 1) AS w,
         ((length(text) * 7) % 480 + 1) AS h
  FROM documents
), grid AS (
  SELECT doc_id, n,
         CAST(ceil(w / 16.0) * ceil(h / 16.0) AS INT) AS n_patches
  FROM meta
), bytes AS (
  SELECT d.doc_id, g.n_patches, s.i - 1 AS pos,
         unicode(d.text[s.i:s.i]) AS b
  FROM documents d
  JOIN grid g ON g.doc_id = d.doc_id,
  unnest(generate_series(1, g.n)) AS s(i)
  WHERE g.n > 0
)
SELECT doc_id,
       CAST(MAX(n_patches) AS INT) AS n_patches,
       CAST(SUM(CASE WHEN pos % n_patches = 0 THEN b ELSE 0 END)
            AS BIGINT) AS first_patch_sum,
       CAST(SUM(b) AS BIGINT) AS total_sum
FROM bytes GROUP BY doc_id
""",
    tags=("llm", "multimodal", "arrow"),
)
def mm8_vit_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patchify plumbing (operators/multimodal.py:patchify_batch):
    payload bytes gathered into the ceil(w/16)·ceil(h/16) patch grid
    (the formula mm7 budgets with) through one Arrow ``mapInPandas``
    stage — the real pixel→patch gather's exact Spark shape (batch in,
    numpy bincount, variable patch counts out) with the codec stubbed
    to deterministic byte dimensions, so every patch sum is
    recomputable from character codes by the oracle (the ASCII-corpus
    trick mm5 uses for audio). Plan: scan → one ArrowEvalPython-free
    mapInPandas boundary → rows; zero shuffles, zero joins."""
    from ..operators import multimodal as M

    docs = load(spark, sf_dir, "documents")
    payloads = M.to_binary_docs(ensure_parallelism(docs))
    return payloads.mapInPandas(M.patchify_batch, M.PATCH_SCHEMA)


# ---------------------------------------------------------------------------
# Data selection
# ---------------------------------------------------------------------------

_D70_BUCKETS = 512
_D70_KEEP = 100

_D70_BUCKET_DUCK = DUCKDB_POLY_HASH.format(expr="concat('dsir:', tok)")
_D70_GUMBEL_DUCK = DUCKDB_POLY_HASH.format(
    expr="concat('dsirg:', CAST(doc_id AS VARCHAR))"
)


@query(
    "d70_dsir_resample",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
), tb AS (
  SELECT doc_id, lang, ({_D70_BUCKET_DUCK}) % {_D70_BUCKETS} AS bucket
  FROM toks
), raw AS (
  SELECT bucket, COUNT(*) AS cr FROM tb GROUP BY bucket
), tgt AS (
  SELECT bucket, COUNT(*) AS ct FROM tb WHERE lang = 'en' GROUP BY bucket
), tot AS (
  SELECT CAST((SELECT COUNT(*) FROM tb WHERE lang = 'en') AS DOUBLE) AS nt,
         CAST((SELECT COUNT(*) FROM tb) AS DOUBLE) AS nr
), ratios AS (
  SELECT bucket,
         CAST(ROUND(
           LN((COALESCE(ct, 0) + 1.0) / (nt + {_D70_BUCKETS}))
           - LN((cr + 1.0) / (nr + {_D70_BUCKETS})), 9)
         AS DECIMAL(28,9)) AS lr
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
), wdoc AS (
  SELECT doc_id, lang, SUM(lr) AS w
  FROM tb JOIN ratios USING (bucket)
  GROUP BY doc_id, lang
), keyed AS (
  SELECT doc_id, lang, w,
         w + CAST(ROUND(
               -LN(-LN((({_D70_GUMBEL_DUCK}) + 1) / {POLY_MOD + 1}.0)), 9)
             AS DECIMAL(28,9)) AS score
  FROM wdoc
)
SELECT doc_id, lang,
       ROUND(CAST(w AS DOUBLE), 6) AS weight,
       ROUND(CAST(score AS DOUBLE), 6) AS score
FROM keyed
ORDER BY score DESC, doc_id
LIMIT {_D70_KEEP}
""",
    tags=("llm", "sampling", "selection"),
)
def d70_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): select raw-corpus documents that look like a target
    domain by importance weights over HASHED n-gram features, then
    draw a fixed-size sample with the Gumbel-top-k trick. Here the
    target is the English stratum (stand-in for "quality domain"),
    features are {_D70_BUCKETS} hashed unigram buckets, and the top
    {_D70_KEEP} Gumbel-perturbed docs are kept. Per the paper:
    log w(x) = Σ_tokens [log p_target(bucket) − log p_raw(bucket)]
    with Laplace (+1) smoothing; sampling without replacement ≡ top-k
    of log w + Gumbel noise (here a deterministic salted-hash Gumbel,
    so the draw is reproducible and engine-portable).

    Exactness: each bucket's log-ratio is quantized to DECIMAL(28,9)
    BEFORE the per-doc sum, so the fold is exact decimal addition —
    order-free, bit-identical across engines regardless of token
    order (the d69 quantized-gradient trick); the Gumbel term is
    quantized the same way. Scale shape: token fan-out is zero-shuffle;
    TWO bucket aggregates carry {_D70_BUCKETS} partials each (map-side
    combine); the {_D70_BUCKETS}-row ratio table broadcasts back onto
    the token stream; ONE doc_id shuffle of decimal partials; global
    top-k is TakeOrderedAndProject (k per partition, never a full
    sort). At 100 TB the ratio table is still {_D70_BUCKETS} rows —
    the paper's whole point is that the selector state is O(buckets),
    not O(corpus)."""
    docs = load(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs).select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    tb = toks.select(
        "doc_id",
        "lang",
        (F.expr(poly_hash("concat('dsir:', tok)")) % _D70_BUCKETS).alias("bucket"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    raw = tb.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt = (
        tb.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    totals = tb.agg(
        F.count("*").cast("double").alias("nr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("nt"),
    )
    b = F.lit(float(_D70_BUCKETS))
    ratios = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + b))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + b)),
                9,
            )
            .cast("decimal(28,9)")
            .alias("lr"),
        )
    )
    wdoc = (
        tb.join(broadcast(ratios), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum("lr").alias("w"))
    )
    gumbel = (
        F.round(
            -F.log(
                -F.log(
                    (
                        F.expr(
                            poly_hash("concat('dsirg:', CAST(doc_id AS STRING))")
                        )
                        + 1
                    )
                    / float(POLY_MOD + 1)
                )
            ),
            9,
        )
    ).cast("decimal(28,9)")
    keyed = wdoc.withColumn("score", F.col("w") + gumbel)
    return (
        keyed.orderBy(F.col("score").desc(), "doc_id")
        .limit(_D70_KEEP)
        .select(
            "doc_id",
            "lang",
            F.round(F.col("w").cast("double"), 6).alias("weight"),
            F.round(F.col("score").cast("double"), 6).alias("score"),
        )
    )


@query(
    "d71_k_anonymity_audit",
    oracle="""
WITH qi AS (
  SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_band
  FROM documents
), classes AS (
  SELECT lang, source, len_band, COUNT(*) AS class_size
  FROM qi GROUP BY lang, source, len_band
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
       CAST(SUM(CASE WHEN class_size < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(SUM(CASE WHEN class_size < 3 THEN class_size ELSE 0 END)
            AS BIGINT) AS n_risky_docs,
       ROUND(CAST(SUM(CASE WHEN class_size < 3 THEN class_size ELSE 0 END)
                  AS DOUBLE) / SUM(class_size), 6) AS suppression_rate
FROM classes GROUP BY lang
""",
    tags=("llm", "privacy", "quality"),
)
def d71_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over quasi-identifiers — the
    privacy gate a training corpus passes before release: group docs
    by the QI tuple (lang, source, 100-char length band), measure each
    equivalence class, and report per-lang the achieved k (min class
    size), the classes below k=3, and the fraction of documents a
    suppression pass would drop. Complements d21/d68 (which find
    direct identifiers IN the text) by measuring re-identification
    risk from the METADATA. Scale shape: two cascaded hash aggregates
    — QI classes (map-side partials; cardinality = |QI space|, not
    |corpus|) then a per-lang rollup over class rows; no joins, no
    windows, no collect. At 100 TB the class table is the only
    shuffle and it is bounded by the QI domain."""
    docs = load(spark, sf_dir, "documents")
    classes = (
        docs.select(
            "lang",
            "source",
            F.floor(F.col("n_chars") / 100).cast("bigint").alias("len_band"),
        )
        .groupBy("lang", "source", "len_band")
        .agg(F.count("*").alias("class_size"))
    )
    risky = F.col("class_size") < 3
    return classes.groupBy("lang").agg(
        F.count("*").alias("n_classes"),
        F.min("class_size").alias("k_anonymity"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("bigint").alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_docs"),
        F.round(
            F.sum(F.when(risky, F.col("class_size")).otherwise(0)).cast("double")
            / F.sum("class_size"),
            6,
        ).alias("suppression_rate"),
    )


_D72_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"
)
_D72_NORMSQ = (
    "list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "(p, q) -> p + q)"
)


@query(
    "d72_hard_negative_mining",
    oracle=f"""
WITH n AS (
  SELECT vec_id, label, embedding,
         sqrt({_D72_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, q.label AS q_label,
         c.vec_id AS c_id, c.label AS c_label,
         {_D72_DOT.format(a="q.embedding", b="c.embedding")}
           / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.label <> q.label
  WHERE q.vec_id % 25 = 0
)
SELECT q_id, q_label, c_id, c_label, cosine, rn AS rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= 3
""",
    tags=("llm", "similarity", "training"),
)
def d72_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the negatives an
    InfoNCE/triplet loss learns most from — e.g. Robinson et al. 2021):
    for each anchor (every 25th vec_id), the 3 most-cosine-similar
    vectors with a DIFFERENT label. d57 samples negatives uniformly;
    this ranks them by similarity, which is what embedding fine-tuning
    pipelines actually mine at scale. Operator:
    operators/similarity.py:hard_negative_topk — anchors broadcast,
    corpus never shuffled, cross-label filter applied before the
    per-anchor top-k window so the shuffle carries only k·|anchors|
    rows after the per-partition rank pre-reduction. Exact kernel here
    (the oracle's brute force); at 100 TB the scorer swaps to the IVF
    probe (d07y) with the same label-mismatch candidate filter."""
    em = load(spark, sf_dir, "embeddings")
    anchors = em.filter(F.col("vec_id") % 25 == 0)
    return S.hard_negative_topk(em, anchors, k=3)


_D73_FP_DUCK = DUCKDB_POLY_HASH.format(expr="concat('fp:', lower(trim(text)))")


@query(
    "d73_dataset_fingerprint",
    oracle=f"""
WITH fp AS (
  SELECT source, ({_D73_FP_DUCK}) AS h FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(bit_xor(h) AS BIGINT) AS xor_fp,
       CAST(SUM(h) AS BIGINT) AS sum_fp,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique
FROM fp GROUP BY source
""",
    tags=("llm", "versioning", "quality"),
)
def d73_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dataset fingerprint — the version stamp a
    100 TB corpus snapshot publishes so replicas/re-materializations
    can be compared WITHOUT moving data: per source shard, the doc
    count plus two ORDER-FREE reductions of the per-doc content hash
    (XOR and exact integer SUM — together they detect any single-doc
    change, addition, or drop regardless of row order or partitioning)
    and the distinct-hash count (dedup-state drift). Two replicas
    agree on this 5-number row iff their shards hold the same multiset
    of normalized documents (up to hash collisions at ~1e-9). Scale
    shape: one scan, per-doc hash is a linear fold, ONE map-side-
    combined groupBy(source); the distinct count is the only partial
    that isn't O(1) — swap it for approx_count_distinct when the exact
    dedup ledger isn't required. No joins, no sort, no collect."""
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "source",
        F.expr(poly_hash("concat('fp:', lower(trim(text)))")).alias("h"),
    )
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr("bit_xor(h)").cast("bigint").alias("xor_fp"),
        F.sum("h").cast("bigint").alias("sum_fp"),
        F.countDistinct("h").alias("n_unique"),
    )


@query(
    "d74_bitext_margin_mining",
    oracle=f"""
WITH a AS (
  SELECT vec_id AS src_id, embedding AS q_vec,
         sqrt({_D72_NORMSQ.format(a="embedding")}) AS q_norm
  FROM embeddings WHERE label = 0
), b AS (
  SELECT vec_id AS tgt_id, embedding AS c_vec,
         sqrt({_D72_NORMSQ.format(a="embedding")}) AS c_norm
  FROM embeddings WHERE label = 1
), s AS (
  SELECT src_id, tgt_id,
         {_D72_DOT.format(a="q_vec", b="c_vec")} / (q_norm * c_norm)
           AS cosine
  FROM a CROSS JOIN b
), fwd AS (
  SELECT src_id, SUM(CAST(ROUND(cosine * 1e9) AS BIGINT)) AS s9
  FROM (SELECT src_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY src_id
                                  ORDER BY cosine DESC, tgt_id) AS rn
        FROM s) t WHERE rn <= 4 GROUP BY src_id
), bwd AS (
  SELECT tgt_id, SUM(CAST(ROUND(cosine * 1e9) AS BIGINT)) AS s9
  FROM (SELECT tgt_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY tgt_id
                                  ORDER BY cosine DESC, src_id) AS rn
        FROM s) t WHERE rn <= 4 GROUP BY tgt_id
), m AS (
  SELECT s.src_id, s.tgt_id, s.cosine,
         s.cosine / (((CAST(fwd.s9 AS DOUBLE) / (4 * 1e9))
                      + (CAST(bwd.s9 AS DOUBLE) / (4 * 1e9))) / 2)
           AS margin_raw
  FROM s JOIN fwd USING (src_id) JOIN bwd USING (tgt_id)
)
SELECT src_id, tgt_id,
       ROUND(cosine, 6) AS cosine,
       ROUND(margin_raw, 6) AS margin,
       margin_raw >= 1.05 AS mined
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                                   ORDER BY margin_raw DESC, tgt_id) AS rn
      FROM m) t WHERE rn = 1
""",
    tags=("llm", "similarity", "multilingual"),
)
def d74_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    CCMatrix/LASER parallel-corpus recipe): label-0 vectors play the
    source language, label-1 the target; each source is paired with
    its best target by the RATIO margin cos(x,y) / ((fwd_k(x) +
    bwd_k(y))/2), which normalizes away hub vectors that raw cosine
    thresholds mis-rank. The mined flag is the margin >= 1.05 accept
    decision a translation-pair harvesting pipeline would apply.

    Operator: operators/similarity.py:bitext_margin_pairs — the scored
    bipartite block is persisted ONCE and reused for the forward
    means, backward means, and final re-rank; the per-side kNN means
    (quantized to 1e-9 integer sums, so the means are order-free and
    the margin is one identical double formula in both engines) are
    |src|- and |tgt|-row tables broadcast back onto the block. At
    100 TB each "nearest" scan swaps to the IVF probe (d07y) per side;
    margin math and rank logic are unchanged."""
    em = load(spark, sf_dir, "embeddings")
    return S.bitext_margin_pairs(
        em.filter(F.col("label") == 0),
        em.filter(F.col("label") == 1),
        k=4,
        threshold=1.05,
    )


@query(
    "d75_tokenizer_fertility",
    oracle="""
WITH t AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS n_char,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_byte,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_char) AS DOUBLE) / SUM(n_tok), 6)
         AS chars_per_token,
       ROUND(CAST(SUM(n_byte) AS DOUBLE) / SUM(n_char), 6)
         AS bytes_per_char,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS tokens_per_doc
FROM t GROUP BY lang
""",
    tags=("llm", "text", "profiling"),
)
def d75_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / compression datasheet per language — the
    numbers a tokenizer-budget decision is made from (how many tokens
    a corpus costs, and how unevenly languages pay: chars-per-token is
    the whitespace-proxy inverse fertility, bytes-per-char exposes the
    UTF-8 multi-byte tax CJK pays that byte-level BPEs inherit).
    Whitespace tokens are the d70 convention (split of
    lower(trim(text)) on ' '); a real subword tokenizer plugs in via
    d45's mapInPandas seam without changing this rollup.

    Scale shape: per-row lengths are codegen scalar exprs fused into
    the scan; ONE map-side-combined groupBy(lang) to |langs| rows; the
    ratios are computed on the rollup from exact integer sums — order-
    free, no UDF, no second pass."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_char"),
        F.octet_length("text").cast("long").alias("n_byte"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), " "))
        .cast("long")
        .alias("n_tok"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(
            F.sum("n_char").cast("double") / F.sum("n_tok"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_byte").cast("double") / F.sum("n_char"), 6
        ).alias("bytes_per_char"),
        F.round(
            F.sum("n_tok").cast("double") / F.count("*"), 6
        ).alias("tokens_per_doc"),
    )


_D76_FP_DUCK = DUCKDB_POLY_HASH.format(expr="lower(trim(text))")
_D76_SPLIT_DUCK = DUCKDB_POLY_HASH.format(
    expr="concat('split:', lower(trim(text)))"
)


@query(
    "d76_curation_pipeline",
    oracle=f"""
WITH quality AS (
  SELECT doc_id, text, lang, source, n_chars,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
  FROM documents
  WHERE n_chars >= 50
    AND len(string_split(lower(trim(text)), ' ')) >= 10
    AND lang IN ('en', 'fr', 'es', 'de')
), deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY ({_D76_FP_DUCK}) ORDER BY doc_id) AS rn
    FROM quality
  ) t WHERE rn = 1
), train AS (
  SELECT * FROM deduped WHERE ({_D76_SPLIT_DUCK}) % 20 < 15
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM train GROUP BY source
""",
    tags=("llm", "pipeline", "curation"),
)
def d76_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline as ONE composed Catalyst plan — the
    C4/CCNet recipe shape: quality gate (length + token floor) →
    language selection → exact dedup keep-first (content fingerprint)
    → deterministic 75% train split → per-source datasheet rollup.
    The point is COMPOSITION: every stage is an operator this engine
    already ships standalone (d09 quality, d10 langid, d02 dedup
    apply, d41 hash split, d62 data card), and chaining them stays one
    DataFrame plan — no intermediate materialization, filters fused
    into the scan, ONE shuffle for the dedup window (WindowGroupLimit
    rank-1) and one map-side-combined rollup.

    At 100 TB this is the nightly curation job: the quality/lang
    filters prune before the only wide exchange, the dedup fingerprint
    partitions uniformly (content hash), and the split is content-
    keyed (d41's discipline) so reruns and re-crawls never migrate a
    document across the train/eval boundary."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), " "))
    quality = docs.filter(
        (F.col("n_chars") >= 50)
        & (n_tok >= 10)
        & F.col("lang").isin("en", "fr", "es", "de")
    ).withColumn("n_tok", n_tok.cast("long"))
    fp = F.expr(poly_hash("lower(trim(text))"))
    w = Window.partitionBy(fp).orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    split_h = F.expr(poly_hash("concat('split:', lower(trim(text)))"))
    train = deduped.filter(split_h % 20 < 15)
    return train.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


_D77_HASH = DUCKDB_POLY_HASH.format(
    expr="concat('umx:', cast(doc_id as varchar))"
)


@query(
    "d77_unimax_temperature_sample",
    oracle=f"""
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY lang
), tot AS (
  SELECT CAST(FLOOR(0.4 * SUM(n)) AS BIGINT) AS b,
         SUM(CAST(ROUND(sqrt(n) * 1e6) AS BIGINT)) AS s
  FROM c
), bud AS (
  SELECT lang, n,
         CAST(LEAST(n, (CAST(ROUND(sqrt(n) * 1e6) AS BIGINT) * b) // s)
              AS BIGINT) AS k
  FROM c CROSS JOIN tot
), r AS (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY ({_D77_HASH}), doc_id) AS BIGINT)
           AS rk
  FROM documents WHERE lang IS NOT NULL
)
SELECT r.doc_id, r.lang, r.rk, bud.k AS lang_budget
FROM r JOIN bud USING (lang) WHERE rk <= k
""",
    tags=("llm", "sampling", "multilingual"),
)
def d77_unimax_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the UniMax / mT5 α=0.5
    recipe): per-language budgets proportional to n_lang^0.5 — high-
    resource languages are downweighted, low-resource ones get their
    full corpus (LEAST(n, budget) is UniMax's epoch cap) — then exactly
    budget_l documents drawn per language by portable-hash rank. d32
    equalizes to the minimum (α=0); this is the tunable-α production
    mixer multilingual pretraining actually uses.

    Exactness: the n^0.5 weights are quantized to integer micro-units
    and the budget is pure integer arithmetic ((q·B) div S), so both
    engines compute byte-identical budgets — no cross-engine double
    summation anywhere.

    Scale shape: budgets come from a count-only rollup (|langs| rows,
    broadcast back); selection is ONE lang shuffle ranking on the
    content-independent portable hash (reproducible across runs,
    engines, partitionings). At 100 TB the rank is bounded per group
    by the broadcast budget — the same per-stratum exact-k shape as
    d44."""
    docs = load(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    q = F.round(F.sqrt(F.col("n")) * 1e6, 0).cast("bigint")
    tot = c.agg(
        F.floor(0.4 * F.sum("n")).cast("bigint").alias("b"),
        F.sum(q).alias("s"),
    )
    bud = (
        c.crossJoin(broadcast(tot))
        .withColumn("q", q)
        .select(
            "lang",
            F.least(F.col("n"), F.expr("(q * b) div s")).alias("k"),
        )
    )
    hk = F.expr(poly_hash("concat('umx:', cast(doc_id as string))"))
    w = Window.partitionBy("lang").orderBy(F.asc("hk"), F.asc("doc_id"))
    r = docs.select("doc_id", "lang", hk.alias("hk")).withColumn(
        "rk", F.row_number().over(w).cast("bigint")
    )
    return (
        r.join(broadcast(bud), "lang")
        .filter(F.col("rk") <= F.col("k"))
        .select("doc_id", "lang", "rk", F.col("k").alias("lang_budget"))
    )


@query(
    "d78_jaro_winkler_linkage",
    oracle="""
WITH dirty AS (
  SELECT p_partkey AS dkey, p_name AS dname_orig, p_brand, p_size,
         substr(p_name, 1, p_partkey % length(p_name))
           || substr(p_name, (p_partkey % length(p_name)) + 2) AS dname
  FROM part WHERE length(p_name) >= 2
), cand AS (
  SELECT d.dkey, d.dname_orig, c.p_partkey AS ckey, c.p_name AS cname,
         CAST(FLOOR(jaro_winkler_similarity(d.dname, c.p_name) * 1e9)
              AS BIGINT) AS sq
  FROM dirty d
  JOIN part c ON d.p_brand = c.p_brand AND d.p_size = c.p_size
), best AS (
  SELECT dkey, ckey, cname, dname_orig, sq,
         row_number() OVER (PARTITION BY dkey ORDER BY sq DESC, ckey)
           AS rn
  FROM cand WHERE sq >= 880000000
)
SELECT dkey, ckey AS matched_key,
       CAST(sq AS DOUBLE) / 1e9 AS score,
       cname = dname_orig AS name_match
FROM best WHERE rn = 1
""",
    tags=("llm", "linkage", "fuzzy", "pandas-udf"),
)
def d78_jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage / entity resolution with Jaro-Winkler scoring —
    the classic dirty-catalog re-link: every part name gets one
    deterministic character deletion (position keyed by p_partkey), and
    the operator must link each dirty record back to a clean catalog
    row. Blocking on p_brand bounds candidates structurally (pairs =
    sum of block sizes squared, never corpus squared — the same
    candidate-bounding contract as d50/d51); each candidate pair is
    scored with Jaro-Winkler and the best match >= 0.88 wins
    (ties: smallest clean key). `name_match` reports whether the linked
    name equals the pre-corruption original — the linkage-quality
    metric a real pipeline would track.

    Cross-engine exactness: the Spark side scores with an original
    Python implementation of Jaro-Winkler (operators/dedup.py:
    jaro_winkler_pandas — Arrow-batched; floored transpositions, 0.7
    boost gate, prefix cap 4) while the oracle scores with DuckDB's
    built-in jaro_winkler_similarity — two INDEPENDENT implementations
    that must agree on every candidate pair after 1e9 floor
    quantization; the argmax then runs on the quantized int64 in both.

    Scale shape: the dirty derivation and blocking join are pure JVM;
    only the JW kernel crosses to Python (Arrow batches of short name
    pairs); the per-record argmax is one WindowGroupLimit-shaped rank
    over the candidate set, partitioned by dirty key."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    cut = F.col("p_partkey") % F.length("p_name")
    dirty = (
        part.filter(F.length("p_name") >= 2)
        .select(
            F.col("p_partkey").alias("dkey"),
            F.col("p_name").alias("dname_orig"),
            F.col("p_brand").alias("dbrand"),
            F.col("p_size").alias("dsize"),
            F.concat(
                F.expr("substring(p_name, 1, p_partkey % length(p_name))"),
                F.expr(
                    "substring(p_name, (p_partkey % length(p_name)) + 2)"
                ),
            ).alias("dname"),
        )
    )
    clean = part.select(
        F.col("p_partkey").alias("ckey"),
        F.col("p_name").alias("cname"),
        F.col("p_brand").alias("cbrand"),
        F.col("p_size").alias("csize"),
    )
    cand = dirty.join(
        clean,
        (F.col("dbrand") == F.col("cbrand"))
        & (F.col("dsize") == F.col("csize")),
    ).withColumn(
        "sq",
        F.floor(
            D.jaro_winkler_pandas(F.col("dname"), F.col("cname")) * F.lit(1e9)
        ).cast("bigint"),
    )
    w = Window.partitionBy("dkey").orderBy(F.desc("sq"), F.asc("ckey"))
    return (
        cand.filter(F.col("sq") >= 880000000)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dkey",
            F.col("ckey").alias("matched_key"),
            (F.col("sq").cast("double") / F.lit(1e9)).alias("score"),
            (F.col("cname") == F.col("dname_orig")).alias("name_match"),
        )
    )


@query(
    "d79_mmr_diversified_retrieval",
    oracle=f"""
WITH RECURSIVE n AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {_DOT.format(a="q.embedding", b="c.embedding")}
           / (q.nrm * c.nrm) AS rel
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10
), cand AS (
  SELECT q_id, c_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY rel DESC, c_id) AS rn
    FROM scored
  ) WHERE rn <= 20
), sims AS (
  SELECT a.q_id, a.c_id AS a_id, b.c_id AS b_id,
         {_DOT.format(a="na.embedding", b="nb.embedding")}
           / (na.nrm * nb.nrm) AS sim
  FROM cand a
  JOIN cand b ON a.q_id = b.q_id AND a.c_id <> b.c_id
  JOIN n na ON na.vec_id = a.c_id
  JOIN n nb ON nb.vec_id = b.c_id
), sel AS (
  SELECT q_id, 0 AS it, CAST([] AS BIGINT[]) AS picked
  FROM (SELECT DISTINCT q_id FROM cand)
  UNION ALL
  SELECT q_id, it + 1,
         list_append(picked, (
           SELECT c.c_id FROM cand c
           WHERE c.q_id = sel.q_id
             AND NOT list_contains(sel.picked, c.c_id)
           ORDER BY 0.7 * c.rel - 0.3 * COALESCE((
             SELECT max(s.sim) FROM sims s
             WHERE s.q_id = sel.q_id AND s.a_id = c.c_id
               AND list_contains(sel.picked, s.b_id)), 0.0) DESC,
             c.c_id
           LIMIT 1))
  FROM sel WHERE it < 5
)
SELECT sel.q_id, gs.i AS pick_order, picked[gs.i] AS c_id
FROM sel CROSS JOIN generate_series(1, 5) gs(i)
WHERE it = 5
""",
    tags=("llm", "similarity", "retrieval", "pandas-udf"),
)
def d79_mmr_diversified_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (operators/similarity.py:mmr_rerank):
    per query (vec_id < 10), greedily pick 5 of the exact-cosine
    top-20 maximizing 0.7*relevance - 0.3*max-similarity-to-already-
    picked — the diversity head that stops RAG retrieval returning
    five copies of the same chunk.

    Two independent implementations of the greedy walk must agree
    pick-for-pick: Spark runs candidate kernel + pairwise sims as JVM
    folds (bit-identical to the oracle's list folds, the d07
    contract) with only the sequential selection in an Arrow cogrouped
    applyInPandas; the oracle replays the same walk as a DuckDB
    recursive CTE with a correlated argmax per iteration. Output is
    ids and pick order only — no float columns to round."""
    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    # mu passed explicitly as the literal 0.3: the oracle's argmax uses
    # the literal too, and 1.0 - 0.7 != 0.3 by one ulp (see mmr_rerank).
    return S.mmr_rerank(em, queries, k=5, m=20, lam=0.7, mu=0.3)


@query(
    "d80_unicode_nfc_normalize",
    oracle="""
WITH injected AS (
  SELECT doc_id, lang,
         CASE doc_id % 3
           WHEN 0 THEN replace(text, 'e', 'e' || chr(769))
           WHEN 1 THEN replace(text, 'a', 'a' || chr(776))
           ELSE text END AS raw,
         length(text) AS n_orig
  FROM documents
), norm AS (
  SELECT doc_id, lang, n_orig, length(raw) AS n_raw,
         nfc_normalize(raw) AS fixed
  FROM injected
)
SELECT doc_id, lang,
       CAST(n_raw AS BIGINT) AS chars_raw,
       CAST(length(fixed) AS BIGINT) AS chars_fixed,
       CAST(n_raw - n_orig AS BIGINT) AS marks_injected,
       length(fixed) < n_raw AS composed,
       substr(fixed, 1, 40) AS head
FROM norm
""",
    tags=("llm", "text", "unicode", "pandas-udf"),
)
def d80_unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the text-cleanup pass every
    multilingual corpus needs before dedup or tokenization (decomposed
    e+COMBINING ACUTE and e-acute must hash identically). The synthetic
    corpus is ASCII, so the pipeline first INJECTS decomposed marks
    deterministically (doc_id % 3 keys which vowel gets a combining
    mark — the same expression in both engines), then normalizes: the
    Spark side through the one genuinely non-SQL kernel (pandas
    ``str.normalize('NFC')``, Arrow-batched, zero shuffles), the
    oracle through DuckDB's independent ``nfc_normalize`` — two
    Unicode implementations (Python unicodedata vs utf8proc) that must
    agree on every composed length and prefix.

    Scale shape: a pure mapInPandas-free projection — injection,
    lengths, and the head sample are codegen string exprs; the
    normalize UDF is the only Python boundary and carries one string
    column through Arrow. No shuffle anywhere."""
    import pandas as pd

    @pandas_udf(T.StringType())
    def nfc(s):
        return s.str.normalize("NFC")

    docs = load(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.replace(F.col("text"), F.lit("a"), F.lit("a\u0308")),
        )
        .otherwise(F.col("text"))
        .alias("raw"),
        F.length("text").alias("n_orig"),
    )
    norm = injected.withColumn("fixed", nfc(F.col("raw")))
    return norm.select(
        "doc_id",
        "lang",
        F.length("raw").cast("bigint").alias("chars_raw"),
        F.length("fixed").cast("bigint").alias("chars_fixed"),
        (F.length("raw") - F.col("n_orig")).cast("bigint").alias(
            "marks_injected"
        ),
        (F.length("fixed") < F.length("raw")).alias("composed"),
        F.substring("fixed", 1, 40).alias("head"),
    )


@query(
    "d81_calibration_audit",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         CAST(FLOOR(1e9 / (1.0 + exp(-((n_chars - 300.0) / 80.0))))
              AS BIGINT) AS pred_q,
         CASE WHEN ({DUCKDB_POLY_HASH.format(expr="CAST(doc_id AS VARCHAR)")})
                   % 100
              < 40 + CASE WHEN lang = 'en' THEN 30 ELSE 0 END
              THEN 1 ELSE 0 END AS label
  FROM documents
), binned AS (
  SELECT LEAST(pred_q // 100000000, 9) AS bin, pred_q, label FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(pred_q) AS DOUBLE) / COUNT(*) / 1e9, 6)
         AS mean_pred,
       ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
       ROUND(ABS(CAST(SUM(pred_q) AS DOUBLE) / COUNT(*) / 1e9
                 - CAST(SUM(label) AS DOUBLE) / COUNT(*)), 6) AS gap
FROM binned GROUP BY 1
""",
    tags=("llm", "ml", "calibration"),
)
def d81_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model calibration audit — the reliability diagram + per-bin ECE
    terms every deployed quality classifier needs: predictions (a
    sigmoid scorer over document length, the b67/d69 serving shape)
    are nano-floor-quantized, bucketed into 10 confidence bins, and
    each bin reports its size, mean predicted probability, observed
    positive rate, and |gap| — the Expected Calibration Error is the
    n-weighted gap sum over these rows. Labels are a deterministic
    portable-hash Bernoulli whose rate shifts with lang, so bins are
    genuinely miscalibrated and the gaps non-trivial.

    Exactness: the sigmoid is computed as the identical double
    expression in both engines and floor-quantized BEFORE any
    aggregation, making every reduction an order-free integer sum
    (the b67/d48 contract); bin ids derive from the quantized value.

    Scale shape: one scan, one 10-row map-side-combined groupBy —
    the audit costs a single pass regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    pred_q = F.floor(
        F.lit(1e9)
        / (F.lit(1.0) + F.exp(-((F.col("n_chars") - F.lit(300.0)) / F.lit(80.0))))
    ).cast("bigint")
    h = F.expr(poly_hash("cast(doc_id as string)"))
    label = F.when(
        h % 100
        < F.lit(40) + F.when(F.col("lang") == "en", 30).otherwise(0),
        1,
    ).otherwise(0)
    scored = docs.select(
        pred_q.alias("pred_q"), label.alias("label")
    ).withColumn(
        "bin", F.least(F.col("pred_q") / F.lit(100000000), F.lit(9)).cast("bigint")
    )
    mean_pred = F.sum("pred_q").cast("double") / F.count("*") / F.lit(1e9)
    pos_rate = F.sum("label").cast("double") / F.count("*")
    return (
        scored.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(mean_pred, 6).alias("mean_pred"),
            F.round(pos_rate, 6).alias("pos_rate"),
            F.round(F.abs(mean_pred - pos_rate), 6).alias("gap"),
        )
        .select("bin", "n", "mean_pred", "pos_rate", "gap")
    )


@query(
    "d82_motif_census",
    oracle="""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
e AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 7 + k) % n.n AS dst
  FROM documents, n, (SELECT unnest([1, 2, 3]) AS k)
  WHERE (doc_id * 7 + k) % n.n <> doc_id
),
ffl AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
open_w AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e2.src = e1.dst
  WHERE e1.src <> e2.dst
    AND NOT EXISTS (SELECT 1 FROM e e3
                    WHERE e3.src = e1.src AND e3.dst = e2.dst)
),
recip AS (
  SELECT e1.src AS a, e1.dst AS b
  FROM e e1 JOIN e e2 ON e2.src = e1.dst AND e2.dst = e1.src
  WHERE e1.src < e1.dst
)
SELECT CAST((SELECT COUNT(*) FROM ffl) AS BIGINT) AS n_ffl,
       CAST((SELECT COUNT(*) FROM open_w) AS BIGINT) AS n_open,
       CAST((SELECT COUNT(*) FROM recip) AS BIGINT) AS n_reciprocal,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges
""",
    tags=("llm", "graph", "motif"),
)
def d82_motif_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-motif census (operators/graph.py:motif_find) — the
    GraphFrames find() surface re-expressed as pure join algebra:
    feed-forward loops a→b→c & a→c (the closure motif — in a citation
    or link graph these are transitive endorsements), OPEN wedges
    a→b→c with NO a→c edge (the negation compiles to a LEFT ANTI
    join — these are the link-prediction candidates), and reciprocal
    pairs a⇄b, all over d36's deterministic directed link graph.

    Scale shape: every motif is a chain of hash equi-joins on vertex
    keys plus at most one anti-join — no cross join exists in the
    algebra (disconnected motifs are a compile ERROR). Wedge fan-out
    is the d55 story: degree-orient the edge table first when the
    graph has hubs; the motif compiler is unchanged by that choice."""
    from ..operators.graph import motif_find

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    e = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select("src", ((F.col("src") * 7 + F.col("k")) % n).alias("dst"))
        .filter(F.col("dst") != F.col("src"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ffl = motif_find(e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
    open_w = motif_find(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)").filter(
        F.col("a") != F.col("c")
    )
    recip = motif_find(e, "(a)-[]->(b); (b)-[]->(a)").filter(
        F.col("a") < F.col("b")
    )
    return (
        ffl.agg(F.count("*").alias("n_ffl"))
        .crossJoin(open_w.agg(F.count("*").alias("n_open")))
        .crossJoin(recip.agg(F.count("*").alias("n_reciprocal")))
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
    )


def _mm9_oracle() -> str:
    from ..operators.multimodal import (
        AUDIO_WINDOW,
        GOERTZEL_COS,
        GOERTZEL_SIN,
    )

    cq = "[" + ", ".join(str(c) for c in GOERTZEL_COS) + "]"
    sq = "[" + ", ".join(str(s) for s in GOERTZEL_SIN) + "]"
    return f"""
WITH lit AS (
  SELECT CAST({cq} AS BIGINT[]) AS cq, CAST({sq} AS BIGINT[]) AS sq
), s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), w AS (
  SELECT doc_id, vs, unnest(range(0, len(vs) // {AUDIO_WINDOW})) AS widx
  FROM s WHERE len(vs) >= {AUDIO_WINDOW}
), p AS (
  SELECT doc_id, widx,
         list_reduce(list_transform(range(0, {AUDIO_WINDOW}),
           j -> vs[CAST(widx * {AUDIO_WINDOW} + j + 1 AS INT)]
                * cq[CAST(j + 1 AS INT)]), (a, b) -> a + b) AS dc,
         list_reduce(list_transform(range(0, {AUDIO_WINDOW}),
           j -> vs[CAST(widx * {AUDIO_WINDOW} + j + 1 AS INT)]
                * sq[CAST(j + 1 AS INT)]), (a, b) -> a + b) AS ds
  FROM w CROSS JOIN lit
), pw AS (
  SELECT doc_id, widx, dc * dc + ds * ds AS power_q,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY dc * dc + ds * ds DESC, widx) AS rn
  FROM p
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(MAX(power_q) AS BIGINT) AS max_power_q,
       CAST(MIN(CASE WHEN rn = 1 THEN widx END) AS BIGINT) AS peak_window
FROM pw GROUP BY doc_id
"""


@query("mm9_goertzel_tone_power", oracle=_mm9_oracle(), tags=("llm", "multimodal", "dsp"))
def mm9_goertzel_tone_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT tone detection (operators/multimodal.py:
    goertzel_power) — the Goertzel primitive behind DTMF / pilot-tone /
    alias probes, over the stubbed-codec waveform column: per full
    64-sample window, power at bin 5 as EXACT int64 arithmetic (cos/sin
    quantized to 1e4 Python-side and inlined as the SAME literals into
    the numpy kernel and this oracle — no engine evaluates trig, the
    d56-literal pattern). Per doc: window count, max power, and the
    earliest window achieving it.

    Scale: one Arrow mapInPandas pass (one int64 matmul per blob), one
    map-side-combining groupBy; the tie-safe argmax is a struct-max,
    not a second window pass."""
    from ..operators import multimodal as MM

    docs = load(spark, sf_dir, "documents")
    p = MM.goertzel_power(docs)
    best = F.max(F.struct(F.col("power_q"), (-F.col("window_idx")).alias("neg")))
    return p.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.max("power_q").alias("max_power_q"),
        (-best.getField("neg")).cast("long").alias("peak_window"),
    )


def _d83_oracle() -> str:
    from ..operators.text import duckdb_bpe_apply_sql

    enc = duckdb_bpe_apply_sql("text")
    return f"""
WITH enc AS (
  SELECT doc_id,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
           AS n_symbols,
         {enc} AS encoded
  FROM documents
)
SELECT doc_id,
       CAST(n_symbols AS BIGINT) AS n_symbols,
       CAST(length(encoded) - length(replace(encoded, '(', ''))
            AS BIGINT) AS n_tokens,
       CAST(n_symbols - (length(encoded) - length(replace(encoded, '(', '')))
            AS BIGINT) AS n_merges,
       substr(encoded, 1, 40) AS head
FROM enc
"""


@query("d83_bpe_apply", oracle=_d83_oracle(), tags=("llm", "tokenizer"))
def d83_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge APPLICATION — the inference half of the tokenizer
    (d54 computes the training-side pair stats), with ZERO Python in
    the row path (operators/text.py:bpe_apply_expr): letters wrap as
    (c) symbols in one regexp_replace, then each rank-ordered merge
    rule is ONE plain string replace — 15 nested replaces, a flat
    codegen chain fused into the scan, byte-identical in DuckDB.
    Rule-sequential application semantics pinned at the operator (the
    re-scanning bpe() loop differs only when a later rule recreates an
    earlier rule's pair). Per doc: symbol count in, token count out,
    merges applied, and the encoded head pinning the actual merge
    content — not just the counts."""
    from ..operators.text import bpe_apply_expr

    docs = load(spark, sf_dir, "documents")
    enc = F.expr(bpe_apply_expr("text"))
    n_sym = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    n_tok = F.length(enc) - F.length(F.replace(enc, F.lit("(")))
    return docs.select(
        "doc_id",
        n_sym.cast("long").alias("n_symbols"),
        n_tok.cast("long").alias("n_tokens"),
        (n_sym - n_tok).cast("long").alias("n_merges"),
        F.substring(enc, 1, 40).alias("head"),
    )


def _d84_oracle() -> str:
    from ..operators.text import POLY_MOD, duckdb_cdc_chunk_sql

    e = duckdb_cdc_chunk_sql("text")
    return f"""
SELECT doc_id,
       CAST(len({e["ends"]}) AS BIGINT) AS n_chunks,
       CAST(list_max(list_transform(
           list_zip(list_concat([0::BIGINT], {e["ends"]}[1:-2]),
                    {e["ends"]}),
           p -> p[2] - p[1])) AS BIGINT) AS max_chunk_len,
       CAST(list_reduce(list_concat([0::BIGINT], {e["chunk_fps"]}),
           (a, x) -> (a * 37 + x) % {POLY_MOD}) AS BIGINT) AS chunks_fp
FROM documents
"""


@query("d84_content_defined_chunking", oracle=_d84_oracle(), tags=("llm", "dedup", "chunking"))
def d84_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/text.py:cdc_chunk_exprs) —
    the rsync/LBFS boundary rule that makes CHUNK-level dedup survive
    edits: boundaries sit where the rolling 16-char hash ≡ 0 (mod 61),
    so an insertion shifts ONE chunk, not every downstream block (the
    fixed-stride alternative re-offsets everything — d43's spans would
    all move). Per doc: chunk count, max chunk length, and an
    order-sensitive fold of the per-chunk fingerprints — pinning the
    exact cut POSITIONS and chunk CONTENT cross-engine, not just
    counts. The corpus-level use is the module-docstring story: group
    by chunk fingerprint across documents and near-identical docs
    share all but their edited chunks.

    Scale: one Arrow mapInPandas pass per doc (operators/dedup.py:
    cdc_chunk_stats — a sliding-window int64 matmul per document), no
    shuffle at all; the chunk-dedup groupBy it feeds is one
    map-side-combining rollup. The pure-expression twin
    (operators/text.py:cdc_chunk_exprs) is the readable spec and the
    oracle's source of truth, but Catalyst evaluates its HOF lambdas
    interpreted PER CHAR POSITION — measured 115 s at sf0.1 vs ~1 s
    for the kernel (the d68 codegen lesson at O(n) scale);
    tests/test_dedup.py pins kernel == expressions == DuckDB."""
    from ..operators.dedup import cdc_chunk_stats

    return cdc_chunk_stats(load(spark, sf_dir, "documents"))


_D29_ORACLE = REGISTRY["d29_bigram_lm_perplexity"].oracle


@query(
    "d85_ccnet_quality_buckets",
    oracle=f"""
WITH scored AS ({_D29_ORACLE}
), with_lang AS (
  SELECT s.doc_id, d.lang, s.nll_bigram
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
), bucketed AS (
  SELECT *, NTILE(3) OVER (
    PARTITION BY lang ORDER BY nll_bigram, doc_id) AS tercile
  FROM with_lang
), kept AS (
  SELECT *, CASE tercile
    WHEN 1 THEN TRUE
    WHEN 2 THEN ((doc_id * 2654435761) % 1000003) % 100 < 50
    ELSE ((doc_id * 2654435761) % 1000003) % 100 < 10 END AS keep
  FROM bucketed
)
SELECT lang,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM kept GROUP BY 1, 2
""",
    tags=("llm", "quality", "sampling", "ccnet"),
)
def d85_ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing — the recipe behind
    CCNet/RedPajama's quality tiers: score every document with the
    corpus-trained LM (d29's bigram NLL, REUSED by calling the
    registered entry — one pipeline, not a re-implementation), split
    each language into NLL terciles (head = most fluent), then keep
    head fully, middle at 50%, tail at 10% via the repo's standard
    deterministic hash draw (d41's recipe — no RNG state, replayable).

    Exactness: tercile assignment orders by (6-dp-rounded NLL, doc_id)
    so NTILE is tie-deterministic cross-engine; keeps are integer hash
    arithmetic. Scale: d29's plan + one lang-partition window over the
    doc-level score table (tiny next to the corpus) + one rollup."""
    scored = REGISTRY["d29_bigram_lm_perplexity"].fn(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    wl = scored.join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy("nll_bigram", "doc_id")
    b = wl.withColumn("tercile", F.ntile(3).over(w))
    draw = ((F.col("doc_id") * 2654435761) % 1000003) % 100
    keep = (
        F.when(F.col("tercile") == 1, F.lit(True))
        .when(F.col("tercile") == 2, draw < 50)
        .otherwise(draw < 10)
    )
    return (
        b.withColumn("keep", keep)
        .groupBy(
            "lang",
            F.when(F.col("tercile") == 1, "head")
            .when(F.col("tercile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
        )
    )


def _d86_oracle() -> str:
    from ..operators.text import duckdb_cdc_chunk_sql

    e = duckdb_cdc_chunk_sql("text")
    return f"""
WITH chunks AS (
  SELECT doc_id, u.fp
  FROM (SELECT doc_id, unnest({e["chunk_fps"]}) AS fp FROM documents) u
), shared AS (
  SELECT fp,
         COUNT(*) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY fp
  HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_shared_chunks,
       CAST(COALESCE(SUM(n_occurrences), 0) AS BIGINT) AS n_occurrences,
       CAST(COALESCE(MAX(n_docs), 0) AS BIGINT) AS max_docs_sharing,
       CAST((SELECT COUNT(*) FROM chunks) AS BIGINT) AS n_total_chunks
FROM shared
"""


@query("d86_cross_doc_chunk_dedup", oracle=_d86_oracle(), tags=("llm", "dedup", "chunking"))
def d86_cross_doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document chunk dedup — the payoff of d84's content-defined
    boundaries (operators/dedup.py:cdc_chunks): explode every document
    into its chunks, group by chunk fingerprint, and content shared
    between documents surfaces as multi-doc fingerprints. Because the
    boundaries are content-defined, a one-line edit leaves every OTHER
    chunk's fp unchanged — fixed-width blocks would re-offset and miss
    all of it. This is segment-granular dedup (d22) with edit-stable
    segments, and the storage-dedup primitive (rsync/LBFS/venti) in
    the same breath.

    Scale: one Arrow pass to chunk, ONE fp rollup with map-side
    combine (fp cardinality ≈ corpus/61 chars); the report is a
    4-scalar corpus audit, no pair joins anywhere."""
    from ..operators.dedup import cdc_chunks

    ch = cdc_chunks(load(spark, sf_dir, "documents")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    shared = (
        ch.groupBy("fp")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return (
        shared.agg(
            F.count("*").alias("n_shared_chunks"),
            F.coalesce(F.sum("n_occurrences"), F.lit(0))
            .cast("bigint")
            .alias("n_occurrences"),
            F.coalesce(F.max("n_docs"), F.lit(0))
            .cast("bigint")
            .alias("max_docs_sharing"),
        )
        .crossJoin(ch.agg(F.count("*").cast("bigint").alias("n_total_chunks")))
    )


#: d87's deterministic per-language weight seeds: the hashing-trick
#: classifier w[bucket, lang] = ((bucket * seed) % 97) - 48, inlined
#: identically into both engines (stand-in for trained weights — the
#: PLUMBING under test is hashed-feature inference, not the fit).
_D87_LANGS = (("en", 31), ("de", 37), ("fr", 41), ("es", 43), ("zh", 47))
_D87_BUCKETS = 4096


def _d87_oracle() -> str:
    score = ", ".join(
        f"SUM((((b % {_D87_BUCKETS}) * {seed}) % 97) - 48) AS s_{lang}"
        for lang, seed in _D87_LANGS
    )
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang, _ in _D87_LANGS) + ")"
    pick = "CASE " + " ".join(
        f"WHEN s_{lang} = {greatest} THEN '{lang}'"
        for lang, _ in _D87_LANGS
    ) + " END"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS arr
  FROM documents
), bg AS (
  SELECT doc_id,
         list_transform(list_zip(arr, arr[2:]),
                        p -> p[1] || ' ' || p[2]) AS pairs
  FROM toks WHERE len(arr) >= 2
), feats AS (
  SELECT doc_id,
         CASE WHEN unnest.p IS NULL THEN NULL ELSE
           list_reduce(list_transform(range(1, length(unnest.p) + 1),
             i -> CAST(unicode(unnest.p[CAST(i AS INT):CAST(i AS INT)])
                       AS BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) END AS b
  FROM bg, UNNEST(list_transform(pairs, x -> x)) AS unnest(p)
), scores AS (
  SELECT doc_id, {score} FROM feats GROUP BY doc_id
)
SELECT {pick} AS pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scores GROUP BY 1
"""


@query("d87_hashed_feature_classifier", oracle=_d87_oracle(), tags=("llm", "ml", "inference"))
def d87_hashed_feature_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick classifier INFERENCE (the fastText recipe:
    features = hashed word bigrams, score = per-class weight sums,
    prediction = argmax) with ZERO Python — the inference sibling of
    d69 (training) and b67 (dense scoring). Word bigrams explode
    through ONE generator, each hashes to a bucket with the portable
    polynomial hash, the 5 per-class scores are conditional SUMs in
    ONE map-side-combining doc rollup, and argmax is a greatest()
    CASE. Weights are a deterministic bucket formula inlined into both
    engines (the plumbing under test is hashed-feature inference; swap
    the formula for a broadcast weight table when the model is real —
    the plan shape is identical, one broadcast join more).

    Scale: generator → one doc-key rollup → 5-column argmax; weight
    memory is O(buckets × classes) regardless of vocabulary — the
    entire point of the hashing trick."""
    docs = load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    t = docs.select("doc_id", arr.alias("arr")).filter(F.size("arr") >= 2)
    n = F.size(F.col("arr"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("arr"), 1, n - 1),
                F.slice(F.col("arr"), 2, n - 1),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.col("p").getField("0"), F.col("p").getField("1")
        ).alias("pair"),
    )
    from ..operators.text import poly_hash

    feats = bg.select("doc_id", F.expr(poly_hash("pair")).alias("b"))
    scores = feats.groupBy("doc_id").agg(
        *[
            F.sum(((F.col("b") % _D87_BUCKETS) * seed) % 97 - 48).alias(
                f"s_{lang}"
            )
            for lang, seed in _D87_LANGS
        ]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang, _ in _D87_LANGS])
    pick = None
    for lang, _seed in _D87_LANGS:
        cond = F.col(f"s_{lang}") == best
        pick = F.when(cond, lang) if pick is None else pick.when(cond, lang)
    return scores.select(pick.alias("pred_lang")).groupBy("pred_lang").agg(
        F.count("*").alias("n_docs")
    )


@query("d88_neardup_clusters_star", oracle=_D20_CC_ORACLE, tags=("llm", "dedup", "graph"))
def d88_neardup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment via LARGE-STAR/SMALL-STAR
    alternation (Kiveris et al., "Connected Components in MapReduce
    and Beyond") as a first-class entry — previously only d20's
    round-cap fallback. Same contract as d20 (component = min
    reachable doc_id over the exact-Jaccard pair graph), same
    hash-exact oracle, different convergence story: O(log² n) rounds
    on ANY graph shape, including the adversarial long chains where
    min-label propagation needs O(diameter) rounds. At 100 TB this is
    the variant you run when the dedup graph's shape is not known to
    be shallow (e.g. chained paraphrase edits), at the same per-round
    cost: one groupBy-min + one equi-join, lineage-checkpointed."""
    from ..operators.graph import connected_components_star

    pairs = d05_ngram_jaccard_pairs(spark, sf_dir).select("id1", "id2")
    return connected_components_star(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


_D89_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
"""


@query("d89_hard_negative_ivf", oracle=_D89_ORACLE, tags=("llm", "similarity", "approx", "training"))
def d89_hard_negative_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed hard-negative mining — the registered scale path
    d72 documents (operators/similarity.py:hard_negative_ivf_topk):
    corpus bucketed into 16 centroid cells, each anchor probes its 8
    nearest, label-mismatch filter on the cell-pruned candidate
    stream, exact-cosine re-rank. Bounded-comparison gate (all-TRUE
    oracle, the d07y pattern):

    - probe -1: recall@3 vs the exact cross-label kernel (d72) at
      nprobe=8 of 16 >= 0.5 — pruning half the corpus must keep at
      least half the true hard negatives (measured, organically much
      higher).
    - probe -2: the exactness knob — nprobe == n_cells probes every
      cell, so the (q_id, c_id) top-3 set must equal the exact
      kernel's EXACTLY (pruning trades recall, never correctness).
    """
    em = load(spark, sf_dir, "embeddings")
    anchors = em.filter(F.col("vec_id") % 25 == 0)
    # one-time IVF build shared by the nprobe=8 probe and the
    # nprobe=16 exactness knob (guide §1.2: one centroid scan + one
    # Arrow cell-assignment pass, not two of each)
    C, cells = S.ivf_build(em, n_cells=16, label_col="label")
    ann = S.hard_negative_ivf_topk(
        em, anchors, k=3, n_cells=16, nprobe=8, centroids=C, cells=cells
    ).persist(StorageLevel.MEMORY_AND_DISK)
    exact = S.hard_negative_topk(em, anchors, k=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    full = S.hard_negative_ivf_topk(
        em, anchors, k=3, n_cells=16, nprobe=16, centroids=C, cells=cells
    ).persist(StorageLevel.MEMORY_AND_DISK)  # two anti-join consumers
    missing = exact.select("q_id", "c_id").join(
        F.broadcast(full.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    extra = full.select("q_id", "c_id").join(
        F.broadcast(exact.select("q_id", "c_id")), ["q_id", "c_id"], "left_anti"
    )
    exact_knob = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    )
    out = _recall_row(ann, exact, 0.5, -1).unionByName(exact_knob)
    # bounded 2-row collect, then release the gate caches (round-10
    # ADVICE d92x pattern: repeated bench/driver invocations must not
    # accumulate session-lifetime MEMORY_AND_DISK entries)
    rows = out.collect()
    ann.unpersist()
    exact.unpersist()
    full.unpersist()
    cells.unpersist()
    return spark.createDataFrame(rows, out.schema)


_D90_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
"""


@query("d90_bitext_margin_ivf", oracle=_D90_ORACLE, tags=("llm", "similarity", "approx", "multilingual"))
def d90_bitext_margin_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed bitext margin mining — the registered scale path d74
    documents: the scored bipartite block (and therefore the fwd/bwd
    kNN means feeding the Artetxe-Schwenk ratio margin) narrows from
    the full |src|x|tgt| product to centroid-cell-pruned candidates
    (bitext_margin_pairs(ivf=(n_cells, nprobe))). Bounded-comparison
    gate (all-TRUE oracle, the d07y pattern):

    - probe -1: at nprobe=8 of 16 (scanning ~half the block), the
      fraction of sources whose mined rank-1 target matches the exact
      path's >= 0.5 (measured; organically much higher since rank-1
      pairs are by construction the far-from-boundary ones).
    - probe -2: the exactness knob — nprobe == n_cells makes the
      candidate block the full product, so every output row
      (src_id, tgt_id, cosine, margin, mined) must equal the exact
      path's EXACTLY.
    """
    em = load(spark, sf_dir, "embeddings")
    src = em.filter(F.col("label") == 0)
    tgt = em.filter(F.col("label") == 1)
    exact = S.bitext_margin_pairs(src, tgt, k=4, threshold=1.05).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # one-time target-side IVF build shared by the nprobe=8 probe and
    # the nprobe=16 exactness knob (guide §1.2: one centroid scan +
    # one Arrow assignment pass over the target side, not two)
    C, tcells = S.bitext_ivf_build(tgt, n_cells=16)
    probed = S.bitext_margin_pairs(
        src, tgt, k=4, threshold=1.05, ivf=(16, 8),
        ivf_centroids=C, ivf_cells=tcells,
    )
    hits = probed.select("src_id", "tgt_id").join(
        exact.select("src_id", "tgt_id"), ["src_id", "tgt_id"], "left_semi"
    )
    recall = (
        hits.agg(F.count("*").alias("h"))
        .crossJoin(exact.select(F.count("*").alias("n")))
        .select(
            F.lit(-1).cast("long").alias("probe_id"),
            (F.col("h") >= F.col("n") * 0.5).alias("ok"),
        )
    )
    full = S.bitext_margin_pairs(
        src, tgt, k=4, threshold=1.05, ivf=(16, 16),
        ivf_centroids=C, ivf_cells=tcells,
    ).persist(StorageLevel.MEMORY_AND_DISK)  # two anti-join consumers
    cols = ["src_id", "tgt_id", "cosine", "margin", "mined"]
    missing = exact.select(cols).join(
        F.broadcast(full.select(cols)), cols, "left_anti"
    )
    extra = full.select(cols).join(
        F.broadcast(exact.select(cols)), cols, "left_anti"
    )
    exact_knob = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    )
    out = recall.unionByName(exact_knob)
    # bounded 2-row collect + cache release (round-10 ADVICE pattern)
    rows = out.collect()
    exact.unpersist()
    full.unpersist()
    tcells.unpersist()
    return spark.createDataFrame(rows, out.schema)


_D91_ORACLE = """
SELECT CAST(-3 AS BIGINT) AS probe_id, TRUE AS ok
"""


@query("d91_ivf_index_at_rest", oracle=_D91_ORACLE, tags=("llm", "similarity", "layout", "approx"))
def d91_ivf_index_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index AT REST — the missing half of d07y's story made
    literal: the corpus is WRITTEN partitioned by centroid cell
    (``partitionBy("cell")`` — one directory per inverted list, the
    parquet rendering of a FAISS IVF index), and the probe join on the
    cell partition column prunes at LISTING time via dynamic partition
    pruning (b89's machinery pointed at ANN): only the probed cells'
    directories are read, the other ~n_cells-nprobe never open a
    footer. At 100 TB this is the difference between "scan fraction
    nprobe/n_cells of rows" (d07y, still lists every file) and "READ
    fraction nprobe/n_cells of the index" — the probe cost is bounded
    by the inverted lists it touches, exactly like a real vector DB.

    Gate (all-TRUE oracle): the at-rest probe must return EXACTLY the
    in-memory d07y candidate result at identical (n_cells, nprobe) —
    the layout is a lossless rewrite (same deterministic centroids,
    parquet float arrays round-trip exactly), so pruning changes WHERE
    bytes live, never the answer. DPP presence is pinned in
    tests/test_plans.py."""
    import os as _os
    import tempfile as _tmp

    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    C = S._centroids(em, 16, "vec_id", "embedding")
    one = S._cell_assigner(C, 1)
    from ..io import derived_cache_dir

    out = derived_cache_dir("d91", f"{sf_dir}/embeddings.parquet")
    if not _os.path.exists(_os.path.join(out, "_SUCCESS")):
        em.withColumn(
            "cell", one(F.col("embedding")).getItem(0)
        ).write.mode("overwrite").partitionBy("cell").parquet(out)
    idx = spark.read.parquet(out).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        "cell",
    )
    queries = em.filter(F.col("vec_id") < 20)
    probe = S._cell_assigner(C, 4)
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).withColumn("cell", F.explode(probe(F.col("q_vec"))))
    cand = idx.join(broadcast(q), "cell").filter(
        F.col("c_id") != F.col("q_id")
    )
    scored = cand.withColumn(
        "cosine",
        S._dot(F.col("q_vec"), F.col("c_vec"))
        / (
            F.sqrt(S._norm_sq(F.col("q_vec")))
            * F.sqrt(S._norm_sq(F.col("c_vec")))
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    at_rest = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", "rank")
    )
    # NOT persisted/broadcast (unlike the d07y-family gates): both
    # sides' shuffles are deduped by ReusedExchange inside this ONE
    # lazy plan, and a measured A/B of the persist+broadcast variant
    # was wall-flat with +156 bookkeeping tasks (OPTIMIZATION_r14.md)
    mem = S.ivf_cosine_topk(
        em, queries, k=5, n_cells=16, nprobe=4
    ).select("q_id", "c_id", "rank")
    cols = ["q_id", "c_id", "rank"]
    missing = mem.join(at_rest, cols, "left_anti")
    extra = at_rest.join(mem, cols, "left_anti")
    return (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-3).cast("long").alias("probe_id"), "ok")
    )


def _mm10_oracle() -> str:
    from ..operators.multimodal import CUT_THRESHOLD, FRAME_BYTES

    return f"""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), f AS (
  SELECT doc_id, vs, unnest(range(0, len(vs) // {FRAME_BYTES})) AS fi
  FROM s WHERE len(vs) >= {FRAME_BYTES}
), luma AS (
  SELECT doc_id, fi,
         list_reduce(list_transform(range(0, {FRAME_BYTES}),
           j -> vs[CAST(fi * {FRAME_BYTES} + j + 1 AS INT)]),
           (a, b) -> a + b) AS luma
  FROM f
), d AS (
  SELECT doc_id, fi,
         ABS(luma - LAG(luma, 1, luma) OVER (
           PARTITION BY doc_id ORDER BY fi)) AS delta
  FROM luma
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(1 + COUNT(CASE WHEN delta >= {CUT_THRESHOLD} THEN 1 END)
            AS BIGINT) AS n_keyframes,
       CAST(COALESCE(MIN(CASE WHEN delta >= {CUT_THRESHOLD} THEN fi END),
                     -1) AS BIGINT) AS first_cut,
       CAST(MAX(delta) AS BIGINT) AS max_delta
FROM d GROUP BY doc_id
"""


@query("mm10_keyframe_selection", oracle=_mm10_oracle(), tags=("llm", "multimodal", "video"))
def mm10_keyframe_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video keyframe selection plumbing (operators/multimodal.py:
    keyframes) — the scene-cut recipe a video curation pipeline runs
    before captioning/embedding: per-frame luma from the stubbed codec
    (frame = FRAME_BYTES-byte block; swap the kernel's byte-sum for
    a real decoder at the documented seam), scene cut = adjacent-frame
    luma jump >= threshold, keyframes = frame 0 + every cut. Per clip:
    frame count, keyframe count, first cut, max jump.

    Scale: the adjacent-frame delta is numpy diff INSIDE the Arrow
    kernel — a clip's frames are blob-local, so no lag-window shuffle
    exists anywhere; the only exchange is the map-side-combining per-
    doc rollup (plan shape shared with mm9). At 100 TB the decode is
    embarrassingly parallel and the shuffle carries 4 longs per
    frame, never pixels."""
    from ..operators.multimodal import CUT_THRESHOLD, keyframes

    docs = load(spark, sf_dir, "documents")
    kf = keyframes(docs)
    is_cut = (F.col("delta") >= CUT_THRESHOLD) & (F.col("frame_idx") > 0)
    return kf.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        (1 + F.sum(is_cut.cast("long"))).alias("n_keyframes"),
        F.coalesce(
            F.min(F.when(is_cut, F.col("frame_idx"))), F.lit(-1)
        ).alias("first_cut"),
        F.max("delta").alias("max_delta"),
    )


_D92_Q, _D92_TOKS, _D92_TOKDIM, _D92_CAND = 8, 4, 16, 20

_D92_ORACLE = f"""
WITH qn AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), cand AS (
  SELECT q_id, c_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm)
             DESC, c.vec_id) AS rn
    FROM qn q JOIN qn c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {_D92_Q}
  ) WHERE rn <= {_D92_CAND}
), toks AS (SELECT unnest([0, 1, 2, 3]) AS t),
qt AS (
  SELECT e.vec_id AS q_id, toks.t AS q_tok,
         e.embedding[1 + {_D92_TOKDIM} * toks.t : {_D92_TOKDIM} * (toks.t + 1)] AS q_vec
  FROM embeddings e, toks WHERE e.vec_id < {_D92_Q}
), ct AS (
  SELECT cand.q_id, cand.c_id, toks.t AS c_tok,
         e.embedding[1 + {_D92_TOKDIM} * toks.t : {_D92_TOKDIM} * (toks.t + 1)] AS c_vec
  FROM cand JOIN embeddings e ON e.vec_id = cand.c_id, toks
), best AS (
  SELECT qt.q_id, ct.c_id, qt.q_tok,
         MAX({_DOT.format(a="qt.q_vec", b="ct.c_vec")} /
             (sqrt({_NORMSQ.format(a="qt.q_vec")}) *
              sqrt({_NORMSQ.format(a="ct.c_vec")}))) AS m
  FROM qt JOIN ct ON ct.q_id = qt.q_id
  GROUP BY qt.q_id, ct.c_id, qt.q_tok
), scored AS (
  SELECT q_id, c_id, SUM(m) AS maxsim FROM best GROUP BY q_id, c_id
)
SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, maxsim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY maxsim DESC, c_id) AS rn
  FROM scored
) WHERE rn <= 3
"""


@query("d92_colbert_maxsim", oracle=_D92_ORACLE, tags=("llm", "similarity", "retrieval"))
def d92_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction (MaxSim) retrieval — the
    multi-vector reranker serving real RAG stacks: each query/document
    is a BAG of token vectors and score(q, d) = sum over query tokens
    of the max cosine against any document token. The token views here
    are four 16-dim slices of the 64-dim embedding (deterministic, so
    the oracle replays them with DuckDB list slicing); a real stack
    stores per-token vectors as `array<array<float>>` and every plan
    below is unchanged.

    Two-stage serving shape, all JVM expressions (zip_with/aggregate
    dot products — no Python anywhere): (1) candidate generation =
    exact top-20 by single-vector cosine via the d37 broadcast-query
    kernel (swapping in d91's DPP-pruned IVF probe is one call, the
    documented scale path); (2) MaxSim rerank over candidates only —
    explode both sides to token granularity (|q| x 20 x 4 x 4 rows,
    bounded by the candidate list, NEVER a corpus cartesian), one
    per-(q, c, q_tok) MAX, one per-(q, c) SUM, window top-3.

    At 100 TB the corpus-sized work is stage 1 (index-pruned); the
    rerank touches k candidates per query regardless of corpus size —
    the property that makes late interaction deployable."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = em.filter(F.col("vec_id") < _D92_Q)
    cand = S.brute_force_cosine_topk(em, queries, k=_D92_CAND).select(
        "q_id", "c_id"
    )
    return _maxsim_rerank(em, queries, cand)


def _maxsim_rerank(em: DataFrame, queries: DataFrame, cand: DataFrame) -> DataFrame:
    """MaxSim late-interaction rerank over a per-query candidate list
    (d92's stage 2, shared with the IVF-probed variant d92x): explode
    query and candidate sides to token granularity, per-(q, c, q_tok)
    MAX cosine, per-(q, c) SUM, window top-3. All JVM higher-order
    functions; the fan-out is bounded by |cand| x tokens^2."""

    def q_token_view(df: DataFrame) -> DataFrame:
        slices = F.array(
            *[
                F.slice("embedding", 1 + _D92_TOKDIM * t, _D92_TOKDIM)
                for t in range(_D92_TOKS)
            ]
        )
        out = df.select(
            F.col("vec_id").alias("q_id"),
            F.posexplode(slices).alias("q_tok", "q_vec"),
        )
        nrm = F.sqrt(
            F.aggregate(
                "q_vec",
                F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            )
        )
        return out.withColumn("q_nrm", nrm)

    qt = q_token_view(queries)
    # candidate tokens carry BOTH ids (a candidate list is per query)
    ct = (
        cand.join(em.withColumnRenamed("vec_id", "c_id"), "c_id")
        .select(
            "q_id",
            "c_id",
            F.posexplode(
                F.array(
                    *[
                        F.slice("embedding", 1 + _D92_TOKDIM * t, _D92_TOKDIM)
                        for t in range(_D92_TOKS)
                    ]
                )
            ).alias("c_tok", "c_vec"),
        )
        .withColumn(
            "c_nrm",
            F.sqrt(
                F.aggregate(
                    "c_vec",
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            ),
        )
    )
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    pairs = ct.join(broadcast(qt), "q_id").withColumn(
        "cos", dot / (F.col("q_nrm") * F.col("c_nrm"))
    )
    best = pairs.groupBy("q_id", "c_id", "q_tok").agg(F.max("cos").alias("m"))
    scored = best.groupBy("q_id", "c_id").agg(F.sum("m").alias("maxsim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("maxsim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("q_id", "rank", "c_id", "maxsim")
    )


_D93_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
UNION ALL SELECT CAST(-3 AS BIGINT), TRUE
UNION ALL SELECT CAST(-4 AS BIGINT), TRUE
"""


@query("d93_ivf_index_optimize", oracle=_D93_ORACLE, tags=("llm", "similarity", "layout", "maintenance"))
def d93_ivf_index_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-cell maintenance for the d91 IVF index at rest
    (operators/similarity.py:optimize_ivf_index) — b68's skew audit +
    b63's compaction pointed at ANN: cells past 1.5x the mean row
    count (plus the hottest cell, so the pass is never a no-op) are
    split by sub-centroids trained on the hot cell ONLY; the rewrite
    lands exactly one file per inverted list. Gate (all-TRUE oracle,
    the b63/b44 pattern):

    - probe -1 LOSSLESS: the nprobe=4 top-5 over the optimized index
      (probing every child of a probed parent via the leaf map) is
      IDENTICAL to the probe over the original index — children
      partition the parent's rows, so maintenance can never change an
      answer.
    - probe -2 CONSERVATION: per-parent row counts are unchanged
      (no loss, no duplication) — leaf rows decode back to exactly
      the original per-cell histogram.
    - probe -3 SKEW REDUCED: every split parent's largest child list
      is strictly smaller than the parent was.
    - probe -4 COMPACTED: every leaf directory holds exactly one
      parquet file (the s49 ingest path accumulates appends; the
      optimize pass is what folds them)."""
    import glob as _glob
    import os as _os

    from ..io import derived_cache_dir

    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    C = S._centroids(em, 16, "vec_id", "embedding")
    one = S._cell_assigner(C, 1)

    base = derived_cache_dir("d91", f"{sf_dir}/embeddings.parquet")
    if not _os.path.exists(_os.path.join(base, "_SUCCESS")):
        em.withColumn(
            "cell", one(F.col("embedding")).getItem(0)
        ).write.mode("overwrite").partitionBy("cell").parquet(base)

    opt = derived_cache_dir("d93_opt", f"{sf_dir}/embeddings.parquet")
    map_path = _os.path.join(opt, "_leafmap")
    if not _os.path.exists(_os.path.join(opt, "_ALL_DONE")):
        leafmap = S.optimize_ivf_index(spark, base, opt, sub_cells=2)
        leafmap.coalesce(1).write.mode("overwrite").parquet(map_path)
        open(_os.path.join(opt, "_ALL_DONE"), "w").close()
    leafmap = spark.read.parquet(map_path)

    base_idx = spark.read.parquet(base).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"), "cell"
    )
    opt_idx = spark.read.parquet(opt).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"), "cell"
    )
    queries = em.filter(F.col("vec_id") < 20)
    probe = S._cell_assigner(C, 4)
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).withColumn("parent", F.explode(probe(F.col("q_vec"))))

    def topk(idx: DataFrame, qside: DataFrame) -> DataFrame:
        cand = idx.join(broadcast(qside), "cell").filter(
            F.col("c_id") != F.col("q_id")
        )
        scored = cand.withColumn(
            "cosine",
            S._dot(F.col("q_vec"), F.col("c_vec"))
            / (
                F.sqrt(S._norm_sq(F.col("q_vec")))
                * F.sqrt(S._norm_sq(F.col("c_vec")))
            ),
        )
        w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5)
            .select("q_id", "c_id", "rank")
        )

    before = topk(base_idx, q.withColumnRenamed("parent", "cell"))
    after = topk(
        opt_idx,
        q.join(broadcast(leafmap), "parent").select(
            "q_id", "q_vec", F.col("leaf").alias("cell")
        ),
    )
    cols = ["q_id", "c_id", "rank"]
    diff = before.join(after, cols, "left_anti").unionByName(
        after.join(before, cols, "left_anti")
    )
    lossless = diff.agg((F.count("*") == 0).alias("ok")).select(
        F.lit(-1).cast("long").alias("probe_id"), "ok"
    )

    base_hist = base_idx.groupBy(F.col("cell").alias("parent")).agg(
        F.count("*").alias("n_before")
    )
    opt_hist = opt_idx.groupBy(
        S.ivf_leaf_parent(F.col("cell"), sub_cells=2).alias("parent")
    ).agg(F.count("*").alias("n_after"))
    conserved = (
        base_hist.join(opt_hist, "parent", "full")
        .agg(
            (
                F.sum(
                    (
                        F.coalesce("n_before", F.lit(-1))
                        != F.coalesce("n_after", F.lit(-2))
                    ).cast("long")
                )
                == 0
            ).alias("ok")
        )
        .select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    )

    child_sizes = (
        opt_idx.filter(F.col("cell") >= 100)
        .groupBy(
            S.ivf_leaf_parent(F.col("cell"), sub_cells=2).alias("parent"),
            "cell",
        )
        .agg(F.count("*").alias("n_child"))
        .groupBy("parent")
        .agg(F.max("n_child").alias("max_child"))
    )
    shrunk = (
        child_sizes.join(base_hist, "parent")
        .agg(
            (F.sum((F.col("max_child") >= F.col("n_before")).cast("long")) == 0)
            .alias("ok")
        )
        .select(F.lit(-3).cast("long").alias("probe_id"), "ok")
    )

    leaf_dirs = _glob.glob(_os.path.join(opt, "cell=*"))
    one_file = all(
        len(_glob.glob(_os.path.join(d, "*.parquet"))) == 1 for d in leaf_dirs
    ) and len(leaf_dirs) > 0
    compacted = spark.createDataFrame(
        [(-4, bool(one_file))], "probe_id long, ok boolean"
    )
    return lossless.unionByName(conserved).unionByName(shrunk).unionByName(
        compacted
    )


_MM11_VAD_THRESHOLD = 628_000

_MM11_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), pos AS (
  SELECT doc_id, vs, unnest(range(0, len(vs))) AS i FROM s
), w AS (
  SELECT doc_id, i // 64 AS widx,
         SUM(vs[i + 1] * vs[i + 1]) AS e
  FROM pos GROUP BY 1, 2
), act AS (
  SELECT doc_id, widx,
         widx - row_number() OVER (PARTITION BY doc_id ORDER BY widx)
           AS seg_key
  FROM w WHERE e >= {_MM11_VAD_THRESHOLD}
), seg AS (
  SELECT doc_id, seg_key, MIN(widx) AS s0, COUNT(*) AS len
  FROM act GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(len) AS BIGINT) AS active_windows,
       CAST(MAX(len) AS BIGINT) AS longest_segment,
       CAST(MIN(s0) AS BIGINT) AS first_active_window
FROM seg GROUP BY doc_id
"""


@query("mm11_audio_vad_segments", oracle=_MM11_ORACLE, tags=("llm", "multimodal", "audio"))
def mm11_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection (VAD) segmentation plumbing — the
    step an audio curation pipeline runs before transcription: window
    the waveform, mark windows whose energy clears a threshold as
    speech, merge CONSECUTIVE active windows into segments
    (gaps-and-islands), and report per clip the segment census
    (count, total active windows, longest run, first onset). The
    energy front-end is mm5's Arrow kernel verbatim (codec stubbed to
    raw bytes at the documented seam — swap in a real decoder + a
    trained VAD without touching the plan); the threshold is pinned at
    the corpus median full-window energy so both states actually
    occur.

    Scale shape: ONE Arrow mapInPandas stage (the energy kernel),
    then the islands trick — seg_key = window_idx - row_number() per
    doc — entirely in JVM window + aggregate operators over the
    doc_id key; shuffle carries (doc, window, energy) longs, never
    samples. Segmentation of a 100 TB audio lake is this exact plan
    with a real codec."""
    docs = load(spark, sf_dir, "documents")
    en = MM.audio_energy(docs)
    w = Window.partitionBy("doc_id").orderBy("window_idx")
    active = en.filter(F.col("energy") >= _MM11_VAD_THRESHOLD)
    seg = active.withColumn(
        "seg_key", F.col("window_idx") - F.row_number().over(w)
    )
    per_seg = seg.groupBy("doc_id", "seg_key").agg(
        F.min("window_idx").alias("s0"), F.count("*").alias("len")
    )
    return per_seg.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("len").cast("long").alias("active_windows"),
        F.max("len").cast("long").alias("longest_segment"),
        F.min("s0").cast("long").alias("first_active_window"),
    )


_D92X_ORACLE = """
SELECT CAST(-1 AS BIGINT) AS probe_id, TRUE AS ok
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
"""


@query("d92x_colbert_maxsim_ivf", oracle=_D92X_ORACLE, tags=("llm", "similarity", "retrieval", "approx"))
def d92x_colbert_maxsim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d92's registered SCALE PATH: candidate generation swapped from
    the exact broadcast scorer to the IVF probe (nprobe=10 of 16 —
    ~60% of the corpus scanned; wider than d89's 8 because MaxSim
    winners are chosen by TOKEN-level similarity, which correlates
    only loosely with the full-vector cells at tiny corpus sizes —
    measured recall 0.62/0.83 at sf0.001/sf0.01 vs 0.29 at nprobe=8
    on the 50-vector corpus), MaxSim rerank identical
    (_maxsim_rerank). Bounded-comparison gate (all-TRUE oracle, the
    d89/d90 pattern):

    - probe -1: recall@3 vs the exact-candidate d92 result >= 0.5 at
      nprobe=10.
    - probe -2: the exactness knob — nprobe == n_cells probes every
      cell, the candidate top-20 equals the exact one (same
      tie-breaks), so the reranked output must equal d92's EXACTLY:
      pruning trades recall, never correctness."""
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = em.filter(F.col("vec_id") < _D92_Q)
    exact = _maxsim_rerank(
        em,
        queries,
        S.brute_force_cosine_topk(em, queries, k=_D92_CAND).select("q_id", "c_id"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # one-time IVF build shared by the nprobe=10 probe and the
    # nprobe=16 exactness knob (guide §1.2)
    C, cells = S.ivf_build(em, n_cells=16)
    probed = _maxsim_rerank(
        em,
        queries,
        S.ivf_cosine_topk(
            em, queries, k=_D92_CAND, n_cells=16, nprobe=10,
            centroids=C, cells=cells,
        ).select("q_id", "c_id"),
    )
    hits = probed.select("q_id", "c_id").join(
        exact.select("q_id", "c_id"), ["q_id", "c_id"], "left_semi"
    )
    recall = (
        hits.agg(F.count("*").alias("h"))
        .crossJoin(exact.agg(F.count("*").alias("n")))
        .select(
            F.lit(-1).cast("long").alias("probe_id"),
            (F.col("h") >= F.col("n") * 0.5).alias("ok"),
        )
    )
    full = _maxsim_rerank(
        em,
        queries,
        S.ivf_cosine_topk(
            em, queries, k=_D92_CAND, n_cells=16, nprobe=16,
            centroids=C, cells=cells,
        ).select("q_id", "c_id"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # two anti-join consumers
    cols = ["q_id", "rank", "c_id"]
    missing = exact.select(cols).join(
        F.broadcast(full.select(cols)), cols, "left_anti"
    )
    extra = full.select(cols).join(
        F.broadcast(exact.select(cols)), cols, "left_anti"
    )
    exact_knob = (
        missing.unionByName(extra)
        .agg((F.count("*") == 0).alias("ok"))
        .select(F.lit(-2).cast("long").alias("probe_id"), "ok")
    )
    out = recall.unionByName(exact_knob)
    # Materialize the two gate rows (bounded collect), then release
    # the MEMORY_AND_DISK rerank cache so repeated bench/driver
    # invocations don't accumulate session-lifetime cache entries
    # (round-10 ADVICE).
    rows = out.collect()
    exact.unpersist()
    full.unpersist()
    cells.unpersist()
    return spark.createDataFrame(rows, out.schema)


_D94_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lower(trim(text)) AS t FROM documents
), cp AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(t)),
           i -> CAST(unicode(t[i:i]) AS BIGINT)) AS cps
  FROM s
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(cps) - 4),
           i -> list_reduce(cps[i:i+4],
                  (acc, c) -> (acc * 31 + c) % {POLY_MOD})) AS gs
  FROM cp WHERE len(cps) >= 8
), sel AS (
  SELECT doc_id, gs,
         list_transform(generate_series(1, len(gs) - 3),
           j -> list_reduce(generate_series(j, j + 3),
                  (acc, i) -> CASE WHEN gs[i] <= gs[acc]
                              THEN i ELSE acc END)) AS ps
  FROM g
)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list_transform(ps,
         p -> CAST(p AS VARCHAR) || ':' || CAST(gs[p] AS VARCHAR)))),
         ',') AS fingerprints
FROM sel
"""


@query(
    "d94_winnowing_fingerprints",
    oracle=_D94_ORACLE,
    tags=("llm", "dedup", "fingerprint"),
)
def d94_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints (operators/text.py:
    winnow_fingerprints — Schleimer et al. 2003, the MOSS algorithm):
    k=5 char-gram portable hashes, w=4 windows, rightmost-minimum
    selection; per document the sorted distinct "pos:hash" set. The
    position-carrying complement to d09's whole-document fingerprint
    and d03's MinHash: winnowing GUARANTEES any shared substring of
    length >= k+w-1 = 8 yields a shared fingerprint (density bound
    2/(w+1)), which is what plagiarism/overlap LOCALIZATION needs.

    Scale shape: zero-shuffle row-local projection — staged array
    columns, JVM HOFs only; the oracle replays the identical poly
    hash, window fold, and tie rule over DuckDB lists."""
    from ..operators.text import winnow_fingerprints

    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    return winnow_fingerprints(docs, "doc_id", "text", k=5, w=4)


_D95_CHUNK_HASH = DUCKDB_POLY_HASH.format(expr="chunk")

_D95_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, text FROM documents WHERE length(text) >= 64
), ch AS (
  SELECT source, text[(i-1)*64+1 : i*64] AS chunk
  FROM d, unnest(generate_series(1, CAST(length(text) // 64 AS INT))) AS g(i)
), h AS (
  SELECT source, {_D95_CHUNK_HASH} AS h FROM ch
), c AS (
  SELECT h, source, COUNT(*) AS cnt FROM h GROUP BY 1, 2
), p AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CASE WHEN a.source = b.source
              THEN a.cnt * (a.cnt - 1) / 2
              ELSE a.cnt * b.cnt END AS pairs
  FROM c a JOIN c b ON a.h = b.h AND a.source <= b.source
  WHERE a.source < b.source OR (a.source = b.source AND a.cnt > 1)
)
SELECT src_a, src_b, CAST(SUM(pairs) AS BIGINT) AS dup_pairs
FROM p GROUP BY 1, 2
"""


@query(
    "d95_cross_source_dup_matrix",
    oracle=_D95_ORACLE,
    tags=("llm", "dedup", "reporting"),
)
def d95_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the data-card-grade
    contamination report a multi-source corpus needs before mixing:
    for every (source_a, source_b) pair (a <= b), how many pairs of
    identical 64-char chunks the two sources share (within-source
    pairs = C(cnt,2), cross = cnt_a * cnt_b). Chunk identity is the
    portable polynomial hash, so the DuckDB oracle replays it.

    Scale shape: text leaves the scan ONLY to be chunk-hashed in the
    same projection (the shuffle carries (hash, source) longs+strings,
    never text — d22's discipline); per-(hash, source) counts are ONE
    map-side-combined groupBy; the pair expansion joins the
    POST-AGGREGATE count table with itself per hash (bounded by
    sources-per-hash, never rows) and sums into a |sources|^2-bounded
    matrix."""
    docs = load(spark, sf_dir, "documents").filter(
        F.length("text") >= 64
    )
    chunks = docs.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.length("text") / 64).cast("int")),
                lambda i: F.col("text").substr(
                    (i - 1) * 64 + 1, F.lit(64)
                ),
            )
        ).alias("chunk"),
    )
    hashed = chunks.select(
        "source", F.expr(poly_hash("chunk")).alias("h")
    )
    c = hashed.groupBy("h", "source").agg(F.count("*").alias("cnt"))
    a, b = c.alias("a"), c.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") <= F.col("b.source")),
        )
        .filter(
            (F.col("a.source") < F.col("b.source"))
            | ((F.col("a.source") == F.col("b.source")) & (F.col("a.cnt") > 1))
        )
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.when(
                F.col("a.source") == F.col("b.source"),
                F.col("a.cnt") * (F.col("a.cnt") - 1) / 2,
            )
            .otherwise(F.col("a.cnt") * F.col("b.cnt"))
            .alias("pairs"),
        )
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.sum("pairs").cast("long").alias("dup_pairs"))
    )


def _mm12_oracle() -> str:
    from ..operators.multimodal import CUT_THRESHOLD, FRAME_BYTES

    return f"""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), f AS (
  SELECT doc_id, vs, unnest(range(0, len(vs) // {FRAME_BYTES})) AS fi
  FROM s WHERE len(vs) >= {FRAME_BYTES}
), luma AS (
  SELECT doc_id, fi,
         list_reduce(list_transform(range(0, {FRAME_BYTES}),
           j -> vs[CAST(fi * {FRAME_BYTES} + j + 1 AS INT)]),
           (a, b) -> a + b) AS luma
  FROM f
), d AS (
  SELECT doc_id, fi, luma,
         ABS(luma - LAG(luma, 1, luma) OVER (
           PARTITION BY doc_id ORDER BY fi)) AS delta
  FROM luma
), shots AS (
  SELECT doc_id, fi, luma,
         SUM(CASE WHEN delta >= {CUT_THRESHOLD} AND fi > 0
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY fi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS shot_id
  FROM d
)
SELECT doc_id, CAST(shot_id AS BIGINT) AS shot_id,
       CAST(MIN(fi) AS BIGINT) AS start_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(luma) AS BIGINT) AS total_luma,
       CAST(MAX(luma * 1000000 + (999999 - fi)) % 1000000 AS BIGINT)
         AS rep_key,
       CAST(999999 - (MAX(luma * 1000000 + (999999 - fi)) % 1000000)
            AS BIGINT) AS rep_frame
FROM shots GROUP BY 1, 2
"""


@query(
    "mm12_video_shot_segments",
    oracle=_mm12_oracle(),
    tags=("llm", "multimodal", "video"),
)
def mm12_video_shot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video shot-boundary segmentation — mm10's scene cuts promoted
    to SEGMENTS (the video sibling of mm11's audio VAD islands): per
    clip, frames partition into shots at every adjacent-luma jump >=
    CUT_THRESHOLD (cumulative-cut-count islands), and each shot
    reports its start frame, length, total luma, and REPRESENTATIVE
    frame (brightest; earliest on ties — the frame a thumbnail/
    captioning stage would decode). The argmax rides the same
    aggregate as everything else via the luma*1e6 + (999999 - fi)
    integer key (exact, replayed by the oracle; frame counts are
    corpus-bounded far below 1e6).

    Scale shape: per-frame luma/delta come from mm10's single Arrow
    kernel (deltas are blob-local numpy diff — no lag shuffle); ONE
    hash shuffle on doc_id drives both the islands window and the
    per-shot rollup; the shuffle carries 4 longs per frame, never
    pixels."""
    from ..operators.multimodal import CUT_THRESHOLD, keyframes

    kf = keyframes(load(spark, sf_dir, "documents"))
    is_cut = (
        (F.col("delta") >= CUT_THRESHOLD) & (F.col("frame_idx") > 0)
    ).cast("long")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shots = kf.withColumn("shot_id", F.sum(is_cut).over(w))
    rep_key = F.col("luma") * 1000000 + (999999 - F.col("frame_idx"))
    return shots.groupBy("doc_id", "shot_id").agg(
        F.min("frame_idx").alias("start_frame"),
        F.count("*").alias("n_frames"),
        F.sum("luma").alias("total_luma"),
        (F.max(rep_key) % 1000000).alias("rep_key"),
        (F.lit(999999) - F.max(rep_key) % 1000000).alias("rep_frame"),
    )


_D96_K = 64
_D96_TOKEN_HASH = DUCKDB_POLY_HASH.format(expr="tok")

_D96_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), h AS (
  SELECT DISTINCT source, {_D96_TOKEN_HASH} AS h
  FROM toks WHERE tok <> ''
), sk AS (
  SELECT source, list_sort(list(h))[1:{_D96_K}] AS sk
  FROM (SELECT DISTINCT source, h FROM h) GROUP BY source
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.sk AS ska, b.sk AS skb,
         list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:{_D96_K}]
           AS sku
  FROM sk a JOIN sk b ON a.source < b.source
)
SELECT src_a, src_b,
  CAST(len(list_intersect(list_intersect(sku, ska), skb)) AS BIGINT)
    AS inter_cnt,
  CAST(len(sku) AS BIGINT) AS sketch_k,
  CAST(FLOOR(CASE WHEN len(sku) < {_D96_K} THEN len(sku)
       ELSE ({_D96_K} - 1) * 1000000007.0 / sku[{_D96_K}] END) AS BIGINT)
    AS union_est
FROM pairs
"""


@query(
    "d96_kmv_vocab_overlap",
    oracle=_D96_ORACLE,
    tags=("llm", "sketch", "reporting"),
)
def d96_kmv_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source VOCABULARY overlap via KMV (k-minimum-values)
    sketch intersection (Beyer et al. 2007 — the sketch algebra b45's
    single-set estimator doesn't exercise): per source the k=64
    smallest distinct portable token hashes; per source pair the
    union sketch is the k smallest of the merged sketches,
    inter_cnt = |sketch(A∪B) ∩ sk(A) ∩ sk(B)| (the Jaccard numerator
    — estimate = inter_cnt / sketch_k), and union_est the KMV
    cardinality estimate (k-1)*MOD/kth-min (exact size when the union
    sketch is short). Everything is DETERMINISTIC given the portable
    hash, so the oracle replays the sketch math bit-for-bit — the
    approximation gates nothing.

    Scale shape: tokens hash in the scan projection; ONE distinct
    shuffle on (source, hash); per-source k-min is a bounded sort of
    DISTINCT hashes per source (at 100 TB: swap for a per-partition
    partial k-min + merge — the sketch property that makes KMV
    mergeable; documented seam). The pair lattice joins |sources|^2
    BOUNDED sketch rows driver-free."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.select(
        "source", F.expr(poly_hash("tok")).alias("h")
    ).distinct()
    sk = hashed.groupBy("source").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, _D96_K).alias("sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.sk").alias("ska"),
        F.col("b.sk").alias("skb"),
        F.slice(
            F.array_sort(
                F.array_distinct(F.concat(F.col("a.sk"), F.col("b.sk")))
            ),
            1,
            _D96_K,
        ).alias("sku"),
    )
    return pairs.select(
        "src_a",
        "src_b",
        F.size(
            F.array_intersect(
                F.array_intersect("sku", "ska"), F.col("skb")
            )
        )
        .cast("long")
        .alias("inter_cnt"),
        F.size("sku").cast("long").alias("sketch_k"),
        F.floor(
            F.when(
                F.size("sku") < _D96_K, F.size("sku").cast("double")
            ).otherwise(
                F.lit((_D96_K - 1) * 1000000007.0)
                / F.element_at("sku", _D96_K)
            )
        )
        .cast("long")
        .alias("union_est"),
    )


def _mm13_oracle() -> str:
    return """
WITH s AS (
  SELECT doc_id, list_transform(string_split(text, ''), c -> unicode(c))
           AS vs
  FROM documents WHERE length(text) >= 72
), dh AS (
  SELECT doc_id,
    list_reduce(list_transform(generate_series(0, 62), b ->
      CASE WHEN vs[CAST((b // 8) * 9 + (b % 8) + 1 AS INT)] >
                vs[CAST((b // 8) * 9 + (b % 8) + 2 AS INT)]
           THEN 1::BIGINT << (b % 63) ELSE 0 END),
      (a, x) -> a + x) AS dhash
  FROM s
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
FROM dh a JOIN dh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 8
"""


@query(
    "mm13_image_dhash_neardup",
    oracle=_mm13_oracle(),
    tags=("llm", "multimodal", "dedup", "image"),
)
def mm13_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection via difference hash (dHash — the
    perceptual-hash staple of image dedup pipelines): the decoded 8x9
    luma grid (codec stub: the payload's first 72 bytes, one byte per
    pixel — swap a real decode+resize at the documented mm2 seam)
    hashes to 63 bits (bit b set iff px[row,col] > px[row,col+1];
    bit 63 unused so the hash lives in a signed 64-bit lane portable
    to engines without unsigned); near-dups are pairs at hamming <= 8.

    Scale shape: the hash comes from the multimodal family's standard
    ONE-Arrow-kernel plumbing (operators/multimodal.py:dhash_batch,
    vectorized numpy — the earlier pure-expression fold's 126
    element_at references were re-inlined by CollapseProject and cost
    51 s at sf0.1; the kernel is 0.4 s); candidate pairs come from a
    9-band x 7-bit BANDED equi-join (pigeonhole: <= 8 differing bits
    cannot touch all 9 bands, so banding is LOSSLESS for this
    threshold — the d06 SimHash discipline), then exact bit_count
    verify. The oracle runs the textbook all-pairs form; the
    differential proves the banding drops nothing."""
    from ..operators.multimodal import image_dhashes

    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 72)
    dh = image_dhashes(docs)
    bands = dh.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        (
                            F.shiftright(F.col("dhash"), 7 * k)
                            .bitwiseAND(F.lit(127))
                        ).alias("val"),
                    )
                    for k in range(9)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "dhash", "b.band", "b.val")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.dhash").alias("ha"),
            F.col("r.dhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        .cast("long")
        .alias("hamming"),
    ).filter(F.col("hamming") <= 8)


_D97_STOPWORDS = ("the", "of", "and", "to", "in", "a", "is")

_D97_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
), m AS (
  SELECT doc_id, len(ws) AS n_words,
    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
      / len(ws) AS mwl,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '^[0-9]+$')))
      AS DOUBLE) / len(ws) AS digit_frac,
    CAST(len(list_filter(ws, w -> w IN {_D97_STOPWORDS!r}))
      AS DOUBLE) / len(ws) AS stop_frac,
    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS uniq_frac
  FROM d WHERE len(ws) > 0
)
SELECT doc_id,
  n_words >= 15 AS r_min_words,
  mwl BETWEEN 3.5 AND 6.5 AS r_mean_word_len,
  digit_frac <= 0.05 AS r_digit_frac,
  stop_frac >= 0.05 AS r_stopword_frac,
  uniq_frac >= 0.5 AS r_unique_frac,
  (n_words >= 15 AND mwl BETWEEN 3.5 AND 6.5 AND digit_frac <= 0.05
   AND stop_frac >= 0.05 AND uniq_frac >= 0.5) AS pass_all
FROM m
"""


@query(
    "d97_gopher_rules_audit",
    oracle=_D97_ORACLE,
    tags=("llm", "quality", "curation"),
)
def d97_gopher_rules_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-RULE battery (Rae et al. 2021, §A1.1 —
    the rule-based pre-filter every large text corpus runs before
    model-based scoring; d11 is the SCORE sibling, this is the named
    per-rule verdict a curation audit wants): per document the five
    rule booleans (word count >= 15, mean word length in [3.5, 6.5],
    digit-token fraction <= 5%, stopword fraction >= 5% — Gopher's
    "contains common English words" proxy, unique-word fraction >=
    50% — the repetition guard) and the conjunction. Thresholds
    probed non-vacuous on this corpus (481/312/219 of 500 pass the
    discriminating rules at sf0.01).

    Scale shape: one scan, zero shuffles — every rule is a JVM HOF
    fold over the token array of its own row; the audit is
    embarrassingly parallel and column-pruned to (doc_id, text)."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    m = docs.select("doc_id", ws.alias("__ws")).filter(F.size("__ws") > 0)
    n = F.size("__ws")
    mwl = (
        F.aggregate(
            F.transform("__ws", F.length), F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / n
    )
    digit_frac = (
        F.size(F.filter("__ws", lambda w: w.rlike("^[0-9]+$"))).cast(
            "double"
        )
        / n
    )
    stop_frac = (
        F.size(
            F.filter("__ws", lambda w: w.isin(*_D97_STOPWORDS))
        ).cast("double")
        / n
    )
    uniq_frac = F.size(F.array_distinct("__ws")).cast("double") / n
    rules = {
        "r_min_words": n >= 15,
        "r_mean_word_len": (mwl >= 3.5) & (mwl <= 6.5),
        "r_digit_frac": digit_frac <= 0.05,
        "r_stopword_frac": stop_frac >= 0.05,
        "r_unique_frac": uniq_frac >= 0.5,
    }
    out = m.select(
        "doc_id", *[c.alias(name) for name, c in rules.items()]
    )
    pass_all = None
    for name in rules:
        pass_all = (
            F.col(name) if pass_all is None else pass_all & F.col(name)
        )
    return out.withColumn("pass_all", pass_all)


_D98_K, _D98_W, _D98_CAP, _D98_MIN = 12, 8, 40, 3

_D98_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lower(trim(text)) AS t FROM documents
), cp AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(t)),
           i -> CAST(unicode(t[i:i]) AS BIGINT)) AS cps
  FROM s
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(cps) - {_D98_K - 1}),
           i -> list_reduce(cps[i:i+{_D98_K - 1}],
                  (acc, c) -> (acc * 31 + c) % {POLY_MOD})) AS gs
  FROM cp WHERE len(cps) >= {_D98_K + _D98_W - 1}
), sel AS (
  SELECT doc_id, gs,
         list_transform(generate_series(1, len(gs) - {_D98_W - 1}),
           j -> list_reduce(generate_series(j, j + {_D98_W - 1}),
                  (acc, i) -> CASE WHEN gs[i] <= gs[acc]
                              THEN i ELSE acc END)) AS ps
  FROM g
), hr AS (
  SELECT DISTINCT doc_id, unnest(list_transform(ps, p -> gs[p])) AS wh
  FROM sel
), rare AS (
  SELECT wh FROM hr GROUP BY wh HAVING COUNT(*) <= {_D98_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM hr a
JOIN rare r ON r.wh = a.wh
JOIN hr b ON b.wh = a.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {_D98_MIN}
"""


@query(
    "d98_winnow_overlap_pairs",
    oracle=_D98_ORACLE,
    tags=("llm", "dedup", "fingerprint"),
)
def d98_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing overlap DETECTION — the MOSS payoff on top of d94's
    fingerprints: document pairs sharing >= {min} selected gram hashes
    (k=12 grams, w=8 windows — the guarantee threshold k+w-1 = 19
    chars keeps trigram-of-words boilerplate out of the index, which
    an 8-char gram could not: probed at sf0.1, k=5 fingerprints of
    common short substrings exceed ANY usable df cap while k=12 keeps
    the pair lattice non-vacuous at every SF).

    Scale shape: the d05 inverted-index discipline — NEVER all-pairs:
    ONE winnowing pass (the char-level hashing is the expensive leg —
    the original hash⋈hash self-join recomputed it for both sides,
    8.9 s at sf0.1; this bucket-explode form runs it once), ONE
    shuffle by hash into postings buckets, and the pair fan is a JVM
    nested-transform over each bucket's sorted doc list — bounded by
    the df cap (> 40 = boilerplate, dropped), so the worst bucket
    fans C(40,2) pairs at any corpus size. Pair counts are one
    map-side-combined groupBy over the fan."""
    from ..operators.text import winnow_hash_rows

    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    hr = winnow_hash_rows(docs, "doc_id", "text", k=_D98_K, w=_D98_W)
    buckets = (
        hr.groupBy("wh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= _D98_CAP))
    )
    ds = F.col("ds")
    pair_fan = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_fan).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= _D98_MIN)
    )


def _d99_let(value, body):
    """Expression-level let-binding (kql.py:_let): bind ``value`` to a
    lambda variable so ``body`` references it without re-evaluating
    the subtree per HOF element."""
    return F.get(F.transform(F.array(value), body), 0)


def _d99_oracle() -> str:
    """Generate the d99 oracle: per n the lead-chain gram build, the
    per-(doc, gram) window count, the modal-gram pick (count desc,
    gram asc) or the dup filter, then the interval-union coverage —
    the same running-max-end rule as the Spark fold."""
    tops = (2, 3, 4)
    dups = (5, 6, 7, 8, 9, 10)
    parts = [
        """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), w AS (
  SELECT b.doc_id, g.i AS i, b.ws[g.i + 1] AS word
  FROM base b, unnest(generate_series(0, len(b.ws) - 1)) AS g(i)
  WHERE len(b.ws) > 0
), o AS (
  SELECT doc_id, i, word, CAST(LENGTH(word) AS BIGINT) AS wl,
         CAST(COALESCE(SUM(LENGTH(word) + 1) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM w
), tot AS (
  SELECT doc_id, CAST(SUM(wl) + COUNT(*) - 1 AS BIGINT) AS tot
  FROM o GROUP BY 1
)"""
    ]
    for n in tops + dups:
        concat = " || ' ' || ".join(
            ["word"] + [f"LEAD(word, {j}) OVER win" for j in range(1, n)]
        )
        parts.append(
            f""", g{n} AS (
  SELECT doc_id, off AS s,
         LEAD(off, {n - 1}) OVER win + LEAD(wl, {n - 1}) OVER win - off AS l,
         {concat} AS g
  FROM o WINDOW win AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY LEAD(off, {n - 1}) OVER win IS NOT NULL
), c{n} AS (
  SELECT doc_id, s, l, g,
         COUNT(*) OVER (PARTITION BY doc_id, g) AS c
  FROM g{n}
)"""
        )
        if n in tops:
            parts.append(
                f""", m{n} AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, g, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
    FROM (SELECT DISTINCT doc_id, g, c FROM c{n})
  ) WHERE rn = 1
), s{n} AS (
  SELECT c.doc_id, c.s, c.l
  FROM c{n} c JOIN m{n} m ON m.doc_id = c.doc_id AND m.g = c.g
)"""
            )
        else:
            parts.append(
                f""", s{n} AS (
  SELECT doc_id, s, l FROM c{n} WHERE c >= 2
)"""
            )
        parts.append(
            f""", u{n} AS (
  SELECT doc_id, CAST(SUM(GREATEST(0, s + l - GREATEST(s, pend)))
                 AS BIGINT) AS cov
  FROM (
    SELECT doc_id, s, l,
           COALESCE(MAX(s + l) OVER (
             PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS pend
    FROM s{n}
  ) GROUP BY 1
)"""
        )
    fracs = []
    flags = []
    thr = {2: 0.20, 3: 0.18, 4: 0.16, 5: 0.15, 6: 0.14,
           7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    for n in tops + dups:
        name = f"top_{n}gram_frac" if n in tops else f"dup_{n}gram_frac"
        expr = f"CAST(COALESCE(u{n}.cov, 0) AS DOUBLE) / tot.tot"
        fracs.append(f"CAST(FLOOR(({expr}) * 1e6) AS BIGINT) AS {name}")
        flags.append(f"({expr}) > {thr[n]}")
    joins = "\n".join(
        f"LEFT JOIN u{n} ON u{n}.doc_id = tot.doc_id" for n in tops + dups
    )
    frac_sql = ",\n       ".join(fracs)
    flag_sql = " OR ".join(flags)
    parts.append(
        f"""
SELECT tot.doc_id,
       {frac_sql},
       CAST(({flag_sql}) AS INTEGER) AS repetitive
FROM tot
{joins}"""
    )
    return "".join(parts)


@query(
    "d99_gopher_repetition_signals",
    oracle=_d99_oracle(),
    tags=("llm", "quality", "dedup"),
)
def d99_gopher_repetition_signals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gopher repetition-signal battery (Rae et al. 2021 §A1.1, Table
    A1 — the within-document repetition filters every large corpus
    runs; d18 is the coarse ratio, d97 the rule conjunction): per
    document the top-n-gram character coverage for n = 2, 3, 4 (the
    fraction of characters covered by occurrences of the single most
    frequent word n-gram; ties pick the lexicographically smallest)
    and the duplicate-n-gram character coverage for n = 5..10 (the
    fraction covered by n-grams occurring more than once), plus the
    Gopher-threshold verdict. Coverage is the UNION of occurrence
    character spans (overlaps counted once — the DataTrove-style
    sharpening of Gopher's count x length, which can exceed 1);
    offsets are measured over the single-space-normalized text, so
    the metric is spacing-insensitive. The corpus has no newlines, so
    Gopher's duplicate line/paragraph signals are vacuous here and
    intentionally omitted (documented divergence).

    Scale shape: one scan, ZERO shuffles — per row, gram spans are
    one transform over the position range; the modal gram and the
    duplicated-gram set come from ONE run-fold over the SORTED gram
    list (O(p log p), not the O(p²) per-position count a naive
    formulation does); the span union is one sequential fold in
    position order (spans arrive start-sorted by construction). All
    JVM HOFs built as SQL strings (Column-by-Column construction
    costs seconds of py4j round-trips; one F.expr parse does not),
    with get(transform(array(v), ..), 0) let-bindings so every
    intermediate evaluates once per row: no explode, no Python,
    embarrassingly parallel at any corpus size. The oracle replays
    the identical spans relationally (window counts + running-max-end
    interval union)."""
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    m = docs.select("doc_id", ws.alias("__ws")).filter(F.size("__ws") > 0)
    m = m.withColumn("__wl", F.transform("__ws", lambda w: F.length(w).cast("long")))
    m = m.withColumn(
        "__off",
        F.transform(
            F.sequence(F.lit(0), F.size("__ws") - 1),
            lambda i: F.aggregate(
                F.slice("__wl", 1, i),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            + i.cast("long"),
        ),
    )
    m = m.withColumn(
        "__tot",
        F.aggregate("__wl", F.lit(0).cast("long"), lambda a, x: a + x)
        + (F.size("__ws") - 1).cast("long"),
    )

    def cover(spans) -> "F.Column":
        # interval union in start order: covered += max(0, end' - max(s,
        # running_end)); running_end = max(running_end, end')
        return F.aggregate(
            spans,
            F.struct(
                F.lit(0).cast("long").alias("cov"),
                F.lit(-1).cast("long").alias("end"),
            ),
            lambda a, e: F.struct(
                (
                    a.getField("cov")
                    + F.greatest(
                        F.lit(0).cast("long"),
                        e.getField("s")
                        + e.getField("l")
                        - F.greatest(e.getField("s"), a.getField("end")),
                    )
                ).alias("cov"),
                F.greatest(
                    a.getField("end"), e.getField("s") + e.getField("l")
                ).alias("end"),
            ),
            lambda a: a.getField("cov"),
        )

    thr = {2: 0.20, 3: 0.18, 4: 0.16, 5: 0.15, 6: 0.14,
           7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

    def frac_sql(n: int, kind: str) -> str:
        # One SQL string per n, parsed JVM-side in a single call —
        # building this tree Column-by-Column costs seconds of py4j
        # round-trips (measured: 3.6 s plan build vs 0.3 s execution).
        # Every intermediate binds through a get(transform(array(v),
        # x -> body), 0) let-idiom so it is evaluated ONCE per row (a
        # bare reference inside a later HOF lambda re-evaluates the
        # subtree per element — the O(p²) trap the first cut fell
        # into, 44 s at sf0.01). Modal gram / dup-gram sets come from
        # ONE run-fold over the SORTED gram list (O(p log p)), not a
        # per-position count (O(p²) string compares).
        grams = f"""CASE WHEN size(__ws) >= {n} THEN
  transform(sequence(0, size(__ws) - {n}), i -> named_struct(
    's', element_at(__off, i + 1),
    'l', element_at(__off, i + {n}) + element_at(__wl, i + {n})
         - element_at(__off, i + 1),
    'g', array_join(slice(__ws, i + 1, {n}), ' ')))
ELSE cast(array() as array<struct<s:bigint,l:bigint,g:string>>) END"""

        def cover(spans: str) -> str:
            # interval union in start order: covered += max(0, end' -
            # max(s, running_end)); running_end = max(running_end, end')
            return f"""aggregate({spans},
  named_struct('cov', 0L, 'fin', -1L),
  (a, e) -> named_struct(
    'cov', a.cov + greatest(0L, e.s + e.l - greatest(e.s, a.fin)),
    'fin', greatest(a.fin, e.s + e.l)),
  a -> a.cov)"""

        if kind == "top":
            # longest run in sorted order = modal gram; sorted scan
            # order makes the tie rule (smallest gram) automatic via
            # strict >
            newrun = "CASE WHEN x = a.prev THEN a.run + 1 ELSE 1L END"
            body = f"""get(transform(array(aggregate(S,
  named_struct('prev', cast(null as string), 'run', 0L,
               'bestn', 0L, 'bestg', cast(null as string)),
  (a, x) -> named_struct(
    'prev', x,
    'run', {newrun},
    'bestn', CASE WHEN {newrun} > a.bestn THEN {newrun} ELSE a.bestn END,
    'bestg', CASE WHEN {newrun} > a.bestn THEN x ELSE a.bestg END))),
  b -> {cover("filter(G, e -> e.g = b.bestg)")}), 0)"""
        else:
            # dup: grams appearing >= 2 times = adjacent equals in the
            # sorted list, deduped
            dupset = """CASE WHEN size(S) >= 2 THEN array_distinct(
  filter(transform(sequence(1, size(S) - 1),
    i -> CASE WHEN element_at(S, i) = element_at(S, i + 1)
              THEN element_at(S, i) END),
    x -> x IS NOT NULL))
ELSE cast(array() as array<string>) END"""
            body = f"""get(transform(array({dupset}),
  d -> {cover("filter(G, e -> array_contains(d, e.g))")}), 0)"""

        return f"""CASE WHEN size(__ws) >= {n} THEN
  cast(get(transform(array({grams}), G ->
    get(transform(array(array_sort(transform(G, e -> e.g))), S ->
      {body}), 0)), 0) as double) / __tot
ELSE 0.0D END"""

    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        kind = "top" if n <= 4 else "dup"
        m = m.withColumn(
            f"__raw_{kind}_{n}gram_frac", F.expr(frac_sql(n, kind))
        )
    frac_cols = []
    verdict = None
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        kind = "top" if n <= 4 else "dup"
        name = f"{kind}_{n}gram_frac"
        frac_cols.append(name)
        m = m.withColumn(
            name, F.floor(F.col(f"__raw_{name}") * F.lit(1e6)).cast("bigint")
        )
        c = F.col(f"__raw_{name}") > F.lit(thr[n])
        verdict = c if verdict is None else (verdict | c)
    return m.select(
        "doc_id", *frac_cols, verdict.cast("int").alias("repetitive")
    )


@query(
    "d100_phrase_search_postings",
    oracle="""
WITH post AS (
  SELECT doc_id, g.i AS pos, ws[g.i + 1] AS term
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents) d,
       unnest(generate_series(0, len(ws) - 1)) AS g(i)
)
SELECT p1.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(p1.pos) AS BIGINT) AS first_pos
FROM post p1
JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
            AND p2.term = 'hash'
JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
            AND p3.term = 'batch'
WHERE p1.term = 'slow'
GROUP BY 1
""",
    tags=("llm", "retrieval", "index"),
)
def d100_phrase_search_postings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positional inverted index + phrase query — the IR primitive
    under every "exact phrase" search box (Lucene's positional
    postings, expressed relationally): build (term, doc_id, position)
    postings from the corpus, then resolve the phrase "slow hash
    batch" as a positional self-join chain (term matches at p, p+1,
    p+2 in the same document); per matching document the match count
    and first occurrence position.

    Scale shape: postings build is ONE posexplode projection (no
    shuffle — the explode pipelines into the scan) and each term
    filter applies BEFORE any join, so the joins move only the three
    terms' postings lists, never the corpus. At rest the postings
    table would be written partitioned/bucketed BY TERM, turning each
    probe into a partition-pruned read (this entry builds it inline —
    the filter sits directly on the generator output, the same rows a
    pruned read would return). The join chain keys on (doc_id,
    pos±k) — equi-joins, AQE-broadcastable at real phrase
    selectivities. The oracle replays the identical postings and
    chain."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    post = docs.select(
        "doc_id", F.posexplode(ws).alias("pos", "term")
    )
    w1, w2, w3 = "slow", "hash", "batch"
    p1 = post.filter(F.col("term") == w1).select(
        "doc_id", F.col("pos").alias("p1")
    )
    p2 = post.filter(F.col("term") == w2).select(
        "doc_id", F.col("pos").alias("p2")
    )
    p3 = post.filter(F.col("term") == w3).select(
        "doc_id", F.col("pos").alias("p3")
    )
    hits = (
        p1.join(p2, ["doc_id"])
        .filter(F.col("p2") == F.col("p1") + 1)
        .join(p3, ["doc_id"])
        .filter(F.col("p3") == F.col("p1") + 2)
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.min("p1").cast("long").alias("first_pos"),
    )


@query(
    "d101_vocab_coverage_curve",
    oracle="""
WITH tok AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z]+'),
           x -> x <> '')) AS t
  FROM documents
), freq AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
), ranked AS (
  SELECT t, c,
         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t) AS BIGINT) AS r,
         CAST(SUM(c) OVER (ORDER BY c DESC, t
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM freq
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total FROM freq
)
SELECT r AS vocab_size, ranked.cum AS covered, tot.total,
       ranked.cum * 1.0 / tot.total AS coverage,
       1.0 - ranked.cum * 1.0 / tot.total AS oov_rate
FROM ranked, tot
WHERE r IN (4, 8, 16, 24)
""",
    tags=("llm", "tokenizer", "vocab"),
)
def d101_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary-coverage curve — the sizing analysis run
    before training a tokenizer (HuggingFace tokenizers' vocab-size
    sweep, done relationally): token frequencies over the corpus,
    deterministic rank (count desc, token asc), and for each candidate
    vocab size V the fraction of corpus tokens covered by the top-V
    types (and the complementary OOV rate). d45/d54/d83 train and
    apply the actual subword vocabularies; this entry answers "how big
    must V be" from one scan.

    Scale shape (the load-bearing choice): the top-V selection is
    ``orderBy(count desc).limit(maxV)`` — Spark's TakeOrderedAndProject
    distributed top-k, NOT a global sort of the vocabulary (at 100 TB
    the type vocabulary is ~1e8 rows; a global-ordered window over it
    would serialize on one task, the limit(4096) heap-merge doesn't).
    The window rank/cumsum then runs over the 4096 SURVIVORS only —
    bounded single-task work by construction. One explode + one
    map-side-combined count; the curve rows that leave the plan are 4. The sweep sizes (4/8/16/24) are a fixture parameter sized to the synthetic corpus's 31-type vocabulary so every row is non-vacuous at every SF; a real crawl uses 2^10..2^17 with the identical plan."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t")
    ).filter(F.col("t") != "")
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("long").alias("total"))
    max_v = 4096
    top = freq.orderBy(F.desc("c"), "t").limit(max_v)
    w = Window.orderBy(F.desc("c"), "t")
    cum = (
        top.withColumn("r", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum",
            F.sum("c")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .filter(F.col("r").isin([4, 8, 16, 24]))
    )
    return cum.crossJoin(broadcast(total)).select(
        F.col("r").alias("vocab_size"),
        F.col("cum").alias("covered"),
        "total",
        (F.col("cum") / F.col("total")).alias("coverage"),
        (F.lit(1.0) - F.col("cum") / F.col("total")).alias("oov_rate"),
    )


@query(
    "d102_ks_corpus_drift",
    oracle=r"""
WITH lab AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) % 2 = 0 AS a
  FROM documents
), counts AS (
  SELECT v,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM lab GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c1) AS DOUBLE) AS n1, CAST(SUM(c2) AS DOUBLE) AS n2
  FROM counts
), cums AS (
  SELECT SUM(c1) OVER (ORDER BY v) AS k1,
         SUM(c2) OVER (ORDER BY v) AS k2
  FROM counts
)
SELECT CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2,
       MAX(ABS(k1 / tot.n1 - k2 / tot.n2)) AS d_stat,
       MAX(ABS(k1 / tot.n1 - k2 / tot.n2))
         > 1.358 * SQRT((tot.n1 + tot.n2) / (tot.n1 * tot.n2))
         AS reject_05
FROM cums, tot GROUP BY tot.n1, tot.n2
""",
    tags=("llm", "drift", "statistics"),
)
def d102_ks_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov corpus-drift check — the
    distribution gate a pipeline runs between corpus snapshots or
    source cohorts before mixing them (here: document length across
    the even- vs odd-numbered sources): D = max |ECDF₁ − ECDF₂| over
    the merged value domain, plus the α=0.05 large-sample rejection
    (c(α)=1.358). b88's Welch t-test compares means; KS is the
    whole-shape sibling.

    Scale shape: ONE per-value count rollup (map-side combined over
    the raw rows), then the ECDF window runs over the DISTINCT VALUE
    DOMAIN — bounded by the measurement's resolution (~600 lengths
    here), not the corpus, so the single-task ordered window holds at
    any row count; totals ride a 1-row broadcast. Integer counts make
    every ECDF division bit-identical across engines."""
    docs = load(spark, sf_dir, "documents")
    lab = docs.select(
        F.col("n_chars").cast("long").alias("v"),
        (
            F.regexp_extract("source", r"(\d+)", 1).cast("int") % 2 == 0
        ).alias("a"),
    )
    counts = lab.groupBy("v").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("a"), 0).otherwise(1)).cast("long").alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = counts.select(
        F.sum("c1").over(w).alias("k1"), F.sum("c2").over(w).alias("k2")
    )
    gap = F.abs(
        F.col("k1") / F.col("n1") - F.col("k2") / F.col("n2")
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1") * F.col("n2"))
    )
    return (
        cums.crossJoin(broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(gap).alias("d_stat"), (F.max(gap) > F.max(crit)).alias("reject_05"))
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            "d_stat",
            "reject_05",
        )
    )


@query(
    "d103_nb_quality_classifier",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, lang = 'en' AS tgt, string_split(text, ' ') AS t
  FROM documents
), bg AS (
  SELECT doc_id, lang, tgt,
         ('0x' || substr(md5(concat_ws(' ', t[i], t[i+1])), 1, 8))::BIGINT
           % 256 AS bucket
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
), doc_bucket AS (
  SELECT doc_id, lang, tgt, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY 1, 2, 3, 4
), bucket_counts AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN tgt THEN 0 ELSE c END) AS BIGINT) AS cr
  FROM doc_bucket GROUP BY 1
), tot AS (
  SELECT CAST(SUM(ct) AS DOUBLE) AS nt, CAST(SUM(cr) AS DOUBLE) AS nr
  FROM bucket_counts
), ratio AS (
  SELECT bucket,
         CAST(ROUND(ln((ct + 1.0) * (nr + 256.0)
                       / ((cr + 1.0) * (nt + 256.0))) * 1e9) AS BIGINT)
           AS llr_nanos
  FROM bucket_counts, tot
)
SELECT d.doc_id, d.lang,
       CAST(SUM(d.c) AS BIGINT) AS n_bigrams,
       CAST(SUM(d.c * r.llr_nanos) AS BIGINT) / 1e9 AS dsir_score
FROM doc_bucket d JOIN ratio r USING (bucket)
GROUP BY 1, 2
ORDER BY dsir_score DESC, doc_id LIMIT 20
""",
    tags=("llm", "selection", "dsir"),
)
def d103_nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes hashed-bigram QUALITY/DOMAIN CLASSIFIER — the
    GPT-3/PaLM-style "does this raw document look like the
    high-quality reference corpus?" filter (Brown et al. 2020 §A;
    the closed-form sibling of the trained classifiers in d69/d87,
    and distinct from d70's DSIR GUMBEL-RESAMPLING form: d70 draws a
    sample by importance weight over unigram buckets vs the whole
    pool; this entry SCORES AND RANKS by the NB log-likelihood ratio
    over BIGRAM buckets against the complement cohort). Word bigrams
    (d14's feature) hash into 256 buckets (first 8 md5 hex chars,
    the cross-engine-stable bucket key used by the dedup family);
    bag-of-buckets models with add-1 smoothing are fit for the
    target cohort (lang='en' here — in production, the curated
    reference corpus) and the rest of the pool; each document's NB
    score is sum_b count_b * log(p_target(b)/p_rest(b)), and the
    top of that ranking is what the quality gate keeps.

    Exactness: the per-bucket log-likelihood ratio is quantized to
    integer NANOS once (256 values), so every per-document sum is
    exact integer math — order-independent, bit-identical across
    engines (the nano-quantized convention, registry.py).

    Scale shape: the explode pre-aggregates per (doc, bucket) before
    anything else — at 100 TB that's the ~10k-bigram doc collapsing
    to <=256 rows before the bucket rollup and the scoring join. The
    bucket model is 256 rows BY CONSTRUCTION (not data-bounded), so
    both the totals and the LLR table ride broadcasts — the only
    doc-cardinality shuffles are the two doc_id-keyed rollups. The
    final ranking is top-k (TakeOrderedAndProject), never a full
    sort.
    """
    docs = load(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs).select(
        "doc_id",
        "lang",
        (F.col("lang") == "en").alias("tgt"),
        F.split(F.col("text"), " ").alias("__t"),
    ).filter(F.size("__t") >= 2)
    t = F.col("__t")
    bg = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1, F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1)
        ),
    )
    feat = toks.select(
        "doc_id",
        "lang",
        "tgt",
        F.explode(bg).alias("bigram"),
    ).select(
        "doc_id",
        "lang",
        "tgt",
        (
            F.conv(F.substring(F.md5("bigram"), 1, 8), 16, 10).cast("long")
            % 256
        ).alias("bucket"),
    )
    doc_bucket = feat.groupBy("doc_id", "lang", "tgt", "bucket").agg(
        F.count("*").alias("c")
    )
    bucket_counts = doc_bucket.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), F.col("c")).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("tgt"), 0).otherwise(F.col("c"))).cast("long").alias("cr"),
    )
    tot = bucket_counts.agg(
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cr").cast("double").alias("nr"),
    )
    ratio = bucket_counts.crossJoin(broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("ct") + 1.0)
                * (F.col("nr") + 256.0)
                / ((F.col("cr") + 1.0) * (F.col("nt") + 256.0))
            )
            * 1e9
        )
        .cast("long")
        .alias("llr_nanos"),
    )
    return (
        doc_bucket.join(broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            (F.sum(F.col("c") * F.col("llr_nanos")).cast("long") / F.lit(1e9)).alias(
                "dsir_score"
            ),
        )
        .orderBy(F.desc("dsir_score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "d104_mink_membership_audit",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS arr
  FROM documents
),
toks AS (SELECT doc_id, unnest(arr) AS tok FROM t),
bg0 AS (SELECT doc_id, unnest(list_zip(arr, arr[2:])) AS p FROM t),
bg AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM bg0 WHERE p[2] IS NOT NULL
),
uni AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY w1),
big AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM toks),
tok_nll AS (
  SELECT bg.doc_id, -LN((cb + 1.0) / (cu + vocab)) AS nll
  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
),
ranked AS (
  SELECT doc_id, nll,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY nll DESC) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM tok_nll
)
SELECT r.doc_id, d.lang,
       CAST(MAX(r.n) AS BIGINT) AS n_bigrams,
       ROUND(AVG(CASE WHEN r.rn <= (r.n + 4) // 5 THEN r.nll END), 6)
         AS mink20_nll
FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
GROUP BY r.doc_id, d.lang
ORDER BY mink20_nll, r.doc_id LIMIT 20
""",
    tags=("llm", "membership", "contamination"),
)
def d104_mink_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-K% prob pretraining-membership audit (Shi et al. 2023,
    "Detecting Pretraining Data from Large Language Models"): score
    each document by the mean negative log-likelihood of its k=20%
    LEAST-probable tokens under a reference LM — text the model finds
    suspiciously unsurprising even at its rarest tokens is likely
    MEMORIZED/member data. The reference LM here is d29's corpus-
    trained add-one bigram model (in production: the target model's
    token logprobs, same shape); output is the 20 most member-looking
    documents (lowest Min-K NLL).

    Exactness: the per-document selection boundary only ever cuts
    WITHIN equal-NLL ties, and a mean is invariant to which of the
    equal values are chosen — so ROW_NUMBER's nondeterministic
    tie-order is safe on both engines. The take count is pure integer
    arithmetic ((n+4) div 5 = ceil(n/5)), never a float multiply.

    Scale shape: d29's model tables (vocab- and bigram-cardinality,
    map-side-combined counts) joined back onto the token stream; ONE
    doc_id shuffle feeds the per-document window (per-doc bounded
    state); the final ranking is a TakeOrderedAndProject heap-merge.
    At 100 TB only the token->model joins move corpus-sized data, and
    they are plain equi-joins AQE can re-plan."""
    docs = load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    t = ensure_parallelism(docs).select("doc_id", arr.alias("arr"))
    n = F.size(F.col("arr"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("arr"), 1, n - 1),
                F.slice(F.col("arr"), 2, n - 1),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        F.col("p").getField("0").alias("w1"),
        F.col("p").getField("1").alias("w2"),
    )
    toks = t.select("doc_id", F.explode("arr").alias("tok"))
    uni = bg.groupBy("w1").agg(F.count("*").alias("cu"))
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    vocab = toks.agg(F.countDistinct("tok").alias("vocab"))
    tok_nll = (
        bg.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.col("cb") + F.lit(1.0))
                    / (F.col("cu") + F.col("vocab"))
                )
            ).alias("nll"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("nll"))
    ranked = tok_nll.select(
        "doc_id",
        "nll",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )
    return (
        ranked.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("doc_id", "lang")
        .agg(
            F.max("n").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.when(
                        F.col("rn") <= F.expr("(n + 4) div 5"), F.col("nll")
                    )
                ),
                6,
            ).alias("mink20_nll"),
        )
        .orderBy(F.asc("mink20_nll"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "d105_source_qq_shift",
    oracle="""
WITH g AS (SELECT unnest(generate_series(1, 9)) AS d),
p AS (
  SELECT quantile_cont(n_chars,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
  FROM documents
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         quantile_cont(n_chars,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
  FROM documents GROUP BY 1
)
SELECT s.source, CAST(g.d AS BIGINT) AS decile, s.n_docs,
       s.qs[g.d] AS src_q, p.qs[g.d] AS pool_q,
       s.qs[g.d] - p.qs[g.d] AS shift
FROM s, g, p
ORDER BY s.source, g.d
""",
    tags=("llm", "drift", "statistics"),
)
def d105_source_qq_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Q-Q quantile-shift report — the analyst's Q-Q plot
    as a table, and the LOCALIZING complement of the whole-shape
    gates (d102's KS says "source X differs"; this says "X's short
    tail is 40 chars shorter than the pool's" — the diagnostic that
    decides between truncation, re-weighting, or exclusion before
    mixing). Nine exact interpolated deciles per source vs the pooled
    corpus, with the shift at each decile.

    Exactness: Spark's ``percentile`` and DuckDB's ``quantile_cont``
    share the linear-interpolation definition; on integer inputs the
    (n−1)·q arithmetic and a+(b−a)·frac interpolation are the same
    IEEE operations, so the doubles agree bit-for-bit (probed, not
    assumed).

    Scale shape: ONE map-side-combinable aggregate per source (exact
    percentile keeps the per-source value list — the documented exact
    bound, same class as b27/k94; the 100 TB swap is b118's KLL
    sketches per source, same report ±rank error); the pooled row is
    a 1-row broadcast; the 9-decile fan is a bounded literal
    explode."""
    docs = load(spark, sf_dir, "documents")
    qs = F.array(*[F.lit(x / 10) for x in range(1, 10)])
    pool = docs.agg(F.percentile("n_chars", qs).alias("pqs"))
    src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.percentile("n_chars", qs).alias("sqs"),
    )
    fan = src.crossJoin(broadcast(pool)).select(
        "source",
        "n_docs",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(9)),
                lambda d: F.struct(
                    d.cast("long").alias("decile"),
                    F.element_at("sqs", d).alias("src_q"),
                    F.element_at("pqs", d).alias("pool_q"),
                ),
            )
        ).alias("p"),
    )
    return fan.select(
        "source",
        F.col("p.decile").alias("decile"),
        "n_docs",
        F.col("p.src_q").alias("src_q"),
        F.col("p.pool_q").alias("pool_q"),
        (F.col("p.src_q") - F.col("p.pool_q")).alias("shift"),
    ).orderBy("source", "decile")


@query(
    "d106_lsh_calibration",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 1000
), shc AS (
  SELECT sh.* FROM sh LEFT JOIN hot USING (shingle) WHERE hot.shingle IS NULL
), cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS isz
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id1, id2, isz * 1.0 / (c1.n + c2.n - isz) AS j
  FROM inter JOIN cnt c1 ON id1 = c1.doc_id JOIN cnt c2 ON id2 = c2.doc_id
  WHERE isz * 1.0 / (c1.n + c2.n - isz) >= 0.2
), h AS (
  SELECT doc_id, CASE WHEN length(shingle) = 0 THEN 0 ELSE
    list_reduce(list_transform(generate_series(1, length(shingle)),
      i -> CAST(unicode(shingle[i:i]) AS BIGINT)),
      (acc, c) -> (acc * 31 + c) % 1000000007) END AS h
  FROM sh
), sigs AS (
  SELECT doc_id,
    CAST(MIN((1 * h + 13) % 1000000007) AS BIGINT) AS mh_0,
    CAST(MIN((3 * h + 110) % 1000000007) AS BIGINT) AS mh_1,
    CAST(MIN((5 * h + 207) % 1000000007) AS BIGINT) AS mh_2,
    CAST(MIN((7 * h + 304) % 1000000007) AS BIGINT) AS mh_3,
    CAST(MIN((9 * h + 401) % 1000000007) AS BIGINT) AS mh_4,
    CAST(MIN((11 * h + 498) % 1000000007) AS BIGINT) AS mh_5,
    CAST(MIN((13 * h + 595) % 1000000007) AS BIGINT) AS mh_6,
    CAST(MIN((15 * h + 692) % 1000000007) AS BIGINT) AS mh_7
  FROM h GROUP BY doc_id
), buckets AS (
  SELECT doc_id, 0 AS band,
         (mh_0 * 1000003 + mh_1 * 999983 + mh_2 * 774047 + mh_3 * 31)
           % 1000000007 AS bh FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band,
         (mh_4 * 1000003 + mh_5 * 999983 + mh_6 * 774047 + mh_7 * 31)
           % 1000000007 AS bh FROM sigs
), det AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
), scored AS (
  SELECT LEAST(CAST(FLOOR(p.j * 10) AS BIGINT), 9) AS band10,
         CASE WHEN d.id1 IS NOT NULL THEN 1 ELSE 0 END AS hit,
         CAST(ROUND((1 - POW(1 - POW(p.j, 4), 2)) * 1e9) AS BIGINT)
           AS th_nanos
  FROM pairs p LEFT JOIN det d ON p.id1 = d.id1 AND p.id2 = d.id2
)
SELECT band10, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_detected,
       SUM(hit) * 1.0 / COUNT(*) AS detect_rate,
       CAST(SUM(th_nanos) AS BIGINT) * 1.0 / COUNT(*) / 1e9
         AS theory_rate
FROM scored GROUP BY 1 ORDER BY 1
""",
    tags=("llm", "dedup", "calibration"),
)
def d106_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH S-CURVE CALIBRATION — the empirical detection rate
    of the d04x banding (8 perms, 2 bands x 4 rows) per exact-Jaccard
    decile, against the textbook collision probability
    1-(1-J^r)^b. This is the table an operator reads before picking
    (b, r) for a 100 TB dedup run: it shows WHERE the S-curve's knee
    sits on THIS corpus and how far the finite-permutation reality
    deviates from theory (d04's recall test checks one threshold;
    this calibrates the whole curve).

    Exactness: everything is the portable polynomial-hash pipeline
    (d04x) — signatures, band mixing, and exact Jaccard are integer
    arithmetic; per-pair theory is quantized to nanos before the
    band rollup (order-free integer sums).

    Scale shape: ground-truth pairs come from the shingle inverted
    index with the hot-shingle cap (d05's discipline — at calibration
    time you run this on a SAMPLE, the curve is corpus-shape-, not
    corpus-size-dependent); detection is the same bucket equi-join as
    production; the rollup is 10 rows."""
    from ..operators.text import poly_hash

    docs = load(spark, sf_dir, "documents")
    sh = D.shingle_docs(docs, "doc_id", "text", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > 1000)
        .select("shingle")
    )
    # shc feeds THREE pipelines (per-doc sizes, both inverted-index
    # sides); without a persist each one re-runs the hot-cap
    # anti-join from the shingle cache (plan audit: the cached scan
    # appeared 10x). Same discipline as sh above.
    shc = sh.join(hot, "shingle", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cnt = shc.groupBy("id").agg(F.count("*").alias("n"))
    a = shc.select(F.col("id").alias("id1"), "shingle")
    b = shc.select(F.col("id").alias("id2"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("isz"))
    )
    j = F.col("isz") / (F.col("n1") + F.col("n2") - F.col("isz"))
    pairs = (
        inter.join(cnt.select(F.col("id").alias("id1"), F.col("n").alias("n1")), "id1")
        .join(cnt.select(F.col("id").alias("id2"), F.col("n").alias("n2")), "id2")
        .select("id1", "id2", j.alias("j"))
        .filter(F.col("j") >= 0.2)
    )
    h = sh.withColumn("h", F.expr(poly_hash("shingle")))
    sigs = h.groupBy("id").agg(
        *[
            F.min((F.lit(p) * F.col("h") + F.lit(q)) % _D04X_P).alias(f"mh_{i}")
            for i, (p, q) in enumerate(_MINHASH_PERMS)
        ]
    )

    def band_hash(bi: int):
        expr = None
        for r, m in enumerate(_D04X_MULT):
            term = F.col(f"mh_{bi * 4 + r}") * F.lit(m)
            expr = term if expr is None else expr + term
        return (expr % F.lit(_D04X_P)).alias("bh")

    buckets = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), band_hash(bi))
                    for bi in range(2)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # 2 rows per doc; both sides of the detection self-join read it —
    # unpersisted, the full-corpus 8-perm signature aggregation ran
    # twice (once per side).
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    l = buckets.select(F.col("id").alias("id1"), "band", "bh")
    r = buckets.select(F.col("id").alias("id2"), "band", "bh")
    det = (
        l.join(r, ["band", "bh"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    scored = pairs.join(det, ["id1", "id2"], "left").select(
        F.least(F.floor(F.col("j") * 10).cast("long"), F.lit(9).cast("long")).alias(
            "band10"
        ),
        F.coalesce(F.col("__hit"), F.lit(0)).alias("hit"),
        F.round(
            (
                F.lit(1)
                - F.pow(F.lit(1) - F.pow(F.col("j"), F.lit(4)), F.lit(2))
            )
            * 1e9
        )
        .cast("long")
        .alias("th_nanos"),
    )
    return (
        scored.groupBy("band10")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("hit").cast("long").alias("n_detected"),
            (F.sum("hit") / F.count("*")).alias("detect_rate"),
            (
                F.sum("th_nanos").cast("long") / F.count("*") / F.lit(1e9)
            ).alias("theory_rate"),
        )
        .orderBy("band10")
    )


def _mm14_oracle() -> str:
    from ..operators.multimodal import (
        AUDIO_WINDOW,
        MEL_COS,
        MEL_SIN,
        MEL_WEIGHTS,
    )

    dots = []
    for b in range(len(MEL_COS)):
        cq = "[" + ", ".join(str(c) for c in MEL_COS[b]) + "]"
        sq = "[" + ", ".join(str(s) for s in MEL_SIN[b]) + "]"
        dots.append(
            f"""list_reduce(list_transform(range(0, {AUDIO_WINDOW}),
           j -> vs[CAST(widx * {AUDIO_WINDOW} + j + 1 AS INT)]
                * (CAST({cq} AS BIGINT[]))[CAST(j + 1 AS INT)]),
           (a, b) -> a + b) AS dc{b},
         list_reduce(list_transform(range(0, {AUDIO_WINDOW}),
           j -> vs[CAST(widx * {AUDIO_WINDOW} + j + 1 AS INT)]
                * (CAST({sq} AS BIGINT[]))[CAST(j + 1 AS INT)]),
           (a, b) -> a + b) AS ds{b}"""
        )
    dot_sql = ",\n         ".join(dots)
    bands = []
    for m, row in enumerate(MEL_WEIGHTS):
        terms = " + ".join(
            f"{w} * (dc{b} * dc{b} + ds{b} * ds{b})"
            for b, w in enumerate(row)
            if w
        )
        bands.append(f"{terms} AS e{m}")
    band_sql = ",\n         ".join(bands)
    return f"""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), w AS (
  SELECT doc_id, vs, unnest(range(0, len(vs) // {AUDIO_WINDOW})) AS widx
  FROM s WHERE len(vs) >= {AUDIO_WINDOW}
), p AS (
  SELECT doc_id, widx,
         {dot_sql}
  FROM w
), e AS (
  SELECT doc_id, widx,
         {band_sql}
  FROM p
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(e0) AS BIGINT) AS tot_e0,
       CAST(SUM(e1) AS BIGINT) AS tot_e1,
       CAST(SUM(e2) AS BIGINT) AS tot_e2,
       CAST(CASE WHEN SUM(e0) >= SUM(e1) AND SUM(e0) >= SUM(e2) THEN 0
                 WHEN SUM(e1) >= SUM(e2) THEN 1 ELSE 2 END AS BIGINT)
         AS dominant_band
FROM e GROUP BY doc_id
"""


@query(
    "mm14_mel_filterbank",
    oracle=_mm14_oracle(),
    tags=("llm", "multimodal", "dsp"),
)
def mm14_mel_filterbank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mel-style filterbank energies (operators/multimodal.py:
    mel_filterbank) — the standard audio feature ahead of MFCCs,
    completing the audio battery (mm5 energy → mm9 tone → mm11 VAD →
    band features): per full 64-sample window, four quantized-Goertzel
    DFT bin powers mixed into three overlapping triangular bands by
    INTEGER literal weights; per doc, total band energies and the
    dominant band (ties to the lowest band on both engines). Trig is
    quantized at 1e2 (vs mm9's 1e4) precisely so the band mix stays
    exact int64 — the headroom arithmetic is documented at the
    constants.

    Scale: one Arrow mapInPandas pass (TWO int64 matmuls per blob —
    samples→bins, powers→bands), one map-side-combined groupBy; no
    shuffle carries waveforms."""
    from ..operators import multimodal as MM

    docs = load(spark, sf_dir, "documents")
    e = MM.mel_filterbank(docs)
    dom = (
        F.when(
            (F.col("tot_e0") >= F.col("tot_e1"))
            & (F.col("tot_e0") >= F.col("tot_e2")),
            0,
        )
        .when(F.col("tot_e1") >= F.col("tot_e2"), 1)
        .otherwise(2)
    )
    return (
        e.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum("e0").cast("long").alias("tot_e0"),
            F.sum("e1").cast("long").alias("tot_e1"),
            F.sum("e2").cast("long").alias("tot_e2"),
        )
        .withColumn("dominant_band", dom.cast("long"))
    )


# ---------------------------------------------------------------------------
# Round 11 session 5: hybrid retrieval, matryoshka truncation, binary ANN
# ---------------------------------------------------------------------------

@query(
    "d107_rrf_hybrid_retrieval",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), dense AS (
  SELECT q_id, c_id, rn AS dense_rank FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT.format(a="q.embedding", b="c.embedding")}
                      / (q.nrm * c.nrm) DESC, c.vec_id) AS BIGINT) AS rn
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
  ) WHERE rn <= 20
), toks AS (
  SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS t
  FROM documents
), qd AS (
  SELECT doc_id AS q_id, t AS qt FROM toks WHERE doc_id < 10
), sparse AS (
  SELECT q_id, c_id, rn AS sparse_rank FROM (
    SELECT q_id, d.doc_id AS c_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q_id
             ORDER BY len(list_filter(d.t, x -> list_contains(qt, x))) * 1.0
                      / (len(d.t) + len(qt)
                         - len(list_filter(d.t, x -> list_contains(qt, x))))
                      DESC, d.doc_id) AS BIGINT) AS rn
    FROM toks d, qd WHERE d.doc_id <> q_id
  ) WHERE rn <= 20
), fused AS (
  SELECT COALESCE(dense.q_id, sparse.q_id) AS q_id,
         COALESCE(dense.c_id, sparse.c_id) AS c_id,
         dense_rank, sparse_rank,
         COALESCE(1.0 / (60.0 + dense_rank), 0.0)
           + COALESCE(1.0 / (60.0 + sparse_rank), 0.0) AS rrf_score
  FROM dense FULL OUTER JOIN sparse
    ON dense.q_id = sparse.q_id AND dense.c_id = sparse.c_id
)
SELECT q_id, c_id, dense_rank, sparse_rank, rrf_score,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY q_id ORDER BY rrf_score DESC, c_id) AS BIGINT)
         AS fused_rank
FROM fused
QUALIFY fused_rank <= 10
""",
    tags=("llm", "retrieval", "hybrid"),
)
def d107_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank-fusion HYBRID retrieval (Cormack et al. 2009,
    the fusion every production RAG stack runs): a dense leg (d07's
    exact cosine top-20) and a sparse lexical leg (word-set Jaccard
    top-20 against each query document's own text, the d05 similarity
    family) fused per candidate as sum of 1/(60+rank), missing leg
    contributing 0 — top-10 fused per query. Rank fusion needs NO
    score calibration between legs, which is exactly why it is the
    default hybrid combiner.

    Determinism: both legs' ranks carry c_id tie-breaks; rrf is the
    same two-term double sum in both engines (dense term first);
    fused rank ties break on c_id.

    Scale shape: both legs broadcast the bounded query set over the
    corpus and pre-limit per query via row_number (WindowGroupLimit —
    partial top-k before the shuffle); the fusion joins two
    |queries| x 20 rank lists — metadata-sized at any corpus scale; a
    100 TB deployment swaps the legs for their index-backed twins
    (d07y IVF / d100 postings), the fusion stage unchanged."""
    em = load(spark, sf_dir, "embeddings")
    dense = (
        S.brute_force_cosine_topk(em, em.filter(F.col("vec_id") < 10), k=20)
        .select("q_id", "c_id", F.col("rank").alias("dense_rank"))
    )
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.trim("text")), " ")).alias("t"),
    )
    qd = toks.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("q_id"), F.col("t").alias("qt")
    )
    isz = F.size(F.array_intersect("t", "qt"))
    jac = isz * F.lit(1.0) / (F.size("t") + F.size("qt") - isz)
    w_sp = Window.partitionBy("q_id").orderBy(F.desc("jac"), F.asc("c_id"))
    sparse = (
        toks.crossJoin(F.broadcast(qd))
        .filter(F.col("doc_id") != F.col("q_id"))
        .select(
            "q_id", F.col("doc_id").alias("c_id"), jac.alias("jac")
        )
        .withColumn("sparse_rank", F.row_number().over(w_sp).cast("long"))
        .filter(F.col("sparse_rank") <= 20)
        .select("q_id", "c_id", "sparse_rank")
    )
    fused = dense.join(sparse, ["q_id", "c_id"], "full_outer").select(
        "q_id",
        "c_id",
        "dense_rank",
        "sparse_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60.0) + F.col("dense_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60.0) + F.col("sparse_rank")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    w_f = Window.partitionBy("q_id").orderBy(F.desc("rrf_score"), F.asc("c_id"))
    return fused.withColumn(
        "fused_rank", F.row_number().over(w_f).cast("long")
    ).filter(F.col("fused_rank") <= 10)


def _d108_dim_sql(d: int) -> str:
    """One dim's (dim, q_id, c_id) prefix top-5 block — the EXACT
    fold/tie shape of the Spark side on the length-d prefix."""
    vec = f"embedding[1:{d}]"
    return f"""
  SELECT {d} AS dim, q_id, c_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT.format(a=f"q.{vec}", b=f"c.{vec}")}
                      / (sqrt({_NORMSQ.format(a=f"q.{vec}")})
                         * sqrt({_NORMSQ.format(a=f"c.{vec}")})) DESC,
                      c.vec_id) AS BIGINT) AS rn
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 20
  ) WHERE rn <= 5"""


@query(
    "d108_matryoshka_recall_curve",
    oracle=f"""
WITH pref AS (
{" UNION ALL ".join(_d108_dim_sql(d) for d in (8, 16, 32, 64))}
), full5 AS (
  SELECT q_id, c_id FROM (
{_d108_dim_sql(64)}
  )
)
SELECT dim AS trunc_dim,
       CAST(COUNT(f.c_id) AS BIGINT) AS n_hits,
       COUNT(f.c_id) / 100.0 AS recall_at_5
FROM pref p LEFT JOIN full5 f
  ON p.q_id = f.q_id AND p.c_id = f.c_id
GROUP BY dim ORDER BY dim
""",
    tags=("llm", "similarity", "evaluation"),
)
def d108_matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA truncation recall curve (Kusupati et al. 2022 MRL —
    the measurement behind every "shortlist on the first d dims, rerank
    full" deployment): top-5 cosine recall of the length-d embedding
    PREFIX against the full 64-dim top-5 truth, for d in 8/16/32/64.
    This is the table that decides how aggressively a 100 TB vector
    store can truncate at rest (d=64 row is 1.0 by construction — the
    built-in self-check of the harness).

    Determinism: the prefix slice is exact; every leg reuses the d07
    fold (identical fp op order both engines); ranks tie-break on
    c_id; recall is an integer count over a literal denominator.

    Scale shape: one broadcast-queries scan per dim (4 bounded legs,
    each WindowGroupLimit-pre-limited); the recall join compares
    |queries| x 5 rank lists — metadata-sized. At scale the prefix
    legs read a COLUMN PRUNED store (prefix dims are a separate
    column family / shorter parquet column), which is the entire
    point of matryoshka at rest."""
    em = load(spark, sf_dir, "embeddings")
    full5 = S.brute_force_cosine_topk(
        em, em.filter(F.col("vec_id") < 20), k=5
    ).select("q_id", "c_id")
    legs = []
    for d in (8, 16, 32, 64):
        sl = em.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        legs.append(
            S.brute_force_cosine_topk(
                sl, sl.filter(F.col("vec_id") < 20), k=5
            ).select(
                F.lit(d).cast("int").alias("trunc_dim"), "q_id", "c_id"
            )
        )
    pref = legs[0]
    for leg in legs[1:]:
        pref = pref.unionByName(leg)
    hits = pref.join(
        full5.select(
            F.col("q_id").alias("fq"),
            F.col("c_id").alias("fc"),
            F.lit(1).alias("hit"),
        ),
        (F.col("q_id") == F.col("fq")) & (F.col("c_id") == F.col("fc")),
        "left",
    )
    return (
        hits.groupBy("trunc_dim")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "trunc_dim",
            "n_hits",
            (F.col("n_hits") / F.lit(100.0)).alias("recall_at_5"),
        )
        .orderBy("trunc_dim")
    )


_D109_BIT_SQL = (
    "list_reduce(list_transform({sl}, x -> CASE WHEN x >= 0 "
    "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END), "
    "(a, b) -> a * 2 + b)"
)


@query(
    "d109_binary_hamming_rerank",
    oracle=f"""
WITH sig AS (
  SELECT vec_id, embedding,
         {_D109_BIT_SQL.format(sl="embedding[1:32]")} AS lo,
         {_D109_BIT_SQL.format(sl="embedding[33:64]")} AS hi,
         sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), short AS (
  SELECT q_id, c_id, hamming, q_vec, c_vec, q_nrm, c_nrm FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           CAST(bit_count(xor(q.lo, c.lo))
                + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming,
           q.embedding AS q_vec, c.embedding AS c_vec,
           q.nrm AS q_nrm, c.nrm AS c_nrm,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY bit_count(xor(q.lo, c.lo))
                      + bit_count(xor(q.hi, c.hi)) ASC, c.vec_id) AS rn
    FROM sig q JOIN sig c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 20
  ) WHERE rn <= 50
)
SELECT q_id, c_id, hamming, cosine, rn AS rank FROM (
  SELECT q_id, c_id, hamming,
         {_DOT.format(a="q_vec", b="c_vec")} / (q_nrm * c_nrm) AS cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY {_DOT.format(a="q_vec", b="c_vec")} / (q_nrm * c_nrm)
                    DESC, c_id) AS BIGINT) AS rn
  FROM short
) WHERE rn <= 5
""",
    tags=("llm", "similarity", "quantization"),
)
def d109_binary_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY-quantized ANN (the 32x-compression retrieval pattern:
    sign-binarize the embedding, shortlist by Hamming distance over
    packed words, exact-rerank the shortlist): 64 dims pack into TWO
    32-bit words, Hamming = two XOR+popcount ops, shortlist = top-50
    per query, rerank = exact cosine top-5 on raw vectors fetched for
    shortlist members only.

    Determinism (full value-exact oracle, unlike the seeded LSH
    gates): the sign bit is a pure predicate (x >= 0), the packed
    words are integer folds, popcounts are exact, and both tie-breaks
    are on c_id; the rerank reuses the d07 fold.

    Scale shape: the signature build is one JVM fold per row at rest
    (8 bytes/vector — a 100 TB float corpus's signatures fit in 3 TB,
    scannable at memory bandwidth); the shortlist scan moves ONLY
    (q_id, c_id, hamming) pairs pre-limited by WindowGroupLimit; raw
    vectors are joined back for 50 rows per query, never scanned
    wholesale. No Python anywhere."""
    em = load(spark, sf_dir, "embeddings")

    def pack(sl):
        return F.aggregate(
            sl,
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2
            + F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)),
        )

    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda p, q: p + q,
        )
    )
    sig = em.select(
        "vec_id",
        "embedding",
        pack(F.slice("embedding", 1, 32)).alias("lo"),
        pack(F.slice("embedding", 33, 32)).alias("hi"),
        nrm.alias("nrm"),
    )
    q = sig.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
        F.col("nrm").alias("q_nrm"),
    )
    ham = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("q_hi")))
    ).cast("long")
    w_h = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("c_id"))
    short = (
        sig.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            ham.alias("hamming"),
            F.col("embedding").alias("c_vec"),
            "q_vec",
            "q_nrm",
            F.col("nrm").alias("c_nrm"),
        )
        .withColumn("srn", F.row_number().over(w_h))
        .filter(F.col("srn") <= 50)
    )
    cosine = F.aggregate(
        F.zip_with(
            "q_vec",
            "c_vec",
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda p, x: p + x,
    ) / (F.col("q_nrm") * F.col("c_nrm"))
    w_r = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        short.select("q_id", "c_id", "hamming", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_r).cast("long"))
        .filter(F.col("rank") <= 5)
    )


def _mm15_oracle() -> str:
    from ..operators.multimodal import (
        AUDIO_WINDOW,
        MEL_COS,
        MEL_SIN,
        MEL_WEIGHTS,
        MFCC_DCT,
    )

    dots = []
    for b in range(len(MEL_COS)):
        cq = "[" + ", ".join(str(c) for c in MEL_COS[b]) + "]"
        sq = "[" + ", ".join(str(s) for s in MEL_SIN[b]) + "]"
        dots.append(
            f"""list_reduce(list_transform(range(0, {AUDIO_WINDOW}),
           j -> vs[CAST(widx * {AUDIO_WINDOW} + j + 1 AS INT)]
                * (CAST({cq} AS BIGINT[]))[CAST(j + 1 AS INT)]),
           (a, b) -> a + b) AS dc{b},
         list_reduce(list_transform(range(0, {AUDIO_WINDOW}),
           j -> vs[CAST(widx * {AUDIO_WINDOW} + j + 1 AS INT)]
                * (CAST({sq} AS BIGINT[]))[CAST(j + 1 AS INT)]),
           (a, b) -> a + b) AS ds{b}"""
        )
    dot_sql = ",\n         ".join(dots)
    bands = []
    for m, row in enumerate(MEL_WEIGHTS):
        terms = " + ".join(
            f"{w} * (dc{b} * dc{b} + ds{b} * ds{b})"
            for b, w in enumerate(row)
            if w
        )
        bands.append(f"{terms} AS e{m}")
    band_sql = ",\n         ".join(bands)
    log_sql = ",\n         ".join(
        f"CAST(length(bin(1 + e{m} // 1024)) AS BIGINT) AS l{m}"
        for m in range(len(MEL_WEIGHTS))
    )
    ceps = []
    for k, row in enumerate(MFCC_DCT):
        terms = " + ".join(
            f"({q}) * l{m}" for m, q in enumerate(row) if q
        )
        ceps.append(f"{terms} AS c{k}")
    ceps_sql = ",\n         ".join(ceps)
    return f"""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
), w AS (
  SELECT doc_id, vs, unnest(range(0, len(vs) // {AUDIO_WINDOW})) AS widx
  FROM s WHERE len(vs) >= {AUDIO_WINDOW}
), p AS (
  SELECT doc_id, widx,
         {dot_sql}
  FROM w
), e AS (
  SELECT doc_id, widx,
         {band_sql}
  FROM p
), l AS (
  SELECT doc_id, widx,
         {log_sql}
  FROM e
), c AS (
  SELECT doc_id, widx,
         {ceps_sql}
  FROM l
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(c0) AS BIGINT) AS mfcc0,
       CAST(SUM(c1) AS BIGINT) AS mfcc1,
       CAST(SUM(c2) AS BIGINT) AS mfcc2
FROM c GROUP BY doc_id
"""


@query(
    "mm15_audio_mfcc",
    oracle=_mm15_oracle(),
    tags=("llm", "multimodal", "dsp"),
)
def mm15_audio_mfcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MFCC-style cepstral coefficients (operators/multimodal.py:
    audio_mfcc) — the final step of the audio-feature battery
    (mm5 energy → mm9 tone → mm11 VAD → mm14 filterbank → cepstra):
    per full 64-sample window, mm14's exact integer mel band energies
    go through an integer LOG (bit_length of the >>10-scaled energy —
    exact on both engines, monotone in the energy, which is all the
    cepstral mix needs) and a 1e3-quantized DCT-II; per-doc
    coefficient sums. The pinned integer contract is this engine's
    stub for real ln-based MFCCs, same class as every deterministic
    decode fake in the mm family — the Spark-side plumbing (binary
    payloads, Arrow batching, int64 matmuls) is the real deliverable.

    Scale shape: ONE mapInPandas pass per partition (three matmuls +
    one frexp per blob), no shuffle carries waveforms; the per-doc
    rollup moves 5 integers per document."""
    docs = load(spark, sf_dir, "documents")
    return MM.audio_mfcc(docs)


@query(
    "d110_kneser_ney_bigram",
    oracle="""
WITH toks AS (
  SELECT string_split(lower(trim(text)), ' ') AS t FROM documents
  WHERE len(string_split(lower(trim(text)), ' ')) >= 2
), bg AS (
  SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
  GROUP BY 1, 2
), ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
         CAST(COUNT(*) AS BIGINT) AS n1p_fw
  FROM bg GROUP BY 1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bw FROM bg GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM bg
)
SELECT w1, w2, c,
       GREATEST(c - 0.75, 0.0) / cw1
         + (0.75 * n1p_fw / cw1) * (n1p_bw / CAST(nbb AS DOUBLE)) AS pkn
FROM bg JOIN ctx USING (w1) JOIN cont USING (w2), tot
ORDER BY c DESC, w1, w2 LIMIT 20
""",
    tags=("llm", "text", "lm"),
)
def d110_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY bigram LM estimation (Kneser & Ney
    1995, the standard n-gram smoothing; the d29 perplexity entry's
    add-k model upgraded to the estimator real LM toolkits ship):
    P(w2|w1) = max(c-D,0)/c(w1•) + D·N1+(w1•)/c(w1•) · N1+(•w2)/N1+(••)
    with D = 0.75 — continuation counts, not raw frequencies, carry
    the backoff (the insight that made KN the default). Output: the
    top-20 bigrams by count with their smoothed probabilities.

    Determinism: every count is exact (adjacent-pair explode via two
    array slices — no positional self-join); the double formula is
    written with the IDENTICAL op order in both engines.

    Scale shape: ONE explode + ONE map-side-combined groupBy builds
    the bigram table; context/continuation tables are vocab-sized
    rollups of IT (no second corpus scan); the model-assembly joins
    are vocab-keyed (broadcastable at any corpus size — vocabulary
    grows sublinearly); top-20 is TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.lower(F.trim("text")), " ").alias("t")
    ).filter(F.size("t") >= 2)
    pair = F.explode(
        F.zip_with(
            F.expr("slice(t, 1, size(t) - 1)"),
            F.expr("slice(t, 2, size(t) - 1)"),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    )
    # the bigram table is the TRAINED MODEL — materialize it once so
    # context/continuation/total derive from the cache, not four
    # corpus re-scans (a real LM pipeline persists exactly this table)
    bg = (
        toks.select(pair.alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctx = bg.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count("*").alias("n1p_fw")
    )
    cont = bg.groupBy("w2").agg(F.count("*").alias("n1p_bw"))
    tot = bg.agg(F.count("*").alias("nbb"))
    pkn = (
        F.greatest(F.col("c") - F.lit(0.75), F.lit(0.0)) / F.col("cw1")
        + (F.lit(0.75) * F.col("n1p_fw") / F.col("cw1"))
        * (F.col("n1p_bw") / F.col("nbb").cast("double"))
    )
    return (
        bg.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c", pkn.alias("pkn"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@query(
    "d111_cluster_balanced_sample",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding, sqrt({_NORMSQ.format(a="embedding")}) AS nrm
  FROM embeddings
), seeds AS (
  SELECT vec_id AS sid, embedding AS s_emb, nrm AS s_nrm
  FROM n WHERE vec_id < 8
), assigned AS (
  SELECT vec_id, sid AS cid FROM (
    SELECT c.vec_id, s.sid,
           ROW_NUMBER() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_DOT.format(a="c.embedding", b="s.s_emb")}
                      / (c.nrm * s.s_nrm) DESC, s.sid) AS rn
    FROM n c, seeds s
  ) WHERE rn = 1
), ranked AS (
  SELECT cid, vec_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY cid
           ORDER BY (vec_id * 2654435761) % 2147483647, vec_id)
           AS BIGINT) AS pick
  FROM assigned
)
SELECT cid, vec_id, pick FROM ranked WHERE pick <= 20
""",
    tags=("llm", "sampling", "clustering"),
)
def d111_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-BALANCED coreset sampling — the balancing step of
    SemDeDup/DBP-style curation: assign every vector to its nearest
    prototype, then take an EQUAL per-cluster quota (20) in
    deterministic hash order, so majority clusters cannot dominate the
    sample the way uniform sampling lets them. Prototypes here are
    pinned to the first 8 corpus vectors so the WHOLE pipeline is
    value-exact under the oracle; a production run swaps in d61's
    trained k-means codebook — the assignment and quota stages are
    unchanged (this entry is the exactly-verifiable twin of that
    composition).

    Scale shape: assignment is one broadcast-prototypes scan (8-way
    fan per row, argmin via WindowGroupLimit's rn=1); the quota stage
    is one hash-ranked window per cluster — at 100 TB, both are a
    single pass each, and the hash ranking replaces the global sort a
    naive 'ORDER BY rand() LIMIT' would shuffle."""
    em = load(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda p, q: p + q,
        )
    )
    n = em.select("vec_id", "embedding", nrm.alias("nrm"))
    seeds = n.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("sid"),
        F.col("embedding").alias("s_emb"),
        F.col("nrm").alias("s_nrm"),
    )
    cosine = F.aggregate(
        F.zip_with(
            "embedding", "s_emb", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda p, x: p + x,
    ) / (F.col("nrm") * F.col("s_nrm"))
    w_a = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("sid")
    )
    assigned = (
        n.crossJoin(F.broadcast(seeds))
        .select("vec_id", "sid", cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(w_a))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("sid").alias("cid"))
    )
    w_p = Window.partitionBy("cid").orderBy(
        (F.col("vec_id") * F.lit(2654435761)) % F.lit(2147483647),
        F.asc("vec_id"),
    )
    return (
        assigned.withColumn("pick", F.row_number().over(w_p).cast("long"))
        .filter(F.col("pick") <= 20)
        .select("cid", "vec_id", "pick")
    )


@query(
    "mm16_image_histogram_gate",
    oracle="""
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> unicode(c)) AS vs
  FROM documents
  WHERE length(text) >= 256
    AND NOT regexp_matches(substring(text, 1, 256), '[^\\x00-\\x7F]')
), px AS (
  SELECT doc_id, unnest(vs[1:256]) AS luma FROM s
), h AS (
  SELECT doc_id, luma // 32 AS lbin, CAST(COUNT(*) AS BIGINT) AS n
  FROM px GROUP BY 1, 2
), dom AS (
  SELECT doc_id, lbin AS dom_bin, n AS dom_n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n DESC, lbin ASC) AS rn
  FROM h
), conc AS (
  SELECT doc_id,
         CAST(SUM(n * length(bin(n))) AS BIGINT) AS conc
  FROM h GROUP BY doc_id
)
SELECT d.doc_id, d.dom_bin, d.dom_n, c.conc,
       d.dom_n >= 211 AS low_info
FROM dom d JOIN conc c USING (doc_id)
WHERE d.rn = 1
""",
    tags=("llm", "multimodal", "quality", "image"),
)
def mm16_image_histogram_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-information image gate (the training-data filter that drops
    flat/near-uniform images — solid backgrounds, letterboxes, failed
    decodes — before they waste multimodal training tokens): per image
    an 8-bin luma histogram over the decoded 16x16 grid (codec stub:
    first 256 payload bytes, the mm2/mm13 seam; grids containing a
    non-ASCII byte are filtered on BOTH engines — see
    ``luma_hist_batch``'s ASCII seam contract — so the byte-side
    kernel and the codepoint-side oracle agree on any corpus, not
    just an ASCII one), the dominant bin
    (ties to the lowest bin — mirrored in the oracle's ORDER BY), an
    integer CONCENTRATION score Σ n_b·bit_length(n_b) (maximal for
    single-bin images, minimal for uniform histograms — the mm15
    integer-log discipline, exact on both engines), and the
    low-information verdict. The verdict threshold (dominant bin ≥
    211/256 ≈ 82% of pixels) is CALIBRATED to the stub corpus so the
    gate splits it ~35/65 at every SF — exactly how a production gate
    is tuned against a labeled sample; the threshold is the knob, the
    exact integer machinery is the contract.

    Scale shape: ONE Arrow mapInPandas boundary per partition (one
    bincount + one frexp per image, vectorized numpy, no per-pixel
    Python); zero shuffles — the stats are per-row, so the gate
    composes with any downstream filter as a scan-side predicate.
    Binary payloads never shuffle."""
    docs = load(spark, sf_dir, "documents")
    stats = MM.image_luma_stats(docs)
    return stats.select(
        "doc_id",
        "dom_bin",
        "dom_n",
        "conc",
        (F.col("dom_n") >= F.lit(211)).alias("low_info"),
    )
