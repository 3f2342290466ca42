"""Rebuild /tmp/sf1 (the decade-up spot-run corpus): sf0.1 replicated 10x under disjoint keys.
Recipe per BASELINE.md round-13: key offsets per replica; documents
word-salted (w -> w_r{k}); embeddings cyclically shifted per replica
(norm-preserving). Untouched tables copied verbatim."""
import duckdb, os, shutil, time

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
R = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
t0 = time.time()

# plain copies for tables the spot set doesn't stress
for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

# lineitem: 10 replicas, orderkey offset (b46 percentiles; values reused)
con.execute(f"""
COPY (
  SELECT l_orderkey + k*100000000 AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), range({R}) t(k)
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
""")

# events: user/event ids offset per replica, ts unchanged
con.execute(f"""
COPY (
  SELECT event_id + k*100000000 AS event_id, ts,
         user_id + k*10000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{SRC}/events.parquet'), range({R}) t(k)
) TO '{DST}/events.parquet' (FORMAT PARQUET)
""")

# documents: doc_id offset; replica k>0 word-salted so replicas are
# disjoint in vocabulary (no verbatim cross-replica duplicates)
con.execute(f"""
COPY (
  SELECT doc_id + k*10000000 AS doc_id,
         CASE WHEN k = 0 THEN text
              ELSE regexp_replace(text, '([^ ]+)', '\\1_r' || k, 'g') END AS text,
         lang, source, n_chars
  FROM read_parquet('{SRC}/documents.parquet'), range({R}) t(k)
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

# embeddings: vec_id offset; embedding cyclically shifted by k
# (norm-preserving, replicas distinct in vector space)
con.execute(f"""
COPY (
  SELECT vec_id + k*10000000 AS vec_id,
         CASE WHEN k = 0 THEN embedding
              ELSE list_concat(embedding[k+1:], embedding[1:k]) END AS embedding,
         label
  FROM read_parquet('{SRC}/embeddings.parquet'), range({R}) t(k)
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")
print("built in %.1fs" % (time.time() - t0))
for t in ["lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, n)
