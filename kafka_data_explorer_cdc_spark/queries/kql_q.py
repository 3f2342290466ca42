"""The reference's KQL queries, run VERBATIM through the KQL front end.

These are the exact query strings a user of the reference types into
ADX (``/root/reference/README.md:363-390``), compiled by
:mod:`..kql` to DataFrame plans and checked against the same DuckDB
oracles as their hand-built twins (a13-a16) — proving the front end
compiles the reference's real workload correctly, not just unit
snippets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cdc.envelope import ORDERS_INFO_SQL, orders_info
from ..io import load
from ..kql import kql
from .registry import query

_OI = f"WITH orders_info AS ({ORDERS_INFO_SQL})"


def _orders(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"Orders": orders_info(load(spark, sf_dir, "orders"))}


@query(
    "k14_kql_avg_sales",
    oracle=f"""{_OI}
SELECT city, CAST(SUM(amount) AS BIGINT) / CAST(COUNT(amount) AS DOUBLE) AS avg_sales
FROM orders_info GROUP BY city
""",
    tags=("kql", "reference"),
)
def k14_kql_avg_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:363-366, verbatim — including the trailing ``render``
    stage (recorded as a presentation hint, relational result unchanged)."""
    return kql(
        "Orders\n"
        "| summarize avg_sales = avg(amount) by city \n"
        "| render columnchart",
        _orders(spark, sf_dir),
    )


@query(
    "k15_kql_total_sales",
    oracle=f"""{_OI}
SELECT city, CAST(SUM(amount) AS BIGINT) AS total
FROM orders_info GROUP BY city ORDER BY total DESC
""",
    tags=("kql", "reference"),
)
def k15_kql_total_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:372-377, verbatim — including KQL's descending-default
    ``sort by`` and the ``render piechart`` hint."""
    return kql(
        "Orders \n"
        "| summarize total = sum(amount) by city \n"
        "| sort by total\n"
        "| render piechart ",
        _orders(spark, sf_dir),
    )


@query(
    "k16_kql_order_counts",
    oracle=f"""{_OI}
SELECT city, CAST(COUNT(*) AS BIGINT) AS orders_cnt
FROM orders_info GROUP BY city ORDER BY orders_cnt DESC
""",
    tags=("kql", "reference"),
)
def k16_kql_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:383-388, verbatim (aggregate aliased to match the
    oracle's column name), including the ``render linechart`` hint."""
    return kql(
        "Orders\n"
        "| summarize orders_cnt = count() by city\n"
        "| sort by orders_cnt\n"
        "| render linechart   ",
        _orders(spark, sf_dir),
    )


@query(
    "k13_kql_recent_orders",
    oracle=f"""{_OI}
SELECT * FROM orders_info ORDER BY orderid DESC LIMIT 5
""",
    tags=("kql", "reference"),
)
def k13_kql_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The psql sanity query (README.md:203) in its KQL idiom:
    ``top 5 by orderid`` — plans as TakeOrderedAndProject, same as a13."""
    return kql("Orders | top 5 by orderid", _orders(spark, sf_dir))


@query(
    "k17_kql_filtered_pipeline",
    oracle=f"""{_OI}
SELECT city,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(amount) AS BIGINT) AS total
FROM orders_info
WHERE amount >= 150 AND city <> 'Austin'
GROUP BY city ORDER BY total DESC LIMIT 3
""",
    tags=("kql",),
)
def k17_kql_filtered_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A longer pipeline exercising where + multi-agg summarize + top:
    the KQL shapes a reference user would write next."""
    return kql(
        "Orders | where amount >= 150 and city != 'Austin' "
        "| summarize n = count(), total = sum(amount) by city "
        "| top 3 by total",
        _orders(spark, sf_dir),
    )


@query(
    "k19_kql_ago_filter",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL '7 days'
GROUP BY event_type
""",
    tags=("kql", "timeseries"),
)
def k19_kql_ago_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ago()`` — the single most common Kusto filter. The anchor is
    injected (kql(..., now=...)) so the differential oracle is
    deterministic; the compiled plan is a plain timestamp range
    predicate, pushable to the scan."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | where ts >= ago(7d) | summarize n = count() by event_type",
        {"Events": events},
        now="2024-01-31 00:00:00",
    )


@query(
    "k20_kql_between",
    oracle=f"""{_OI}
SELECT city, CAST(COUNT(*) AS BIGINT) AS n
FROM orders_info WHERE amount BETWEEN 150 AND 180
GROUP BY city
""",
    tags=("kql",),
)
def k20_kql_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``between (lo .. hi)`` — inclusive range, compiled to two
    scan-pushable comparisons."""
    return kql(
        "Orders | where amount between (150 .. 180) "
        "| summarize n = count() by city",
        _orders(spark, sf_dir),
    )


@query(
    "k21_kql_countif_sumif",
    oracle=f"""{_OI}
SELECT city,
       CAST(SUM(CASE WHEN amount >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS big_n,
       CAST(SUM(CASE WHEN amount >= 150 THEN amount END) AS BIGINT) AS big_total
FROM orders_info GROUP BY city
""",
    tags=("kql",),
)
def k21_kql_countif_sumif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates ``countif``/``sumif`` — indicator sums, so
    they partial-aggregate map-side exactly like plain sums."""
    return kql(
        "Orders | summarize big_n = countif(amount >= 150), "
        "big_total = sumif(amount, amount >= 150) by city",
        _orders(spark, sf_dir),
    )


@query(
    "k22_kql_parse_json",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS total_k
FROM events GROUP BY event_type
""",
    tags=("kql", "json"),
)
def k22_kql_parse_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_json(col).field`` dynamic access — compiles to one
    ``get_json_object`` probe per row (the b15a plan shape), never a
    full-document parse."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | extend k = tolong(parse_json(props).k) "
        "| summarize total_k = sum(k) by event_type",
        {"Events": events},
    )


@query(
    "k23_kql_mv_expand",
    oracle="""
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_elems
FROM (SELECT vec_id, unnest(embedding) FROM embeddings)
GROUP BY vec_id
""",
    tags=("kql", "array"),
)
def k23_kql_mv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mv-expand`` — dynamic-array fan-out over the embedding column
    (explode), counted back per vector to verify the row multiplicity
    exactly."""
    em = load(spark, sf_dir, "embeddings")
    return kql(
        "Embeddings | mv-expand e = embedding "
        "| summarize n_elems = count() by vec_id",
        {"Embeddings": em},
    )


@query(
    "k24_kql_join",
    oracle="""
SELECT c.c_custkey, c.c_name, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY c.c_custkey, c.c_name
""",
    tags=("kql", "join"),
)
def k24_kql_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``join`` with a parenthesized subquery right side and the
    ``$left == $right`` key form — the first verb a real Kusto user
    needs beyond the reference README's surface. The subquery
    pre-aggregates orders per customer, so the join compiles to an
    equi-join on the already-reduced side (Catalyst broadcasts it when
    small); an explicit ``kind=inner`` keeps the result deterministic
    (the Kusto default ``innerunique`` picks an arbitrary left record
    per key)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Customers"
        " | where c_mktsegment == 'BUILDING'"
        " | project c_custkey, c_name"
        " | join kind=inner ("
        "     Orders | summarize n_orders = count() by o_custkey"
        "   ) on $left.c_custkey == $right.o_custkey"
        " | project c_custkey, c_name, n_orders",
        {"Customers": cust, "Orders": orders},
    )


@query(
    "k25_kql_let",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice >= 400000)
""",
    tags=("kql", "join"),
)
def k25_kql_let(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``let`` statements — a scalar constant, a scalar threshold and a
    tabular CTE — feeding a ``kind=leftanti`` join: customers in a
    segment with no big-ticket order. The threshold (400k) is chosen so
    the result is non-empty at every test SF — a 0-row driver check
    verifies nothing. Tabular lets are named sub-plans (no
    materialization); the whole statement collapses into one Catalyst
    plan with the anti-join on the two filtered projections."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return kql(
        "let seg = 'BUILDING';"
        "let minprice = 400000;"
        "let bldg = Customers | where c_mktsegment == seg"
        " | project c_custkey, c_name;"
        "let big = Orders | where o_totalprice >= minprice;"
        "bldg | join kind=leftanti big on $left.c_custkey == $right.o_custkey",
        {"Customers": cust, "Orders": orders},
    )


@query(
    "k26_kql_parse_extract",
    oracle="""
SELECT c_custkey,
       CAST(regexp_extract(c_name, '^Customer#0*(\\d+)', 1) AS BIGINT) AS idn
FROM customer
""",
    tags=("kql", "text"),
)
def k26_kql_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse ... with`` (Kusto simple-mode pattern extraction) plus
    ``extract`` — both compile to one anchored JVM ``regexp_extract``
    per derived column, no UDF. The parsed id round-trips to the key so
    the oracle checks the extraction exactly."""
    cust = load(spark, sf_dir, "customer")
    return kql(
        "Customers"
        " | parse c_name with 'Customer#' idstr"
        " | extend idn = tolong(extract('^0*(\\d+)', 1, idstr))"
        " | project c_custkey, idn",
        {"Customers": cust},
    )


@query(
    "k27_kql_case_tiers",
    oracle="""
SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 150000 THEN 'mid'
            ELSE 'low' END AS tier,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1
""",
    tags=("kql",),
)
def k27_kql_case_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``case()`` — ordered predicate/value pairs compiled to a chained
    when/otherwise; the derived tier is a groupable expression, so the
    aggregation still partial-aggregates map-side."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend tier = case(o_totalprice >= 300000, 'high',"
        "                      o_totalprice >= 150000, 'mid', 'low')"
        " | summarize n = count() by tier",
        {"Orders": orders},
    )


@query(
    "k28_kql_arg_max",
    oracle="""
SELECT o_orderpriority,
       arg_max(o_totalprice, o_orderkey) AS latest_price
FROM orders GROUP BY o_orderpriority
""",
    tags=("kql", "agg"),
)
def k28_kql_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``arg_max`` — the value of one expression at another's maximum,
    compiled to Spark's ``max_by``: a single mergeable struct-max (one
    shuffle, map-side partials), NOT a ranking window. The maximized
    key (o_orderkey) is unique, so the result is deterministic."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | summarize latest_price = arg_max(o_orderkey, o_totalprice)"
        "   by o_orderpriority",
        {"Orders": orders},
    )


@query(
    "k29_kql_make_set",
    oracle="""
SELECT o_orderpriority,
       array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',')
         AS statuses
FROM orders GROUP BY o_orderpriority
""",
    tags=("kql", "agg", "array"),
)
def k29_kql_make_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``make_set`` + ``strcat_array`` + ``project-away`` — the dynamic-
    array aggregation surface. The set is sorted (collect order is
    partition-dependent in any distributed engine) and joined to a
    scalar string so the differential gate can hash it — the b28
    contract, reached through the KQL front end."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | summarize s = make_set(o_orderstatus) by o_orderpriority"
        " | extend statuses = strcat_array(s, ',')"
        " | project-away s",
        {"Orders": orders},
    )


@query(
    "k30_kql_percentile",
    oracle="""
SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50
FROM lineitem GROUP BY l_returnflag
""",
    tags=("kql", "agg"),
)
def k30_kql_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile(col, 50)`` — exact median per group (Spark
    ``percentile`` and DuckDB ``quantile_cont`` share linear
    interpolation; the b27 exactness contract through the KQL front
    end). Kusto's own percentile is approximate — at 100 TB swap in
    ``percentile_approx``, as b27x does."""
    li = load(spark, sf_dir, "lineitem")
    return kql(
        "Lineitem | summarize p50 = percentile(l_extendedprice, 50)"
        " by l_returnflag",
        {"Lineitem": li},
    )


@query(
    "k31_kql_make_series",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.t
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-07 00:00:00',
                                  INTERVAL '1 day')) AS t
  ) g
), binned AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS t,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2
)
SELECT g.event_type,
       array_to_string(list(COALESCE(b.n, 0) ORDER BY g.t), ',') AS series
FROM grid g LEFT JOIN binned b ON g.event_type = b.event_type AND g.t = b.t
GROUP BY g.event_type
""",
    tags=("kql", "timeseries"),
)
def k31_kql_make_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``make-series`` — Kusto's signature time-series materialization:
    per group, a DENSE per-day count array over a fixed window, gaps
    zero-filled. Compiles to bin → per-bin aggregate (one shuffle) →
    per-group map → sequence/transform grid; all JVM expressions, the
    grid is array slots per group, never a row explode. Joined to a
    scalar string for the gate (b28 hashability contract)."""
    events = load(spark, sf_dir, "events")
    out = kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 00:00:00'"
        " step 1d by event_type",
        {"Events": events},
    )
    from pyspark.sql import functions as F

    return out.select(
        "event_type",
        F.array_join(F.transform("n", lambda x: x.cast("string")), ",").alias(
            "series"
        ),
    )


@query(
    "k32_kql_top_nested",
    oracle="""
WITH l1 AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n1
  FROM orders GROUP BY 1
), t1 AS (
  SELECT o_orderpriority, n1 FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY n1 DESC, o_orderpriority ASC) AS r
    FROM l1
  ) WHERE r <= 3
), l2 AS (
  SELECT o.o_orderpriority, o.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n2
  FROM orders o JOIN t1 USING (o_orderpriority) GROUP BY 1, 2
), t2 AS (
  SELECT o_orderpriority, o_orderstatus, n2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY n2 DESC, o_orderstatus ASC) AS r
    FROM l2
  ) WHERE r <= 2
)
SELECT t2.o_orderpriority, t1.n1, t2.o_orderstatus, t2.n2
FROM t2 JOIN t1 USING (o_orderpriority)
""",
    tags=("kql", "agg", "window"),
)
def k32_kql_top_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top-nested`` — hierarchical top-k (top-3 priorities by order
    count, top-2 statuses within each): per level one aggregate plus a
    ranking window partitioned by the parent prefix; the surviving
    prefix set (≤ 3×2 rows) broadcasts into the next level. Ties break
    on the key ascending so the differential gate is deterministic."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders | top-nested 3 of o_orderpriority by n1 = count(),"
        "         top-nested 2 of o_orderstatus by n2 = count()",
        {"Orders": orders},
    )


@query(
    "k18_kql_time_binning",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS t,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
    tags=("kql", "timeseries"),
)
def k18_kql_time_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Kusto time-series shape — ``bin(ts, 1h)`` — on the
    events table; compiles to epoch-floor arithmetic, groupable and
    partition-prunable, matching DuckDB's time_bucket exactly."""
    from ..io import load as _load

    events = _load(spark, sf_dir, "events")
    return kql(
        "Events | summarize n = count() by t = bin(ts, 1h), event_type",
        {"Events": events},
    )


@query(
    "k33_kql_lookup",
    oracle="""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("kql", "join"),
)
def k33_kql_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lookup`` — Kusto's dimension-table join, compiled to an
    explicitly broadcast left join (the dimension contract IS the scale
    contract: the fact side never shuffles, every executor hash-probes
    the dim). Right key columns are dropped from the output, as in
    Kusto; plan test pins BroadcastHashJoin."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return kql(
        "Customer"
        " | lookup Nation on $left.c_nationkey == $right.n_nationkey"
        " | summarize n_cust = count() by n_name",
        {"Customer": c, "Nation": n},
    )


@query(
    "k34_kql_mv_apply",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n,
       CAST(list_max(list_filter(embedding, x -> x > 0)) AS DOUBLE) AS mx
FROM embeddings
""",
    tags=("kql", "array"),
)
def k34_kql_mv_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mv-apply`` — per-record sub-pipeline over a dynamic array.
    Compiled WITHOUT the expand: ``where`` becomes a JVM higher-order
    ``filter()`` over the array and the re-aggregation is an array fold
    (``size``/``array_max``) — the row never stops being one row, so
    the Kusto expand+regroup costs zero shuffle and zero explode. At
    100 TB that is a narrow map stage vs 64× the corpus through an
    exchange. Only order-independent aggregates (count/max) are used so
    the float→double differential is bit-exact."""
    em = load(spark, sf_dir, "embeddings")
    return kql(
        "Embeddings"
        " | mv-apply e = embedding to typeof(real) on"
        "   (where e > 0 | summarize n = count(), mx = max(e))"
        " | project vec_id, n, mx",
        {"Embeddings": em},
    )


@query(
    "k35_kql_pivot",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority
""",
    tags=("kql", "agg"),
)
def k35_kql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate pivot`` — one output column per pivot value. Spark
    runs a bounded distinct-values job to fix the schema, then ONE
    aggregate pass with map-side partials; the oracle declares the
    status values (F/O/P) statically. Every priority×status cell is
    populated at the tested SFs, so COUNT's 0-vs-NULL edge never
    arises."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders | project o_orderpriority, o_orderstatus"
        " | evaluate pivot(o_orderstatus)",
        {"Orders": orders},
    )


@query(
    "k36_kql_top_hitters",
    oracle=f"""{_OI}
SELECT city, CAST(SUM(amount) AS BIGINT) AS approximate_sum_amount
FROM orders_info GROUP BY city
ORDER BY approximate_sum_amount DESC, city LIMIT 3
""",
    tags=("kql", "reference", "agg"),
)
def k36_kql_top_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top-hitters`` — heavy-hitters over the reference's orders_info
    feed. Compiled exactly (mergeable SUM with map-side partials, then
    TakeOrderedAndProject) rather than approximately — the same
    deliberate exactness choice as dcount; ties break on the key
    ascending for a deterministic differential."""
    return kql(
        "Orders | top-hitters 3 of city by amount",
        _orders(spark, sf_dir),
    )


@query(
    "k37_kql_search",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE lower(o_orderstatus) LIKE '%urgent%'
   OR lower(o_orderpriority) LIKE '%urgent%'
GROUP BY o_orderstatus
""",
    tags=("kql", "filter"),
)
def k37_kql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``search`` — unscoped case-insensitive containment over every
    string column (here: o_orderstatus, o_orderpriority). Compiles to
    one OR-chain of contains() probes — a single narrow scan, no UDF;
    at rest this is exactly the predicate a bloom/zonemap skip
    accelerates."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders | search 'urgent' | summarize n = count() by o_orderstatus",
        {"Orders": orders},
    )


@query(
    "k38_kql_range_source",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS s,
       MAX(x) AS mx
FROM generate_series(1, 100000, 7) t(x)
""",
    tags=("kql", "source"),
)
def k38_kql_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``range`` tabular source — the inclusive arithmetic sequence is
    GENERATED on executors (``spark.range`` + affine projection), never
    materialized on the driver: a billion-row range is a parallel
    source, not a literal."""
    return kql(
        "range x from 1 to 100000 step 7"
        " | summarize n = count(), s = sum(x), mx = max(x)",
        {},
    )


@query(
    "k39_kql_scalar_strings",
    oracle="""
SELECT o_orderkey,
       CAST(strpos(o_orderpriority, '-') - 1 AS BIGINT) AS idx,
       CAST(length(o_orderpriority)
            - length(replace(o_orderpriority, 'E', '')) AS BIGINT) AS cnt,
       replace(o_orderpriority, '-', '_') AS rep,
       array_to_string(string_split(o_orderpriority, '-'), '~') AS parts,
       regexp_replace(o_orderpriority, '^(?:[0-9-])+|(?:[0-9-])+$', '', 'g')
         AS core
FROM orders
""",
    tags=("kql", "scalar"),
)
def k39_kql_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-scalar surface: ``indexof`` (0-based, vs instr's 1-based),
    ``countof`` (occurrence count via a length-delta erase — one JVM
    expression, no UDF), ``replace_string`` (plain-text, not regex),
    ``split`` + ``strcat_array`` round-trip, and regex ``trim``. All
    whole-stage-codegen string expressions."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend idx = indexof(o_orderpriority, '-'),"
        "   cnt = countof(o_orderpriority, 'E'),"
        "   rep = replace_string(o_orderpriority, '-', '_'),"
        "   parts = strcat_array(split(o_orderpriority, '-'), '~'),"
        "   core = trim('[0-9-]', o_orderpriority)"
        " | project o_orderkey, idx, cnt, rep, parts, core",
        {"Orders": orders},
    )


@query(
    "k40_kql_datetime_scalars",
    oracle="""
SELECT CAST(month(ts) AS BIGINT) AS m,
       CAST(CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS TIMESTAMP)
         AS w,
       date_trunc('day', ts) AS d,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2, 3
""",
    tags=("kql", "timeseries", "scalar"),
)
def k40_kql_datetime_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-scalar surface: ``datetime_part`` (compiled to
    ``date_part``), ``startofweek`` (Kusto weeks are SUNDAY-anchored —
    Spark's ``date_trunc('week')`` is Monday-based, so the compiler
    anchors on ``dayofweek`` instead; the oracle mirrors with DuckDB's
    Sunday=0 ``dayofweek``), and ``startofday``."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | project m = datetime_part('month', ts), w = startofweek(ts),"
        "   d = startofday(ts)"
        " | summarize n = count() by m, w, d",
        {"Events": events},
    )


@query(
    "k41_kql_serialized_windows",
    oracle="""
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn,
       lag(o_totalprice) OVER (ORDER BY o_orderkey) AS prv,
       CAST(SUM(o_orderkey) OVER (ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum
FROM orders
""",
    tags=("kql", "window"),
)
def k41_kql_serialized_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto's serialized window functions — ``row_number``/``prev``/
    ``row_cumsum`` after ``sort by`` (whose output is serialized, as in
    Kusto). Compiled to a Spark window over the recorded sort keys.
    SCALE NOTE: a global ordered window is a single task — identical to
    Kusto's single-node serialized operators; at 100 TB use these after
    a row-bounding stage (top/take/summarize), not on the raw fact
    table. The sort key is unique, so lag/cumsum are deterministic."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders | sort by o_orderkey asc"
        " | extend rn = row_number(), prv = prev(o_totalprice),"
        "   cum = row_cumsum(o_orderkey)"
        " | project o_orderkey, rn, prv, cum",
        {"Orders": orders},
    )


@query(
    "k42_kql_parse_where",
    oracle=r"""
SELECT string_split(o_orderpriority, '-')[1] AS head,
       regexp_extract(o_orderpriority, '^(.*?)\-NOT (.*)', 2) AS rest,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE regexp_matches(o_orderpriority, '^(.*?)\-NOT (.*)')
GROUP BY 1, 2
""",
    tags=("kql", "scalar", "filter"),
)
def k42_kql_parse_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse-where`` (pattern extraction that DROPS non-matching rows
    — one rlike filter plus per-capture regexp_extract, all pushed
    JVM expressions) composed with 0-based dynamic array indexing
    (``split(x, '-')[0]`` compiles to ``getItem``)."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend head = split(o_orderpriority, '-')[0]"
        " | parse-where o_orderpriority with num '-NOT ' rest"
        " | summarize n = count() by head, rest",
        {"Orders": orders},
    )


@query(
    "k43_kql_top_by_expr",
    oracle="""
SELECT o_orderkey, rn FROM (
  SELECT o_orderkey,
         CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey * 2 + 1 DESC) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 5
""",
    tags=("kql", "topk"),
)
def k43_kql_top_by_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top N by <expr>`` with a scalar expression key (round-5 verb
    sweep): compiles to TakeOrderedAndProject on the computed key —
    the same no-global-sort plan as column-keyed top — and the output
    is serialized, so ``row_number()`` works directly after it. The
    key expression is injective over orderkey, making the selection
    deterministic without a secondary sort key (Kusto ``top`` takes
    exactly one expression)."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | top 5 by o_orderkey * 2 + 1"
        " | extend rn = row_number()"
        " | project o_orderkey, rn",
        {"Orders": orders},
    )


@query(
    "k44_kql_count_and_distinct_star",
    oracle=f"""{_OI}
SELECT CAST(COUNT(*) AS BIGINT) AS "Count"
FROM (SELECT DISTINCT * FROM orders_info)
""",
    tags=("kql", "agg"),
)
def k44_kql_count_and_distinct_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``distinct *`` piped into terminal ``count`` (round-5 verb
    sweep): the all-columns dedup + Kusto's exact `Count` column
    naming, both audited against Kusto semantics this round."""
    return kql("Orders | distinct * | count", _orders(spark, sf_dir))


@query(
    "k45_kql_find",
    oracle=f"""{_OI}
SELECT * FROM (
  SELECT 'Orders' AS source_, CAST(orderid AS VARCHAR) AS orderid, amount
  FROM orders_info WHERE amount > 190
  UNION ALL
  SELECT 'Nations', 'n-' || CAST(n_nationkey AS VARCHAR), NULL
  FROM nation WHERE n_nationkey > 1000000
)
""",
    tags=("kql", "search"),
)
def k45_kql_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``find in (T1, T2) where pred`` (round-5 verb sweep): cross-
    table search — per-table filter (pushdown preserved per branch),
    name-aligned union with null fill, ``source_`` provenance column.
    Nations lacks ``amount``, so it contributes no rows — asserted by
    the oracle's vacuous second branch."""
    oi = orders_info(load(spark, sf_dir, "orders")).select(
        "orderid", "amount"
    )
    nations = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = kql(
        "find in (Orders, Nations) where amount > 190",
        {"Orders": oi, "Nations": nations},
    )
    import pyspark.sql.functions as F

    return out.select(
        "source_", F.col("orderid").cast("string").alias("orderid"), "amount"
    )


@query(
    "k46_kql_partition",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
  FROM orders
) WHERE rn <= 2
""",
    tags=("kql", "topk", "partition"),
)
def k46_kql_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto's ``partition`` operator — per-partition subqueries —
    for its dominant real shape, top-k per key: the two most recent
    orders (by orderkey, an injective sort key, so the selection is
    deterministic) for EVERY customer. Compiled to
    row_number-over-window <= N, which Catalyst executes as
    WindowGroupLimit: per-group partial top-k on the map side BEFORE
    the one shuffle on the partition key — the same plan pinned for
    b39's LATERAL. No per-key re-execution, no driver loop — the ADX
    semantics on a scale-correct physical plan."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | partition by o_custkey ( top 2 by o_orderkey )"
        " | project o_custkey, o_orderkey, o_totalprice",
        {"Orders": orders},
    )


@query(
    "k47_kql_top_nested_others",
    oracle=f"""{_OI},
totals AS (
  SELECT city, CAST(SUM(amount) AS BIGINT) AS total
  FROM orders_info GROUP BY city
), top3 AS (
  SELECT city, total FROM totals
  ORDER BY total DESC, city LIMIT 3
)
SELECT city, total FROM top3
UNION ALL
SELECT 'Other', CAST(SUM(total) AS BIGINT) FROM totals
WHERE city NOT IN (SELECT city FROM top3)
""",
    tags=("kql", "topk", "agg"),
)
def k47_kql_top_nested_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top-nested N of col with others = "label" by agg`` — the
    dashboard staple (top 3 cities + an "Other" bucket that keeps the
    report summing to 100%). The Others row re-aggregates the
    non-surviving keys' values — valid because the aggregate is
    additive; the compiler REFUSES non-additive aggregates under
    `with others` and refuses deeper levels after an others bucket
    (which would descend into a synthetic key) — explicit errors, not
    silent mis-aggregation.

    Plan: the level's one grouped aggregate is shared by the top-k
    window and the Others residual (an anti join against the ≤N
    broadcast survivors + one tiny re-sum) — no second scan of the
    fact table."""
    return kql(
        'Orders | top-nested 3 of city with others = "Other" by '
        "total = sum(amount)",
        _orders(spark, sf_dir),
    )


@query(
    "k48_kql_dcountif_stdev",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END)
            AS BIGINT) AS hi_users,
       CAST(SUM(CASE WHEN value > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_extreme,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS all_users
FROM events GROUP BY event_type
""",
    tags=("kql", "agg"),
)
def k48_kql_dcountif_stdev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dcountif(col, pred)`` (round-6 aggregate sweep, alongside new
    ``stdev``/``variance`` — exercised in tests/test_kql.py since
    sample-stddev doubles are not hash-portable): conditional distinct
    count compiles to ONE mergeable ``countDistinct(when(pred, col))``
    — the WHEN's null else-arm is skipped by count-distinct, so no
    second aggregate pass and no join, exactly how the unconditional
    ``dcount`` lowers."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | summarize hi_users = dcountif(user_id, value > 50), "
        "n_extreme = countif(value > 90), all_users = dcount(user_id) "
        "by event_type",
        {"Events": events},
    )


@query(
    "k49_kql_shufflekey_hint",
    oracle="""
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       MAX(value) AS maxv
FROM events GROUP BY user_id, event_type
""",
    tags=("kql", "agg", "hint", "scale"),
)
def k49_kql_shufflekey_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto's ``summarize hint.shufflekey = key`` — the
    high-cardinality aggregation hint (ADX docs prescribe it exactly
    for group keys so distinct that map-side partials reduce nothing).
    Compiled to ONE explicit repartition on the hinted key before the
    groupBy: hash-partitioning on a SUBSET of the group keys satisfies
    the aggregate's ClusteredDistribution, so EnsureRequirements adds
    no second Exchange — plan-pinned in tests/test_plans.py as exactly
    one Exchange, hashpartitioning(user_id) alone, REPARTITION_BY_COL.
    At 100 TB this is the knob that puts the one unavoidable shuffle on
    the key whose locality you want (e.g. the follow-up join key),
    instead of the full composite. Values are hint-independent —
    max/count are order-free — which is what the oracle proves."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | summarize hint.shufflekey = user_id cnt = count(), "
        "maxv = max(value) by user_id, event_type",
        {"Events": events},
    )


@query(
    "k50_kql_join_strategy_hint",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("kql", "join", "hint", "scale"),
)
def k50_kql_join_strategy_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``join hint.strategy = broadcast`` — Kusto's broadcast-join hint,
    lowered to Spark's own advisory broadcast hint on the sub-pipeline
    side (``hint.strategy = shuffle`` lowers to ``shuffle_hash`` the
    same way; both stay advisory, Catalyst keeps final say, so an
    un-broadcastable side degrades to a legal plan instead of an OOM —
    the failure mode a hard-pinned broadcast has at 100 TB).
    Plan-pinned as BroadcastHashJoin with zero shuffle on the fact
    side's join input. The dimension side here is customer — the
    classic small-dim star-join shape the hint exists for."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return kql(
        "Orders"
        " | join kind=inner hint.strategy=broadcast ( Customers )"
        " on $left.o_custkey == $right.c_custkey"
        " | extend cents_1 = toint(round(o_totalprice * 100))"
        " | summarize n = count(), cents = sum(cents_1) by c_mktsegment",
        {"Orders": orders, "Customers": customer},
    )


@query(
    "k51_kql_conditional_agg_sweep",
    oracle="""
SELECT event_type,
       MIN(CASE WHEN value > 50 THEN value END) AS lo_hi,
       MAX(CASE WHEN value <= 50 THEN value END) AS hi_lo,
       MIN_BY(user_id, event_id) AS first_user,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
    tags=("kql", "agg"),
)
def k51_kql_conditional_agg_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 aggregate sweep: ``minif``/``maxif`` (with ``avgif``
    exercised in tests/test_kql.py against a pandas recompute, since
    averaged doubles are not hash-portable) plus ``arg_min`` — closing
    the Kusto conditional-aggregate family (`countif`/`sumif`/
    `dcountif` landed earlier). Each lowers to ONE mergeable aggregate
    over ``when(pred, col)`` — null else-arms are ignored by min/max/
    avg, so no second pass and no join; ``arg_min`` is Spark's
    ``min_by`` struct-min, one shuffle, no window. event_id is unique,
    so the arg_min pick is deterministic."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | summarize lo_hi = minif(value, value > 50), "
        "hi_lo = maxif(value, value <= 50), "
        "first_user = arg_min(event_id, user_id), "
        "n = count() by event_type",
        {"Events": events},
    )


@query(
    "k52_kql_bag_unpack",
    oracle="""
WITH bagged AS (
  SELECT event_id,
         '{"city":"' || CASE WHEN user_id % 3 = 0 THEN 'austin'
                             WHEN user_id % 3 = 1 THEN 'boston'
                             ELSE 'chicago' END
           || '","tier":' || CAST(user_id % 4 AS VARCHAR)
           || ',"kv":' || CAST(json_extract_string(props, '$.k') AS VARCHAR)
           || '}' AS bag
  FROM events
), unpacked AS (
  SELECT event_id,
         json_extract_string(bag, '$.city') AS city,
         json_extract_string(bag, '$.kv') AS kv,
         json_extract_string(bag, '$.tier') AS tier
  FROM bagged
)
SELECT city, tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(kv AS BIGINT)) AS BIGINT) AS kv_total
FROM unpacked GROUP BY city, tier
""",
    tags=("kql", "json", "dynamic"),
)
def k52_kql_bag_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate bag_unpack(col)`` — Kusto's schema-on-read expansion
    of a dynamic property bag into real columns. The bag here carries
    three keys (a derived city, a tier, and the original props value),
    so discovery genuinely infers a multi-key schema. Cost model
    mirrors `evaluate pivot`: one bounded key-vocabulary job fixes the
    output schema, then the expansion is pure codegen get_json_object
    probes (the b15a/k22 plan shape — no per-row parse
    materialization). Leaves are strings (Kusto dynamic-leaf
    behavior); the follow-up summarize casts and aggregates them,
    proving the unpacked columns compose with the rest of the
    dialect."""
    events = load(spark, sf_dir, "events")
    bagged = events.select(
        "event_id",
        F.to_json(
            F.struct(
                F.when(F.col("user_id") % 3 == 0, "austin")
                .when(F.col("user_id") % 3 == 1, "boston")
                .otherwise("chicago")
                .alias("city"),
                (F.col("user_id") % 4).alias("tier"),
                F.get_json_object("props", "$.k")
                .cast("bigint")
                .alias("kv"),
            )
        ).alias("bag"),
    )
    return kql(
        "Events | evaluate bag_unpack(bag) "
        "| summarize n = count(), kv_total = sum(tolong(kv)) by city, tier",
        {"Events": bagged},
    )


@query(
    "k53_kql_series_stats",
    oracle="""
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts < TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT t.event_type,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i) DAY AS d
  FROM types t, unnest(generate_series(0, 6)) AS g(i)
), dense AS (
  SELECT g.event_type, COALESCE(daily.n, 0) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
)
SELECT event_type,
       CAST(MIN(n) AS BIGINT) AS smin,
       CAST(MAX(n) AS BIGINT) AS smax,
       CAST(SUM(n) AS BIGINT) AS total,
       CAST(COUNT(*) AS BIGINT) AS slen
FROM dense GROUP BY event_type
""",
    tags=("kql", "timeseries", "dynamic"),
)
def k53_kql_series_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_stats_dynamic`` — Kusto's series summary bag — composed
    with ``make-series`` and ``evaluate bag_unpack`` end to end: build
    the dense per-type daily series, summarize each array into a
    dynamic bag (JVM folds, no explode), unpack the bag into columns,
    and project the integer-safe statistics (avg/stdev are double-
    formatted JSON leaves, exercised in tests/test_kql.py instead —
    the k48 stdev discipline). Three dialect features that each
    compile to pure Catalyst expressions chain without a single extra
    shuffle beyond make-series' one per-bin aggregate."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 00:00:00'"
        " step 1d by event_type"
        " | extend s = series_stats_dynamic(n)"
        " | project-away n"
        " | evaluate bag_unpack(s)"
        " | project event_type, smin = tolong(todouble(min)),"
        " smax = tolong(todouble(max)), total = tolong(todouble(sum)),"
        " slen = tolong(len)",
        {"Events": events},
    )


@query(
    "k54_kql_scan_funnel",
    oracle="""
WITH RECURSIVE coded AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 3 ELSE 0 END AS x
  FROM events
), walk AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS state,
         CAST(0 AS BIGINT) AS rows_m, CAST(0 AS BIGINT) AS matches
  FROM (SELECT DISTINCT user_id FROM coded)
  UNION ALL
  SELECT c.user_id, c.rn,
         CASE WHEN c.x = w.state + 1 THEN (w.state + 1) % 3
              ELSE w.state END,
         w.rows_m + CASE WHEN c.x = w.state + 1 THEN 1 ELSE 0 END,
         w.matches + CASE WHEN c.x = w.state + 1 AND w.state = 2
                          THEN 1 ELSE 0 END
  FROM walk w JOIN coded c ON c.user_id = w.user_id AND c.rn = w.rn + 1
)
SELECT w.user_id, w.rows_m AS n_matched_rows, w.matches AS n_matches
FROM walk w
JOIN (SELECT user_id, max(rn) AS mx FROM coded GROUP BY user_id) t
  ON t.user_id = w.user_id AND w.rn = t.mx
WHERE w.rows_m > 0
""",
    tags=("kql", "scan", "stateful"),
)
def k54_kql_scan_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto's ``scan`` sequence-match operator, deployed the way real
    Kusto pipelines deploy it — inside ``partition by`` so every key's
    state machine runs independently and in parallel: per user (sorted
    by event time) a greedy view→click→purchase automaton advances on
    each step's predicate, emits the matched rows annotated with the
    step name, and resets on completion. The pipeline then rolls up
    matched-row and completed-sequence counts per user — the
    process-mining workload ``scan`` exists for.

    Compilation (kql.py:_compile_scan): step predicates are ordinary
    KQL expressions lowered to Catalyst columns and JVM-evaluated
    BEFORE the Python boundary; only the intrinsically-sequential walk
    runs in an Arrow applyInPandas, one shuffle on the partition key.
    The oracle replays the identical automaton as a DuckDB recursive
    CTE stepping one event position per iteration and carrying the
    (state, advances, completions) triple — two independent
    implementations of the same state machine must agree on every
    user. (A list_reduce fold was rejected: DuckDB 1.0.0 returns
    cross-row-corrupted accumulators when several rows fold in one
    vector batch — verified by folding the identical list alone vs in
    a batch.)

    Supported subset documented at kql.py (partition verb): single
    active sequence per key (greedy non-overlapping matching); Kusto's
    simultaneous-sequence ``declare()`` semantics and global serialized
    scans are out of scope by design."""
    ev = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | partition by user_id ( sort by ts asc, event_id asc"
        "   | scan with (step view: event_type == 'view';"
        "                step click: event_type == 'click';"
        "                step purchase: event_type == 'purchase') )"
        " | summarize n_matched_rows = count(),"
        "             n_matches = countif(step == 'purchase') by user_id",
        {"Events": ev},
    )


@query(
    "k55_kql_series_outliers",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.t
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-29 00:00:00',
                                  INTERVAL '1 day')) AS t
  ) g
), binned AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS t,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
  GROUP BY 1, 2
), ser AS (
  SELECT g.event_type, list(COALESCE(b.n, 0) ORDER BY g.t) AS xs
  FROM grid g LEFT JOIN binned b
    ON g.event_type = b.event_type AND g.t = b.t
  GROUP BY g.event_type
), qq AS (
  SELECT event_type, xs, list_sort(xs) AS s, len(xs) AS n FROM ser
), qv AS (
  SELECT event_type, xs,
    s[CAST(FLOOR((n-1)*CAST(0.1 AS DOUBLE)) AS INT)+1] * (1 - ((n-1)*CAST(0.1 AS DOUBLE) - FLOOR((n-1)*CAST(0.1 AS DOUBLE))))
      + s[LEAST(CAST(FLOOR((n-1)*CAST(0.1 AS DOUBLE)) AS INT)+2, n)]
        * ((n-1)*CAST(0.1 AS DOUBLE) - FLOOR((n-1)*CAST(0.1 AS DOUBLE))) AS q10,
    s[CAST(FLOOR((n-1)*CAST(0.5 AS DOUBLE)) AS INT)+1] * (1 - ((n-1)*CAST(0.5 AS DOUBLE) - FLOOR((n-1)*CAST(0.5 AS DOUBLE))))
      + s[LEAST(CAST(FLOOR((n-1)*CAST(0.5 AS DOUBLE)) AS INT)+2, n)]
        * ((n-1)*CAST(0.5 AS DOUBLE) - FLOOR((n-1)*CAST(0.5 AS DOUBLE))) AS q50,
    s[CAST(FLOOR((n-1)*CAST(0.9 AS DOUBLE)) AS INT)+1] * (1 - ((n-1)*CAST(0.9 AS DOUBLE) - FLOOR((n-1)*CAST(0.9 AS DOUBLE))))
      + s[LEAST(CAST(FLOOR((n-1)*CAST(0.9 AS DOUBLE)) AS INT)+2, n)]
        * ((n-1)*CAST(0.9 AS DOUBLE) - FLOOR((n-1)*CAST(0.9 AS DOUBLE))) AS q90
  FROM qq
)
SELECT event_type,
  array_to_string(list_transform(xs, x -> CAST(x AS VARCHAR)), ',')
    AS series,
  array_to_string(list_transform(xs, x -> CAST(CAST(FLOOR(
    CASE WHEN q90 = q10 THEN 0.0
         WHEN x > q90 OR x < q10 THEN (x - q50) / (q90 - q10)
         ELSE 0.0 END * 1e6) AS BIGINT) AS VARCHAR)), ',') AS scores
FROM qv
""",
    tags=("kql", "timeseries", "anomaly"),
)
def k55_kql_series_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_outliers`` over a ``make-series`` array — Kusto's
    series anomaly scoring, under this engine's deterministic
    Tukey-fence definition (kql.py:_series_outliers: 0 inside
    [q10, q90], else (x - q50)/(q90 - q10), linearly interpolated
    percentiles): per event_type, 29 daily counts are scored and the
    outlier days surface as non-zero entries.

    All array work is JVM expressions on the make-series output (sort
    + fold + transform — no explode, no Python, no extra shuffle past
    make-series' one per-bin aggregate). The oracle rebuilds the dense
    grid relationally and applies the identical interpolation/scoring
    formulas to DuckDB lists; scores are floor-quantized to micro
    units on both sides (b28 hashability contract via array_join)."""
    events = load(spark, sf_dir, "events")
    out = kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-30 00:00:00'"
        " step 1d by event_type"
        " | extend sc = series_outliers(n)",
        {"Events": events},
    )
    return out.select(
        "event_type",
        F.array_join(
            F.transform("n", lambda x: x.cast("string")), ","
        ).alias("series"),
        F.array_join(
            F.transform(
                "sc",
                lambda x: F.floor(x * F.lit(1e6)).cast("bigint").cast(
                    "string"
                ),
            ),
            ",",
        ).alias("scores"),
    )


@query(
    "k56_kql_basket",
    oracle="""
WITH b AS (
  SELECT event_type,
         CASE WHEN value >= 500 THEN 'high' ELSE 'low' END AS vband,
         CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 'am' ELSE 'pm' END
           AS period
  FROM events
), t AS (SELECT COUNT(*) AS n FROM b),
u AS (
  SELECT event_type, CAST(NULL AS VARCHAR) AS vband,
         CAST(NULL AS VARCHAR) AS period, COUNT(*) AS c
  FROM b GROUP BY 1
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), vband, CAST(NULL AS VARCHAR), COUNT(*)
  FROM b GROUP BY 2
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), period, COUNT(*)
  FROM b GROUP BY 3
  UNION ALL
  SELECT event_type, vband, CAST(NULL AS VARCHAR), COUNT(*)
  FROM b GROUP BY 1, 2
  UNION ALL
  SELECT event_type, CAST(NULL AS VARCHAR), period, COUNT(*)
  FROM b GROUP BY 1, 3
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), vband, period, COUNT(*)
  FROM b GROUP BY 2, 3
)
SELECT u.event_type, u.vband, u.period,
       CAST(u.c AS BIGINT) AS Count,
       ROUND(u.c / CAST(t.n AS DOUBLE) * 100, 4) AS Percent
FROM u, t
WHERE u.c >= CEIL(0.1 * t.n)
""",
    tags=("kql", "itemsets", "segmentation"),
)
def k56_kql_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate basket`` — Kusto's frequent-segment plugin under
    this engine's depth-2-exact contract (kql.py:_compile_basket): all
    attribute combinations of size 1-2 over (event_type, value band,
    am/pm period) with support >= 10%, one row per frequent itemset
    with member values filled, Count and Percent.

    Plan: k + C(k,2) masked struct copies per row (JVM array +
    explode — blowup bounded by the attribute count), ONE map-side-
    combined groupBy over every itemset at once, plus one bounded
    COUNT(*) for the support floor. The oracle enumerates the same
    lattice as six relational GROUP BY branches — structurally
    different plans, identical counts."""
    ev = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | project event_type,"
        "   vband = iff(value >= 500, 'high', 'low'),"
        "   period = iff(hourofday(ts) < 12, 'am', 'pm')"
        " | evaluate basket(0.1)",
        {"Events": ev},
    )


@query(
    "k57_kql_reduce_by",
    oracle="""
WITH lines AS (
  SELECT event_type || ' user=' || CAST(user_id AS VARCHAR)
         || ' amt=' || CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR)
           AS line
  FROM events
)
SELECT regexp_replace(line, '[0-9]+', '*', 'g') AS Pattern,
       CAST(COUNT(*) AS BIGINT) AS Count,
       MIN(line) AS Representative
FROM lines GROUP BY 1
""",
    tags=("kql", "patterns", "observability"),
)
def k57_kql_reduce_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``reduce by`` — Kusto's log-pattern clustering, under this
    engine's deterministic core (kql.py, reduce verb): synthesize the
    log line every service emits (type + user + amount), collapse
    digit runs to '*', group by the resulting pattern with count and
    the smallest raw line as the replay-stable exemplar. Kusto's
    plugin groups by an undocumented similarity heuristic; the pinned
    digit-run rule is the deterministic 90% of its real use
    (divergence documented at the verb).

    One map-side-combined groupBy over a codegen regexp_replace — no
    Python, no second scan; the pattern table is observability-sized
    (distinct shapes, not rows)."""
    ev = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | project line = strcat(event_type, ' user=',"
        "     tostring(user_id), ' amt=', tostring(tolong(floor(value))))"
        " | reduce by line",
        {"Events": ev},
    )


@query(
    "k58_kql_mv_expand_typed",
    oracle="""
SELECT vec_id,
       CAST(t.i - 1 AS BIGINT) AS i,
       CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS e
FROM embeddings,
     UNNEST(range(1, least(3, len(embedding)) + 1)) AS t(i)
WHERE vec_id < 100
""",
    tags=("kql", "array"),
)
def k58_kql_mv_expand_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mv-expand with_itemindex = i e = embedding to typeof(real)
    limit 3`` — Kusto's full expansion form (kql.py, mv-expand verb):
    0-based element index via posexplode, typed elements, and the
    per-RECORD expansion cap. The cap compiles to a slice BEFORE the
    generator, so a hot record's oversized array never fans out — the
    bound that keeps one pathological row from exploding a partition
    at 100 TB. Oracle replays with generate_series-with-ordinality."""
    em = load(spark, sf_dir, "embeddings")
    return kql(
        "Embeddings"
        " | where vec_id < 100"
        " | mv-expand with_itemindex = i e = embedding"
        "     to typeof(real) limit 3"
        " | project vec_id, i = tolong(i), e",
        {"Embeddings": em},
    )


@query(
    "k59_kql_narrow",
    oracle="""
WITH agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
), ordered AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS r
  FROM agg
)
SELECT r AS Row, 'event_type' AS Column, event_type AS Value FROM ordered
UNION ALL
SELECT r AS Row, 'n' AS Column, CAST(n AS VARCHAR) AS Value FROM ordered
""",
    tags=("kql", "unpivot"),
)
def k59_kql_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate narrow()`` — Kusto's generic unpivot plugin (kql.py,
    evaluate narrow): every column of the serialized input becomes a
    (Row, Column, Value) string triple, Row being the 0-based row
    index of the REQUIRED preceding sort (a distributed engine has no
    implicit order to narrow by). Compiled to one ordering window +
    one inline array<struct> explode — fan-out factor is the schema
    width, a constant; only long/string columns are narrowed here so
    the Value stringification is engine-portable (double formatting
    is not a cross-engine contract)."""
    ev = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | summarize n = count() by event_type"
        " | sort by event_type asc"
        " | evaluate narrow()",
        {"Events": ev},
    )


@query(
    "k60_kql_series_fir",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.t,
         ROW_NUMBER() OVER (PARTITION BY et.event_type ORDER BY g.t) - 1
           AS i
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-07 00:00:00',
                                  INTERVAL '1 day')) AS t
  ) g
), binned AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS t,
         COUNT(*) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2
), series AS (
  SELECT g.event_type, g.i, COALESCE(b.n, 0) AS n
  FROM grid g LEFT JOIN binned b
    ON g.event_type = b.event_type AND g.t = b.t
)
SELECT event_type, CAST(i AS BIGINT) AS i,
       CAST(COALESCE(LAG(n, 2) OVER w, 0)
            + 2 * COALESCE(LAG(n, 1) OVER w, 0)
            + n AS DOUBLE) AS y
FROM series
WINDOW w AS (PARTITION BY event_type ORDER BY i)
""",
    tags=("kql", "timeseries", "dsp"),
)
def k60_kql_series_fir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_fir`` — Kusto's FIR filter over make-series arrays
    (kql.py:_series_fir): the trailing [1,2,1] smoothing kernel over
    the per-type daily count series, unpacked back to rows through the
    typed mv-expand so the oracle (a LAG-weighted window sum over the
    dense grid) can pin every element exactly — integer taps, integer
    counts, zero-padded edges, no rounding anywhere. The whole
    pipeline — dense grid, filter, unpack — is one Catalyst plan: bin
    rollup shuffle, per-group array ops, one generator."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 00:00:00'"
        " step 1d by event_type"
        " | extend y = series_fir(n, dynamic([1, 2, 1]))"
        " | mv-expand with_itemindex = i y to typeof(real)"
        " | project event_type, i = tolong(i), y",
        {"Events": events},
    )


@query(
    "k61_kql_toscalar",
    oracle=f"""{_OI}
SELECT city, CAST(COUNT(*) AS BIGINT) AS n_above
FROM orders_info
WHERE amount > (SELECT SUM(amount) / CAST(COUNT(*) AS DOUBLE)
                FROM orders_info)
GROUP BY city
""",
    tags=("kql", "subquery"),
)
def k61_kql_toscalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``toscalar()`` — Kusto's scalar subquery (kql.py,
    _resolve_toscalar): the inner pipeline compiles through the same
    compiler, is evaluated once (bounded: its contract is exactly one
    row, one column), and substitutes back as a typed literal — the
    plan Catalyst itself builds for an uncorrelated scalar subquery,
    with the evaluation made explicit. Orders strictly above the
    average amount, counted per city; the integer amounts make the
    average bit-identical in both engines (exact integer sum / exact
    count)."""
    return kql(
        "Orders"
        " | where amount > toscalar(Orders | summarize avg(amount))"
        " | summarize n_above = count() by city",
        _orders(spark, sf_dir),
    )


@query(
    "k62_kql_extract_all",
    oracle="""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '([a-z]{4,})', 1)))
            AS BIGINT) AS n_long_words,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
""",
    tags=("kql", "regex", "text"),
)
def k62_kql_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``extract_all`` — Kusto's multi-match regex extraction (kql.py,
    extract_all): every >=4-letter word in each document as a dynamic
    array (one capture group returns the captures), folded to per-lang
    totals. One JVM regexp_extract_all pass fused into the scan; the
    oracle is DuckDB's regexp_extract_all with the identical pattern
    (the RE2 ∩ Java portable subset, the d21 contract)."""
    docs = load(spark, sf_dir, "documents")
    return kql(
        "Docs"
        " | extend words = extract_all('([a-z]{4,})', text)"
        " | summarize n_long_words = sum(array_length(words)),"
        "   n_docs = count() by lang",
        {"Docs": docs},
    )


@query(
    "k63_kql_bin_at_percentiles",
    oracle="""
WITH binned AS (
  SELECT TIMESTAMP '2024-01-01 06:00:00'
           + to_seconds(CAST(FLOOR((epoch(ts)
               - epoch(TIMESTAMP '2024-01-01 06:00:00')) / 86400)
               * 86400 AS BIGINT)) AS day6,
         value
  FROM events
), q AS (
  SELECT day6, quantile_cont(value, [0.5, 0.9, 0.99]) AS p,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM binned GROUP BY day6
)
SELECT day6, CAST(t.i - 1 AS BIGINT) AS i,
       p[CAST(t.i AS INT)] AS pv, n
FROM q, UNNEST(range(1, 4)) AS t(i)
""",
    tags=("kql", "timeseries", "percentiles"),
)
def k63_kql_bin_at_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bin_at`` + ``percentiles_array`` — Kusto's anchored binning
    (buckets aligned to an arbitrary fixed point: 06:00-based
    operational days here, fiscal weeks in general) and the
    multi-percentile aggregate returned as ONE dynamic array (the
    single per-group sort is shared by all requested percentiles,
    where N separate percentile() calls would each pay it). Unpacked
    through the typed mv-expand so the oracle pins every percentile
    of every bucket exactly."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | extend day6 = bin_at(ts, 1d,"
        "     todatetime('2024-01-01 06:00:00'))"
        " | summarize p = percentiles_array(value, 50, 90, 99),"
        "     n = count() by day6"
        " | mv-expand with_itemindex = i pv = p to typeof(real)"
        " | project day6, i = tolong(i), pv, n",
        {"Events": events},
    )


@query(
    "k64_kql_materialize",
    oracle=f"""{_OI},
m AS (
  SELECT city, CAST(SUM(amount) AS BIGINT) AS total
  FROM orders_info GROUP BY city
)
SELECT city, total FROM m
UNION ALL
SELECT 'ALL' AS city, CAST(SUM(total) AS BIGINT) AS total FROM m
""",
    tags=("kql", "cache"),
)
def k64_kql_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``let M = materialize(...)`` — Kusto's cache hint for
    multi-reference lets (kql.py grammar header): the bound pipeline
    is compiled once and PERSISTED, so the two references below (the
    per-city rows and the re-aggregated ALL row) each read the same
    in-memory materialization instead of recomputing the aggregate —
    tests/test_plans.py pins the InMemoryTableScan reuse. At 100 TB
    the difference is one shuffle over the fact table vs one per
    reference. The oracle recomputes both references from a plain CTE
    (semantics are identical; only the execution sharing differs)."""
    return kql(
        "let M = materialize("
        "  Orders | summarize total = sum(amount) by city);"
        " M | union ("
        "  M | summarize total = sum(total) | extend city = 'ALL'"
        "     | project city, total )",
        _orders(spark, sf_dir),
    )


@query(
    "k65_kql_fork",
    oracle=f"""{_OI}
SELECT 'by_city' AS fork_, city,
       CAST(SUM(amount) AS BIGINT) AS total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders_info WHERE amount > 0 GROUP BY city
UNION ALL
SELECT 'overall', NULL,
       CAST(SUM(amount) AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM orders_info WHERE amount > 0
""",
    tags=("kql", "fork"),
)
def k65_kql_fork(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``fork`` — Kusto's branch operator: the pre-fork pipeline runs
    ONCE (persisted; tests/test_plans.py pins the shared
    InMemoryTableScan) and each parenthesized branch continues from
    it. kql() renders the branches as one table unioned by name with
    a ``fork_`` discriminator (the overall branch has no city —
    null-filled, exactly unionByName(allowMissingColumns)); the
    Kusto-faithful multi-table surface is kql_fork(). The oracle
    recomputes both branches from the same filtered scan."""
    return kql(
        "Orders | where amount > 0 | fork"
        "  by_city = ( summarize total = sum(amount), n = count()"
        "              by city )"
        "  overall = ( summarize total = sum(amount), n = count() )",
        _orders(spark, sf_dir),
    )


@query(
    "k66_kql_externaldata",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS keysum,
       MAX(o_totalprice) AS maxp
FROM orders
""",
    tags=("kql", "source"),
)
def k66_kql_externaldata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``externaldata`` — Kusto's external-file source (blob URLs with
    a declared schema) mapped onto ``spark.read`` (kql.py grammar
    header): the declared column list is authoritative (parquet
    projects/casts onto it — column pruning still reaches the scan;
    csv/json read WITH the schema, so there is never a driver-side
    inference pass over 100 TB), multiple paths union, and the result
    is an ordinary distributed scan with pushdown. Here it reads the
    orders parquet by PATH — no table binding — and the oracle reads
    the same file through its registered view; exact rollup (counts +
    integer key sum + max) keeps the comparison engine-portable."""
    path = f"{sf_dir.rstrip('/')}/orders.parquet"
    return kql(
        "externaldata (o_orderkey: long, o_totalprice: real)"
        f" ['{path}'] with (format='parquet')"
        " | summarize n = count(), keysum = sum(o_orderkey),"
        "   maxp = max(o_totalprice)",
        {},
    )


@query(
    "k67_kql_series_decompose",
    oracle="""
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts < TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT t.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i * 6) HOUR AS d
  FROM types t, unnest(generate_series(0, 27)) AS g(i)
), dense AS (
  SELECT g.event_type, g.i, CAST(COALESCE(daily.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
), t AS (
  SELECT event_type, i, n,
         AVG(n) OVER (PARTITION BY event_type ORDER BY i
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS tv
  FROM dense
), ph AS (
  SELECT event_type, i % 4 AS p, AVG(n - tv) AS sv
  FROM t GROUP BY 1, 2
)
SELECT t.event_type, CAST(t.i AS BIGINT) AS i, t.n AS nv,
       t.tv + ph.sv AS bv, ph.sv AS sv, t.tv,
       t.n - t.tv - ph.sv AS rv
FROM t JOIN ph ON ph.event_type = t.event_type AND ph.p = t.i % 4
""",
    tags=("kql", "timeseries", "dynamic"),
)
def k67_kql_series_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_decompose`` + tuple-destructuring extend — Kusto's
    time-series decomposition verb over a make-series array (kql.py:
    _series_decompose; b91 is the row-form sibling): dense 6-hour
    event counts per type decompose into trend (clamped centered
    moving average), seasonal (per-phase mean of the detrended
    series, period 4 = one day of 6h bins), baseline and residual —
    all as JVM HOF folds over the observability-sized arrays, no
    explode until the final typed mv-expand + computed-index probe
    (``s[i]`` — 0-based, compiled to element_at) unpacks every value
    for the oracle. One shuffle total (make-series' per-bin rollup);
    the decomposition itself is row-local expression work."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 00:00:00'"
        " step 6h by event_type"
        " | extend (b, s, tr, res) = series_decompose(n, 4)"
        " | mv-expand with_itemindex = i bv = b to typeof(real)"
        " | extend i = tolong(i), nv = todouble(n[i]),"
        "   sv = todouble(s[i]), tv = todouble(tr[i]),"
        "   rv = todouble(res[i])"
        " | project event_type, i, nv, bv, sv, tv, rv",
        {"Events": events},
    )


@query(
    "k68_kql_invoke_lambda",
    oracle=f"""{_OI}
SELECT city, CAST(SUM(amount) AS BIGINT) AS total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders_info WHERE amount > 0 GROUP BY city
ORDER BY total DESC LIMIT 3
""",
    tags=("kql", "lambda"),
)
def k68_kql_invoke_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``let f = (T:(*)) {{ ... }}; T | invoke f()`` — Kusto's tabular
    lambda lets (kql.py grammar header): the function body is stored
    as a template and ``invoke`` substitutes the incoming pipeline for
    the tabular parameter at COMPILE time, so the result plans exactly
    like the inlined query — reusable query logic with zero runtime
    indirection (no view, no temp table, no extra shuffle). The
    library pattern for shared KQL snippets across dashboards."""
    return kql(
        "let top_cities = (T:(*)) {"
        "  T | summarize total = sum(amount), n = count() by city"
        "    | top 3 by total };"
        " Orders | where amount > 0 | invoke top_cities()",
        _orders(spark, sf_dir),
    )


@query(
    "k69_kql_parse_regex",
    oracle=f"""{_OI}
SELECT city AS c, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(orderid) AS BIGINT) AS keysum
FROM orders_info GROUP BY city
""",
    tags=("kql", "parse"),
)
def k69_kql_parse_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse kind=regex`` — Kusto's regex-mode extraction: the
    pattern fragments between captured names are RAW regex (vs simple
    mode's escaped literals), compiled into the same single anchored
    regex with one non-greedy capture per name — still pure JVM
    regexp_extract work, no UDF. Fragments containing capturing
    groups are rejected (they would shift the name→group mapping —
    tested); round-trips a synthesized log line back into its fields
    over every order row."""
    return kql(
        "Orders"
        " | extend line = strcat('order-', tostring(orderid),"
        "     ' city=', city)"
        " | parse kind=regex line with 'order-(?:id)?' oid ' +city=' c"
        " | summarize n = count(), keysum = sum(tolong(oid)) by c",
        _orders(spark, sf_dir),
    )


@query(
    "k70_kql_graph_match",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), e AS (
  SELECT DISTINCT event_type AS s, next_type AS d
  FROM seq WHERE next_type IS NOT NULL
)
SELECT e1.s AS a, e1.d AS b, e2.d AS c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e e1 JOIN e e2 ON e1.d = e2.s
WHERE e1.s <> e2.d
GROUP BY 1, 2, 3
""",
    tags=("kql", "graph"),
)
def k70_kql_graph_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``make-graph`` + ``graph-match`` — Kusto's graph operators
    (kql.py:_compile_graph_match) over the distinct event-type
    transition graph (d39's edges, deduplicated): 2-hop open paths
    (a)→(b)→(c) with a ≠ c, counted per triple. The vertex-chain
    pattern compiles to motif_find's chained hash equi-joins
    (operators/graph.py) — one edge-scan per hop, broadcast-joinable,
    no cross join ever; repeated variables close cycles through the
    shared-variable join keys (tested). The count(*) per triple is 1
    on a deduplicated edge set unless parallel paths exist — kept as
    an aggregate so the KQL continues through summarize after
    graph-match like any pipeline stage.

    Scale: hub-vertex fan-out is the wedge count, same story and same
    mitigation as d55/d82 — degree-orient the edge table before
    make-graph; the operator algebra is unchanged."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    edges = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .select(
            F.col("event_type").alias("s"), F.col("next_type").alias("d")
        )
        .distinct()
    )
    return kql(
        "E | make-graph s --> d"
        " | graph-match (a)-[]->(b)-[]->(c) where a != c project a, b, c"
        " | summarize n = count() by a, b, c",
        {"E": edges},
    )


@query(
    "k71_kql_funnel_sequence",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, s1.t1, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id, s1.t1
), s3 AS (
  SELECT e.user_id, s2.t1, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id, s2.t1
)
SELECT time_bucket(INTERVAL '1 day', t1) AS period,
       CAST(COUNT(*) AS BIGINT) AS ids
FROM s3 GROUP BY 1
""",
    tags=("kql", "funnel", "analytics"),
)
def k71_kql_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL ``evaluate funnel_sequence(...)`` — Kusto's funnel plugin
    (kql.py:_compile_funnel_sequence), pinned to its headline table:
    distinct users who executed view -> click -> purchase IN ORDER
    (not necessarily adjacent; earliest-completion greedy matching:
    t1 = first view, t2 = first click after t1, t3 = first purchase
    after t2), bucketed by the day of each user's t1. The oracle
    replays the identical min-chain as k cascaded conditional-MIN
    CTEs.

    Scale shape: pure Catalyst — one conditional MIN aggregate per
    funnel step keyed on user_id (co-partitioned shuffles, each step's
    input shrunk to the previous step's survivors), no window over the
    raw stream, no Python. The b90 staged-funnel shape behind a Kusto
    spelling."""
    ev = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate funnel_sequence(user_id, ts, 1d, event_type,"
        " ('view', 'click', 'purchase'))",
        {"Events": ev},
    )


@query(
    "k72_kql_sequence_detect",
    oracle="""
WITH RECURSIVE coded AS (
  SELECT user_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         event_type = 'view' AS f1,
         event_type = 'click' AS f2,
         event_type = 'purchase' AS f3
  FROM events
), walk AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS cur,
         CAST(NULL AS TIMESTAMP) AS t1, CAST(NULL AS TIMESTAMP) AS tprev,
         CAST(NULL AS TIMESTAMP) AS s2, CAST(NULL AS TIMESTAMP) AS e1,
         CAST(NULL AS TIMESTAMP) AS e2, CAST(NULL AS TIMESTAMP) AS e3,
         FALSE AS emit
  FROM (SELECT DISTINCT user_id FROM coded)
  UNION ALL
  SELECT c.user_id, c.rn,
         CASE WHEN nd AND wok AND w.cur = 2 THEN 0
              WHEN nd AND wok THEN w.cur + 1
              WHEN nd AND NOT wok AND c.f1 THEN 1
              WHEN nd AND NOT wok THEN 0
              ELSE w.cur END,
         CASE WHEN nd AND wok AND w.cur = 2 THEN NULL
              WHEN nd AND wok AND w.cur = 0 THEN c.ts
              WHEN nd AND wok THEN w.t1
              WHEN nd AND NOT wok AND c.f1 THEN c.ts
              WHEN nd AND NOT wok THEN NULL
              ELSE w.t1 END,
         CASE WHEN nd AND wok AND w.cur = 2 THEN NULL
              WHEN nd AND wok THEN c.ts
              WHEN nd AND NOT wok AND c.f1 THEN c.ts
              WHEN nd AND NOT wok THEN NULL
              ELSE w.tprev END,
         CASE WHEN nd AND wok AND w.cur = 2 THEN NULL
              WHEN nd AND wok AND w.cur = 1 THEN c.ts
              WHEN nd AND wok THEN w.s2
              WHEN nd AND NOT wok THEN NULL
              ELSE w.s2 END,
         CASE WHEN nd AND wok AND w.cur = 2 THEN w.t1 END,
         CASE WHEN nd AND wok AND w.cur = 2 THEN w.s2 END,
         CASE WHEN nd AND wok AND w.cur = 2 THEN c.ts END,
         COALESCE(nd AND wok AND w.cur = 2, FALSE)
  FROM walk w
  JOIN coded c ON c.user_id = w.user_id AND c.rn = w.rn + 1
  CROSS JOIN LATERAL (SELECT
      CASE w.cur WHEN 0 THEN c.f1 WHEN 1 THEN c.f2 ELSE c.f3 END AS nd,
      (w.cur = 0 OR (c.ts <= w.tprev + INTERVAL 24 HOUR
                     AND c.ts <= w.t1 + INTERVAL 96 HOUR)) AS wok) x
)
SELECT user_id, e1 AS f1_ts, e2 AS f2_ts, e3 AS f3_ts
FROM walk WHERE emit
""",
    tags=("kql", "scan", "stateful"),
)
def k72_kql_sequence_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL ``evaluate sequence_detect(...)`` — Kusto's sequence-
    detection plugin (kql.py:_compile_sequence_detect): per user,
    events time-ordered, greedy non-overlapping matching of
    view -> click -> purchase where each step arrives within 24h of the
    previous matched step AND within 96h of the first (binding at this
    data's event density: the windowed match count is ~1/6 of the
    unconstrained one, so the constraint is genuinely exercised); one row per
    completed sequence with the per-step timestamps. A step candidate
    outside its window aborts the in-progress sequence and is
    immediately reconsidered as a fresh first step (pinned subset,
    documented at the compiler).

    The oracle replays the identical automaton as a DuckDB recursive
    CTE stepping one event per iteration and carrying
    (state, t1, tprev, s2) — the k54 two-independent-implementations
    pattern, now with window constraints in the transition relation.

    Scale shape: k54's exactly — flags lower to Catalyst booleans
    before the boundary, ONE user_id shuffle, ONE mapInPandas pass per
    task (plan-pinned); the window arithmetic is numpy datetime64
    inside the walk."""
    ev = load(spark, sf_dir, "events")
    return kql(
        "Events | extend f1 = event_type == 'view',"
        " f2 = event_type == 'click', f3 = event_type == 'purchase'"
        " | evaluate sequence_detect(ts, 24h, 96h, f1, f2, f3, user_id)",
        {"Events": ev},
    )


@query(
    "k73_kql_series_fill",
    oracle="""
WITH ev AS (
  SELECT * FROM events WHERE user_id = 7
), grid AS (
  SELECT et.event_type, g.t
  FROM (SELECT DISTINCT event_type FROM ev) et
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                  TIMESTAMP '2024-01-24 00:00:00',
                                  INTERVAL 1 DAY)) AS t) g
), daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS t,
         AVG(value) AS v
  FROM ev
  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
  GROUP BY 1, 2
), s AS (
  SELECT grid.event_type, grid.t, daily.v,
         CAST(date_diff('day', TIMESTAMP '2024-01-05', grid.t) AS BIGINT)
           AS idx
  FROM grid LEFT JOIN daily
    ON daily.event_type = grid.event_type AND daily.t = grid.t
), w AS (
  SELECT event_type, idx, v,
         last_value(v IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fwd,
         first_value(v IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY idx
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bwd,
         last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
         first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
  FROM s
)
SELECT event_type, idx,
       CAST(COALESCE(v, -1.0) AS DOUBLE) AS v_const,
       CAST(fwd AS DOUBLE) AS v_fwd,
       CAST(bwd AS DOUBLE) AS v_bwd,
       CAST(CASE WHEN v IS NOT NULL THEN v
                 WHEN pi IS NULL THEN bwd
                 WHEN ni IS NULL THEN fwd
                 ELSE fwd + (bwd - fwd) * (idx - pi) / (ni - pi)
            END AS DOUBLE) AS v_linear
FROM w
""",
    tags=("kql", "timeseries"),
)
def k73_kql_series_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL ``series_fill_const`` / ``_forward`` / ``_backward`` /
    ``_linear`` — the gap-filling quartet every real make-series
    pipeline runs before series_decompose/series_outliers (which need
    dense numeric arrays): one sparse user's daily average value per
    event type, ``default = null`` making the gaps explicit, then all
    four fills side by side. Linear interpolates interior runs and
    takes the nearest value at the edges; forward/backward leave
    leading/trailing nulls null — each a documented Kusto contract,
    all pinned against a DuckDB twin that computes the same fills with
    IGNORE NULLS window functions over the exploded grid (two
    independent formulations: array folds vs window frames).

    Scale shape: the fills are JVM higher-order functions over the
    per-group array — zero shuffles beyond make-series' own two
    exchanges, no explode in the engine (the entry explodes only to
    hand row-wise values to the driver's comparator)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") == 7)
    arr = kql(
        "Events | make-series v = avg(value) default = null on ts"
        " from '2024-01-05 00:00:00' to '2024-01-25 00:00:00' step 1d"
        " by event_type"
        " | extend c = series_fill_const(v, -1.0),"
        " f = series_fill_forward(v), b = series_fill_backward(v),"
        " l = series_fill_linear(v)",
        {"Events": ev},
    )
    return arr.select(
        "event_type",
        F.posexplode(F.arrays_zip("c", "f", "b", "l")).alias("idx", "z"),
    ).select(
        "event_type",
        F.col("idx").cast("long").alias("idx"),
        F.col("z.c").alias("v_const"),
        F.col("z.f").alias("v_fwd"),
        F.col("z.b").alias("v_bwd"),
        F.col("z.l").alias("v_linear"),
    )


@query(
    "k74_kql_series_decompose_anomalies",
    oracle="""
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts < TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT t.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i * 6) HOUR AS d
  FROM types t, unnest(generate_series(0, 27)) AS g(i)
), dense AS (
  SELECT g.event_type, g.i, CAST(COALESCE(daily.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
), t AS (
  SELECT event_type, i, n,
         AVG(n) OVER (PARTITION BY event_type ORDER BY i
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS tv
  FROM dense
), ph AS (
  SELECT event_type, i % 4 AS p, AVG(n - tv) AS sv
  FROM t GROUP BY 1, 2
), dec AS (
  SELECT t.event_type, t.i, t.tv + ph.sv AS bv,
         t.n - t.tv - ph.sv AS rv
  FROM t JOIN ph ON ph.event_type = t.event_type AND ph.p = t.i % 4
), ser AS (
  SELECT event_type,
         list(rv ORDER BY i) AS xs,
         list(bv ORDER BY i) AS bs
  FROM dec GROUP BY event_type
), qq AS (
  SELECT event_type, xs, bs, list_sort(xs) AS s, len(xs) AS n FROM ser
), qv AS (
  SELECT event_type, xs, bs,
    s[CAST(FLOOR((n-1)*0.1) AS INT)+1] * (1 - ((n-1)*0.1 - FLOOR((n-1)*0.1)))
      + s[LEAST(CAST(FLOOR((n-1)*0.1) AS INT)+2, n)]
        * ((n-1)*0.1 - FLOOR((n-1)*0.1)) AS q10,
    s[CAST(FLOOR((n-1)*0.5) AS INT)+1] * (1 - ((n-1)*0.5 - FLOOR((n-1)*0.5)))
      + s[LEAST(CAST(FLOOR((n-1)*0.5) AS INT)+2, n)]
        * ((n-1)*0.5 - FLOOR((n-1)*0.5)) AS q50,
    s[CAST(FLOOR((n-1)*0.9) AS INT)+1] * (1 - ((n-1)*0.9 - FLOOR((n-1)*0.9)))
      + s[LEAST(CAST(FLOOR((n-1)*0.9) AS INT)+2, n)]
        * ((n-1)*0.9 - FLOOR((n-1)*0.9)) AS q90
  FROM qq
), sc AS (
  SELECT event_type, bs,
    list_transform(xs, x ->
      CASE WHEN q90 = q10 THEN 0.0
           WHEN x > q90 OR x < q10 THEN (x - q50) / (q90 - q10)
           ELSE 0.0 END) AS scores
  FROM qv
)
SELECT event_type,
  array_to_string(list_transform(scores, x ->
    CAST(CASE WHEN x > 1.5 THEN 1 WHEN x < -1.5 THEN -1 ELSE 0 END
         AS VARCHAR)), ',') AS flags,
  array_to_string(list_transform(scores, x ->
    CAST(CAST(FLOOR(x * 1e6) AS BIGINT) AS VARCHAR)), ',') AS scores,
  array_to_string(list_transform(bs, x ->
    CAST(CAST(FLOOR(x * 1e6) AS BIGINT) AS VARCHAR)), ',') AS baseline
FROM sc
""",
    tags=("kql", "timeseries", "anomaly"),
)
def k74_kql_series_decompose_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``series_decompose_anomalies`` — Kusto's one-call series anomaly
    detector (kql.py:_series_decompose_anomalies), the last gap in the
    series_* family: decompose (k67's STL-lite, period 4 over 6-hour
    bins), Tukey-score the residual (k55's fences), flag at the
    default ±1.5 threshold; output triple (ad_flag, ad_score,
    baseline) destructured by the tuple extend.

    All JVM HOF folds over make-series arrays — one shuffle total
    (the per-bin rollup), no explode, no Python (plan-pinned via the
    k67 shape). The oracle composes k67's relational decomposition
    with k55's interpolated-percentile scoring; scores/baseline are
    floor-quantized to micro units (b28 hashability contract)."""
    events = load(spark, sf_dir, "events")
    out = kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 00:00:00'"
        " step 6h by event_type"
        " | extend (f, sc, b) = series_decompose_anomalies(n, 4)",
        {"Events": events},
    )
    return out.select(
        "event_type",
        F.array_join(
            F.transform("f", lambda x: x.cast("string")), ","
        ).alias("flags"),
        F.array_join(
            F.transform(
                "sc",
                lambda x: F.floor(x * F.lit(1e6)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("scores"),
        F.array_join(
            F.transform(
                "b",
                lambda x: F.floor(x * F.lit(1e6)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("baseline"),
    )


@query(
    "k75_kql_autocluster",
    oracle="""
WITH base AS (
  SELECT o_orderpriority AS pr, o_orderstatus AS st FROM orders
), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
cand AS (
  SELECT pr, CAST(NULL AS VARCHAR) AS st, COUNT(*) AS cnt, 1 AS k
  FROM base WHERE pr IS NOT NULL GROUP BY 1
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), st, COUNT(*), 1
  FROM base WHERE st IS NOT NULL GROUP BY 2
  UNION ALL
  SELECT pr, st, COUNT(*), 2
  FROM base WHERE pr IS NOT NULL AND st IS NOT NULL GROUP BY 1, 2
), scored AS (
  SELECT pr, st, cnt, k,
         100.0 * cnt / (SELECT n FROM tot) AS pct_raw,
         0.5 * cnt / (SELECT n FROM tot) + 0.5 * k / 2.0 AS score_raw
  FROM cand
  WHERE 100.0 * cnt / (SELECT n FROM tot) >= 10
), pruned AS (
  SELECT * FROM scored s
  WHERE k = 1 OR NOT EXISTS (
    SELECT 1 FROM scored p
    WHERE p.k = 1 AND p.cnt = s.cnt
      AND ((p.pr IS NOT NULL AND p.pr = s.pr)
           OR (p.st IS NOT NULL AND p.st = s.st)))
), ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY score_raw DESC,
                            pr ASC NULLS LAST, st ASC NULLS LAST) - 1
           AS SegmentId,
         cnt, pct_raw, score_raw, pr, st
  FROM pruned
)
SELECT CAST(SegmentId AS BIGINT) AS SegmentId,
       CAST(cnt AS BIGINT) AS Count,
       CAST(ROUND(pct_raw, 4) AS DOUBLE) AS Percent,
       CAST(ROUND(score_raw, 6) AS DOUBLE) AS Score,
       pr, st
FROM ranked WHERE SegmentId < 16 ORDER BY SegmentId
""",
    tags=("kql", "segmentation", "analytics"),
)
def k75_kql_autocluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate autocluster()`` — Kusto's segmentation plugin under
    this engine's pinned deterministic contract
    (kql.py:_compile_autocluster: exhaustive size<=2 segments, exact
    counts, 10% support floor, parent-dominance prune, score =
    size_weight*coverage + (1-size_weight)*informativeness, top 16):
    which (priority, status) attribute patterns cover the order book.

    Scale shape: basket's masked-copy expansion (bounded by attribute
    count, never cardinality) + ONE map-side-combined groupBy; the
    dominance prune self-joins the BOUNDED post-aggregate candidate
    table (broadcast); the single-partition rank window orders
    metadata-sized rows only."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders | project pr = o_orderpriority, st = o_orderstatus"
        " | evaluate autocluster(0.5)",
        {"Orders": orders},
    )


@query(
    "k76_kql_series_periods_detect",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.t
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-28 00:00:00',
                                  INTERVAL '1 day')) AS t
  ) g
), binned AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS t,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
  GROUP BY 1, 2
), ser AS (
  SELECT g.event_type,
         list(CAST(COALESCE(b.n, 0) AS DOUBLE) ORDER BY g.t) AS xs
  FROM grid g LEFT JOIN binned b
    ON g.event_type = b.event_type AND g.t = b.t
  GROUP BY g.event_type
), stats AS (
  SELECT event_type, xs, len(xs) AS n,
         list_sum(xs) / len(xs) AS m
  FROM ser
), v AS (
  SELECT event_type, xs, n, m,
         list_sum(list_transform(xs, x -> (x - m) * (x - m))) AS var
  FROM stats
), lags AS (
  SELECT v.event_type, l.lag,
    CASE WHEN v.var = 0 THEN 0.0 ELSE
      list_sum(list_transform(generate_series(1, CAST(v.n - l.lag AS INT)),
        i -> (v.xs[i] - v.m) * (v.xs[i + l.lag] - v.m))) / v.var
    END AS score
  FROM v CROSS JOIN (SELECT unnest(generate_series(2, 10)) AS lag) l
), ranked AS (
  SELECT event_type, lag, score,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY score DESC, lag ASC) AS r
  FROM lags
)
SELECT event_type,
  array_to_string(list_transform(list(CAST(lag AS DOUBLE) ORDER BY r),
    x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS periods,
  array_to_string(list_transform(list(score ORDER BY r),
    x -> CAST(CAST(FLOOR(x * 1e6) AS BIGINT) AS VARCHAR)), ',') AS scores
FROM ranked WHERE r <= 3 GROUP BY event_type
""",
    tags=("kql", "timeseries"),
)
def k76_kql_series_periods_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``series_periods_detect`` — dominant-period detection over a
    make-series array (kql.py:_series_periods_detect): per event
    type, the top-3 candidate lags in [2, 10] days by normalized
    sample autocorrelation over 28 daily counts. Kusto's detector is
    periodogram-based; this engine pins the deterministic ACF
    definition (documented divergence — same output shape (periods,
    scores), oracle-replayable math).

    Candidate lags are compile-time literals, so the detector unrolls
    into flat JVM folds over the series array — one shuffle total
    (make-series' rollup), no explode, no Python. Scores are
    floor-quantized to micro units for the hash compare."""
    events = load(spark, sf_dir, "events")
    out = kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-29 00:00:00'"
        " step 1d by event_type"
        " | extend (p, s) = series_periods_detect(n, 2, 10, 3)",
        {"Events": events},
    )
    return out.select(
        "event_type",
        F.array_join(
            F.transform("p", lambda x: x.cast("bigint").cast("string")), ","
        ).alias("periods"),
        F.array_join(
            F.transform(
                "s",
                lambda x: F.floor(x * F.lit(1e6)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("scores"),
    )


@query(
    "k77_kql_diffpatterns",
    oracle="""
WITH base AS (
  SELECT o_orderstatus AS st, o_orderpriority AS pr,
         CASE WHEN o_totalprice >= 300000 THEN 'high'
              WHEN o_totalprice >= 150000 THEN 'mid'
              ELSE 'low' END AS tier
  FROM orders WHERE o_orderstatus IN ('O', 'F')
), tots AS (
  SELECT CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS DOUBLE) AS ta,
         CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS tb
  FROM base
), cand AS (
  SELECT pr, CAST(NULL AS VARCHAR) AS tier,
         SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS cb
  FROM base WHERE pr IS NOT NULL GROUP BY 1
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), tier,
         SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END),
         SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END)
  FROM base WHERE tier IS NOT NULL GROUP BY 2
  UNION ALL
  SELECT pr, tier,
         SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END),
         SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END)
  FROM base WHERE pr IS NOT NULL AND tier IS NOT NULL GROUP BY 1, 2
), sc AS (
  SELECT pr, tier, ca, cb,
         100.0 * ca / (SELECT ta FROM tots) AS pa,
         100.0 * cb / (SELECT tb FROM tots) AS pb
  FROM cand
  WHERE GREATEST(100.0 * ca / (SELECT ta FROM tots),
                 100.0 * cb / (SELECT tb FROM tots)) >= 5
), ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY ABS(pa - pb) DESC,
                            pr ASC NULLS LAST, tier ASC NULLS LAST) - 1
           AS SegmentId,
         ca, cb, pa, pb, pr, tier
  FROM sc
)
SELECT CAST(SegmentId AS BIGINT) AS SegmentId,
       CAST(ca AS BIGINT) AS CountA, CAST(cb AS BIGINT) AS CountB,
       CAST(ROUND(pa, 4) AS DOUBLE) AS PercentA,
       CAST(ROUND(pb, 4) AS DOUBLE) AS PercentB,
       CAST(ROUND(pa - pb, 4) AS DOUBLE) AS PercentDiffAB,
       pr, tier
FROM ranked WHERE SegmentId < 16 ORDER BY SegmentId
""",
    tags=("kql", "segmentation", "analytics"),
)
def k77_kql_diffpatterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate diffpatterns()`` — Kusto's cohort-comparison plugin
    under this engine's pinned deterministic contract
    (kql.py:_compile_diffpatterns: exhaustive size<=2 patterns, 5%
    support floor on either cohort, rank by abs percent difference,
    top 16): which (priority, price-tier) patterns differ between the
    open ('O') and finalized ('F') order cohorts.

    Scale shape: both cohorts ride ONE masked-copy expansion and ONE
    map-side-combined groupBy (the cohort split is two conditional
    sums inside the same aggregate — never two scans); denominators
    are one bounded 2-row job; the rank window orders the bounded
    candidate table only."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders | project st = o_orderstatus,"
        " pr = o_orderpriority,"
        " tier = case(o_totalprice >= 300000, 'high',"
        "             o_totalprice >= 150000, 'mid', 'low')"
        " | evaluate diffpatterns(st, 'O', 'F')",
        {"Orders": orders},
    )


@query(
    "k78_kql_sliding_window_counts",
    oracle="""
WITH bins AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-29 00:00:00',
                                INTERVAL 1 DAY)) AS t
)
SELECT b.t AS Timeline,
       CAST(COUNT(e.user_id) AS BIGINT) AS Count,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS Dcount
FROM bins b LEFT JOIN events e
  ON e.ts > b.t - INTERVAL 7 DAY AND e.ts <= b.t
GROUP BY 1
""",
    tags=("kql", "timeseries", "activity"),
)
def k78_kql_sliding_window_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``evaluate sliding_window_counts()`` — Kusto's rolling-window
    activity plugin (kql.py:_compile_sliding_window_counts): per daily
    report bin, event count and distinct users over the trailing
    7-day window (t - 7d, t]; dense timeline with zero rows. The
    plugin spelling of b73's WAU discipline: DISTINCT does not sum, so
    the exact form fans each event to the lookback/bin report bins it
    supports and distinct-counts per bin.

    Scale shape: ONE explode fan (×7) + ONE map-side-combined groupBy
    on the bin ordinal; the dense grid is a bounded range join. The
    oracle uses the textbook bins×events range join — fine at sf0.01,
    quadratic at scale, which is exactly why the Spark plan fans
    instead."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate sliding_window_counts(user_id, ts,"
        " datetime('2024-01-01 00:00:00'),"
        " datetime('2024-01-29 00:00:00'), 7d, 1d)",
        {"Events": events},
    )


@query(
    "k79_kql_activity_engagement",
    oracle="""
WITH bins AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-29 00:00:00',
                                INTERVAL 1 DAY)) AS t
), din AS (
  SELECT b.t, COUNT(DISTINCT e.user_id) AS d
  FROM bins b LEFT JOIN events e
    ON e.ts > b.t - INTERVAL 1 DAY AND e.ts <= b.t
  GROUP BY 1
), dout AS (
  SELECT b.t, COUNT(DISTINCT e.user_id) AS d
  FROM bins b LEFT JOIN events e
    ON e.ts > b.t - INTERVAL 7 DAY AND e.ts <= b.t
  GROUP BY 1
)
SELECT din.t AS Timeline,
       CAST(CASE WHEN dout.d > 0
                 THEN CAST(din.d AS DOUBLE) / dout.d END AS DOUBLE)
         AS activity_ratio
FROM din JOIN dout ON dout.t = din.t
""",
    tags=("kql", "timeseries", "activity"),
)
def k79_kql_activity_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate activity_engagement()`` — Kusto's DAU/MAU-style
    stickiness plugin (kql.py:_compile_activity_engagement): per daily
    bin, distinct users in the trailing 1-day window over distinct
    users in the trailing 7-day window; 0 where the day is silent but
    the week is not, null where both are empty.

    Scale shape: two fans of the event stream (×1 and ×7) joined on
    the bin ordinal — both distinct aggregates map-side combine; at
    100 TB the swap is one HLL sketch per day union-merged per window
    (b41's layout), same report schema."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate activity_engagement(user_id, ts,"
        " datetime('2024-01-01 00:00:00'),"
        " datetime('2024-01-29 00:00:00'), 1d, 7d)",
        {"Events": events},
    )


@query(
    "k80_kql_series_fit_line",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i) DAY AS d
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN unnest(generate_series(0, 27)) AS g(i)
), daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
  GROUP BY 1, 2
), dense AS (
  SELECT g.event_type, g.i, CAST(COALESCE(daily.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
), s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(n) AS sy, SUM(i * n) AS sxy, SUM(n * n) AS syy
  FROM dense GROUP BY 1
), p AS (
  SELECT event_type, m, sy, sxy, syy,
         (m-1)*m/2 AS s1, (m-1)*m*(2*m-1)/6 AS s2
  FROM s
), fl AS (
  SELECT event_type, m, sy, s1,
    CASE WHEN m >= 2 AND m*s2 - s1*s1 > 0
         THEN (m*sxy - s1*sy) / (m*s2 - s1*s1) ELSE 0 END AS slope,
    syy/m - (sy/m)*(sy/m) AS variance,
    CASE WHEN m >= 2 AND (s2 - s1*s1/m) > 0
         THEN ((syy - sy*sy/m)
               - (sxy - s1*sy/m)*(sxy - s1*sy/m)/(s2 - s1*s1/m)) / m
         ELSE 0 END AS rvariance
  FROM p
), fo AS (
  SELECT event_type, slope, (sy - slope*s1)/m AS interception,
         variance, rvariance,
         CASE WHEN variance > 0 THEN 1 - rvariance/variance
              ELSE 1 END AS rsquare
  FROM fl
), fitv AS (
  SELECT d.event_type,
         array_to_string(list(
           CAST(CAST(FLOOR((fo.interception + fo.slope*d.i)*1e6) AS BIGINT)
                AS VARCHAR) ORDER BY d.i), ',') AS line_fit
  FROM dense d JOIN fo ON fo.event_type = d.event_type
  GROUP BY 1
)
SELECT fo.event_type,
       CAST(FLOOR(fo.rsquare*1e6) AS BIGINT) AS rsquare,
       CAST(FLOOR(fo.slope*1e6) AS BIGINT) AS slope,
       CAST(FLOOR(fo.variance*1e6) AS BIGINT) AS variance,
       CAST(FLOOR(fo.rvariance*1e6) AS BIGINT) AS rvariance,
       CAST(FLOOR(fo.interception*1e6) AS BIGINT) AS interception,
       fitv.line_fit
FROM fo JOIN fitv ON fitv.event_type = fo.event_type
""",
    tags=("kql", "timeseries", "regression"),
)
def k80_kql_series_fit_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_fit_line`` — Kusto's per-series linear regression
    (kql.py:_series_fit_line, pinned contract: 0-based x axis,
    population variance/rvariance, rsquare = 1 on flat series),
    destructured by the tuple extend in Kusto's documented order
    (rsquare, slope, variance, rvariance, interception, line_fit):
    the daily event-count trend per event type.

    Scale shape: ONE sequential JVM fold per series collecting the
    OLS sufficient statistics, closed-form outputs in the fold's
    finish lambda — no explode, no Python, no shuffle beyond
    make-series' per-bin rollup. The oracle replays the identical
    closed forms over the same dense grid (integer count sums ⇒
    bit-exact inputs); all doubles floor-quantized to micro units
    (b28 hashability contract)."""
    events = load(spark, sf_dir, "events")
    out = kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-29 00:00:00'"
        " step 1d by event_type"
        " | extend (rsq, slope, variance, rvariance, icpt, fit)"
        " = series_fit_line(n)",
        {"Events": events},
    )
    micro = lambda c: F.floor(F.col(c) * F.lit(1e6)).cast("bigint")  # noqa: E731
    return out.select(
        "event_type",
        micro("rsq").alias("rsquare"),
        micro("slope").alias("slope"),
        micro("variance").alias("variance"),
        micro("rvariance").alias("rvariance"),
        micro("icpt").alias("interception"),
        F.array_join(
            F.transform(
                "fit",
                lambda x: F.floor(x * F.lit(1e6)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("line_fit"),
    )


@query(
    "k81_kql_series_fit_2lines",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i) DAY AS d
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN unnest(generate_series(0, 27)) AS g(i)
), daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
  GROUP BY 1, 2
), dense AS (
  SELECT g.event_type, g.i, CAST(COALESCE(daily.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
), cand AS (
  SELECT et.event_type, g.k
  FROM (SELECT DISTINCT event_type FROM dense) et
  CROSS JOIN unnest(generate_series(2, 26)) AS g(k)
), seg AS (
  SELECT c.event_type, c.k,
         CASE WHEN d.i < c.k THEN 0 ELSE 1 END AS side,
         CAST(CASE WHEN d.i < c.k THEN d.i ELSE d.i - c.k END AS DOUBLE) AS x,
         d.n
  FROM cand c JOIN dense d ON d.event_type = c.event_type
), ss AS (
  SELECT event_type, k, side, CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(n) AS sy, SUM(x * n) AS sxy, SUM(n * n) AS syy
  FROM seg GROUP BY 1, 2, 3
), sse1 AS (
  SELECT event_type, k, side, m, sy, sxy, syy,
         (m-1)*m/2 AS s1, (m-1)*m*(2*m-1)/6 AS s2
  FROM ss
), sse AS (
  SELECT event_type, k, SUM(
    CASE WHEN m >= 2 AND (s2 - s1*s1/m) > 0
         THEN (syy - sy*sy/m)
              - (sxy - s1*sy/m)*(sxy - s1*sy/m)/(s2 - s1*s1/m)
         ELSE 0 END) AS sse
  FROM sse1 GROUP BY 1, 2
), best AS (
  SELECT event_type, k, sse,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY sse ASC, k ASC) AS rn
  FROM sse
), bk AS (
  SELECT event_type, k, sse FROM best WHERE rn = 1
), lines AS (
  SELECT s.event_type, s.side,
    CASE WHEN s.m >= 2 AND s.m*s.s2 - s.s1*s.s1 > 0
         THEN (s.m*s.sxy - s.s1*s.sy) / (s.m*s.s2 - s.s1*s.s1)
         ELSE 0 END AS slope,
    s.m, s.sy, s.s1
  FROM sse1 s JOIN bk ON bk.event_type = s.event_type AND bk.k = s.k
), lp AS (
  SELECT event_type, side, slope, (sy - slope*s1)/m AS icpt
  FROM lines
), var_all AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(n) AS sy, SUM(n * n) AS syy
  FROM dense GROUP BY 1
), va AS (
  SELECT event_type, syy/m - (sy/m)*(sy/m) AS variance, m FROM var_all
), fitv AS (
  SELECT d.event_type,
         array_to_string(list(
           CAST(CAST(FLOOR((lp.icpt + lp.slope *
             (CASE WHEN d.i < bk.k THEN d.i ELSE d.i - bk.k END))*1e6)
             AS BIGINT) AS VARCHAR) ORDER BY d.i), ',') AS line_fit
  FROM dense d
  JOIN bk ON bk.event_type = d.event_type
  JOIN lp ON lp.event_type = d.event_type
         AND lp.side = (CASE WHEN d.i < bk.k THEN 0 ELSE 1 END)
  GROUP BY 1
)
SELECT va.event_type,
       CAST(FLOOR((CASE WHEN va.variance > 0
                        THEN 1 - (bk.sse/va.m)/va.variance
                        ELSE 1 END)*1e6) AS BIGINT) AS rsquare,
       CAST(bk.k AS BIGINT) AS split_idx,
       CAST(FLOOR(va.variance*1e6) AS BIGINT) AS variance,
       CAST(FLOOR((bk.sse/va.m)*1e6) AS BIGINT) AS rvariance,
       fitv.line_fit
FROM va
JOIN bk ON bk.event_type = va.event_type
JOIN fitv ON fitv.event_type = va.event_type
""",
    tags=("kql", "timeseries", "regression"),
)
def k81_kql_series_fit_2lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_fit_2lines`` — Kusto's segmented two-piece regression
    (kql.py:_series_fit_2lines, pinned contract: split sweep over
    [2, n−2] so both sides keep ≥ 2 points, ties keep the smallest
    split, population moments, head columns (rsquare, split_idx,
    variance, rvariance, line_fit)): where the daily event-count
    trend per event type changes regime.

    Scale shape: the candidate sweep is ONE JVM transform over the
    bounded split range (two sequential slice-folds per candidate,
    O(n²) arithmetic on a 28-element array) — the _let binding keeps
    the analyzed tree linear; no explode, no Python, no shuffle
    beyond make-series' per-bin rollup. The oracle replays the sweep
    relationally (candidate × side grouping, identical closed forms
    on bit-exact integer-count sums, same argmin tie rule); doubles
    floor-quantized to micro units."""
    events = load(spark, sf_dir, "events")
    out = kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-29 00:00:00'"
        " step 1d by event_type"
        " | extend (rsq, split_idx, variance, rvariance, fit)"
        " = series_fit_2lines(n)",
        {"Events": events},
    )
    micro = lambda c: F.floor(F.col(c) * F.lit(1e6)).cast("bigint")  # noqa: E731
    return out.select(
        "event_type",
        micro("rsq").alias("rsquare"),
        F.col("split_idx").cast("bigint").alias("split_idx"),
        micro("variance").alias("variance"),
        micro("rvariance").alias("rvariance"),
        F.array_join(
            F.transform(
                "fit",
                lambda x: F.floor(x * F.lit(1e6)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("line_fit"),
    )


@query(
    "k82_kql_activity_counts",
    oracle="""
WITH bins AS (
  SELECT unnest(generate_series(0, 27)) AS k
), ev AS (
  SELECT CAST(FLOOR(EXTRACT(EPOCH FROM ts - TIMESTAMP '2024-01-01 00:00:00')
                    / 86400) AS BIGINT) AS k, user_id
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
), per AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS count,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount
  FROM ev GROUP BY 1
), fs AS (
  SELECT user_id, MIN(k) AS k FROM ev GROUP BY 1
), nw AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS new_dcount FROM fs GROUP BY 1
)
SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (b.k) DAY AS Timestamp,
       COALESCE(per.count, 0) AS count,
       COALESCE(per.dcount, 0) AS dcount,
       COALESCE(nw.new_dcount, 0) AS new_dcount,
       CAST(SUM(COALESCE(nw.new_dcount, 0)) OVER (ORDER BY b.k) AS BIGINT)
         AS aggregated_dcount
FROM bins b
LEFT JOIN per ON per.k = b.k
LEFT JOIN nw ON nw.k = b.k
""",
    tags=("kql", "timeseries", "activity"),
)
def k82_kql_activity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate activity_counts_metrics()`` — Kusto's per-bin
    activity datasheet (kql.py:_compile_activity_counts_metrics):
    daily events, distinct users, NEW users (first activity in the
    analyzed range falls in this bin) and the running distinct-user
    union, dense timeline.

    Scale shape: two map-side-combined rollups (per-bin, per-id
    first-seen); aggregated_dcount is a running sum over the BOUNDED
    bin table — the single-partition window orders 28 metadata rows,
    never events. At 100 TB the dcount swap is one HLL per bin (b41
    layout); new/aggregated stay exact (they roll up the first-seen
    table, which is id-cardinality, not event-cardinality)."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate activity_counts_metrics(user_id, ts,"
        " datetime('2024-01-01 00:00:00'),"
        " datetime('2024-01-29 00:00:00'), 1d)",
        {"Events": events},
    )


@query(
    "k83_kql_new_activity_metrics",
    oracle="""
WITH ev AS (
  SELECT DISTINCT
    CAST(FLOOR(EXTRACT(EPOCH FROM ts - TIMESTAMP '2024-01-01 00:00:00')
               / 604800) AS BIGINT) AS k, user_id
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
), fs AS (
  SELECT user_id, MIN(k) AS f FROM ev GROUP BY 1
), cohort AS (
  SELECT f, CAST(COUNT(*) AS BIGINT) AS new FROM fs GROUP BY 1
), ret AS (
  SELECT fs.f, ev.k AS t, CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS ret
  FROM ev JOIN fs ON fs.user_id = ev.user_id
  GROUP BY 1, 2
), pairs AS (
  SELECT a.f, b.t
  FROM (SELECT unnest(generate_series(0, 3)) AS f) a
  JOIN (SELECT unnest(generate_series(0, 3)) AS t) b ON a.f <= b.t
)
SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (p.f * 7) DAY
         AS from_Timestamp,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (p.t * 7) DAY
         AS to_Timestamp,
       COALESCE(c.new, 0) AS dcount_new_values,
       COALESCE(r.ret, 0) AS dcount_retained_values,
       COALESCE(c.new, 0) - COALESCE(r.ret, 0) AS dcount_churn_values,
       CASE WHEN COALESCE(c.new, 0) > 0
            THEN 100.0 * COALESCE(r.ret, 0) / COALESCE(c.new, 0)
       END AS retention_rate,
       CASE WHEN COALESCE(c.new, 0) > 0
            THEN 100.0 * (COALESCE(c.new, 0) - COALESCE(r.ret, 0))
                 / COALESCE(c.new, 0)
       END AS churn_rate
FROM pairs p
LEFT JOIN cohort c ON c.f = p.f
LEFT JOIN ret r ON r.f = p.f AND r.t = p.t
""",
    tags=("kql", "timeseries", "activity"),
)
def k83_kql_new_activity_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate new_activity_metrics()`` — Kusto's cohort-retention
    plugin (kql.py:_compile_new_activity_metrics): users cohorted by
    the week of their first activity; for every (from, to) week pair
    the cohort size, retained and churned distinct counts, and the
    retention/churn percentages (null on an empty cohort). The dense
    upper-triangle pair grid (K(K+1)/2 bounded rows) is emitted.

    Scale shape: events dedup to (id, week) once; the only join that
    moves per-id rows keys ON ID (first-seen back to activity), then
    everything rolls up to the bounded week lattice — all aggregates
    map-side combine."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate new_activity_metrics(user_id, ts,"
        " datetime('2024-01-01 00:00:00'),"
        " datetime('2024-01-29 00:00:00'), 7d)",
        {"Events": events},
    )


@query(
    "k84_kql_session_count",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
  WHERE ts > TIMESTAMP '2024-01-01 00:00:00' - INTERVAL 6 HOUR
    AND ts < TIMESTAMP '2024-01-29 00:00:00'
), starts AS (
  SELECT CAST(FLOOR(EXTRACT(EPOCH FROM ts - TIMESTAMP '2024-01-01 00:00:00')
                    / 86400) AS BIGINT) AS k
  FROM lagged
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND (prev IS NULL OR ts - prev > INTERVAL 6 HOUR)
), per AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM starts GROUP BY 1
)
SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (b.k) DAY AS Timestamp,
       COALESCE(per.n, 0) AS SessionCount
FROM (SELECT unnest(generate_series(0, 27)) AS k) b
LEFT JOIN per ON per.k = b.k
""",
    tags=("kql", "timeseries", "activity", "sessionization"),
)
def k84_kql_session_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate session_count()`` — session analytics under this
    engine's pinned contract (kql.py:_compile_session_count): a
    session starts at an event with no same-user event in the
    preceding 6-hour look-back (b25's gaps-and-islands rule); the
    report counts session STARTS per day, dense timeline. The
    look-back probe admits pre-Start events so a session straddling
    the range start is not double-counted.

    Scale shape: ONE per-user shuffle for the lag window + ONE
    map-side-combined per-bin rollup; the grid join moves 28 bounded
    rows. The oracle replays the identical lag/gap rule."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate session_count(user_id, ts,"
        " datetime('2024-01-01 00:00:00'),"
        " datetime('2024-01-29 00:00:00'), 1d, 6h)",
        {"Events": events},
    )


@query(
    "k85_kql_ipv4_functions",
    oracle="""
WITH base AS (
  SELECT (user_id * 2654435761) % 4294967296 AS ipn0 FROM events
), oct AS (
  SELECT ipn0,
         (ipn0 // 16777216) % 256 AS o1,
         (ipn0 // 65536) % 256 AS o2
  FROM base
), cls AS (
  SELECT ipn0, ipn0 % 16 AS b,
    CASE WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
              OR (o1 = 192 AND o2 = 168)
         THEN 1 ELSE 0 END AS priv,
    CASE WHEN FLOOR(CAST(ipn0 AS DOUBLE) / 1048576)
              = FLOOR(CAST(2886729728 AS DOUBLE) / 1048576)
         THEN 1 ELSE 0 END AS inr
  FROM oct
)
SELECT CAST(b AS BIGINT) AS b,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(priv) AS BIGINT) AS npriv,
       CAST(SUM(inr) AS BIGINT) AS ninr
FROM cls GROUP BY b ORDER BY b
""",
    tags=("kql", "scalar", "network"),
)
def k85_kql_ipv4_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 scalar family — ``parse_ipv4`` / ``format_ipv4`` /
    ``ipv4_is_private`` / ``ipv4_is_in_range`` (kql.py:_parse_ipv4
    et seq., Kusto's network-analytics staples under the
    error-as-null convention): synthesize a deterministic address per
    event (Knuth multiplicative hash of user_id — replayable
    arithmetic, not an engine hash), round-trip it through
    format→parse, classify RFC-1918 membership and a /12 CIDR probe,
    roll up per low-nibble bucket. The parse→format round-trip is
    verified inside the oracle comparison itself (the bucket key is
    the re-PARSED value: any corruption shifts rows across buckets).

    Scale shape: all four functions are pure codegen (regex probe +
    4-element fold + arithmetic) — one scan, ONE map-side-combined
    rollup, no UDF, no explode. 172.16.0.0 = 2886729728; /12 divides
    by 2^20 (shift-free prefix compare, exact in doubles)."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | extend ipn0 = (user_id * 2654435761) % 4294967296"
        " | extend ip = format_ipv4(ipn0)"
        " | extend back = parse_ipv4(ip)"
        " | extend priv = ipv4_is_private(ip),"
        "          inr = ipv4_is_in_range(ip, '172.16.0.0/12')"
        " | summarize n = count(), npriv = countif(priv),"
        "             ninr = countif(inr) by b = back % 16"
        " | sort by b asc",
        {"Events": events},
    )


@query(
    "k86_kql_geo_distance",
    oracle="""
WITH pts AS (
  SELECT event_id,
    CAST((event_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat1,
    CAST((event_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon1,
    CAST((user_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat2,
    CAST((user_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon2
  FROM events
), r AS (
  SELECT event_id,
    SIN((lat2 - lat1) * (PI() / 180.0) / 2) AS sdla,
    SIN((lon2 - lon1) * (PI() / 180.0) / 2) AS sdlo,
    COS(lat1 * (PI() / 180.0)) AS c1,
    COS(lat2 * (PI() / 180.0)) AS c2
  FROM pts
)
SELECT event_id,
       CAST(FLOOR(2.0 * 6371000.0 *
            ASIN(SQRT(sdla * sdla + c1 * c2 * sdlo * sdlo)))
            AS BIGINT) AS dm
FROM r
""",
    tags=("kql", "scalar", "geo"),
)
def k86_kql_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_distance_2points`` — great-circle distance under this
    engine's pinned haversine contract (kql.py:_geo_distance_2points;
    Kusto's WGS-84 geodesic differs by < 0.5%, documented): per event
    the distance between two deterministic synthetic points (modular
    lattices over event_id / user_id — replayable arithmetic, not an
    engine hash), truncated to whole meters for hashability (one trig
    chain per row, no accumulation — cross-engine libm agreement at
    meter scale).

    Scale shape: pure codegen trig per row, one scan, zero shuffles,
    no UDF."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | extend lat1 = todouble((event_id * 7919) % 18000) / 100.0 - 90.0,"
        "          lon1 = todouble((event_id * 104729) % 36000) / 100.0 - 180.0,"
        "          lat2 = todouble((user_id * 7919) % 18000) / 100.0 - 90.0,"
        "          lon2 = todouble((user_id * 104729) % 36000) / 100.0 - 180.0"
        " | extend d = geo_distance_2points(lon1, lat1, lon2, lat2)"
        " | project event_id, dm = tolong(d)",
        {"Events": events},
    )


@query(
    "k87_kql_array_manipulation",
    oracle="""
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), six AS (
  SELECT doc_id, ws[1:6] AS a, ws[1:3] AS h, ws[4:6] AS t
  FROM base WHERE len(ws) >= 6
)
SELECT doc_id,
  array_to_string(list_concat(a[3:6], a[1:2]), ',') AS rot,
  array_to_string(list_concat(a[3:6], ['N', 'N']), ',') AS shf,
  array_to_string(a[1:3], ',') || '|' || array_to_string(a[4:6], ',')
    AS sp,
  COALESCE(array_to_string(list_sort(list_distinct(list_concat(h, t))),
    ','), '') AS su,
  COALESCE(array_to_string(list_sort(list_filter(list_distinct(h),
    x -> list_contains(t, x))), ','), '') AS si,
  COALESCE(array_to_string(list_sort(list_filter(list_distinct(h),
    x -> NOT list_contains(t, x))), ','), '') AS sd,
  h[1] || ':' || t[1] || ',' || h[2] || ':' || t[2] || ',' ||
    h[3] || ':' || t[3] AS zp
FROM six
""",
    tags=("kql", "scalar", "arrays"),
)
def k87_kql_array_manipulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-manipulation scalar family — ``array_rotate_left`` /
    ``array_shift_left`` / ``array_split`` / ``set_union`` /
    ``set_intersect`` / ``set_difference`` / ``zip`` (kql.py array
    family: rotation via pmod + two slices, shifts via the
    out-of-range-get null fill, dedup set algebra on Spark's
    distinct-preserving array ops): each document's first six words
    rotated, shifted, split, and set-compared head-vs-tail. Set
    results are sorted on both sides — Kusto documents set_* element
    ORDER as unspecified, so the pinned comparison is set equality
    (the dedup semantics themselves are pinned by the unit test).

    Scale shape: pure JVM array expressions per row — one scan, zero
    shuffles, no UDF, no explode."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    base = docs.select(
        "doc_id",
        F.slice(ws, 1, 6).alias("a"),
        F.slice(ws, 1, 3).alias("h"),
        F.slice(ws, 4, 3).alias("t"),
        F.size(ws).alias("__n"),
    ).filter(F.col("__n") >= 6).drop("__n")
    out = kql(
        "T | extend rotv = array_rotate_left(a, 2),"
        " shfv = array_shift_left(a, 2),"
        " spv = array_split(a, 3),"
        " suv = array_sort_asc(set_union(h, t)),"
        " siv = array_sort_asc(set_intersect(h, t)),"
        " sdv = array_sort_asc(set_difference(h, t)),"
        " zpv = zip(h, t)",
        {"T": base},
    )
    j = lambda c: F.array_join(c, ",")  # noqa: E731
    return out.select(
        "doc_id",
        j(F.col("rotv")).alias("rot"),
        F.array_join(
            F.transform("shfv", lambda x: F.coalesce(x, F.lit("N"))), ","
        ).alias("shf"),
        F.concat(
            j(F.element_at("spv", 1)), F.lit("|"), j(F.element_at("spv", 2))
        ).alias("sp"),
        j(F.col("suv")).alias("su"),
        j(F.col("siv")).alias("si"),
        j(F.col("sdv")).alias("sd"),
        F.array_join(
            F.transform(
                "zpv",
                lambda p: F.concat(
                    F.element_at(p, 1), F.lit(":"), F.element_at(p, 2)
                ),
            ),
            ",",
        ).alias("zp"),
    )


@query(
    "k88_kql_rolling_percentile",
    oracle="""
WITH bins AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-29 00:00:00',
                                INTERVAL 1 DAY)) AS t
)
SELECT b.t AS Timeline,
       quantile_cont(e.value, 0.9) AS rolling_percentile
FROM bins b
LEFT JOIN events e
  ON e.ts > b.t - INTERVAL 7 DAY AND e.ts <= b.t
GROUP BY 1
""",
    tags=("kql", "timeseries", "percentile"),
)
def k88_kql_rolling_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate rolling_percentile()`` — Kusto's rolling-window
    percentile plugin under this engine's pinned contract
    (kql.py:_compile_rolling_percentile: explicit range, EXACT linear
    interpolation — k30's percentile contract; Kusto's own is its
    internal sketch): per daily bin, the p90 of the event value over
    the trailing 7-day window; null where the window is empty.

    Scale shape: one x7 explode fan + ONE groupBy per report bin
    (exact percentiles do not merge across bins, the k78 DISTINCT
    argument); at 100 TB the swap is a t-digest per day merged per
    window. The oracle is the textbook bins x events range join."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate rolling_percentile(value, 90, ts,"
        " datetime('2024-01-01 00:00:00'),"
        " datetime('2024-01-29 00:00:00'), 1d, 7)",
        {"Events": events},
    )


@query(
    "k89_kql_parse_url",
    oracle="""
WITH u AS (
  SELECT 'shop-' || CAST(o_custkey % 50 AS VARCHAR) || '.example.com'
           AS host,
         CAST(8080 + o_orderkey % 3 AS VARCHAR) AS port,
         '/cat/' || replace(o_orderpriority, ' ', '_') AS path
  FROM orders
)
SELECT host, port,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS dpath
FROM u GROUP BY 1, 2
""",
    tags=("kql", "scalar", "url"),
)
def k89_kql_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` — Kusto's URL decomposition as a dynamic bag
    (kql.py:_parse_url over Spark's built-in parse_url; Scheme/Host/
    Port/Path/credentials/Query Parameters/Fragment keys), composed
    with ``parse_json`` dynamic access: synthesize a deterministic
    URL per order, parse it back, roll up traffic per (host, port)
    with the distinct path count. The oracle rebuilds the components
    from the same arithmetic — the differential proves the
    construct→parse round-trip, not just that a parser ran.

    Scale shape: parse_url + three get_json_object probes are pure
    codegen per row (the b15a dynamic-access shape — no full-document
    parse, no UDF); ONE map-side-combined rollup."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend u = strcat('https://shop-',"
        " tostring(o_custkey % 50), '.example.com:',"
        " tostring(8080 + o_orderkey % 3), '/cat/',"
        " replace_string(o_orderpriority, ' ', '_'),"
        " '?id=', tostring(o_orderkey))"
        " | extend p = parse_url(u)"
        " | extend host = tostring(parse_json(p).Host),"
        "          port = tostring(parse_json(p).Port),"
        "          path = tostring(parse_json(p).Path)"
        " | summarize n = count(), dpath = dcount(path) by host, port",
        {"Orders": orders},
    )


@query(
    "k90_kql_datetime_diff_bitwise",
    oracle="""
WITH b AS (
  SELECT
    (1998*12 + 8)
      - (EXTRACT(YEAR FROM o_orderdate)*12
         + EXTRACT(MONTH FROM o_orderdate)) AS mdiff,
    CAST(FLOOR((
      (DATE '1998-08-02' - CAST(0 AS INTEGER))
      - (o_orderdate::DATE - CAST(dayofweek(o_orderdate) AS INTEGER))
    ) / 7.0) AS BIGINT) AS wdiff,
    CAST(DATE '1998-08-02' - o_orderdate::DATE AS BIGINT) AS ddiff,
    date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
      - INTERVAL 1 MICROSECOND AS eom,
    o_orderkey & 255 AS ba,
    (o_orderkey % 8) << 3 AS bs,
    xor(o_orderkey, o_custkey) AS bx
  FROM orders
)
SELECT CAST(mdiff % 4 AS BIGINT) AS q,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ba) AS BIGINT) AS sba,
       CAST(SUM(bs) AS BIGINT) AS sbs,
       CAST(SUM(bx) AS BIGINT) AS sbx,
       CAST(COUNT(DISTINCT eom) AS BIGINT) AS deom,
       CAST(MIN(wdiff) AS BIGINT) AS wmin,
       CAST(MAX(wdiff) AS BIGINT) AS wmax,
       CAST(SUM(ddiff) AS BIGINT) AS dsum
FROM b GROUP BY 1 ORDER BY 1
""",
    tags=("kql", "scalar", "datetime", "bitwise"),
)
def k90_kql_datetime_diff_bitwise(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``datetime_diff`` (calendar-boundary counting, Sunday-anchored
    weeks) + the ``endof*`` period family + the ``binary_*`` bitwise
    family (kql.py: datetime_diff block, _end_of, binary_* scalars):
    order ages against a fixed anchor in months/weeks/days, month-end
    stamps, and bitwise key arithmetic, rolled up per month-diff
    quarter-bucket.

    NOTE the week anchor: DuckDB's dayofweek is 0 = Sunday while
    Spark's is 1 = Sunday — the oracle subtracts dow directly where
    Spark subtracts dow − 1; both land on the same Sunday start.

    Scale shape: all scalars are pure codegen arithmetic; ONE
    map-side-combined rollup; no UDF."""
    orders = load(spark, sf_dir, "orders")
    anchor = "datetime('1998-08-02 00:00:00')"
    return kql(
        "Orders"
        f" | extend mdiff = datetime_diff('month', {anchor}, o_orderdate),"
        f"          wdiff = datetime_diff('week', {anchor}, o_orderdate),"
        f"          ddiff = datetime_diff('day', {anchor}, o_orderdate),"
        "           eom = endofmonth(o_orderdate),"
        "           ba = binary_and(o_orderkey, 255),"
        "           bs = binary_shift_left(o_orderkey % 8, 3),"
        "           bx = binary_xor(o_orderkey, o_custkey)"
        " | summarize n = count(), sba = sum(ba), sbs = sum(bs),"
        "             sbx = sum(bx), deom = dcount(eom),"
        "             wmin = min(wdiff), wmax = max(wdiff),"
        "             dsum = sum(ddiff) by q = mdiff % 4"
        " | sort by q asc",
        {"Orders": orders},
    )


@query(
    "k91_kql_bag_functions",
    oracle="""
WITH c AS (
  SELECT o_orderkey % 7 AS seg,
         'P' || substr(o_orderpriority, 1, 1) AS pk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT seg,
       CAST(MAX(CASE WHEN pk = 'P1' THEN n END) AS VARCHAR) AS p1,
       CAST(MAX(CASE WHEN pk = 'P3' THEN n END) AS VARCHAR) AS p3,
       CAST(COUNT(*) AS BIGINT) AS nk,
       'probe' AS p9,
       CAST(COUNT(*) - MAX(CASE WHEN pk = 'P1' THEN 1 ELSE 0 END)
            AS BIGINT) AS rk
FROM c GROUP BY seg
""",
    tags=("kql", "scalar", "dynamic"),
)
def k91_kql_bag_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic property-bag family — ``bag_pack`` (typed struct
    form for literal keys, string-map form for computed keys),
    ``make_bag`` (group-wise bag union, deterministic first-wins in
    ascending JSON order — kql.py:_make_bag_agg pins the order Kusto
    leaves arbitrary), ``bag_merge`` (first bag wins on collision),
    ``bag_keys`` and ``bag_remove_keys``: per-(segment, priority)
    counts are packed into per-row bags, merged into one bag per
    segment, probed, extended with a literal bag and key-pruned. The
    oracle reassembles every probed value and key count from the same
    arithmetic — the differential proves the pack → merge → probe
    round-trip, not just that JSON was produced.

    Scale shape: bag construction and key algebra are pure per-row
    codegen (to_json/map_filter/map_concat — no UDF, no explode);
    make_bag is one collect_list + one JVM fold per group, the same
    bound the user accepts for make_list."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | summarize n = count()"
        "   by seg = o_orderkey % 7,"
        "      pk = strcat('P', substring(o_orderpriority, 0, 1))"
        " | extend b = bag_pack(pk, n)"
        " | summarize B = make_bag(b) by seg"
        " | extend m = bag_merge(B, bag_pack('P9', 'probe'))"
        " | extend r = bag_remove_keys(m, pack_array('P1', 'P9'))"
        " | project seg,"
        "           p1 = tostring(parse_json(B).P1),"
        "           p3 = tostring(parse_json(B).P3),"
        "           nk = tolong(array_length(bag_keys(B))),"
        "           p9 = tostring(parse_json(m).P9),"
        "           rk = tolong(array_length(bag_keys(r)))",
        {"Orders": orders},
    )


@query(
    "k92_kql_datetime_format",
    oracle="""
WITH t AS (
  SELECT CAST(o_orderdate AS TIMESTAMP) AS d,
         strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS fd,
         CAST(dayofweek(o_orderdate) AS BIGINT) AS dw,
         strftime(make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                                 CAST(month(o_orderdate) AS BIGINT),
                                 15, 0, 0, 0.0), '%Y-%m-%d') AS md,
         86400 + (o_orderkey % 5) * 990.5 AS secs
  FROM orders
), f AS (
  SELECT d, fd, dw, md,
         CAST(CAST(FLOOR(secs / 86400) AS BIGINT) AS VARCHAR) || '.' ||
         lpad(CAST(CAST(FLOOR(secs / 3600) AS BIGINT) % 24 AS VARCHAR),
              2, '0') || ':' ||
         lpad(CAST(CAST(FLOOR(secs / 60) AS BIGINT) % 60 AS VARCHAR),
              2, '0') || ':' ||
         lpad(CAST(CAST(FLOOR(secs) AS BIGINT) % 60 AS VARCHAR),
              2, '0') || '.' ||
         CAST(CAST(FLOOR((secs - FLOOR(secs)) * 10) AS BIGINT)
              AS VARCHAR) AS ft
  FROM t
)
SELECT fd, dw, md, ft,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(CAST(weekofyear(d) AS BIGINT)) AS wmin
FROM f GROUP BY 1, 2, 3, 4
""",
    tags=("kql", "scalar", "datetime"),
)
def k92_kql_datetime_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datetime formatting/construction family — ``format_datetime``
    (Kusto pattern tokens translated to the JVM formatter,
    kql.py:_kusto_datetime_format), ``format_timespan`` over the
    engine's numeric-seconds timespan carrier, ``totimespan`` literals,
    ``make_datetime``, ``week_of_year`` (ISO 8601 in both engines) and
    ``dayofweek`` (days-since-Sunday as a number). The oracle rebuilds
    every formatted string from strftime / lpad arithmetic — proving
    token-for-token agreement, not just that formatting ran.

    Scale shape: all pure per-row codegen (date_format, lpad/concat
    arithmetic); ONE map-side-combined rollup."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend d = todatetime(o_orderdate)"
        " | extend fd = format_datetime(d, 'yyyy-MM'),"
        "          dw = tolong(dayofweek(d)),"
        "          md = format_datetime("
        "                 make_datetime(getyear(d), monthofyear(d), 15),"
        "                 'yyyy-MM-dd'),"
        "          ft = format_timespan("
        "                 totimespan('1.00:00:00') + (o_orderkey % 5) * 990.5,"
        "                 'd.hh:mm:ss.f')"
        " | summarize n = count(), wmin = min(tolong(week_of_year(d)))"
        "   by fd, dw, md, ft",
        {"Orders": orders},
    )


@query(
    "k93_kql_row_rank_session",
    oracle="""
WITH s AS (
  SELECT event_type, ts,
         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         CASE WHEN LAG(event_type) OVER (ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg,
         CASE WHEN LAG(ts) OVER (ORDER BY ts, event_id) IS NULL
                   OR ts - LAG(ts) OVER (ORDER BY ts, event_id)
                      > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS news
  FROM events WHERE event_id < 500
), s2 AS (
  SELECT event_type,
         CAST(SUM(chg) OVER (ORDER BY rn) AS BIGINT) AS rd,
         MAX(CASE WHEN chg = 1 THEN rn END) OVER (ORDER BY rn) AS rm,
         MAX(CASE WHEN news = 1 THEN ts END) OVER (ORDER BY rn) AS ss
  FROM s
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(rd) AS mx,
       MAX(rm) AS mm,
       CAST(COUNT(DISTINCT ss) AS BIGINT) AS ds
FROM s2 GROUP BY 1
""",
    tags=("kql", "serialized", "session"),
)
def k93_kql_row_rank_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto's serialized rank/session trio — ``row_rank_dense``
    (increments whenever the term changes from the previous row),
    ``row_rank_min`` (the row number of the current run's first row)
    and ``row_window_session`` (session start value; new session on
    gap > MaxDistanceBetweenValues or span > MaxDistanceFromFirst).
    Compiled by kql.py:_compile_row_rank as STAGED window plans (a
    change-indicator column, then a cumulative sum/max over it —
    Spark forbids nested window functions in one expression); the
    session function is the one genuine sequential recursion and runs
    as ONE Arrow mapInPandas pass over the serialized rows (the k54
    kernel shape). This fixture's 365d MaxDistanceFromFirst makes the
    oracle's pure-gap SQL exact; the recursion branch (span-triggered
    restart) is pinned by tests/test_kql.py hand-computed cases.

    Scale shape: serialized operators are single-task by contract in
    Kusto and here alike — the event_id bound keeps the input fixed
    (500 rows) at every SF; use after a row-bounding stage at 100 TB."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | where event_id < 500"
        " | sort by ts asc, event_id asc"
        " | extend rd = row_rank_dense(event_type),"
        "          rm = row_rank_min(event_type),"
        "          ss = row_window_session(ts, 365d, 10m)"
        " | summarize n = count(), mx = max(rd), mm = max(rm),"
        "             ds = dcount(ss) by event_type",
        {"Events": events},
    )


@query(
    "k94_kql_weighted_percentile",
    oracle="""
WITH w AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DOUBLE) AS v,
         CAST(l_quantity AS DOUBLE) AS wt,
         CAST(l_linenumber AS BIGINT) AS ln,
         l_linestatus, l_quantity
  FROM lineitem
), c AS (
  SELECT l_returnflag, v,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v, wt
                       ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS total
  FROM w
)
SELECT a.l_returnflag,
       MIN(CASE WHEN c.cum >= 0.5 * c.total THEN c.v END) AS p50,
       MIN(CASE WHEN c.cum >= 0.9 * c.total THEN c.v END) AS p90,
       MIN(a.ta) AS ta,
       MIN(a.bo) AS bo, MIN(a.ba) AS ba, MIN(a.bx) AS bx
FROM (
  SELECT l_returnflag,
         MIN(CASE WHEN l_quantity > 25 THEN l_linestatus END) AS ta,
         bit_or(ln) AS bo, bit_and(ln) AS ba, bit_xor(ln) AS bx
  FROM w GROUP BY 1
) a JOIN c ON a.l_returnflag = c.l_returnflag
GROUP BY 1
""",
    tags=("kql", "aggregate", "percentile"),
)
def k94_kql_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining aggregate family — ``percentilew`` (exact weighted
    percentile, nearest-rank contract: smallest value whose running
    cumulative weight over (value, weight)-ascending order reaches P%
    of the group total; ONE sorted collect_list + ONE JVM fold, no
    window, no second shuffle), ``take_any``/``take_anyif`` (Kusto
    promises arbitrary; this engine pins the deterministic minimum)
    and ``binary_all_or/and/xor`` (Spark's mergeable bit_* aggregates).
    Integer-valued quantity weights keep every cumulative sum exact in
    doubles, so the oracle's window-cumsum replay is bit-identical.

    Scale shape: percentilew materializes the per-group value list
    (the same bound as make_list / exact percentile — swap a
    weight-expanded percentile_approx sketch at 100 TB); the bit and
    take-any aggregates are single-pass map-side-combined."""
    lineitem = load(spark, sf_dir, "lineitem")
    return kql(
        "Lineitem"
        " | summarize p50 = percentilew(l_extendedprice, l_quantity, 50),"
        "             p90 = percentilew(l_extendedprice, l_quantity, 90),"
        "             ta = take_anyif(l_linestatus, l_quantity > 25),"
        "             bo = binary_all_or(tolong(l_linenumber)),"
        "             ba = binary_all_and(tolong(l_linenumber)),"
        "             bx = binary_all_xor(tolong(l_linenumber))"
        "   by l_returnflag",
        {"Lineitem": lineitem},
    )


@query(
    "k95_kql_series_forecast",
    oracle="""
WITH grid AS (
  SELECT et.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i) DAY AS d
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN unnest(generate_series(0, 36)) AS g(i)
), daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-02-07 00:00:00'
  GROUP BY 1, 2
), dense AS (
  SELECT g.event_type, g.i, CAST(COALESCE(daily.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
), t AS (
  SELECT event_type, i, n,
         AVG(n) OVER (PARTITION BY event_type ORDER BY i
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tv
  FROM dense WHERE i < 30
), ph AS (
  SELECT event_type, i % 7 AS p, AVG(n - tv) AS sv
  FROM t GROUP BY 1, 2
), s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(tv) AS sy, SUM(i * tv) AS sxy
  FROM t GROUP BY 1
), p2 AS (
  SELECT event_type, m, sy, sxy,
         (m-1)*m/2 AS s1, (m-1)*m*(2*m-1)/6 AS s2
  FROM s
), fo AS (
  SELECT event_type, m, sy, s1,
    CASE WHEN m >= 2 AND m*s2 - s1*s1 > 0
         THEN (m*sxy - s1*sy) / (m*s2 - s1*s1) ELSE 0 END AS slope
  FROM p2
), fo2 AS (
  SELECT event_type, slope, (sy - slope*s1)/m AS icpt FROM fo
)
SELECT d.event_type, CAST(d.i AS BIGINT) AS i, d.n AS nv,
       fo2.icpt + fo2.slope * d.i + ph.sv AS f
FROM dense d
JOIN fo2 ON fo2.event_type = d.event_type
JOIN ph ON ph.event_type = d.event_type AND ph.p = d.i % 7
""",
    tags=("kql", "timeseries", "forecast"),
)
def k95_kql_series_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_decompose_forecast`` — the last gap in the series_*
    family (kql.py:_series_decompose_forecast, pinned contract: model
    fit on the series minus the last ``points`` horizon bins, k67's
    STL-lite decomposition + the k80 OLS trend line, forecast[i] =
    line(i) + seasonal phase mean): daily event counts per type over
    a 37-bin grid whose last 7 bins lie beyond the corpus (default 0
    — exactly the make-series-into-the-future shape Kusto documents
    for this function), forecast across the full grid. The oracle
    replays decompose + line fit + phase add from the same dense grid
    (trend values are exact sums-of-integers ÷ window, so the OLS
    inputs agree bit-for-bit; k67 precedent for the phase means).

    Scale shape: everything is JVM folds/transforms over the
    37-element series — ONE rollup shuffle (make-series), no explode
    until the final unpack for the oracle, no Python."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-02-07 00:00:00'"
        " step 1d by event_type"
        " | extend fc = series_decompose_forecast(n, 7, 7)"
        " | mv-expand with_itemindex = i f = fc to typeof(real)"
        " | extend i = tolong(i), nv = todouble(n[i])"
        " | project event_type, i, nv, f",
        {"Events": events},
    )


@query(
    "k96_kql_parse_kv",
    oracle="""
SELECT o_orderpriority AS p,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS ks,
       SUM(CAST(o_totalprice AS DOUBLE)) AS ts
FROM orders GROUP BY 1
""",
    tags=("kql", "parse", "kv"),
)
def k96_kql_parse_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse-kv`` — Kusto's key-value extraction operator (kql.py
    stage compiler: ONE str_to_map with regex-escaped literal
    delimiters + one typed probe per DECLARED key): a kv-encoded
    string is synthesized per order, parsed back with declared types
    (long/string/real), and rolled up. The oracle computes the same
    rollup from the raw columns — the differential proves the
    encode → parse-kv → typed-probe round-trip including numeric
    casts, not just string splitting.

    Scale shape: pure per-row codegen (str_to_map + element_at +
    cast); undeclared keys never materialize; ONE map-side-combined
    rollup."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend s = strcat('k=', tostring(o_orderkey),"
        " '; p=', o_orderpriority,"
        " '; t=', tostring(o_totalprice))"
        " | parse-kv s as (k: long, p: string, t: real)"
        "   with (pair_delimiter='; ', kv_delimiter='=')"
        " | summarize n = count(), ks = sum(k), ts = sum(t) by p",
        {"Orders": orders},
    )


@query(
    "k97_kql_facet",
    oracle="""
SELECT 'o_orderpriority' AS facet_column,
       o_orderpriority AS value,
       CAST(COUNT(*) AS BIGINT) AS Count
FROM orders GROUP BY 2
UNION ALL
SELECT 'o_orderstatus', o_orderstatus, CAST(COUNT(*) AS BIGINT)
FROM orders GROUP BY 2
UNION ALL
SELECT 'seg', CAST(o_orderkey % 3 AS VARCHAR), CAST(COUNT(*) AS BIGINT)
FROM orders GROUP BY 2
""",
    tags=("kql", "facet"),
)
def k97_kql_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``facet by`` — Kusto's multi-table value-distribution operator
    (one ``summarize count() by col`` table per listed column); this
    single-table engine surface renders the tables unioned behind a
    ``facet_column`` discriminator with stringified values — the same
    adaptation the fork render uses (kql_fork is the multi-table
    sibling). A computed column (extend seg) rides along to prove
    facet composes with the pipeline, not just raw columns.

    Scale shape: one map-side-combined rollup per facet column over
    the same scan (Spark reuses the exchange where beneficial); the
    union moves only per-value count rows."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | extend seg = o_orderkey % 3"
        " | facet by o_orderpriority, o_orderstatus, seg",
        {"Orders": orders},
    )


_SERIES2 = """
WITH grid AS (
  SELECT et.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i * 6) HOUR AS d
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN unnest(generate_series(0, 111)) AS g(i)
), bins AS (
  SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS d,
         CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS c2
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
  GROUP BY 1, 2
), dense AS (
  SELECT g.event_type, g.i,
         CAST(COALESCE(b.c1, 0) AS DOUBLE) AS c1,
         CAST(COALESCE(b.c2, 0) AS DOUBLE) AS c2
  FROM grid g LEFT JOIN bins b
    ON b.event_type = g.event_type AND b.d = g.d
)
"""


@query(
    "k98_kql_series_similarity",
    oracle=_SERIES2 + """
SELECT event_type,
       SUM(c1 * c2) AS dp,
       SQRT(SUM(c1 * c1)) AS m1,
       SQRT(SUM(c2 * c2)) AS m2,
       SUM(c1 * c2) / (SQRT(SUM(c1 * c1)) * SQRT(SUM(c2 * c2))) AS cs,
       (COUNT(*) * SUM(c1 * c2) - SUM(c1) * SUM(c2))
         / (SQRT(COUNT(*) * SUM(c1 * c1) - SUM(c1) * SUM(c1))
            * SQRT(COUNT(*) * SUM(c2 * c2) - SUM(c2) * SUM(c2))) AS pc
FROM dense GROUP BY 1
""",
    tags=("kql", "timeseries", "similarity"),
)
def k98_kql_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The series similarity-math family — ``series_dot_product`` /
    ``series_magnitude`` / ``series_cosine_similarity`` /
    ``series_pearson_correlation`` (kql.py:_series_dot et al.; null on
    length mismatch or degenerate denominators), over TWO series built
    by ONE multi-aggregate make-series (n aggregates share the grid
    and the single per-bin rollup — one shuffle, not n; this entry is
    also the multi-column make-series pin). Integer count series keep
    every fold sum exact in doubles, so the oracle's closed forms
    agree bit-for-bit before the final single-op divisions.

    Scale shape: folds/zips over the 112-bin arrays — no explode, no
    Python; ONE rollup shuffle total."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n1 = countif(value > 100), n2 = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-29 00:00:00'"
        " step 6h by event_type"
        " | project event_type,"
        "   dp = series_dot_product(n1, n2),"
        "   m1 = series_magnitude(n1), m2 = series_magnitude(n2),"
        "   cs = series_cosine_similarity(n1, n2),"
        "   pc = series_pearson_correlation(n1, n2)",
        {"Events": events},
    )


@query(
    "k99_kql_series_arithmetic",
    oracle=_SERIES2 + """
SELECT event_type, CAST(i AS BIGINT) AS i,
       c1 + c2 AS v,
       c1 - c2 AS vsub,
       c1 * c2 AS vmul,
       c1 / NULLIF(c2, 0) AS vdiv,
       ABS(c1 - c2) AS vabs,
       c2 * c2 AS vpow
FROM dense
""",
    tags=("kql", "timeseries", "arithmetic"),
)
def k99_kql_series_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise series arithmetic — ``series_add/subtract/multiply/
    divide`` (zero divisors pinned to null on both engines), unary
    ``series_abs``/``series_pow``, composed (abs∘subtract) to prove
    the family chains. One zip_with per op over the shared make-series
    arrays; the typed mv-expand + computed-index probes unpack every
    element for the oracle.

    Scale shape: per-row array expressions until the single unpack
    explode; ONE rollup shuffle (the shared multi-agg make-series)."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n1 = countif(value > 100), n2 = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-29 00:00:00'"
        " step 6h by event_type"
        " | extend s_add = series_add(n1, n2),"
        "   s_sub = series_subtract(n1, n2),"
        "   s_mul = series_multiply(n1, n2),"
        "   s_div = series_divide(n1, n2),"
        "   s_abs = series_abs(series_subtract(n1, n2)),"
        "   s_pow = series_pow(n2, 2)"
        " | mv-expand with_itemindex = i v = s_add to typeof(real)"
        " | extend i = tolong(i), vsub = todouble(s_sub[i]),"
        "   vmul = todouble(s_mul[i]), vdiv = todouble(s_div[i]),"
        "   vabs = todouble(s_abs[i]), vpow = todouble(s_pow[i])"
        " | project event_type, i, v, vsub, vmul, vdiv, vabs, vpow",
        {"Events": events},
    )


@query(
    "k100_kql_ipv4_lookup",
    oracle="""
WITH src AS (SELECT o_orderkey % 128 AS a FROM orders)
SELECT 'corp' AS label, CAST(COUNT(*) AS BIGINT) AS n FROM src
UNION ALL
SELECT 'teamA', CAST(COUNT(*) AS BIGINT) FROM src WHERE a = 0
UNION ALL
SELECT 'vpn', CAST(COUNT(*) AS BIGINT) FROM src WHERE a >= 64
""",
    tags=("kql", "plugin", "ipv4"),
)
def k100_kql_ipv4_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate ipv4_lookup`` — Kusto's IP-to-network lookup plugin
    (kql.py:_compile_ipv4_lookup): per-order source IPs are joined
    against a CIDR table (an overlapping /8 supernet, a /16, a /10,
    and a never-matching /12), ALL containing networks match (Kusto's
    contract — a 10.0.x.y row lands in both teamA's /16 and corp's
    /8). The oracle replays each network's mask predicate as plain
    octet arithmetic, including the empty network's absence.

    Scale shape (the plugin's reason to exist): NEVER a range/theta
    join — the dim reduces to (prefix_len, masked_net), the probe
    fans each row into one candidate per DISTINCT prefix length
    present (3 here, ≤ 33 ever, bounded driver collect), and the
    lookup is ONE bounded explode + ONE broadcast equi-join, so the
    fact side streams through codegen at any scale."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "let Nets = datatable (net: string, label: string) ["
        " '10.0.0.0/16', 'teamA', '10.0.0.0/8', 'corp',"
        " '10.64.0.0/10', 'vpn', '172.16.0.0/12', 'priv' ];"
        " Orders"
        " | extend ip = strcat('10.', tostring(o_orderkey % 128), '.',"
        " tostring(o_custkey % 256), '.', tostring(o_orderkey % 256))"
        " | evaluate ipv4_lookup(Nets, ip, net)"
        " | summarize n = count() by label",
        {"Orders": orders},
    )


@query(
    "k101_kql_dcount_intersect",
    oracle="""
WITH a AS (
  SELECT DISTINCT user_id % 16 AS g, user_id FROM events
  WHERE event_type = 'purchase'
), b AS (
  SELECT DISTINCT user_id % 16 AS g, user_id FROM events
  WHERE event_type = 'view'
), c AS (
  SELECT DISTINCT user_id % 16 AS g, user_id FROM events
  WHERE value > 150
)
SELECT a.g,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS s0,
       CAST(COUNT(DISTINCT CASE WHEN b.user_id IS NOT NULL
                                THEN a.user_id END) AS BIGINT) AS s1,
       CAST(COUNT(DISTINCT CASE WHEN b.user_id IS NOT NULL
                                 AND c.user_id IS NOT NULL
                                THEN a.user_id END) AS BIGINT) AS s2
FROM a
LEFT JOIN b ON b.g = a.g AND b.user_id = a.user_id
LEFT JOIN c ON c.g = a.g AND c.user_id = a.user_id
GROUP BY 1
""",
    tags=("kql", "plugin", "sketch"),
)
def k101_kql_dcount_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate dcount_intersect`` — Kusto's sketch-intersection
    plugin over ``hll()`` columns (kql.py evaluate chain): per user
    segment, the purchasing audience (s0), its overlap with viewers
    (s1), and the three-way overlap with high-value users (s2), all by
    inclusion-exclusion over per-row REGISTER-MAX SKETCH UNIONS
    (intersection sketches don't exist; unions do). The conditional
    sketches are built with ``hll(iff(pred, user, tolong('')))`` —
    nulls never enter a sketch, and the try-semantics ``tolong``
    (Kusto's conversion contract, null on malformed) is what makes
    that idiom legal under ANSI. Segment cardinalities sit in the
    sketches' exact coupon range at every SF, so the exact-recount
    oracle is a true differential (the same exactness contract as
    dcount_hll/b41).

    Scale shape: sketches aggregate mergeable and map-side-combined;
    the intersection arithmetic is per-row JVM sketch ops — no second
    shuffle, no UDF, no user-id movement past the rollup."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | summarize"
        " h1 = hll(iff(event_type == 'purchase', user_id, tolong(''))),"
        " h2 = hll(iff(event_type == 'view', user_id, tolong(''))),"
        " h3 = hll(iff(value > 150, user_id, tolong('')))"
        " by g = user_id % 16"
        " | evaluate dcount_intersect(h1, h2, h3)"
        " | project g, s0, s1, s2",
        {"Events": events},
    )


@query(
    "k102_kql_funnel_completion",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, s1.t1, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1, 2
), s3 AS (
  SELECT e.user_id, s2.t1, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1, 2
), steps AS (
  SELECT user_id, t1, 'signup' AS step, t1 AS tj FROM s1
  UNION ALL SELECT user_id, t1, 'view', t2 FROM s2
  UNION ALL SELECT user_id, t1, 'purchase', t3 FROM s3
), w AS (SELECT unnest([3600, 86400, 604800]) AS win)
SELECT time_bucket(INTERVAL '1 day', t1) AS period,
       step, CAST(win AS BIGINT) AS window_s,
       CAST(COUNT(*) AS BIGINT) AS ids
FROM steps, w
WHERE epoch_us(tj) - epoch_us(t1) <= CAST(win AS BIGINT) * 1000000
GROUP BY 1, 2, 3
""",
    tags=("kql", "plugin", "funnel"),
)
def k102_kql_funnel_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate funnel_sequence_completion`` — the k71 funnel's
    completion form (kql.py:_compile_funnel_completion): per period
    bin of each user's earliest signup, per sequence step
    (signup → view → purchase) and per comparison window (1h/1d/7d),
    the count of users who completed that step within the window.
    Completion compares in MICROSECONDS on both engines (unix_micros /
    epoch_us) so sub-second event times never misclassify a boundary.

    Scale shape: the earliest-completion cascade is one conditional
    MIN per step on the user key (co-partitioned, no stream-wide
    window), each step's survivor table retained; the window fan is a
    3-literal explode; ONE final rollup. Pure Catalyst, no Python."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate funnel_sequence_completion(user_id, ts, 1d,"
        " event_type, ('signup', 'view', 'purchase'), (1h, 1d, 7d))",
        {"Events": events},
    )


@query(
    "k103_kql_hash_digest_functions",
    oracle="""
WITH b AS (
  SELECT lang,
         md5(lower(text)) AS fp,
         sha256(source || ':' || lang) AS sig,
         strlen(text) AS nbytes,
         CAST(to_timestamp(doc_id * 86400) AS TIMESTAMP) AS ts,
         degrees(atan2(CAST(n_chars AS DOUBLE), 100.0)) AS ang
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS ufp,
       CAST(COUNT(DISTINCT sig) AS BIGINT) AS usig,
       CAST(SUM(nbytes) AS BIGINT) AS bytes,
       MIN(ts) AS first_day,
       MIN(fp) AS fp_min,
       AVG(ang) AS mean_angle
FROM b GROUP BY 1 ORDER BY 1
""",
    tags=("kql", "scalar", "hash"),
)
def k103_kql_hash_digest_functions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Kusto digest/byte-size scalar family (kql.py _SCALARS:
    ``hash_md5`` / ``hash_sha256`` / ``string_size`` /
    ``unixtime_seconds_todatetime`` + the trig family ``atan2`` /
    ``degrees``): a per-language content-integrity audit — md5 content
    fingerprints, sha256 provenance signatures, byte (not char) sizes,
    epoch-day timestamps. Digests are lowercase-hex on BOTH engines,
    so unlike ``hash()`` (engine-defined xxhash64) this family is
    oracle-exact; ``hash_sha1``/``hash_combine`` exist in the compiler
    too and are pinned by unit vector tests (DuckDB has no sha1 to
    differential against). The oracle CASTs DuckDB's ``to_timestamp``
    (which returns TIMESTAMP WITH TIME ZONE) to naive TIMESTAMP so the
    ``first_day`` dtype matches Spark's naive timestamp — the values
    were always identical; only the dtype differed (r11 driver row).

    Scale shape: every scalar is pure JVM codegen (md5/sha2 are
    built-in expressions, no UDF); ONE map-side-combined rollup by
    lang; distinct counts shuffle the 32-byte digest, never the
    document text."""
    docs = load(spark, sf_dir, "documents")
    return kql(
        "Documents"
        " | extend fp = hash_md5(tolower(text)),"
        "          sig = hash_sha256(strcat(source, ':', lang)),"
        "          nbytes = string_size(text),"
        "          ts = unixtime_seconds_todatetime(doc_id * 86400),"
        "          ang = degrees(atan2(todouble(n_chars), 100.0))"
        " | summarize docs = count(), ufp = dcount(fp),"
        "             usig = dcount(sig), bytes = sum(nbytes),"
        "             first_day = min(ts), fp_min = min(fp),"
        "             mean_angle = avg(ang) by lang"
        " | sort by lang asc",
        {"Documents": docs},
    )


@query(
    "k104_kql_partition_datatable",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS rn
  FROM orders
), kept AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS kept_sum
  FROM ranked WHERE rn <= 2 GROUP BY 1
), boosts(o_orderpriority, boost) AS (
  VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
         ('4-NOT SPECIFIED', 2), ('5-LOW', 1)
)
SELECT k.o_orderpriority, k.n_kept, k.kept_sum,
       k.kept_sum * b.boost AS weighted
FROM kept k JOIN boosts b USING (o_orderpriority)
ORDER BY k.o_orderpriority
""",
    tags=("kql", "partition", "datatable"),
)
def k104_kql_partition_datatable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kusto's ``partition by`` per-key subquery operator + the
    ``datatable`` literal source, driver-gate-visible (both are
    compiler features with unit tests — kql.py:_compile partition
    block, test_kql.py getschema/datatable/sample suites — this entry
    puts the composition under the DuckDB differential): per-priority
    top-2 orders by value via ``partition by (top 2 by ...)``, rolled
    up and joined against an inline ``datatable`` of priority boosts.

    Tie-safety: the output aggregates (count, decimal sum) over the
    kept set are INVARIANT to which of the equal boundary values
    row_number picks, so the differential cannot flake on totalprice
    ties.

    Scale shape: ``partition (top N)`` compiles to row_number over
    (partitionBy, orderBy) — Catalyst's WindowGroupLimit applies the
    per-group limit BEFORE the shuffle; the datatable is a 5-row
    local relation, broadcast by size."""
    orders = load(spark, sf_dir, "orders")
    return kql(
        "Orders"
        " | partition by o_orderpriority (top 2 by o_totalprice)"
        " | summarize n_kept = count(), kept_sum = sum(o_totalprice)"
        "             by o_orderpriority"
        " | join kind=inner ("
        "     datatable (o_orderpriority: string, boost: long) ["
        "       '1-URGENT', 5, '2-HIGH', 4, '3-MEDIUM', 3,"
        "       '4-NOT SPECIFIED', 2, '5-LOW', 1"
        "     ]) on o_orderpriority"
        " | project o_orderpriority, n_kept, kept_sum,"
        "           weighted = kept_sum * boost"
        " | sort by o_orderpriority asc",
        {"Orders": orders},
    )


@query(
    "k105_kql_python_plugin",
    oracle="""
SELECT event_id,
       value * 2.0 + 1.0 AS score,
       CAST(FLOOR(value / 10.0) AS BIGINT) AS vbucket
FROM events
""",
    tags=("kql", "plugin", "python"),
)
def k105_kql_python_plugin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate python(typeof(...), 'script')`` — Kusto's inline
    Python plugin (kql.py:_compile_python_plugin). The script execs
    once per partition over the partition's rows as a pandas ``df``
    and returns ``result`` against the declared typeof schema —
    Kusto's own per-shard sandbox contract, so partition-locality is
    parity, not a divergence. This test script is deliberately
    row-local pure arithmetic so the DuckDB oracle can verify the
    WHOLE boundary value-exactly (schema coercion, Arrow round-trip,
    column selection); real deployments put the genuinely
    non-SQL-expressible kernel here.

    Scale shape: the only cost beyond a scan is the one Arrow
    round-trip; no shuffle, scripts run partition-parallel. The
    partition-must-fit-in-pandas bound is Kusto's own shard bound.

    The plugin is gated off by default (it exec()s script text on
    executors; upstream Kusto ships it admin-disabled the same way) —
    this repo-authored query opts in explicitly, the trust contract
    being identical to registering a UDF."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | evaluate python(typeof(event_id:long, score:real,"
        " vbucket:long),"
        " 'result = pd.DataFrame({\"event_id\": df[\"event_id\"],"
        " \"score\": df[\"value\"].to_numpy() * 2.0 + 1.0,"
        " \"vbucket\": np.floor(df[\"value\"].to_numpy() / 10.0)"
        ".astype(\"int64\")})')",
        {"Events": events},
        allow_python=True,
    )


def _k106_oracle() -> str:
    """DuckDB twin of the p=5 geohash encode/decode arithmetic —
    generated from the same interleave layout the Spark scalar
    unrolls (kql.py:_geo_point_to_geohash)."""
    p = 5
    total, lon_bits, lat_bits = 5 * p, 13, 12
    terms = []
    for k in range(total):
        j = k // 2
        src, bits = ("lon_idx", lon_bits) if k % 2 == 0 else ("lat_idx", lat_bits)
        terms.append(f"(({src} >> {bits - 1 - j}) % 2) * {1 << (total - 1 - k)}")
    code_sql = " + ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST((code >> {5 * (p - 1 - i)}) % 32 AS INT) + 1, 1)"
        for i in range(p)
    )
    return f"""
WITH pts AS (
  SELECT CAST((event_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
         CAST((event_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat
  FROM events
), idx AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 360.0 * {float(2**lon_bits)})
           AS BIGINT), 0), {2**lon_bits - 1}) AS lon_idx,
         LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * {float(2**lat_bits)})
           AS BIGINT), 0), {2**lat_bits - 1}) AS lat_idx
  FROM pts
), coded AS (
  SELECT lon_idx, lat_idx, {code_sql} AS code FROM idx
), gh AS (
  SELECT {chars} AS gh,
         ((lon_idx + 0.5) / {float(2**lon_bits)}) * 360.0 - 180.0 AS clon,
         ((lat_idx + 0.5) / {float(2**lat_bits)}) * 180.0 - 90.0 AS clat
  FROM coded
)
SELECT gh, clon, clat, CAST(COUNT(*) AS BIGINT) AS n
FROM gh GROUP BY 1, 2, 3
ORDER BY n DESC, gh ASC LIMIT 20
"""


@query(
    "k106_kql_geohash",
    oracle=_k106_oracle(),
    tags=("kql", "scalar", "geo"),
)
def k106_kql_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_point_to_geohash`` + ``geo_geohash_to_central_point`` —
    Kusto's geospatial cell-rollup pair (kql.py:_geo_point_to_geohash):
    every event's deterministic lattice point (k86's replayable
    modular arithmetic) encodes to its precision-5 geohash cell
    (standard base-32 bit-interleave, verified against the canonical
    ezs42 vector in tests), cells roll up to the top-20 hotspots with
    their decoded centers — the standard map-tile heatmap query.

    Determinism: quantization is floor on identical doubles;
    everything after is integer shifts/masks; tie-break gh asc.

    Scale shape: encode is an all-JVM Morton spread (let-bound
    shift/mask chain — 14x faster than the unrolled per-bit fold,
    measured); the rollup is ONE map-side-combined groupBy on the
    cell id — the geohash IS the shuffle key, which is why cell
    systems partition this way at planet scale; decode runs AFTER the
    top-20 (20 rows, never the corpus); TakeOrderedAndProject."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | extend lon = todouble((event_id * 104729) % 36000) / 100.0 - 180.0,"
        "          lat = todouble((event_id * 7919) % 18000) / 100.0 - 90.0"
        " | extend gh = geo_point_to_geohash(lon, lat, 5)"
        " | summarize n = count() by gh"
        " | sort by n desc, gh asc"
        " | take 20"
        " | extend c = geo_geohash_to_central_point(gh)"
        " | extend clon = c[0], clat = c[1]"
        " | project gh, clon, clat, n",
        {"Events": events},
    )


def _k107_fb_sql() -> str:
    """DuckDB twin of format_bytes(b, 2) for non-negative b < 1 TB —
    the same unit thresholds, integer HALF-AWAY rounding (equal to
    Spark's HALF_UP for the non-negative domain), trailing-zero trim."""
    units = ["Bytes", "KB", "MB", "GB"]
    k_case = (
        "CASE WHEN b >= 1073741824 THEN 3 WHEN b >= 1048576 THEN 2 "
        "WHEN b >= 1024 THEN 1 ELSE 0 END"
    )
    unit_case = (
        "CASE k "
        + " ".join(f"WHEN {i} THEN '{u}'" for i, u in enumerate(units))
        + " END"
    )
    return f"""
  SELECT *, CASE WHEN frac = '' THEN intp ELSE intp || '.' || frac END
              || ' ' || ({unit_case}) AS fb
  FROM (
    SELECT *, CAST(CAST(FLOOR(r / 100.0) AS BIGINT) AS VARCHAR) AS intp,
           rtrim(lpad(CAST(r % 100 AS VARCHAR), 2, '0'), '0') AS frac
    FROM (
      SELECT *, CAST(ROUND(b / POW(1024.0, k) * 100.0, 0) AS BIGINT) AS r
      FROM (SELECT *, {k_case} AS k FROM src)
    )
  )"""


@query(
    "k107_kql_format_scalars",
    oracle=f"""
WITH src AS (
  SELECT event_id, user_id,
         (event_id * 104729) % 1099511627776 AS b
  FROM events
), fb AS (
{_k107_fb_sql()}
)
SELECT CASE k WHEN 0 THEN 'Bytes' WHEN 1 THEN 'KB' WHEN 2 THEN 'MB'
       ELSE 'GB' END AS unit,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(fb) AS lo, MAX(fb) AS hi,
       CAST(COUNT(*) FILTER (
         WHERE event_id % 97 <> 0 AND event_id % 4 >= 2) AS BIGINT)
         AS n_v2plus
FROM fb GROUP BY 1
""",
    tags=("kql", "scalar", "format"),
)
def k107_kql_format_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``format_bytes`` + ``parse_version`` (kql.py:_format_bytes /
    _parse_version): per event, a deterministic byte count formats to
    its human-readable binary-unit string (integer-exact scaled
    rounding, trailing-zero trim — the pinned contract verified here
    string-for-string via min/max per unit), and a derived version
    string parses to Kusto's comparable DECIMAL(38,0) encoding
    (8-digit-padded parts; the 'beta' rows prove non-numeric -> null,
    dropping out of countif). Rollup per unit with the
    version-ordering predicate pv >= parse_version('2.0').

    Scale shape: both scalars are pure codegen (when-chains + string
    ops + decimal fold — no UDF); ONE map-side-combined groupBy on
    the 4-value unit key."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | extend b = (event_id * 104729) % 1099511627776"
        " | extend ver = iff(event_id % 97 == 0, 'beta',"
        "     strcat(event_id % 4, '.', user_id % 20, '.', event_id % 100))"
        " | extend fb = format_bytes(b, 2), pv = parse_version(ver)"
        " | extend unit = extract(' ([A-Za-z]+)$', 1, fb)"
        " | summarize n = count(), lo = min(fb), hi = max(fb),"
        "   n_v2plus = countif(pv >= parse_version('2.0')) by unit",
        {"Events": events},
    )


@query(
    "k108_kql_graph_shortest_paths",
    oracle="""
WITH RECURSIVE seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), e AS (
  SELECT DISTINCT event_type AS s, next_type AS d
  FROM seq WHERE next_type IS NOT NULL
), walk AS (
  SELECT s, d, 1 AS hops FROM e
  UNION ALL
  SELECT w.s, e.d, w.hops + 1 FROM walk w JOIN e ON e.s = w.d
  WHERE w.hops < 4
)
SELECT s AS a, d AS b, CAST(MIN(hops) AS BIGINT) AS hops
FROM walk WHERE s = 'signup'
GROUP BY 1, 2
""",
    tags=("kql", "graph"),
)
def k108_kql_graph_shortest_paths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``make-graph`` + ``graph-shortest-paths`` — Kusto's bounded-hop
    shortest-path operator (kql.py:_compile_graph_shortest_paths),
    completing the graph family next to k70's graph-match: over the
    distinct event-type transition graph, the shortest path length
    (1..4 hops) from 'signup' to every reachable type. The oracle
    recomputes the closure with a recursive CTE + MIN(hops); the
    engine runs level-synchronous BFS (one hash equi-join + one
    anti-join per level — first level found IS the minimum, no
    MIN-over-paths blowup, which is the whole point at scale: the CTE
    enumerates PATHS, the BFS enumerates PAIRS).

    Scale: frontier joins are edge-keyed and broadcastable; hub
    fan-out is bounded by the anti-join's dedup each level; K is a
    literal. Sources should be filtered before make-graph when the
    seed set is bounded (documented in the compile)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    edges = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .select(
            F.col("event_type").alias("s"), F.col("next_type").alias("d")
        )
        .distinct()
    )
    return kql(
        "E | make-graph s --> d"
        " | graph-shortest-paths (a)-[*1..4]->(b)"
        "   where a == 'signup' project a, b, hops",
        {"E": edges},
    )


@query(
    "k109_kql_graph_mark_components",
    oracle="""
WITH RECURSIVE p AS (
  SELECT user_id, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, MIN(event_id) AS root FROM p GROUP BY user_id
), pe AS (
  SELECT p.user_id, p.event_id, p.k, p.cents, r.root
  FROM p JOIN r USING (user_id)
), links AS (
  SELECT DISTINCT a.root AS s, b.root AS d
  FROM pe a JOIN pe b
    ON a.k = b.k AND a.cents = b.cents AND a.root < b.root
), e AS (
  SELECT s AS a, d AS b FROM links
  UNION SELECT d, s FROM links
), reach AS (
  SELECT a AS id, a AS comp FROM e
  UNION
  SELECT e.b, r2.comp FROM reach r2 JOIN e ON e.a = r2.id
), m AS (
  SELECT id, MIN(comp) AS comp FROM reach GROUP BY id
)
SELECT pe.event_id AS node,
       CAST(COALESCE(m.comp, pe.root) AS BIGINT) AS cid
FROM pe LEFT JOIN m ON m.id = pe.root
""",
    tags=("kql", "graph"),
)
def k109_kql_graph_mark_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``make-graph`` + ``graph-mark-components with_component_id=``
    — Kusto's connected-components marker
    (kql.py:_compile_graph_mark_components), completing the graph
    trio next to k70's graph-match and k108's shortest-paths. The
    fixture is entity resolution over purchase events: every purchase
    belongs to its user's entity, and two ENTITIES merge when any of
    their purchases share the exact (props.k, value-cents) signature
    — the transitive closure a pairwise join cannot express. Every
    purchase is emitted with its entity id = min reachable event_id
    (deterministic; Kusto's own component ids are arbitrary, the
    canonical choice is what makes a differential oracle possible —
    the DuckDB twin recomputes the closure with a recursive CTE).

    Scale shape — CONTRACT, MARK, EXPAND (the at-scale discipline for
    any entity-resolution CC): the event graph is first contracted to
    one node per user (root = the user's min event_id, one
    partition-local window), graph-mark-components runs on the
    CONTRACTED signature-link graph (nodes = entities, edges bounded
    by observed signature collisions — orders of magnitude below the
    event count), and the component labels broadcast-join back to the
    full event table. Component-of-root == component-of-event because
    every root is its star's minimum. The CC itself is
    operators/graph.py min-label propagation (node-keyed equi-join +
    map-side-combined groupBy-min per round, adaptive pointer
    jumping, localCheckpoint per round) — never a driver-side graph.
    The signature self-join is equi-keyed on (k, cents); a production
    run caps hot signatures exactly like the LSH hot-bucket cap
    (operators/dedup.py:cap_bucket_width)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn(
            "root", F.min("event_id").over(Window.partitionBy("user_id"))
        )
    )
    links = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.root") < F.col("b.root")),
        )
        .select(F.col("a.root").alias("s"), F.col("b.root").alias("d"))
        .distinct()
    )
    marked = kql(
        "E | make-graph s --> d"
        " | graph-mark-components with_component_id=cid",
        {"E": links},
    )
    # NO forced broadcast: marked scales with linked entities (a
    # user-count-bounded side, not a fixed dim) — AQE/statistics pick
    # broadcast at test SFs on their own (r10 advice discipline).
    return ev.join(
        marked, ev["root"] == marked["node"], "left"
    ).select(
        F.col("event_id").alias("node"),
        F.coalesce(marked["cid"], ev["root"]).alias("cid"),
    )


@query(
    "k110_kql_series_iir",
    oracle="""
WITH RECURSIVE grid AS (
  SELECT et.event_type, g.t,
         ROW_NUMBER() OVER (PARTITION BY et.event_type ORDER BY g.t) - 1
           AS i
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-07 00:00:00',
                                  INTERVAL '1 day')) AS t
  ) g
), binned AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS t,
         COUNT(*) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2
), series AS (
  SELECT g.event_type, g.i, CAST(COALESCE(b.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN binned b
    ON g.event_type = b.event_type AND g.t = b.t
), iir AS (
  SELECT event_type, i, 0.5 * n AS y FROM series WHERE i = 0
  UNION ALL
  SELECT s.event_type, s.i, 0.5 * s.n + 0.5 * p.y
  FROM series s JOIN iir p
    ON p.event_type = s.event_type AND s.i = p.i + 1
)
SELECT event_type, CAST(i AS BIGINT) AS i, y FROM iir
""",
    tags=("kql", "timeseries", "dsp"),
)
def k110_kql_series_iir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_iir`` — Kusto's infinite-impulse-response filter
    (kql.py:_series_iir), the FEEDBACK complement of k60's
    series_fir and the last gap in the series DSP family
    (fir → iir → decompose → forecast): an EWMA smoother
    (b=[0.5], a=[1, -0.5] ⇒ y[i] = (x[i] + y[i-1])/2 — halves are
    binary-exact, so the differential is bit-exact, not
    rounding-tolerant) over the per-type daily count series, unpacked
    to rows through the typed mv-expand. The oracle replays the same
    recurrence with a recursive CTE over the dense grid.

    Scale shape: the recurrence is ONE JVM aggregate fold per series
    evaluated at runtime (HOF lambdas interpret iteratively — the
    expression tree stays O(taps) whatever the series length, the
    k74/k106 staged-compile lesson applied by construction); dense
    grid + filter + unpack is one Catalyst plan — bin-rollup shuffle,
    per-group array ops, one generator."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 00:00:00'"
        " step 1d by event_type"
        " | extend y = series_iir(n, dynamic([0.5]), dynamic([1, -0.5]))"
        " | mv-expand with_itemindex = i y to typeof(real)"
        " | project event_type, i = tolong(i), y",
        {"Events": events},
    )


#: k111's polygon — a single non-convex ring (closed, no holes) in
#: plain lon/lat. Vertices sit at .005 offsets so no synthetic lattice
#: point (multiples of 0.01) can coincide with a vertex; both the KQL
#: dynamic literal and the DuckDB oracle are GENERATED from this one
#: constant so the two engines can never drift.
_K111_RING = [
    (-120.005, -60.005),
    (-10.005, -75.005),
    (80.005, -20.005),
    (20.005, 10.005),
    (110.005, 55.005),
    (-40.005, 70.005),
    (-60.005, 5.005),
    (-120.005, -60.005),
]


def _k111_ring_literal() -> str:
    return (
        "dynamic(["
        + ", ".join(f"[{x!r}, {y!r}]" for x, y in _K111_RING)
        + "])"
    )


def _k111_oracle() -> str:
    """Crossing-number replay with the edge slopes PRE-FOLDED to the
    same double constants the Spark expression carries (repr is
    shortest-round-trip, so both engines parse the identical double),
    and every comparison in the same textual order — bit-exact."""
    terms = []
    for (x1, y1), (x2, y2) in zip(_K111_RING, _K111_RING[1:]):
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"(CASE WHEN (({y1!r} > lat) <> ({y2!r} > lat))"
            f" AND lon < ((lat - {y1!r}) * {slope!r} + {x1!r})"
            " THEN 1 ELSE 0 END)"
        )
    total = "\n       + ".join(terms)
    return f"""
WITH pts AS (
  SELECT event_id,
    CAST((event_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
    CAST((event_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
  FROM events
)
SELECT event_id,
       (({total}) % 2) = 1 AS inside
FROM pts
"""


@query(
    "k111_kql_geo_point_in_polygon",
    oracle=_k111_oracle(),
    tags=("kql", "scalar", "geo"),
)
def k111_kql_geo_point_in_polygon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``geo_point_in_polygon`` — point-in-polygon membership over the
    k86 synthetic point lattice (kql.py:_geo_point_in_polygon; the ADX
    geospatial family next to k86's distance and k106's geohash).
    Pinned subset: the polygon is a compile-time ``dynamic([[lon,lat],
    ...])`` ring literal (closed, no holes — the GeoJSON coordinates
    ring without the object wrapper), evaluated with the planar
    even-odd crossing rule, so a NON-CONVEX ring classifies correctly;
    Kusto's spherical edges differ only near antimeridian/poles
    (documented engine pin — the oracle replays the identical planar
    test with pre-folded edge slopes, bit-exact).

    Scale shape: the ring unrolls at compile time into one flat
    codegen comparison chain per row — one scan, zero shuffles, zero
    UDFs; the polygon constant never ships with the data."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events"
        " | extend lat = todouble((event_id * 7919) % 18000) / 100.0 - 90.0,"
        "          lon = todouble((event_id * 104729) % 36000) / 100.0 - 180.0"
        f" | extend inside = geo_point_in_polygon(lon, lat, {_k111_ring_literal()})"
        " | project event_id, inside",
        {"Events": events},
    )


@query(
    "k112_kql_series_seasonal",
    oracle="""
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts < TIMESTAMP '2024-01-08 12:00:00'
  GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT t.event_type, g.i,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (g.i * 6) HOUR AS d
  FROM types t, unnest(generate_series(0, 29)) AS g(i)
), dense AS (
  SELECT g.event_type, g.i, CAST(COALESCE(daily.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.d = g.d
), ph AS (
  SELECT event_type, i % 4 AS p, list_sort(list(n)) AS vals
  FROM dense GROUP BY 1, 2
), med AS (
  SELECT event_type, p,
         (vals[CAST((len(vals) + 1) // 2 AS INT)]
          + vals[CAST(len(vals) // 2 + 1 AS INT)]) / 2.0 AS sv
  FROM ph
)
SELECT d.event_type, CAST(d.i AS BIGINT) AS i, d.n AS nv, m.sv
FROM dense d JOIN med m
  ON m.event_type = d.event_type AND m.p = d.i % 4
""",
    tags=("kql", "timeseries", "dynamic"),
)
def k112_kql_series_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_seasonal`` — Kusto's standalone seasonal component
    (kql.py:_series_seasonal; the explicit-period sibling of k67's
    series_decompose, whose seasonal term is a phase MEAN of the
    DETRENDED series — this one is Kusto's phase MEDIAN of the RAW
    series): 6-hour event counts per type over 7.5 days (30 bins, so
    period 4 yields phases with BOTH even (8) and odd (7) value
    counts — both median branches exercised), per-phase median via
    one sort + the uniform two-middle-pick formula, identical on both
    engines. Unpacked through the typed mv-expand for the value
    differential.

    Scale shape: one make-series shuffle; the seasonal computation is
    row-local JVM array HOF work (one array_sort + two element picks
    per phase) — no second shuffle, no UDF."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | make-series n = count()"
        " on ts from '2024-01-01 00:00:00' to '2024-01-08 12:00:00'"
        " step 6h by event_type"
        " | extend s = series_seasonal(n, 4)"
        " | mv-expand with_itemindex = i sv = s to typeof(real)"
        " | extend i = tolong(i), nv = todouble(n[i])"
        " | project event_type, i, nv, sv",
        {"Events": events},
    )


@query(
    "k113_kql_graph_match_edge_props",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), e AS (
  SELECT event_type AS s, next_type AS d, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT e1.s AS a, e1.d AS b, e2.d AS c, e1.w AS w1, e2.w AS w2
FROM e e1 JOIN e e2 ON e1.d = e2.s
WHERE e1.w >= 40 AND e2.w > e1.w
""",
    tags=("kql", "graph"),
)
def k113_kql_graph_match_edge_props(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``graph-match`` with NAMED EDGES and edge-property predicates —
    the k70 upgrade the round-12 verdict queued: ``(a)-[e1]->(b)``
    binds ``e1`` to a struct of the edge pipeline's property columns
    (operators/graph.py:motif_find named-edge support), so ``where``
    and ``project`` reference ``e1.w`` exactly as Kusto does — here
    a WEIGHTED transition graph (transition count per edge) filtered
    to heavy 2-hop paths with ascending weights (``e2.w > e1.w`` is
    the genuinely new capability: an edge-to-edge comparison no
    vertex-only match can express).

    Scale shape: identical join algebra to k70 — one edge-scan per
    hop, hash equi-joins on the shared vertex variables; the property
    struct rides the join payload (wider rows, same shuffle count),
    and both predicates are plain Catalyst filters pushed against the
    joined result. Hub-skew mitigation unchanged (degree-orient
    before make-graph)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    edges = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("s"), F.col("next_type").alias("d")
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    return kql(
        "E | make-graph s --> d"
        " | graph-match (a)-[e1]->(b)-[e2]->(c)"
        " where e1.w >= 40 and e2.w > e1.w"
        " project a, b, c, w1 = e1.w, w2 = e2.w",
        {"E": edges},
    )


@query(
    "k114_kql_string_codepoint_scalars",
    oracle="""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[0-9]+')
            THEN CAST(length(regexp_replace(text, '[0-9]+.*$', '', 's'))
                      AS BIGINT)
            ELSE -1 END AS ir,
       CAST(bit_count(doc_id) AS BIGINT) AS bc,
       array_to_string(list_transform(string_split(substring(text, 1, 8), ''),
                                      c -> CAST(unicode(c) AS BIGINT)),
                       ',') AS cps,
       list_aggregate(
         list_transform(
           list_transform(string_split(substring(text, 1, 8), ''),
                          c -> unicode(c)),
           cp -> chr(cp)),
         'string_agg', '') = substring(text, 1, 8) AS rt_ok,
       CAST(CASE WHEN lang < 'en' THEN -1
                 WHEN lang > 'en' THEN 1 ELSE 0 END AS BIGINT) AS sc
FROM documents
""",
    tags=("kql", "scalar", "string"),
)
def k114_kql_string_codepoint_scalars(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The round-13 scalar-gap bundle (k87's discipline — several
    related scalars, one differential): ``indexof_regex`` (0-based
    first-match position, -1 when absent — regexp_instr shifted;
    DuckDB lacks regexp_instr, so the oracle derives the position as
    the length of the prefix left after deleting ``pattern.*$``, with
    an explicit no-match branch), ``bitset_count_ones`` (int64
    popcount — F.bit_count vs DuckDB bit_count), the
    ``unicode_codepoints_from_string`` / ``_to_string`` round trip
    over the first 8 chars (Spark's ascii() reads full code points
    and format_string's %c writes them — NOT char(), which truncates
    to Latin-1; asserted here as a per-row round-trip flag rather
    than assumed), and ``strcmp`` (three-way compare; the oracle
    spells the same CASE ladder so collation never enters — both
    sides compare codepoint-wise on this corpus).

    The projected ``cps`` column is the comma-joined canonical scalar
    rendering of the codepoint array (``strcat_array(cpa, ",")`` vs
    DuckDB ``array_to_string``) rather than the bare array: the
    driver's canonicalizer sorts result frames with pandas, which
    cannot hash/sort array cells (round-13 verdict item 1 — the bare
    array made the entry driver-unverifiable). Same codepoints, same
    match domain (element-wise equal arrays join to equal strings;
    the join is injective for integer lists at a fixed separator),
    now driver-sortable. The round trip still exercises the real
    array (``cpa``).

    Scale shape: all six are row-local codegen expressions over one
    scan — zero shuffles, zero UDFs, nothing to re-plan at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    return kql(
        "Docs"
        ' | extend ir = indexof_regex(text, "[0-9]+"),'
        "          bc = bitset_count_ones(doc_id),"
        "          head = substring(text, 0, 8)"
        " | extend cpa = unicode_codepoints_from_string(head)"
        ' | extend cps = strcat_array(cpa, ","),'
        "          rt_ok = unicode_codepoints_to_string(cpa) == head,"
        '          sc = strcmp(lang, "en")'
        " | project doc_id, ir, bc, cps, rt_ok, sc",
        {"Docs": docs},
    )


@query(
    "k115_kql_active_users_count",
    oracle="""
WITH periods AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(EPOCH(ts - TIMESTAMP '2024-01-01 00:00:00')
                    / 86400.0) AS BIGINT) AS p
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-01-29 00:00:00'
), bins AS (
  SELECT CAST(g.k AS BIGINT) AS k
  FROM unnest(generate_series(0, 28)) AS g(k)
), qualified AS (
  SELECT b.k, pr.user_id
  FROM periods pr JOIN bins b
    ON pr.p * 86400 <= b.k * 86400
   AND pr.p * 86400 > b.k * 86400 - 604800
  GROUP BY 1, 2
  HAVING COUNT(DISTINCT pr.p) >= 3
), per_bin AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS Dcount
  FROM qualified GROUP BY 1
)
SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (b.k) DAY AS Timeline,
       COALESCE(p.Dcount, 0) AS Dcount
FROM bins b LEFT JOIN per_bin p ON p.k = b.k
""",
    tags=("kql", "activity", "analytics"),
)
def k115_kql_active_users_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``evaluate active_users_count(...)`` — Kusto's repeat-engagement
    plugin (kql.py:_compile_active_users_count), completing the
    activity family next to sliding_window_counts / activity_engagement
    / activity_counts_metrics: per daily bin, the distinct users active
    on >= 3 DISTINCT days within the trailing 7-day window — the
    retention-grade WAU refinement (any-activity Dcount counts
    drive-bys; this counts habits). Pinned window contract documented
    at the compiler; the oracle replays it with an explicit
    period-grid range join.

    Scale shape: the event stream collapses to DISTINCT (user, day)
    FIRST (map-side combinable, at most lookback/period live rows per
    user), and only that bounded table fans lookback/bin-fold to
    report bins; threshold + per-bin count both map-side combine. The
    collapse is the scale lever — the fan never touches raw events."""
    events = load(spark, sf_dir, "events")
    return kql(
        "Events | evaluate active_users_count(user_id, ts,"
        " datetime('2024-01-01 00:00:00'), datetime('2024-01-29 00:00:00'),"
        " 7d, 1d, 3, 1d)",
        {"Events": events},
    )
