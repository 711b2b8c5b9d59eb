"""Round-12 faces: recursive-CTE hierarchy rollup (qx53) and
VARIANT semi-structured extraction (qx54) — the two Spark-4 engine
surfaces the registry had not yet exercised.

qx50 proved the engine's plain SQL-string surface (views + spark.sql,
one query text shared verbatim with the oracle); qx53 proves the
ITERATIVE SQL surface — ``WITH RECURSIVE``, new in Spark 4 — on the
workload recursion exists for: walking a hierarchy whose depth is
data-dependent and unknown at plan time. No fixed-depth unrolling
(the dx38/dx39 oracle technique) could express it without assuming a
maximum.

The hierarchy is derived deterministically from the data: customer
``c_custkey`` parents to ``greatest(floor(c_custkey / 4), 1)`` — a quaternary org tree
over the contiguous TPC-H key range, the standard synthesis when the
schema carries no explicit parent edge. Each customer's chain walks
leaf -> root accumulating the path's account balances in EXACT CENTS
(BIGINT — double sums would be order-sensitive across engines); the
face serves the per-depth rollup: chain count, path-balance sum, and
a leaf-key checksum. One query text runs verbatim on both engines
(floor-division spelled ``CAST(floor(x/4) AS BIGINT)``, the shared
dialect subset; sums wrapped ``CAST(... AS BIGINT)`` against DuckDB's
HUGEINT widening).

Scale shape: Spark executes the recursion as an iterative union —
one frontier-join stage per level, so the iteration count is the
TREE DEPTH (log4 n: ~7 at sf0.1, ~20 at 100 TB keys), never the row
count; each level's frontier join is a plain equi-join Catalyst
shuffles or broadcasts like any other. The anchor scans customer
once; nothing ever materializes more than frontier x depth rows.

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351 — no hierarchical data); recursion completes the SQL
surface inventory (SURVEY.md §2.8's scalar catalogue + qx50's
join/agg/HAVING string surface + this face's fixpoint iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

# ONE query text, two engines (the qx50 convention): every construct
# below is in the dialect subset both parse identically.
_QX53_SQL = """
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS leaf,
             c_custkey AS cur,
             0 AS depth,
             CAST(round(c_acctbal * 100) AS BIGINT) AS path_bal_c
      FROM customer
      UNION ALL
      SELECT w.leaf,
             CAST(greatest(floor(w.cur / 4), 1) AS BIGINT) AS cur,
             w.depth + 1,
             w.path_bal_c + CAST(round(c.c_acctbal * 100) AS BIGINT)
      FROM walk w
      JOIN customer c ON c.c_custkey = CAST(greatest(floor(w.cur / 4), 1) AS BIGINT)
      WHERE w.cur > 1
    )
    SELECT depth,
           count(*) AS n_chains,
           CAST(sum(path_bal_c) AS BIGINT) AS bal_sum_c,
           CAST(sum(leaf) AS BIGINT) AS leaf_key_sum
    FROM walk
    WHERE cur <= 1
    GROUP BY depth
"""


_QX55_SQL = """
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
                 2) AS charged
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
"""


@query("qx55_sql_udf", sql=_QX55_SQL)
def qx55_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ...
    RETURN <expr>``) — the third Spark-4 surface face: business logic
    packaged as named SQL UDFs (``disc_price``, ``taxed``,
    ``is_bulk``) and used in both the WHERE clause and the aggregate
    expressions. The scale property this face pins: Catalyst INLINES
    SQL UDF bodies into the plan — no black-box row-at-a-time call
    boundary — so a filter written as ``is_bulk(l_quantity)`` still
    reaches the parquet scan as a pushed-down predicate and every
    expression stays inside whole-stage codegen
    (tests/test_variant.py's sibling pins PushedFilters + no
    UDF/EvalPython node). The oracle states the same query with the
    function bodies written out — the same expression per row, but
    cross-engine parallel SUM ordering of doubles is NOT
    bit-reproducible; parity rests on the 2-dp round absorbing the
    low-bit accumulation drift (ADVICE r12), the same convention the
    other double-sum faces use. Sums here are O(sf) values of
    magnitude ~1e4, so the drift is ~1e-9 against a 0.005 rounding
    margin — qx53's balances use exact BIGINT cents instead because
    its recursion COMPOUNDS per-step rounding.

    No counterpart in the reference (row-oriented options pipeline,
    main.py:43-351 — its helpers are Python functions applied
    eagerly); completes the SQL surface family (qx50 strings, qx53
    recursion, qx54 VARIANT, qx55 SQL UDFs)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION disc_price("
              "p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION taxed("
              "p DOUBLE, t DOUBLE) RETURNS DOUBLE RETURN p * (1 + t)")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION is_bulk("
              "q DOUBLE) RETURNS BOOLEAN RETURN q >= 30")
    return spark.sql("""
        SELECT l_returnflag,
               count(*) AS n,
               round(sum(disc_price(l_extendedprice, l_discount)), 2)
                 AS revenue,
               round(sum(taxed(disc_price(l_extendedprice, l_discount),
                               l_tax)), 2) AS charged
        FROM lineitem
        WHERE is_bulk(l_quantity)
        GROUP BY l_returnflag
    """)


_QX54_SQL = """
    SELECT o_orderpriority AS pri,
           count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS tagged,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0
                         THEN o_orderkey % 7 + o_orderkey % 5
                         ELSE 0 END) AS BIGINT) AS tag_sum
    FROM orders
    GROUP BY o_orderpriority
"""


@query("qx54_variant_extract", sql=_QX54_SQL)
def qx54_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type — the
    open-schema scale path the reference's field extraction maps to
    at 100 TB (reference main.py:94-104 parses a REST JSON payload;
    the engine's string-path twin, ``get_json_object``, lives in
    q06's folded q13 leg and operators/parse.py:51).

    Each order row becomes a heterogeneous JSON document in-plan
    (``to_json`` drops null fields, so two schema variants coexist:
    every third document carries a ``tags`` array, the rest do not —
    ``schema_of_variant`` reads OBJECT<id, meta> vs OBJECT<id, meta,
    tags>). The face then does what a lake ingests: ``parse_json`` to
    VARIANT once, typed path extraction (``variant_get`` for
    guaranteed paths: '$.id' as BIGINT, '$.meta.pri' nested;
    ``try_variant_get`` for the optional '$.tags[0]'/'$.tags[1]',
    NULL where the variant lacks the path), and aggregates the
    extracted columns. The oracle computes the SAME statistics
    straight from the relational columns — any corruption anywhere in
    the JSON->VARIANT->typed-path pipeline breaks the hash.

    Scale shape: construction, parse, and every extraction are
    row-local expressions (zero shuffle before the final 5-group
    aggregate); VARIANT is the columnar-shredded semi-structured
    format, so at lake scale the typed paths read as pushed-down
    subcolumns rather than string re-parses. Tag values and sums stay
    integer-exact (no doubles enter the JSON round-trip)."""
    o = load_table(spark, sf_dir, "orders")
    payload = F.to_json(F.struct(
        F.col("o_orderkey").alias("id"),
        F.struct(F.col("o_orderpriority").alias("pri"),
                 F.col("o_orderstatus").alias("st")).alias("meta"),
        F.when(F.col("o_orderkey") % 3 == 0,
               F.array(F.col("o_orderkey") % 7,
                       F.col("o_orderkey") % 5)).alias("tags")))
    v = F.parse_json(payload)
    ext = o.select(
        F.variant_get(v, "$.id", "long").alias("id"),
        F.variant_get(v, "$.meta.pri", "string").alias("pri"),
        F.try_variant_get(v, "$.tags[0]", "long").alias("t0"),
        F.try_variant_get(v, "$.tags[1]", "long").alias("t1"))
    return (ext.groupBy("pri")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("id").cast("long").alias("key_sum"),
                 F.count("t0").cast("long").alias("tagged"),
                 F.sum(F.coalesce("t0", F.lit(0))
                       + F.coalesce("t1", F.lit(0)))
                 .cast("long").alias("tag_sum")))


@query("qx53_recursive_cte", sql=_QX53_SQL)
def qx53_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the engine's SQL surface: register the
    table as a temp view, run the hierarchy walk verbatim. Every
    chain bottoms out at custkey 1 (parent = greatest(floor(key/4), 1) over the
    contiguous key range), so ``WHERE cur <= 1`` keeps exactly one
    completed row per leaf and the depth histogram is the tree's
    level structure."""
    # pin the view's backing table (rotation-managed cache): every
    # recursion level joins the frontier against customer, and an
    # unmaterialized view would re-scan (and re-spread) the parquet
    # once per level — depth x the cost for a table the iteration
    # never changes (cache, not localCheckpoint, so rotation can never
    # poison a stale result frame — r16)
    from eth_options_data_pipeline_spark.operators import scratch
    cust = scratch.scoped_cache(
        load_table(spark, sf_dir, "customer"), "qx53")
    cust.createOrReplaceTempView("customer")
    return spark.sql(_QX53_SQL)


_QX56_SQL = """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_quantity >= 30
    GROUP BY o_orderpriority
    HAVING count(*) >= 10
"""


@query("qx56_sql_pipe", sql=_QX56_SQL)
def qx56_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>``) — the fourth Spark-4 surface
    face (VERDICT r12 item 8): the same relational program spelled as
    a linear operator pipeline (FROM -> WHERE -> JOIN -> AGGREGATE ->
    post-aggregate WHERE), the form query generators and interactive
    users increasingly emit. The scale property this face pins:
    pipe-syntax stages are PURE SUGAR over the same logical plan — the
    pipe-spelled WHERE still reaches the parquet scan as a pushed-down
    predicate and the AGGREGATE still plans partial/final with one
    exchange (tests/test_variant.py sibling pins PushedFilters).
    DuckDB has no pipe syntax, so the oracle states the equivalent
    ANSI form (WHERE/GROUP BY/HAVING) — unlike qx50/qx53's shared-text
    convention, the equivalence here IS the point: two spellings, one
    result. Double sums round at 2 dp per the family convention
    (see qx55's docstring on cross-engine sum ordering).

    No counterpart in the reference (row-oriented options pipeline,
    main.py:43-351); completes the Spark-4 SQL-surface family (qx50
    strings, qx53 recursion, qx54 VARIANT, qx55 SQL UDFs, qx56 pipe
    syntax)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        FROM lineitem
        |> WHERE l_quantity >= 30
        |> JOIN orders ON l_orderkey = o_orderkey
        |> AGGREGATE count(*) AS n,
                     round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
           GROUP BY o_orderpriority
        |> WHERE n >= 10
    """)


_QX57_SQL = """
    SELECT p_brand,
           count(*) AS n,
           round(sum(p_retailprice), 2) AS retail_sum
    FROM part
    WHERE p_size >= 25
    GROUP BY p_brand
    HAVING count(*) >= 5
"""


@query("qx57_parameterized_sql", sql=_QX57_SQL)
def qx57_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL + IDENTIFIER() (Spark 4) — the fifth Spark-4
    surface face: the injection-safe templating path a SQL service
    runs, with the table name bound through ``IDENTIFIER(:tbl)`` and
    the predicate through a named ``:min_size`` parameter. The scale
    property this face pins: parameters bind at PARSE time — the bound
    predicate is an ordinary literal to Catalyst, so it still reaches
    the parquet scan pushed down, and IDENTIFIER resolution costs
    nothing at runtime (tests/test_sql_udf.py sibling pins
    PushedFilters). DuckDB has no IDENTIFIER/parameter-marker syntax
    in this harness, so the oracle states the resolved ANSI form —
    the qx56 convention: two spellings, one result, one plan shape.

    No counterpart in the reference (row-oriented options pipeline,
    main.py:43-351 — its parameters are Python f-strings); completes
    the Spark-4 SQL-surface family (qx50 strings, qx53 recursion,
    qx54 VARIANT, qx55 SQL UDFs, qx56 pipe syntax, qx57 parameter
    binding)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               count(*) AS n,
               round(sum(p_retailprice), 2) AS retail_sum
        FROM IDENTIFIER(:tbl)
        WHERE p_size >= :min_size
        GROUP BY p_brand
        HAVING count(*) >= 5
        """,
        args={"tbl": "part", "min_size": 25},
    )


# ------------------------------ UNPIVOT INCLUDE NULLS SQL surface (qx58)
#
# q46 covers the DataFrame melt (df.unpivot -> in-row Expand); this is
# the SQL-standard spelling, including the null-retention switch the
# relational UNPIVOT defaults hide: both engines parse the IDENTICAL
# query text (the qx50 shared-text convention — Spark 4 and DuckDB both
# accept `UNPIVOT INCLUDE NULLS (val FOR metric IN (...))`), and the
# planted NULLs make retention observable: n_rows counts the retained
# NULL rows, n_vals does not, so an engine that silently dropped them
# (the EXCLUDE NULLS default) breaks the hash on BOTH columns.

_QX58_SQL = """
    SELECT l_returnflag, metric,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(val) AS BIGINT) AS n_vals,
           CAST(sum(CAST(round(coalesce(val, 0) * 1000000) AS BIGINT))
                AS BIGINT) AS sum_micro
    FROM (
      SELECT l_returnflag,
             CASE WHEN l_orderkey % 5 = 0 THEN NULL ELSE l_quantity END
               AS qty,
             CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_tax END AS tax
      FROM lineitem
    ) UNPIVOT INCLUDE NULLS (val FOR metric IN (qty, tax))
    GROUP BY l_returnflag, metric
"""


@query("qx58_sql_unpivot_nulls", sql=_QX58_SQL)
def qx58_sql_unpivot_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT with INCLUDE NULLS — the seventh Spark-4 SQL-surface
    face (VERDICT r13 item 7): the standard wide-to-long spelling with
    the null-retention switch exercised against deterministically
    planted NULLs (orderkey % 5 nulls qty, % 7 nulls tax). ONE query
    text runs verbatim on both engines (the qx50 convention — DuckDB
    accepts the same SQL-standard UNPIVOT clause), so the check is the
    strongest form: same parse, same semantics, same hash. n_rows >
    n_vals everywhere NULLs were planted — an engine applying the
    EXCLUDE NULLS default diverges on two columns at once.

    Scale shape: Catalyst plans the UNPIVOT clause as the same in-row
    Expand as q46's DataFrame melt — the 2x row amplification is
    shuffle-free and the single exchange carries the ~6 grouped rows
    (plan-pinned in tests/test_plans.py). Sums are exact integer
    micro-units (per-row round THEN sum; NULL coalesced to 0 so the
    retained rows contribute determinately).

    No counterpart in the reference (row-oriented options pipeline,
    main.py:43-351; pandas melt unused); completes the Spark-4
    SQL-surface family (qx50 strings, qx53 recursion, qx54 VARIANT,
    qx55 SQL UDFs, qx56 pipe syntax, qx57 parameter binding, qx58
    standard UNPIVOT)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem")
    return spark.sql(_QX58_SQL)
