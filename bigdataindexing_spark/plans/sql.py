"""SQL passthrough surface: declared queries expressed as ANSI SQL text
and executed via ``spark.sql`` over the registered table views.

The engine's primary API is the DataFrame builders in ``operators/``; this
module proves the equivalent SQL front door (the reference's users query
through a DSL — Elasticsearch JSON — so both entry styles matter). The SQL
text is dialect-shared: the exact same string runs on duckdb as the
oracle, which also pins Spark's ANSI compatibility for these shapes
(multi-way joins, EXISTS semi-joins, HAVING, scalar subqueries).

Catalyst treatment is identical to the DataFrame API — same analyzed plan,
same pushdown/broadcast decisions — so these add SQL-surface coverage, not
a second engine path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import register_views

_Q3 = (
    "SELECT l_orderkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue, "
    "o_orderdate FROM customer "
    "JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1995-03-15' "
    "AND l_shipdate > DATE '1995-03-15' "
    "GROUP BY l_orderkey, o_orderdate "
    "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
)

_Q5 = (
    "SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name"
)

_Q4 = (
    "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
    "WHERE o_orderdate >= DATE '1994-01-01' AND EXISTS ("
    "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "AND l_shipdate > DATE '1995-01-01') "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority"
)

_Q18 = (
    "SELECT c_name, o_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "GROUP BY c_name, o_orderkey HAVING SUM(l_quantity) > 250 "
    "ORDER BY o_orderkey"
)

# Spark-side rewrite of _Q18: aggregate lineitem BEFORE the joins. The
# grouping key (c_name, o_orderkey) is functionally dependent on
# l_orderkey (o_orderkey unique in orders, one customer per order), so
# pushing the GROUP BY + HAVING below the joins is semantics-preserving
# and collapses the join input from every lineitem row to the handful of
# orders that clear the quantity threshold — at 100 TB the difference
# between shuffling the fact table through two joins and shuffling it
# once. Catalyst does not reorder aggregates across joins; this is the
# engine-level rewrite. The oracle stays the canonical Q18 text.
_Q18_SPARK = (
    "SELECT c_name, o_orderkey, total_qty FROM ("
    "SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty "
    "FROM lineitem GROUP BY l_orderkey "
    "HAVING SUM(l_quantity) > 250) big "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "ORDER BY o_orderkey"
)

_SCALAR_SUB = (
    "SELECT c_custkey, ROUND(c_acctbal, 4) AS acctbal FROM customer "
    "WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer) "
    "ORDER BY c_custkey"
)

_CORR_SCALAR = (
    "SELECT o_custkey, o_orderkey FROM orders o "
    "WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2 "
    "WHERE o2.o_custkey = o.o_custkey) "
    "AND o_custkey <= 100 ORDER BY o_custkey, o_orderkey"
)

_GROUPING_SETS = (
    "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty "
    "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) "
    "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"
)


# SQL queries whose result is BOUNDED (grouped by a low-cardinality /
# calendar key) and whose ORDER BY is the trailing top-level clause with
# no LIMIT: the Spark-side plan strips that tail from the shared text and
# sorts the handful of result rows in one partition (tables.bounded_sort
# — no range-sampling pass, no range exchange). The ORACLE keeps the
# canonical ORDER BY text — same engine-level-rewrite contract as
# _Q18_SPARK. Values are name -> sort columns (strings ascending, or a
# ("col", "desc") pair).
_BOUNDED_TAILS: dict[str, tuple] = {
    "q35_sql_tpch_q5": ("n_name",),
    "q36_sql_exists": ("o_orderpriority",),
    "q52_sql_grouping_sets": (
        ("l_returnflag", "asc_nulls_first"),
        ("l_linestatus", "asc_nulls_first"),
    ),
    "q56_sql_recursive_cte": ("m",),
    "q65_sql_tpch_q12": ("l_returnflag",),
    "q72_sql_tpch_q22": ("c_nationkey",),
    "q75_sql_tpch_q13": (("custdist", "desc"), ("c_count", "desc")),
    "q80_sql_tpch_q21": (("numwait", "desc"), "s_name"),
    "q89_sql_tpch_q20": ("s_suppkey",),
    "q76_sql_tpch_q7": ("supp_nation", "cust_nation", "l_year"),
    "q79_sql_tpch_q15": ("s_suppkey",),
    "q85_sql_tpch_q8": ("o_year",),
    "q86_sql_tpch_q9": ("nation", ("o_year", "desc")),
}

_ORDER_TAIL = " ORDER BY "


def _sql_builder(sql: str, name: str | None = None):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        tail = _BOUNDED_TAILS.get(name) if name else None
        if tail is None:
            return spark.sql(sql)
        from pyspark.sql import functions as F

        from bigdataindexing_spark.tables import bounded_sort

        cut = sql.rindex(_ORDER_TAIL)
        cols = [
            F.col(c)
            if isinstance(c, str)
            else F.col(c[0]).desc()
            if c[1] == "desc"
            else F.col(c[0]).asc_nulls_first()
            for c in tail
        ]
        return bounded_sort(spark.sql(sql[:cut]), *cols)

    return build


for _name, _sql, _doc in [
    (
        "q34_sql_tpch_q3",
        _Q3,
        "TPC-H Q3 shape (shipping priority): 3-way join + filtered agg + "
        "top-10, submitted as SQL text; dialect-shared with the oracle.",
    ),
    (
        "q35_sql_tpch_q5",
        _Q5,
        "TPC-H Q5 shape (local supplier volume): 6-way join with a "
        "cross-table equality (c_nationkey = s_nationkey) collapsing the "
        "customer and supplier nations.",
    ),
    (
        "q36_sql_exists",
        _Q4,
        "TPC-H Q4 shape: EXISTS correlated subquery — planned as a left "
        "semi join, never a per-row probe.",
    ),
    (
        "q38_sql_scalar_subquery",
        _SCALAR_SUB,
        "Scalar subquery in a predicate (compare to the table's own "
        "average) — planned as a broadcast of the 1-row subquery result.",
    ),
    (
        "q64_sql_tpch_q10",
        "SELECT c_custkey, c_name, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue, n_name "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= DATE '1996-10-01' "
        "AND o_orderdate < DATE '1997-01-01' AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20",
        "TPC-H Q10 shape (returned-item reporting): fact-fact join "
        "filtered on a quarter, broadcast nation dim, top-20 by revenue "
        "with an explicit key tiebreak.",
    ),
    (
        "q65_sql_tpch_q12",
        "SELECT l_returnflag, "
        # CASTs: duckdb integer SUM yields HUGEINT (decimal128 over
        # Arrow) which hash-diverges from Spark's BIGINT; the cast is a
        # no-op on the Spark side so the text stays dialect-shared.
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= DATE '1996-01-01' "
        "AND l_shipdate < DATE '1997-01-01' "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
        "TPC-H Q12 shape (conditional counts over a join): CASE-pivoted "
        "sums — the classic one-pass multi-metric aggregate — adapted to "
        "this corpus's columns (no l_shipmode at any sf).",
    ),
    (
        "q66_sql_tpch_q14",
        "SELECT FLOOR(100.00 * "
        "CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' "
        "THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END) AS DOUBLE) / "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS promo_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= DATE '1996-09-01' "
        "AND l_shipdate < DATE '1996-10-01'",
        "TPC-H Q14 shape (promotion effect): scalar ratio of a "
        "conditional aggregate to the total, one join one agg — the "
        "month filter prunes before the join on both engines.",
    ),
    (
        "q72_sql_tpch_q22",
        "SELECT c_nationkey, COUNT(*) AS numcust, "
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal "
        "FROM customer "
        "WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer "
        "WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders "
        "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') "
        "GROUP BY c_nationkey ORDER BY c_nationkey",
        "TPC-H Q22 shape (global sales opportunity): scalar subquery "
        "threshold + NOT EXISTS anti-join + grouped aggregate in one "
        "statement — the anti side is planned as a left-anti hash join, "
        "the scalar average as a 1-row broadcast, never per-row probes. "
        "Adapted to this corpus: 'inactive' = no urgent-priority order "
        "(every synthetic customer has some order).",
    ),
    (
        "q74_sql_tpch_q6",
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= DATE '1996-01-01' "
        "AND l_shipdate < DATE '1997-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
        "TPC-H Q6 shape (forecast revenue change): single-table filter + "
        "scalar aggregate — the canonical pushdown probe; every predicate "
        "reaches the parquet scan, no shuffle at all (partial sums only).",
    ),
    (
        "q75_sql_tpch_q13",
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey) AS c_orders "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
        "TPC-H Q13 shape (customer order-count distribution): LEFT OUTER "
        "join keeping zero-order customers, double aggregation — the "
        "join-condition filter (non-urgent) must stay in the ON clause, "
        "not WHERE, or empty customers vanish. Adapted: the exclusion is "
        "on o_orderpriority (this corpus has no o_comment).",
    ),
    (
        "q76_sql_tpch_q7",
        "SELECT supp_nation, cust_nation, l_year, "
        "CAST(SUM(volume) AS DOUBLE) AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "EXTRACT(YEAR FROM l_shipdate) AS l_year, "
        "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') "
        "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) "
        "AND l_shipdate >= DATE '1995-01-01' "
        "AND l_shipdate < DATE '1997-01-01') AS shipping "
        "GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year",
        "TPC-H Q7 shape (volume shipping between two nations): the nation "
        "dim joins twice under different roles (supplier's vs customer's "
        "nation) with a symmetric disjunctive pair filter — both nation "
        "joins broadcast; the disjunction prunes after the dim join, not "
        "per-row on the fact table.",
    ),
    (
        "q77_sql_tpch_q17",
        "SELECT FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 * 1e4 + 0.5) / 1e4 AS avg_yearly "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#23' "
        "AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) "
        "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)",
        "TPC-H Q17 shape (small-quantity-order revenue): correlated "
        "scalar AVG per part — Catalyst decorrelates it into a grouped "
        "aggregate over lineitem joined back on l_partkey, so the inner "
        "query runs once as one shuffle, never per-row. Adapted: no "
        "p_container at any sf, brand filter only.",
    ),
    (
        "q78_sql_tpch_q19",
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 "
        "AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 "
        "AND l_quantity BETWEEN 20 AND 30)",
        "TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
        "three OR'd brand/size/quantity conjunctions spanning both join "
        "sides. The single-side parts of the disjunction (quantity 1-30, "
        "the brand IN-list) are inferrable scan filters; the cross-side "
        "residual evaluates post-join. Adapted to p_brand/p_size (no "
        "p_container).",
    ),
    (
        "q79_sql_tpch_q15",
        "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' "
        "AND l_shipdate < DATE '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
        "ORDER BY s_suppkey",
        "TPC-H Q15 shape (top supplier): CTE referenced twice — once as "
        "the join input, once inside a scalar MAX subquery. Revenue is "
        "rounded at the CTE so the max-equality comparison is over the "
        "same 4-decimal grid in both engines (raw float max-ties are not "
        "cross-engine deterministic).",
    ),
    (
        "q51_sql_correlated_scalar",
        _CORR_SCALAR,
        "Correlated scalar subquery (each customer's max-price order): "
        "Catalyst de-correlates it into a grouped aggregate joined back "
        "on the correlation key — one shuffle, never a per-row re-scan.",
    ),
    (
        "q52_sql_grouping_sets",
        _GROUPING_SETS,
        "Explicit GROUPING SETS (two single-column groupings + grand "
        "total): one Expand + one hash aggregate, completing the "
        "rollup (Q-11) / cube (q31) family with arbitrary set lists; "
        "NULL ordering pinned explicitly for cross-engine determinism.",
    ),
]:
    register(_name, oracle=_sql, tags=("sql",), doc=_doc)(
        _sql_builder(_sql, _name)
    )


# The remaining TPC-H shapes, completing all 22. This corpus has no
# partsupp table, so Q2/Q11/Q16/Q20 (which aggregate supplier inventory)
# are re-anchored on lineitem as the supplier-part fact — each docstring
# states the adaptation; the query SHAPE (correlated min, fraction-of-
# total HAVING, distinct-count with NOT IN, nested IN with a correlated
# half-of-total threshold) is preserved exactly.
for _name, _sql, _doc in [
    (
        "q85_sql_tpch_q8",
        "SELECT o_year, FLOOR(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume "
        "ELSE 0 END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) * 1e4 + 0.5) "
        "/ 1e4 AS mkt_share "
        "FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, "
        "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume, n2.n_name AS nation "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "WHERE r_name = 'ASIA' AND p_type = 'PROMO') AS all_nations "
        "GROUP BY o_year ORDER BY o_year",
        "TPC-H Q8 shape (national market share): 8-way join with nation "
        "in two roles, conditional-fraction aggregate (share = sum of "
        "CASE / sum). All five dims broadcast; lineitem shuffles once "
        "for the orders join and the year agg is partial-aggregable.",
    ),
    (
        "q86_sql_tpch_q9",
        "SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit FROM ("
        "SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year, "
        "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) - CAST(0.8 AS DECIMAL(2,1)) "
        "* CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) "
        "AS amount FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%bolt%') AS profit "
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC",
        "TPC-H Q9 shape (product-type profit): LIKE-filtered part join, "
        "profit arithmetic spanning three tables, nation x year rollup. "
        "Adapted: cost = 0.8 x p_retailprice x quantity stands in for "
        "ps_supplycost (no partsupp); the %bolt% infix filter stays "
        "un-pushable by design (it exercises the post-scan filter path).",
    ),
    (
        "q88_sql_tpch_q16",
        "SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49) "
        "AND l_suppkey NOT IN ("
        "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 30",
        "TPC-H Q16 shape (supplier relationship): distinct-supplier count "
        "per part attribute triple, excluding a NOT IN denylist — planned "
        "as a null-aware anti join against the (tiny, broadcast) "
        "negative-balance supplier set, never a per-row probe. Adapted: "
        "the exclusion is negative account balance (no s_comment "
        "complaints column); supplier-part pairs come from lineitem.",
    ),
    (
        "q89_sql_tpch_q20",
        "SELECT s_suppkey, s_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name LIKE 'NATION_1%' AND s_suppkey IN ("
        "SELECT l1.l_suppkey FROM lineitem l1 "
        "WHERE l1.l_partkey IN ("
        "SELECT p_partkey FROM part WHERE p_name LIKE 'small%') "
        "AND l1.l_shipdate >= DATE '1996-01-01' "
        "AND l1.l_shipdate < DATE '1997-01-01' "
        "GROUP BY l1.l_suppkey, l1.l_partkey "
        "HAVING SUM(l1.l_quantity) > 0.5 * ("
        "SELECT SUM(l2.l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey = l1.l_partkey "
        "AND l2.l_shipdate >= DATE '1996-01-01' "
        "AND l2.l_shipdate < DATE '1997-01-01')) "
        "ORDER BY s_suppkey",
        "TPC-H Q20 shape (part promotion candidates): nested IN "
        "subqueries three deep with a correlated half-of-total HAVING "
        "threshold — the correlated SUM decorrelates into a grouped "
        "aggregate joined back on partkey, the IN chains plan as "
        "left-semi joins. Adapted: a supplier qualifies by shipping more "
        "than half a part's total 1996 volume (dominant supplier) — the "
        "availqty comparison without a partsupp table. The outer alias "
        "l1 is load-bearing: an unqualified l_partkey inside the "
        "correlated subquery would capture l2's own column and silently "
        "compare every group against the global sum.",
    ),
]:
    register(_name, oracle=_sql, tags=("sql",), doc=_doc)(
        _sql_builder(_sql, _name)
    )

_Q21 = (
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "AND n_name = 'NATION_5' "
    "AND EXISTS (SELECT 1 FROM lineitem l2 "
    "WHERE l2.l_orderkey = l1.l_orderkey "
    "AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "WHERE l3.l_orderkey = l1.l_orderkey "
    "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name"
)

# Spark-side Q21: same text with SHUFFLE_HASH hints on the two lineitem
# self-join subqueries (guide §3.1 — pick the strategy deliberately).
# Catalyst planned both the semi and the anti self-join as SortMergeJoin
# (the build side's stats land just over the shuffled-hash size gate at
# sf0.1), paying two sorts of the fact table per serve; the hint keeps
# them hash joins — measured interleaved 0.63 -> 0.55s at sf0.1, plan
# 0 SMJ / 2 SHJ, results row-identical. At scale the per-partition
# build side is bounded by the shuffle partition count, and a deploy
# that prefers sort-merge's spill behavior can drop the hint — it only
# pins the strategy, never the result. The ORACLE stays the unhinted
# _Q21 text.
_Q21_SPARK = _Q21.replace(
    "AND EXISTS (SELECT 1 FROM lineitem l2 ",
    "AND EXISTS (SELECT /*+ SHUFFLE_HASH(l2) */ 1 FROM lineitem l2 ",
).replace(
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 ",
    "AND NOT EXISTS (SELECT /*+ SHUFFLE_HASH(l3) */ 1 FROM lineitem l3 ",
)

# Q21 rewrites MEASURED AND REJECTED (interleaved best-of-6 at sf0.1,
# local[32]/4 shuffle partitions): folding the EXISTS/NOT EXISTS pair
# into one per-order aggregate — COUNT(DISTINCT l_suppkey) > 1 and
# distinct-'R'-supplier count = 1, the classic warehouse rewrite — is
# SLOWER on Spark than the canonical text (0.90s double-COUNT-DISTINCT
# via Expand, 0.82s expand-free two-level groupBy, vs 0.74s canonical):
# Catalyst's semi/anti hash probes over the pushed-down lineitem scans
# cost less than one extra full-fact-table aggregation plus the
# join-back. The canonical EXISTS text stays on both engines; the
# residual ~5x-vs-duckdb ratio is the multi-stage scheduling floor on a
# 4-way self-join at sf0.1 (7 stages x ~0.1s), not a plan defect.
#
# Round-6 re-measure (scripts/probe_q21.py, interleaved best-of-6,
# quiet host): canonical 0.51s; candidate-order-restricted COUNT-
# DISTINCT fold 0.57s; restricted expand-free two-level 0.50s (tie);
# all-SHJ (no broadcast jobs) 0.77s; runtime bloom-filter pruning
# FORCED on (creationSideThreshold 1GB, application threshold 0,
# broadcast off) 1.59s — at sf0.1 the broadcast probes beat the bloom
# build + shuffle they replace, 3x. The bloom lever is the 100 TB path
# (nothing broadcasts there) and stays wired as the pinned plan
# contract (tests/test_plans.py::test_runtime_bloom_filter_prunes_
# fact_scan: bloom_filter_agg over the filtered dim keys, might_contain
# on the fact scan before its exchange) rather than forced into the
# local session, where it is a measured regression. The one residual
# win taken: q80 joins _BOUNDED_TAILS (the ~50-row result sorts in one
# partition instead of paying a range-sampling pass + range exchange).
# Q20 (q89) variant sweep, measured at sf0.1, 5x interleaved A-B-C-D with
# order reversed each round (round 7): canonical 1.11s median; staged
# single-scan CTE (per-(suppkey,partkey) aggregate re-aggregated by
# partkey for the half-of-total threshold, small-part IN pushed into the
# shared scan — one lineitem pass instead of two) 1.09s; canonical +
# bounded-sort tail 0.98s; staged + bounded 1.07s. All within host-noise
# of each other: like Q21, the shape is floored by the serial broadcast-
# build job chain, not the scans, so the one-scan rewrite buys nothing
# locally (at 100 TB it would — but there the IN-chain plans as shuffle
# joins and runtime bloom pruning restructures the plan anyway; see the
# Q21 note above). Taken: the bounded-sort tail (_BOUNDED_TAILS entry),
# the only variant that removes whole stages (range-sampling pass +
# range exchange) rather than re-shuffling work between stages.
_Q2 = (
    "SELECT p_partkey, p_name, s_name, n_name, l_extendedprice AS price "
    "FROM part JOIN lineitem ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' AND p_size <= 5 "
    "AND l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2 "
    "JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey "
    "JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey "
    "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey "
    "WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA') "
    "ORDER BY price, p_partkey, s_name LIMIT 20"
)

# Spark-side staged form of _Q2: the region-filtered sales relation is a
# CTE consumed by both the outer row set and the per-part MIN, so the
# 4-way join tree runs once and its exchange is reused — Catalyst
# decorrelates the MIN but still plans the inner join tree as a second,
# separate copy of the same scans. Equality filter against the grouped
# MIN is unchanged (ties keep every min-price supplier, as in the
# canonical form). Measured 0.41 -> 0.34s at sf0.1; one pass over the
# fact instead of two at scale. (The analogous staging of Q20 measured
# SLOWER — its two aggregates group by different keys, so nothing
# reuses — and was rejected; its canonical text stands.)
_Q2_SPARK = (
    "WITH asia AS ("
    "SELECT l_partkey, l_extendedprice, s_name, n_name "
    "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA'), "
    "minp AS (SELECT l_partkey, MIN(l_extendedprice) AS mn "
    "FROM asia GROUP BY l_partkey) "
    "SELECT p_partkey, p_name, s_name, n_name, l_extendedprice AS price "
    "FROM part JOIN asia ON p_partkey = asia.l_partkey "
    "JOIN minp ON minp.l_partkey = asia.l_partkey "
    "WHERE p_size <= 5 AND l_extendedprice = mn "
    "ORDER BY price, p_partkey, s_name LIMIT 20"
)

register(
    "q84_sql_tpch_q2",
    oracle=_Q2,
    tags=("sql",),
    doc="TPC-H Q2 shape (minimum-cost supplier): correlated scalar MIN "
    "subquery that itself contains a 4-way join, equality against the "
    "outer fact row. Spark side runs the staged-CTE rewrite (see "
    "_Q2_SPARK): the region-filtered join tree materializes once and "
    "both consumers reuse its exchange. Adapted: min sale price over "
    "lineitem stands in for min ps_supplycost (no partsupp table); "
    "equality on a MIN is exact because both engines compare the same "
    "stored value.",
)(_sql_builder(_Q2_SPARK, "q84_sql_tpch_q2"))

_Q11 = (
    "SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value "
    "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3') "
    "GROUP BY l_partkey "
    "HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) > ("
    "SELECT 2.0 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(DISTINCT l_partkey) "
    "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')) "
    "ORDER BY value DESC, l_partkey"
)

# Spark-side staged form of _Q11: the per-part aggregate is a CTE
# referenced by both the projection and the scalar threshold, so the
# physical plan REUSES the scan+join+agg exchange (ReusedExchange,
# verified) instead of scanning the fact table twice — Spark does not
# CSE across a HAVING boundary on its own. Threshold algebra is exact:
# SUM over all rows in the group = SUM of per-part sums and
# COUNT(DISTINCT l_partkey) = COUNT(*) of the per-part relation.
# Measured 0.55 -> 0.45s at sf0.1; at 100 TB this is one fact pass
# instead of two. Oracle stays the canonical two-scan text.
_Q11_SPARK = (
    "WITH per_part AS ("
    "SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v "
    "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3') "
    "GROUP BY l_partkey) "
    "SELECT l_partkey, CAST(v AS DOUBLE) AS value FROM per_part "
    "WHERE CAST(v AS DOUBLE) > "
    "(SELECT 2.0 * CAST(SUM(v) AS DOUBLE) / COUNT(*) FROM per_part) "
    "ORDER BY value DESC, l_partkey"
)

register(
    "q87_sql_tpch_q11",
    oracle=_Q11,
    tags=("sql",),
    doc="TPC-H Q11 shape (important stock): per-part value for a nation "
    "group, kept only above a scalar-subquery threshold computed over "
    "the SAME filtered fact. Spark side runs the staged-CTE rewrite "
    "(see _Q11_SPARK): one fact scan, exchange reused by the threshold "
    "subquery. Adapted: threshold = 2x the mean per-part value (scale-"
    "invariant, unlike TPC-H's sf-dependent 0.0001 literal), value = "
    "lineitem revenue (no partsupp).",
)(_sql_builder(_Q11_SPARK, "q87_sql_tpch_q11"))

register(
    "q80_sql_tpch_q21",
    oracle=_Q21,
    tags=("sql",),
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS + "
    "NOT EXISTS both correlated on the same fact table with an "
    "inequality on the correlated column — planned as left-semi and "
    "left-anti hash joins on l_orderkey (the <> residual evaluates "
    "inside the join), never per-row re-scans. Adapted: 'waiting' = "
    "sole supplier with returned lines on a finished multi-supplier "
    "order (no l_commitdate/l_receiptdate in this corpus). The "
    "single-aggregate rewrite was measured slower here (see module "
    "comment above).",
)(_sql_builder(_Q21_SPARK, "q80_sql_tpch_q21"))

register(
    "q37_sql_having",
    oracle=_Q18,
    tags=("sql",),
    doc="TPC-H Q18 shape: grouped join with HAVING over the aggregate. "
    "Spark side runs the agg-below-join rewrite (see _Q18_SPARK): the "
    "HAVING threshold is applied on a lineitem-only aggregate and only "
    "the surviving orders join customer/orders.",
)(_sql_builder(_Q18_SPARK))


# Lateral correlated subquery with ORDER BY + LIMIT (top-2 orders per
# customer). Dialect-shared: Spark decorrelates the LATERAL into a
# ranked window over a single equi-join (never a per-customer re-scan);
# duckdb runs the identical text as the oracle.
_LATERAL = (
    "SELECT c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 4) AS price "
    "FROM customer, LATERAL ("
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_custkey = c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t "
    "WHERE c_custkey <= 50 ORDER BY c_custkey, price DESC, o_orderkey"
)

register(
    "q57_sql_lateral_topk",
    oracle=_LATERAL,
    tags=("sql", "lateral"),
    doc="LATERAL correlated subquery (top-2 orders per customer by "
    "price). Catalyst plans it as one join + rank filter, not N "
    "point queries — the set-oriented rewrite of the reference's "
    "per-relation-key loop (PlanService.java:106-133).",
)(_sql_builder(_LATERAL))

# Recursive CTE (Spark 4 WITH RECURSIVE): generate the 1995-1996 month
# calendar and gap-fill order counts (months with zero orders still get a
# row — a LEFT JOIN against a generated spine, impossible with a plain
# GROUP BY which drops empty buckets). Dialect differs only in date
# arithmetic: Spark add_months/trunc vs duckdb INTERVAL/date_trunc.
_REC_SPARK = (
    "WITH RECURSIVE months(m) AS ("
    "SELECT DATE '1995-01-01' AS m "
    "UNION ALL SELECT add_months(m, 1) FROM months WHERE m < DATE '1996-12-01') "
    "SELECT m, COALESCE(cnt, 0) AS order_cnt FROM months "
    "LEFT JOIN (SELECT trunc(o_orderdate, 'MM') AS om, COUNT(*) AS cnt "
    "FROM orders GROUP BY 1) o ON m = om ORDER BY m"
)
_REC_DUCK = (
    "WITH RECURSIVE months(m) AS ("
    "SELECT DATE '1995-01-01' AS m "
    "UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months "
    "WHERE m < DATE '1996-12-01') "
    "SELECT m, COALESCE(cnt, 0) AS order_cnt FROM months "
    "LEFT JOIN (SELECT date_trunc('month', o_orderdate) AS om, COUNT(*) AS cnt "
    "FROM orders GROUP BY 1) o ON m = om ORDER BY m"
)

register(
    "q56_sql_recursive_cte",
    oracle=_REC_DUCK,
    tags=("sql", "recursive"),
    doc="WITH RECURSIVE month-spine generation + gap-filled LEFT JOIN "
    "(months with no orders keep a zero row). The recursion generates "
    "24 driver-side rows — the fact side stays one distributed "
    "aggregate, so the iterative part never touches the big table.",
)(_sql_builder(_REC_SPARK))
