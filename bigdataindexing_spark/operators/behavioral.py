"""Behavioral / product-analytics operators over the `events` stream table.

The reference's queue-driven pipeline (PlanController.java:100-108 ->
IndexingListener.java:23-45) treats events as things to apply, never to
analyze; these are the standard event-analytics shapes an index over a
change stream exists to serve — funnels and cohort retention — expressed
as single-shuffle DataFrame plans.

Both operators hash-partition once on ``user_id`` and keep every later
step (windows, per-user aggregate, joins) on that partitioning, so at
100 TB the plan is: one exchange of the event log, then partition-local
work. The final funnel reduction is a 150-row (per-user) aggregate —
driver-safe at any corpus size because the per-user collapse happens
before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import bounded_sort, spread, table

_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events),
s2 AS (
  SELECT user_id, ts, event_type, t1,
         MIN(CASE WHEN event_type = 'click'
                  AND ts >= t1 AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
           OVER (PARTITION BY user_id) AS t2
  FROM s1),
s3 AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2,
         MIN(CASE WHEN event_type = 'purchase'
                  AND ts >= t2 AND ts <= t2 + INTERVAL 24 HOUR THEN ts END)
             AS t3
  FROM s2 GROUP BY user_id)
SELECT COUNT(t1) AS viewed, COUNT(t2) AS clicked, COUNT(t3) AS purchased
FROM s3
"""


@register(
    "q70_event_funnel",
    oracle=_FUNNEL_SQL,
    tags=("behavioral", "window-agg"),
    doc="Ordered 3-step conversion funnel (view -> click within 24h -> "
    "purchase within 24h of the click): each stage anchor is an "
    "unbounded MIN window over the user's partition, so the whole "
    "funnel is ONE hash exchange on user_id followed by partition-local "
    "windows and a per-user collapse; the final 3-counter reduction "
    "sees one row per user, never one per event. The same plan answers "
    "any step count — add a window per stage, never a self-join per "
    "stage (the O(steps) join chain is the anti-pattern at 100 TB).",
)
def q70_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.tables import table_view

    ev = table_view(spark, sf_dir, "events")
    return spark.sql(f"""
        WITH s1 AS (
          SELECT user_id, ts, event_type,
                 MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
          FROM {ev}
        ),
        s2 AS (
          SELECT user_id, ts, event_type, t1,
                 MIN(CASE WHEN event_type = 'click'
                          AND ts >= t1
                          AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
          FROM s1
        ),
        s3 AS (
          SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2,
                 MIN(CASE WHEN event_type = 'purchase'
                          AND ts >= t2
                          AND ts <= t2 + INTERVAL 24 HOUR THEN ts END) AS t3
          FROM s2 GROUP BY user_id
        )
        SELECT COUNT(t1) AS viewed, COUNT(t2) AS clicked,
               COUNT(t3) AS purchased
        FROM s3
    """)


_RETENTION_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT cohort, day - cohort AS day_offset, COUNT(*) AS users
FROM activity JOIN firsts USING (user_id)
WHERE day - cohort <= 7
GROUP BY cohort, day_offset
ORDER BY cohort, day_offset
"""


@register(
    "q71_cohort_retention",
    oracle=_RETENTION_SQL,
    tags=("behavioral", "agg"),
    doc="Daily cohort retention: cohort = each user's first-event date, "
    "counted by (cohort, day offset 0-7) over the user's distinct active "
    "days. ONE shuffle on user_id computes both facts at once — "
    "groupBy(user).agg(min(day), collect_set(day)) — instead of a "
    "cohort aggregate plus a separate distinct relation joined back "
    "(two shuffles + a join): each user's active-day set is bounded by "
    "the calendar, so the set aggregate is safe at any corpus size, and "
    "the output is cohorts x 8 offsets regardless of scale. The duckdb "
    "oracle keeps the relational two-step formulation (dialect-shared "
    "except DATE subtraction: bigint days in duckdb, datediff here).",
)
def q71_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(table(spark, sf_dir, "events")).select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("cohort"),
        F.collect_set("day").alias("days"),
    )
    offset = F.datediff(F.col("day"), F.col("cohort"))
    return (
        per_user.select("cohort", F.explode("days").alias("day"))
        .select("cohort", offset.alias("day_offset"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).alias("users"))
        .transform(lambda d: bounded_sort(d, "cohort", "day_offset"))
    )


@register(
    "q103_event_pattern",
    oracle="WITH seq AS (SELECT user_id, "
    "string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s "
    "FROM events GROUP BY user_id) "
    "SELECT user_id, CAST(len(regexp_extract_all(s, 'v[^p]*p')) AS BIGINT) "
    "AS conversions, CAST(len(s) AS BIGINT) AS n_events "
    "FROM seq ORDER BY user_id",
    tags=("behavioral", "pattern"),
    doc="Sequence pattern matching over per-user event streams (the "
    "MATCH_RECOGNIZE shape): each user's events collapse — ordered by "
    "(ts, event_id) for a total, engine-independent order — into a "
    "string of event-type initials, and a regex counts non-overlapping "
    "view-...-purchase conversion runs ('v[^p]*p': a view, anything but "
    "a purchase, then the purchase that closes the run). Generalizes "
    "the funnel (q70) from a fixed stage list to arbitrary regular "
    "patterns. Plan: one shuffle on user_id, then row-local "
    "array_sort + transform + regexp inside codegen; per-user state is "
    "bounded by that user's activity, and at 100 TB the same plan runs "
    "windowed by (user, day) to cap it.",
)
def q103_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(table(spark, sf_dir, "events")).select(
        "user_id",
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.substring("event_type", 1, 1).alias("c"),
        ).alias("e"),
    )
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list("e")), lambda x: x["c"]
            ),
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.size(F.regexp_extract_all("s", F.lit("v[^p]*p"), F.lit(0)))
        .cast("long")
        .alias("conversions"),
        F.length("s").cast("long").alias("n_events"),
    ).orderBy("user_id")


@register(
    "q108_event_transitions",
    oracle="WITH seq AS (SELECT user_id, event_type, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS prev_type FROM events), "
    "c AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt "
    "FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type) "
    "SELECT prev_type, next_type, cnt, "
    "((2 * cnt * 10000 + SUM(cnt) OVER (PARTITION BY prev_type)) "
    "// (2 * SUM(cnt) OVER (PARTITION BY prev_type))) / 1e4 AS p "
    "FROM c ORDER BY prev_type, next_type",
    tags=("behavioral", "pattern"),
    doc="First-order Markov transition matrix over per-user event "
    "streams: lag each user's (ts, event_id)-ordered events one step, "
    "count (prev, next) pairs, and normalize rows into transition "
    "probabilities — the statistic behind next-action prediction, "
    "anomaly scoring (improbable transitions), and funnel discovery "
    "(vs q70's fixed stage list). One shuffle on user_id for the lag, "
    "then the count collapses to |types|^2 rows, so the normalizing "
    "window runs on a constant-size relation at any corpus scale.",
)
def q108_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.tables import table_view

    ev = table_view(spark, sf_dir, "events")
    counts = spark.sql(f"""
        WITH seq AS (
          SELECT LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type,
                 event_type AS next_type
          FROM {ev}
        ),
        c AS (
          SELECT prev_type, next_type, COUNT(1) AS cnt
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, cnt,
               (2 * cnt * 10000 + SUM(cnt) OVER (PARTITION BY prev_type))
                 DIV (2 * SUM(cnt) OVER (PARTITION BY prev_type)) / 1e4 AS p
        FROM c
    """)
    return bounded_sort(counts, "prev_type", "next_type", barrier=True)


SCD2_COHORT = 25  # users in the registered build (output stays cohort-
# bounded: intervals per user are history-bounded, not corpus-bounded)


def _islands(src: str) -> str:
    """The gaps-and-islands core shared by q116/q117/q123 (and st13's
    oracle): lag-change marker -> running-sum run ids -> one
    (state, valid_from, n_events) row per run, over CTE ``src``
    (user_id, ts, event_id, event_type). ONE definition: a fix to the
    run-assignment logic (e.g. the tie-break ordering) lands in every
    consumer at once instead of silently diverging the 'same
    gaps-and-islands plan' claims."""
    return f"""m AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM {src} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT user_id, ts, event_type,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM m
),
iv AS (
  SELECT user_id, run_id, MIN(event_type) AS state,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM r GROUP BY user_id, run_id
)"""


_SCD2_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id < {SCD2_COHORT}
),
{_islands('e')}
SELECT user_id, state AS event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
         AS valid_to,
       n_events
FROM iv ORDER BY user_id, valid_from
"""


@register(
    "q116_scd2_intervals",
    oracle=_SCD2_SQL,
    tags=("behavioral", "temporal"),
    doc="SCD2 (type-2 slowly-changing dimension) interval build: collapse "
    "each user's (ts, event_id)-ordered event stream into validity "
    "intervals — one row per run of equal event_type with [valid_from, "
    "valid_to) bounds (valid_to NULL = current), the standard temporal-"
    "dimension layout a warehouse keeps for as-of joins (q33 is the "
    "consumer shape). Gaps-and-islands: a lag-change marker, a running "
    "sum assigning run ids, one grouped aggregate per run, and a lead "
    "for the closing bound — two shuffles total (user_id for the "
    "windows, then the run aggregate reuses the same clustering). "
    "Cohort-restricted (user_id pushdown) so the registered output is "
    "bounded by users x their state-change history, never corpus-"
    "proportional; at 100 TB the build partitions by user and appends "
    "incrementally — new events can only extend or close each user's "
    "LAST interval, so a delta merge touches one interval per active "
    "user.",
)
def q116_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.tables import table_view

    ev = table_view(spark, sf_dir, "events")
    out = spark.sql(_SCD2_SQL.replace("FROM events", f"FROM {ev}").rsplit(
        "ORDER BY user_id, valid_from", 1
    )[0])
    return bounded_sort(out, "user_id", "valid_from", barrier=True)


_PIT_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type, value FROM events
  WHERE user_id < {SCD2_COHORT}
),
d0 AS (
  SELECT user_id, ts, event_id, event_type FROM e
  WHERE event_type <> 'purchase'
),
{_islands('d0')},
dim AS (
  SELECT user_id, state, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
           AS valid_to
  FROM iv
),
f AS (
  SELECT user_id, ts, value FROM e WHERE event_type = 'purchase'
)
SELECT COALESCE(dim.state, '(pre-history)') AS state,
       COUNT(*) AS purchases,
       COUNT(DISTINCT f.user_id) AS users,
       CAST(SUM(CAST(f.value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM f LEFT JOIN dim
  ON f.user_id = dim.user_id
 AND f.ts >= dim.valid_from
 AND (dim.valid_to IS NULL OR f.ts < dim.valid_to)
GROUP BY COALESCE(dim.state, '(pre-history)')
ORDER BY state
"""


@register(
    "q117_scd2_pit_join",
    oracle=_PIT_SQL,
    tags=("behavioral", "temporal", "join"),
    doc="Point-in-time enrichment against the SCD2 dimension (the q116 "
    "consumer): the browsing-state dimension is rebuilt from the "
    "cohort's NON-purchase events (same gaps-and-islands plan), then "
    "every purchase left-joins to the interval containing its "
    "timestamp — an equi-join on user_id with a residual "
    "[valid_from, valid_to) range predicate, the temporal-warehouse "
    "'attribute as it was THEN' join. Because intervals tile each "
    "user's timeline, every fact matches at most one dimension row "
    "(pre-history purchases keep the left row, labeled); revenue then "
    "aggregates by state. At 100 TB the fact side partitions by "
    "user_id and the dimension is per-user history-bounded, so the "
    "join stays an equi-key hash join with a row-local range filter — "
    "never an interval cross-product; a date-bucketed dimension key "
    "is the standard refinement if one user's history itself gets "
    "large.",
)
def q117_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.tables import table_view

    ev = table_view(spark, sf_dir, "events")
    out = spark.sql(_PIT_SQL.replace("FROM events", f"FROM {ev}").rsplit(
        "ORDER BY state", 1
    )[0])
    return bounded_sort(out, "state", barrier=True)


# Open intervals cap just past the data window. The interval CTE clamps
# vt to GREATEST(cap, vf): if the events table ever extends past the cap
# an interval opening later becomes empty ([vf, vf), contributing no
# overlap in BOTH engines) instead of crashing Spark's day-bucket
# sequence() with vt < vf while the oracle silently computes negative
# overlaps — degraded-but-consistent, never divergent.
OVERLAP_CAP = "2024-02-01"

_OVERLAP_IV = f"""
e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id < {SCD2_COHORT}
),
{_islands('e')},
d AS (
  SELECT user_id, state, valid_from AS vf,
         GREATEST(
           COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id
                                           ORDER BY run_id),
                    TIMESTAMP '{OVERLAP_CAP}'),
           valid_from) AS vt
  FROM iv
)
"""

_OVERLAP_ORACLE = f"""
WITH {_OVERLAP_IV},
p AS (
  SELECT a.state, a.user_id AS ua, b.user_id AS ub,
         GREATEST(a.vf, b.vf) AS gf, LEAST(a.vt, b.vt) AS lt
  FROM d a JOIN d b
    ON a.state = b.state AND a.user_id < b.user_id
   AND a.vf < b.vt AND b.vf < a.vt
)
SELECT state, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(epoch_us(lt) - epoch_us(gf)) AS BIGINT) AS overlap_us
FROM p GROUP BY state ORDER BY state
"""

_OVERLAP_SPARK = f"""
WITH {_OVERLAP_IV},
b AS (
  SELECT user_id, state, vf, vt,
         explode(sequence(date_trunc('DAY', vf), date_trunc('DAY', vt),
                          interval 1 day)) AS day
  FROM d
),
p AS (
  SELECT DISTINCT a.state, a.user_id AS ua, b2.user_id AS ub,
         GREATEST(a.vf, b2.vf) AS gf, LEAST(a.vt, b2.vt) AS lt
  FROM b a JOIN b b2
    ON a.state = b2.state AND a.day = b2.day AND a.user_id < b2.user_id
   AND a.vf < b2.vt AND b2.vf < a.vt
)
SELECT state, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(unix_micros(lt) - unix_micros(gf)) AS BIGINT) AS overlap_us
FROM p GROUP BY state
"""


@register(
    "q123_interval_overlap",
    oracle=_OVERLAP_ORACLE,
    tags=("behavioral", "temporal", "join"),
    doc="Interval-overlap join, completing the temporal trifecta (as-of "
    "q33, point-in-time q117, overlap q123): which users were in the "
    "SAME state at the SAME time — per state, the count of overlapping "
    "interval pairs across distinct users and their total overlap "
    "duration (microsecond-exact, so the hash gate needs no float "
    "rounding). The naive formulation is a quadratic theta-join; the "
    "Spark plan DECOMPOSES it: intervals explode to the day buckets "
    "they span, pairs equi-join on (state, day) with the overlap "
    "predicate as a row-local residual, and DISTINCT collapses multi-"
    "bucket matches — the standard interval-join reduction (Spark "
    "itself uses it for stream-stream interval joins). At 100 TB the "
    "bucket grain trades join fan-out against bucket skew; day is "
    "right when intervals span hours. The duckdb oracle runs the "
    "direct quadratic join — tractable at oracle scale, and exactly "
    "what the decomposition must reproduce.",
)
def q123_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.tables import table_view

    ev = table_view(spark, sf_dir, "events")
    out = spark.sql(_OVERLAP_SPARK.replace("FROM events", f"FROM {ev}"))
    return bounded_sort(out, "state", barrier=True)


@register(
    "q130_m4_downsample",
    oracle="SELECT event_type, date_trunc('hour', ts) AS w, "
    "MIN(value) AS v_min, MAX(value) AS v_max, "
    "first(value ORDER BY ts, event_id) AS v_first, "
    "last(value ORDER BY ts, event_id) AS v_last, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events GROUP BY event_type, w ORDER BY event_type, w",
    tags=("behavioral", "timeseries"),
    doc="M4 time-series downsampling (Jugel et al., VLDB 2014 — the "
    "min/max/first/last per (series, time-bucket) reduction every "
    "monitoring/visualization backend runs): one hash aggregate with "
    "map-side partial combine per (event_type, hour), emitting the four "
    "pixel-determining points plus the bucket count. All four outputs "
    "are SELECTIONS of stored doubles (no float arithmetic crosses the "
    "engine boundary — min/max compare, first/last pick by the "
    "deterministic (ts, event_id) order via min_by/max_by on a struct "
    "key), so the hash gate needs no rounding. At 100 TB this is the "
    "rollup that turns a petabyte of raw points into a render-exact "
    "chart: cost one shuffle of (series, bucket) partials, output "
    "4 points per pixel column regardless of input density.",
)
def q130_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("w")
    ).agg(
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.expr("min_by(value, struct(ts, event_id))").alias("v_first"),
        F.expr("max_by(value, struct(ts, event_id))").alias("v_last"),
        F.count(F.lit(1)).alias("n"),
    )
    return bounded_sort(out, "event_type", "w")
