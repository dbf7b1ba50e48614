"""Event-log composite operators (SURVEY J10/J16/J17, X4).

These are the reference's signature analytics — fuzzy as-of matching,
point-in-time backlog, windowed similarity counts, process-mining
traces — built on the reusable operators package.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import literal_dim, load_table
from ..functions.scalars import ratio_dbl, ratio_dec, sql_ratio_dbl, sql_ratio_dec
from ..operators.pit import date_grid, pit_backlog
from ..registry import REGISTRY, materialize_ctes, register


@register(
    "j10_fuzzy_asof_match",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT event_id AS s_id, user_id, ts AS s_ts FROM events WHERE event_type = 'signup'
    ), cand AS (
      SELECT p.p_id, p.user_id, s.s_id,
             CASE WHEN CAST(p.p_ts AS DATE) = CAST(s.s_ts AS DATE)
                  THEN 'precise' ELSE 'fuzzy' END AS match_type,
             ABS(DATEDIFF('day', CAST(s.s_ts AS DATE), CAST(p.p_ts AS DATE))) AS day_diff,
             s.s_ts
      FROM purchases p JOIN signups s ON p.user_id = s.user_id
      WHERE ABS(DATEDIFF('day', CAST(s.s_ts AS DATE), CAST(p.p_ts AS DATE))) <= 3
    ), best AS (
      SELECT p_id, user_id, match_type,
             ROW_NUMBER() OVER (PARTITION BY p_id
                                ORDER BY match_type DESC, day_diff, s_ts, s_id) AS rn
      FROM cand
    )
    SELECT user_id,
           COUNT(CASE WHEN match_type = 'precise' THEN 1 END) AS n_precise,
           COUNT(CASE WHEN match_type = 'fuzzy' THEN 1 END) AS n_fuzzy
    FROM best WHERE rn = 1
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("J10",),
    bench=True,
)
def j10_fuzzy_asof_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy date-window match with precise-over-fuzzy precedence —
    the decisions⋈claims logic (time-to-ep.Rmd:101-125, J10) via
    operators.fuzzy_join. Purchases match same-user signups within
    ±3 days; exact-day matches win, then closest/earliest."""
    from ..operators.fuzzy_join import fuzzy_asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"), F.col("user_id"), F.col("ts").alias("s_ts")
    )
    matched = fuzzy_asof_join(
        purchases,
        signups,
        on="user_id",
        left_key="p_id",
        left_ts="p_ts",
        right_ts="s_ts",
        tolerance_days=3,
        right_tiebreak="s_id",
        how="inner",
    )
    return (
        matched.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("match_type") == "precise", 1)).alias("n_precise"),
            F.count(F.when(F.col("match_type") == "fuzzy", 1)).alias("n_fuzzy"),
        )
        .orderBy("user_id")
    )


@register(
    "j16_window_similarity_count",
    oracle="""
    SELECT p.event_id, p.user_id,
           COUNT(*) AS n_nearby
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND date_diff('second', p.ts, e.ts) BETWEEN -3600 AND 3600
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    ORDER BY p.event_id
    """,
    tags=("J16",),
)
def j16_window_similarity_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor count of same-entity events within ±1 hour — the
    reference's ±3-day multi-decision count (max-multi-decision.R:16-22,
    J16). A RANGE window over epoch seconds replaces the self-join:
    one sort per entity partition instead of an O(n·m) join."""
    from ..operators.sessionize import epoch_seconds

    e = load_table(spark, sf_dir, "events").withColumn("sec", epoch_seconds("ts"))
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 3600)
    return (
        e.withColumn("n_nearby", F.count("*").over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "n_nearby")
        .orderBy("event_id")
    )


@register(
    "j17_pit_backlog",
    oracle="""
    WITH grid AS (
      SELECT UNNEST(generate_series(DATE '1995-01-02', DATE '2001-12-31', INTERVAL 7 DAY)) AS grid_date
    ), intervals AS (
      SELECT CAST(o_orderdate AS DATE) AS enter_d,
             CAST(o_orderdate AS DATE) + CAST(30 + o_orderkey % 60 AS INTEGER) AS exit_d
      FROM orders
    )
    SELECT CAST(grid_date AS DATE) AS grid_date,
           (SELECT COUNT(*) FROM intervals
             WHERE enter_d <= CAST(grid_date AS DATE) AND exit_d > CAST(grid_date AS DATE)) AS backlog
    FROM grid
    ORDER BY grid_date
    """,
    tags=("J17", "J18"),
    bench=True,
)
def j17_pit_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time backlog over (enter, exit) cohorts on a weekly
    grid (capacity.R:84-86, impact.R:569-571, J17). Synthetic exit =
    enter + 30 + orderkey%60 days. Uses the explode-sequence strategy:
    map-side expansion + count, no join (see operators.pit)."""
    o = load_table(spark, sf_dir, "orders")
    intervals = o.select(
        F.col("o_orderdate").cast("date").alias("enter_d"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.lit(30) + F.col("o_orderkey") % 60).cast("int"),
        ).alias("exit_d"),
    )
    grid = date_grid(spark, "1995-01-02", "2001-12-31", 7)
    return pit_backlog(
        intervals, grid, "enter_d", "exit_d", step_days=7,
        grid_start="1995-01-02", grid_end="2001-12-31",
    )


@register(
    "x4_trace_coverage",
    oracle="""
    WITH traces AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS trace
      FROM events
      WHERE event_id % 20 = 0
      GROUP BY user_id
    )
    SELECT trace, COUNT(*) AS n_users
    FROM traces
    GROUP BY trace
    HAVING COUNT(*) > 0
    ORDER BY n_users DESC, trace
    LIMIT 20
    """,
    tags=("X4", "A10"),
)
def x4_trace_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining trace coverage (status-api-traces.R:110-120, X4):
    ordered event sequence per case -> trace string -> frequency.
    Sampled to every-20th event to keep distinct traces meaningful."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    traces = e.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("trace")
    )
    return (
        traces.groupBy("trace")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("trace"))
        .limit(20)
    )


@register(
    "x4_transition_matrix",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), counts AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           {sql_ratio_dbl("n", "SUM(n) OVER (PARTITION BY event_type)")}
             AS p
    FROM counts
    ORDER BY event_type, next_type
    """,
    tags=("X4", "W1", "A6"),
)
def x4_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event process
    (process-mining companion to x4_trace_coverage — edeaR's
    process-map edges, status-api-traces.R:110-120): lead over each
    entity stream, count (state, next) pairs, row-normalize with a
    window. p rounded at 6 dp (double division of exact ints)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    return counts.select(
        "event_type",
        "next_type",
        "n",
        # count ratio: the ROUND(double, s) tie-flip class — exact
        # decimal half-up, double final (round-11 migration)
        ratio_dbl(
            F.col("n"), F.sum("n").over(Window.partitionBy("event_type"))
        ).alias("p"),
    ).orderBy("event_type", "next_type")


_PRIORLOC_CODES = ["55", "18", "14", "92", "20", "48", "96", "D1", "I1", "I2"]


@register(
    "comp_priorloc_parsers",
    oracle="""
    WITH base AS (
      SELECT user_id AS entity_id, event_id, ts AS locdout,
             ts + to_minutes(CAST(FLOOR(value) AS BIGINT)) AS locdin,
             CASE raw WHEN 'I1' THEN '55' WHEN 'I2' THEN '48'
                      ELSE raw END AS loc
      FROM (
        SELECT *,
               (['55','18','14','92','20','48','96','D1','I1','I2'])
                 [CAST(event_id % 10 AS INT) + 1] AS raw
        FROM events
      )
    ), wl AS (
      SELECT *,
             LEAD(loc) OVER (PARTITION BY entity_id
                             ORDER BY locdout, event_id) AS loc_next,
             LAG(loc) OVER (PARTITION BY entity_id
                            ORDER BY locdout, event_id) AS loc_prev
      FROM base
    ), ev AS (
      SELECT entity_id, 'TRANSLATION_REQ' AS event_type, locdout AS ts
      FROM wl WHERE loc = '18'
      UNION ALL
      SELECT entity_id, 'TO_TRANSLATION', locdout FROM wl WHERE loc = '14'
      UNION ALL
      SELECT entity_id, 'FROM_TRANSLATION', locdin FROM wl WHERE loc = '14'
      UNION ALL
      SELECT entity_id, 'TO_VSO', locdin
      FROM wl WHERE loc <> '55' AND loc_next = '55'
      UNION ALL
      SELECT entity_id, 'FROM_VSO', locdout
      FROM wl WHERE loc = '55' AND loc_next <> '55'
      UNION ALL
      SELECT entity_id, 'TO_OMO', locdout
      FROM wl WHERE loc_prev = '92' AND loc = '20'
      UNION ALL
      SELECT entity_id, 'FROM_OMO', locdin
      FROM wl WHERE loc_prev = '92' AND loc = '20'
      UNION ALL
      SELECT entity_id, 'QR', locdin FROM wl WHERE loc = '48'
      UNION ALL
      SELECT entity_id, 'REMAND_RETURN', locdout
      FROM (
        SELECT entity_id, locdout,
               ROW_NUMBER() OVER (PARTITION BY entity_id
                                  ORDER BY locdout DESC, event_id DESC) AS rn
        FROM wl WHERE loc = '96'
      ) WHERE rn = 1
    )
    SELECT event_type, YEAR(ts) AS yr, COUNT(*) AS n
    FROM ev GROUP BY event_type, YEAR(ts)
    ORDER BY event_type, yr
    """,
    tags=("COMPOSITE", "U1", "W1", "W2", "J8"),
)
def comp_priorloc_parsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRIORLOC parser family (events.R:106-268) as ONE plan over a
    synthesized location log: TRANSLATION_REQ + TO/FROM_TRANSLATION
    (.parseTranslationLocs:106-128 — membership filter + from/to pair),
    TO/FROM_VSO (.parseVSOLocs:131-163 — lead-boundary detection; the
    NULL lead on a stream's last row drops the row, matching R's
    NA-comparison filter), TO/FROM_OMO (.parseOMOLocs:183-206 —
    two-step lag pattern: an OMO request immediately followed by the
    outside-BVA location), QR (.parseQRLocs:241-252 — filter at
    check-in), and REMAND_RETURN (.parseRemReturnLocs:255-268 — latest
    occurrence per entity, deterministic tiebreak on event_id).

    Also folds in event_getPriorLocs' STAFF normalization
    (events.R:92-99): 'individual' codes are replaced by their parent
    location before any parsing.

    The reference runs five separate dplyr passes each with its own
    arrange(); here one window pass computes lead+lag once and every
    parser is a filter over it — a single shuffle on entity_id,
    reused by all nine event types (plus one more for the REMAND_RETURN
    argmax, same key so AQE-local)."""
    e = load_table(spark, sf_dir, "events")
    raw = F.element_at(
        F.array(*[F.lit(c) for c in _PRIORLOC_CODES]),
        (F.pmod(F.col("event_id"), F.lit(10)) + 1).cast("int"),
    )
    loc = (
        F.when(raw == "I1", F.lit("55"))
        .when(raw == "I2", F.lit("48"))
        .otherwise(raw)
    )
    base = e.select(
        F.col("user_id").alias("entity_id"),
        "event_id",
        F.col("ts").alias("locdout"),
        (
            F.col("ts") + F.make_interval(mins=F.floor("value").cast("int"))
        ).alias("locdin"),
        loc.alias("loc"),
    )
    w = Window.partitionBy("entity_id").orderBy("locdout", "event_id")
    wl = base.withColumn("loc_next", F.lead("loc").over(w)).withColumn(
        "loc_prev", F.lag("loc").over(w)
    )

    def pick(cond, label, ts_col):
        return wl.filter(cond).select(
            "entity_id", F.lit(label).alias("event_type"), F.col(ts_col).alias("ts")
        )

    translation_req = pick(F.col("loc") == "18", "TRANSLATION_REQ", "locdout")
    to_translation = pick(F.col("loc") == "14", "TO_TRANSLATION", "locdout")
    from_translation = pick(F.col("loc") == "14", "FROM_TRANSLATION", "locdin")
    to_vso = pick(
        (F.col("loc") != "55") & (F.col("loc_next") == "55"), "TO_VSO", "locdin"
    )
    from_vso = pick(
        (F.col("loc") == "55") & (F.col("loc_next") != "55"), "FROM_VSO", "locdout"
    )
    omo_cond = (F.col("loc_prev") == "92") & (F.col("loc") == "20")
    to_omo = pick(omo_cond, "TO_OMO", "locdout")
    from_omo = pick(omo_cond, "FROM_OMO", "locdin")
    qr = pick(F.col("loc") == "48", "QR", "locdin")
    rr_w = Window.partitionBy("entity_id").orderBy(
        F.desc("locdout"), F.desc("event_id")
    )
    remand_return = (
        wl.filter(F.col("loc") == "96")
        .withColumn("_rn", F.row_number().over(rr_w))
        .filter(F.col("_rn") == 1)
        .select(
            "entity_id",
            F.lit("REMAND_RETURN").alias("event_type"),
            F.col("locdout").alias("ts"),
        )
    )
    ev = reduce(
        DataFrame.unionByName,
        [
            translation_req,
            to_translation,
            from_translation,
            to_vso,
            from_vso,
            to_omo,
            from_omo,
            qr,
            remand_return,
        ],
    )
    return (
        ev.groupBy("event_type", F.year("ts").alias("yr"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "yr")
    )


def funnel_counts(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered first-touch funnel over (user_id, event_type, ts): a
    user advances to step k only if the FIRST occurrence of each step
    strictly follows the first occurrence of the previous one. One
    conditional-min aggregation per user plus an n-row unpivot — no
    per-step joins, no window. Ties at identical timestamps do not
    advance; a missing later step makes the chained flag NULL, which
    coalesces to 0 so an all-missing step still reports 0, not NULL.

    Scale shape: one map-side-combinable groupBy(user) over the event
    stream, then constant-size arithmetic — the cheapest possible
    funnel plan at 100 TB."""

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        *[first_ts(t).alias(f"t{i}") for i, t in enumerate(steps, start=1)]
    )
    flags = [F.col("t1").isNotNull()]
    for i in range(2, len(steps) + 1):
        flags.append(flags[-1] & (F.col(f"t{i}") > F.col(f"t{i - 1}")))
    # Outer coalesce: SUM over zero users is NULL; an empty event set
    # should report 0 at every step.
    agg = per_user.agg(
        *[
            F.coalesce(F.sum(F.coalesce(s.cast("int"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias(f"n{i}")
            for i, s in enumerate(flags, start=1)
        ]
    )
    stack_args = ", ".join(
        f"{i}, '{t}', n{i}" for i, t in enumerate(steps, start=1)
    )
    return agg.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, step_name, n_users)"
    ).orderBy("step")


@register(
    "u6_event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t2,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t3,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
      FROM events GROUP BY user_id
    ), flags AS (
      SELECT CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS s1,
             CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END AS s2,
             CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2
                  THEN 1 ELSE 0 END AS s3,
             CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 AND t4 > t3
                  THEN 1 ELSE 0 END AS s4
      FROM per_user
    ), agg AS (
      SELECT CAST(COALESCE(SUM(s1), 0) AS BIGINT) AS n1,
             CAST(COALESCE(SUM(s2), 0) AS BIGINT) AS n2,
             CAST(COALESCE(SUM(s3), 0) AS BIGINT) AS n3,
             CAST(COALESCE(SUM(s4), 0) AS BIGINT) AS n4
      FROM flags
    )
    SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users FROM agg
    UNION ALL SELECT 2, 'view', n2 FROM agg
    UNION ALL SELECT 3, 'click', n3 FROM agg
    UNION ALL SELECT 4, 'purchase', n4 FROM agg
    ORDER BY step
    """,
    tags=("U1", "A2", "X4"),
)
def u6_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clickstream conversion query: signup -> view -> click ->
    purchase through :func:`funnel_counts` (see its docstring for the
    first-touch semantics and the all-NULL-step golden test in
    tests/test_operators_golden.py)."""
    e = load_table(spark, sf_dir, "events")
    return funnel_counts(e, ["signup", "view", "click", "purchase"])


# The reference's full disposition classifier (constants.R:15-18): 14
# one-character VACOLS codes collapsing onto 4 terminal labels. Kept
# 1:1 — adding or relabeling a disposition is data, not code (J14).
ENDSTATE_CLASSIFIER = (
    ("1", "DECISION"),
    ("3", "DECISION"),
    ("4", "DECISION"),
    ("5", "VACATED"),
    ("6", "WITHDRAWN"),
    ("8", "WITHDRAWN"),
    ("9", "WITHDRAWN"),
    ("A", "GRANT"),
    ("B", "GRANT"),
    ("E", "WITHDRAWN"),
    ("F", "WITHDRAWN"),
    ("G", "WITHDRAWN"),
    ("W", "WITHDRAWN"),
    ("X", "WITHDRAWN"),
)

_ENDSTATE_CODES = [c for c, _ in ENDSTATE_CLASSIFIER]

# Location log codes for the abeyance/dispatch parsers: the ten
# comp_priorloc_parsers codes are irrelevant here, so this log draws
# from the parser-relevant alphabet instead — the two AbeyanceLocs
# ("24|39", constants.R:21), two codes matching the DispatchLocs regex
# ("A.+|SUP|OPR", constants.R:23), and filler codes no parser matches.
_LOCLOG12_CODES = [
    "55", "18", "14", "92", "20", "48", "96", "D1", "24", "39", "A92", "SUP",
]


@register(
    "u7_event_endstates",
    oracle="""
    WITH endstates AS (
      SELECT o_custkey AS entity_id, cls.event_type,
             CAST(o_orderdate AS TIMESTAMP) AS ts
      FROM orders
      JOIN (VALUES ('1','DECISION'), ('3','DECISION'), ('4','DECISION'),
                   ('5','VACATED'), ('6','WITHDRAWN'), ('8','WITHDRAWN'),
                   ('9','WITHDRAWN'), ('A','GRANT'), ('B','GRANT'),
                   ('E','WITHDRAWN'), ('F','WITHDRAWN'), ('G','WITHDRAWN'),
                   ('W','WITHDRAWN'), ('X','WITHDRAWN')) cls(code, event_type)
        ON cls.code = (['1','3','4','5','6','8','9','A','B','E','F','G','W','X'])
                        [CAST(o_orderkey % 14 AS INT) + 1]
      WHERE o_orderstatus = 'F'
    ), loclog AS (
      SELECT user_id AS entity_id, ts AS locdout,
             ts + to_minutes(CAST(FLOOR(value) AS BIGINT)) AS locdin,
             (['55','18','14','92','20','48','96','D1','24','39','A92','SUP'])
               [CAST(event_id % 12 AS INT) + 1] AS loc
      FROM events
    ), abeyance AS (
      SELECT entity_id, 'TO_ABEYANCE' AS event_type, locdout AS ts
      FROM loclog WHERE regexp_matches(loc, '24|39')
      UNION ALL
      SELECT entity_id, 'FROM_ABEYANCE', locdin
      FROM loclog WHERE regexp_matches(loc, '24|39')
    ), dispatch AS (
      SELECT entity_id, 'DISPATCH' AS event_type, locdout AS ts
      FROM loclog WHERE regexp_matches(loc, 'A.+|SUP|OPR')
    ), cavc AS (
      SELECT DISTINCT l_orderkey AS entity_id, 'CAVC' AS event_type,
             CAST(l_shipdate AS TIMESTAMP) AS ts
      FROM lineitem WHERE l_returnflag = 'R'
    ), ev AS (
      SELECT * FROM endstates UNION ALL SELECT * FROM abeyance
      UNION ALL SELECT * FROM dispatch UNION ALL SELECT * FROM cavc
    )
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT entity_id) AS n_entities,
           MIN(YEAR(ts)) AS first_yr, MAX(YEAR(ts)) AS last_yr
    FROM ev GROUP BY event_type ORDER BY event_type
    """,
    tags=("U1", "J14", "P7", "A3"),
)
def u7_event_endstates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining named event families of event_all (events.R:898-991)
    not covered by events_all/comp_priorloc_parsers, each via its
    reference mechanism:

    - Terminal dispositions through the FULL 14-code
      EventEndStateClassifier inner-merge (events.R:844-868 +
      constants.R:15-18): DECISION / VACATED / WITHDRAWN / GRANT. The
      synthetic disposition code is drawn deterministically from the
      14-code alphabet per finished order (``BFDC IS NOT NULL`` gate ~
      ``o_orderstatus = 'F'``); the classifier is an inner join on a
      broadcast literal dim, so unclassified codes drop — merge()
      semantics, not a left join.
    - TO/FROM_ABEYANCE (.parseAbeyanceLocs, events.R:164-177):
      unanchored regex membership on AbeyanceLocs '24|39', then the
      gather() shape — one log row emits a check-out AND a check-in
      event.
    - DISPATCH via the DispatchLocs regex 'A.+|SUP|OPR'
      (constants.R:23). Simplification: the reference uses DispatchLocs
      only inside .parseDecisionLocs:205-215's run-grouping
      (cumsum(!grepl)) to derive SIGNED_DECISION events; here it is a
      per-row regex classification emitting one DISPATCH event per
      matching log row — a simplified per-row form of the reference's
      dispatch detector, not the run-grouped shape (Spark and oracle
      stay internally consistent).
    - CAVC (event_cavc, events.R:881-895): a date-column extract with
      distinct(BFKEY, DATE) dedup — returned lines keyed by order with
      duplicate receipt dates collapsed.

    One plan, four branches; the rollup is per-type volume, entity
    reach, and the active year span."""
    o = load_table(spark, sf_dir, "orders")
    code = F.element_at(
        F.array(*[F.lit(c) for c in _ENDSTATE_CODES]),
        (F.pmod(F.col("o_orderkey"), F.lit(14)) + 1).cast("int"),
    )
    classifier = literal_dim(
        spark, ENDSTATE_CLASSIFIER, "code string, event_type string"
    )
    endstates = (
        o.filter(F.col("o_orderstatus") == "F")
        .withColumn("code", code)
        .join(F.broadcast(classifier), "code")
        .select(
            F.col("o_custkey").alias("entity_id"),
            "event_type",
            F.col("o_orderdate").cast("timestamp_ntz").alias("ts"),
        )
    )

    e = load_table(spark, sf_dir, "events")
    loc = F.element_at(
        F.array(*[F.lit(c) for c in _LOCLOG12_CODES]),
        (F.pmod(F.col("event_id"), F.lit(12)) + 1).cast("int"),
    )
    loclog = e.select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("locdout"),
        (
            F.col("ts") + F.make_interval(mins=F.floor("value").cast("int"))
        ).alias("locdin"),
        loc.alias("loc"),
    )
    abeyance = (
        loclog.filter(F.col("loc").rlike("24|39"))
        .select(
            "entity_id",
            F.col("locdout").alias("TO_ABEYANCE"),
            F.col("locdin").alias("FROM_ABEYANCE"),
        )
        .unpivot(
            ids=["entity_id"],
            values=["TO_ABEYANCE", "FROM_ABEYANCE"],
            variableColumnName="event_type",
            valueColumnName="ts",
        )
    )
    dispatch = loclog.filter(F.col("loc").rlike("A.+|SUP|OPR")).select(
        "entity_id",
        F.lit("DISPATCH").alias("event_type"),
        F.col("locdout").alias("ts"),
    )

    li = load_table(spark, sf_dir, "lineitem")
    cavc = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("entity_id"),
            F.lit("CAVC").alias("event_type"),
            F.col("l_shipdate").cast("timestamp_ntz").alias("ts"),
        )
        .distinct()
    )

    ev = reduce(DataFrame.unionByName, [endstates, abeyance, dispatch, cavc])
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("entity_id").alias("n_entities"),
            F.min(F.year("ts")).alias("first_yr"),
            F.max(F.year("ts")).alias("last_yr"),
        )
        .orderBy("event_type")
    )


# Trace-classification patterns: regexes over the ordered '>'-joined
# event-type trace — the MATCH_RECOGNIZE-style sequence predicate
# expressed as string matching over the listagg'd trace, the same
# mechanism status-api-traces.R uses to bucket journeys.
_TRACE_PATTERNS = (
    ("converted", "signup.*purchase"),
    ("direct_conversion", "signup>purchase"),
    ("window_shopper", "view(>view)+"),
    ("reactivated", "purchase.*signup"),
)


@register(
    "x4_trace_regex",
    oracle="""
    WITH traces AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS trace
      FROM events
      GROUP BY user_id
    ), tot AS (SELECT COUNT(*) AS n_total FROM traces)
    SELECT p.pattern_name,
           CAST(SUM(CASE WHEN regexp_matches(t.trace, p.pat)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN regexp_matches(t.trace, p.pat)
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / (SELECT n_total FROM tot) AS share
    FROM traces t
    CROSS JOIN (VALUES ('converted', 'signup.*purchase'),
                       ('direct_conversion', 'signup>purchase'),
                       ('window_shopper', 'view(>view)+'),
                       ('reactivated', 'purchase.*signup'))
         p(pattern_name, pat)
    GROUP BY p.pattern_name
    ORDER BY p.pattern_name
    """,
    tags=("X4", "P8", "A10"),
)
def x4_trace_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over process traces: each user's full
    ordered event trace is classified by unanchored regexes (converted
    = a signup EVENTUALLY followed by a purchase; direct = adjacent;
    window_shopper = consecutive views; reactivated = a signup after a
    purchase) — the MATCH_RECOGNIZE shape built from the X4 trace
    listagg (status-api-traces.R:110-120) plus the P8 rlike family.

    One shuffle builds all traces; the pattern dim is a broadcast
    literal, so adding a journey class is data, not code. Counts are
    integer-exact; the share division has identical integer operands
    on both engines, so the emitted double needs no rounding."""
    e = load_table(spark, sf_dir, "events")
    traces = e.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("trace")
    )
    pats = literal_dim(
        spark, _TRACE_PATTERNS, "pattern_name string, pat string"
    )
    classified = traces.join(F.broadcast(pats)).select(
        "pattern_name", F.expr("trace RLIKE pat").cast("int").alias("hit")
    )
    total = traces.agg(F.count("*").alias("n_total"))
    return (
        classified.groupBy("pattern_name")
        .agg(F.sum("hit").cast("long").alias("n_users"))
        .join(F.broadcast(total))
        .select(
            "pattern_name",
            "n_users",
            (F.col("n_users").cast("double") / F.col("n_total")).alias("share"),
        )
        .orderBy("pattern_name")
    )


def _stationary_oracle(rounds: int = 6) -> str:
    """Unrolled power-iteration oracle: round K's mass at state s' is
    SUM over s of pi_{K-1}(s)·p(s,s'), every term an exact
    DECIMAL(14,12)×DECIMAL(14,12) product summed exactly, then rounded
    back to 12 dp — so neither engine's summation order can move a
    digit (the pegasos/IRLS unrolled-oracle discipline).

    The transition probs and the uniform start are ``sql_ratio_dec``
    exact integer half-up divisions — NOT ROUND(double, 12), which
    flipped the round-8 driver hash: count ratios n/d with d divisible
    by a high power of 2 land on exact 12-dp ties where Spark's
    exact-expansion HALF_UP and DuckDB's scaled-double std::round
    systematically disagree (functions/scalars.py pin rationale)."""
    p_expr = sql_ratio_dec("COUNT(*)",
                           "SUM(COUNT(*)) OVER (PARTITION BY event_type)")
    pi0_expr = sql_ratio_dec(
        "1", "(SELECT COUNT(DISTINCT event_type) FROM events)")
    ctes = [f"""
    seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), trans AS (
      SELECT event_type, next_type,
             {p_expr} AS p
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ), r0 AS (
      SELECT event_type AS state,
             {pi0_expr} AS pi
      FROM (SELECT DISTINCT event_type FROM events)
    )"""]
    for k in range(1, rounds + 1):
        ctes.append(f""", r{k} AS (
      SELECT t.next_type AS state,
             CAST(ROUND(SUM(r.pi * t.p), 12) AS DECIMAL(14,12)) AS pi
      FROM r{k - 1} r JOIN trans t ON t.event_type = r.state
      GROUP BY t.next_type
    )""")
    body = "".join(ctes).lstrip()
    return (
        f"WITH {body}\n    SELECT state, CAST(pi AS DOUBLE) AS pi "
        f"FROM r{rounds} ORDER BY state"
    )


# At or below this many transition-matrix rows the whole power
# iteration runs driver-side in exact Python decimal (the chain is
# |alphabet|²-sized — a model artifact, not data; 100k rows ≈ a
# 316-state alphabet, far past any real event vocabulary). Above it,
# or when the count is unknown, the per-round checkpointed loop runs —
# the only shape that scales. Same dispatch family as
# PAGERANK_LOCAL_MAX_EDGES / CLOSURE_LOCAL_MAX_EDGES / the BT bound.
MARKOV_LOCAL_MAX_EDGES = 100_000


def _markov_rounds_distributed(
    pi: DataFrame, trans: DataFrame, rounds: int = 6
) -> DataFrame:
    """Per-round checkpointed power iteration — the at-scale arm of the
    dispatch in x4_markov_stationary (each round one ≤|S|-row join-agg
    + checkpoint). Kept as its own function so the equality test can
    drive it directly below the dispatch threshold."""
    for _ in range(rounds):
        pi = (
            pi.join(trans, pi["state"] == trans["event_type"])
            .groupBy(F.col("next_type").alias("state"))
            .agg(
                F.round(F.sum(F.col("pi") * F.col("p")), 12)
                .cast("decimal(14,12)")
                .alias("pi")
            )
            .localCheckpoint()
        )
    return pi


def _markov_pi_local(states, trans_rows, rounds: int = 6):
    """All power-iteration rounds in exact driver-side decimal — the
    small-chain arm. Bit-identical to the distributed arm by
    construction: pi0 is ratio_dec's integer half-up quotient
    ((2·10¹² + ns) // (2·ns) at scale 12), Spark decimal products and
    sums are exact and order-free (mirrored with context precision 60,
    far above the 26 significant digits a round can produce), and the
    12-dp round is HALF_UP in both. Equality is pinned by
    tests/test_operators_golden.py::test_markov_local_matches_distributed
    and end-to-end vs DuckDB on exact-tie data in
    tests/test_portable_rounding.py."""
    from decimal import ROUND_HALF_UP, localcontext
    from decimal import Decimal as D

    tw = D(1).scaleb(-12)
    with localcontext() as ctx:
        ctx.prec = 60
        ns = len(states)
        q0 = (2 * 10**12 + ns) // (2 * ns)
        pi = {s: D(q0) * tw for s in states}
        for _ in range(rounds):
            acc: dict = {}
            for src, dst, p in trans_rows:
                v = pi.get(src)
                if v is not None and p is not None:
                    acc[dst] = acc.get(dst, D(0)) + v * p
            pi = {
                s: v.quantize(tw, rounding=ROUND_HALF_UP)
                for s, v in acc.items()
            }
    return pi


@register(
    "x4_markov_stationary",
    oracle=None,  # bound below after materialize_ctes import dance
    tags=("X4", "ITER"),
)
def x4_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event chain — the
    process-mining 'where does the process spend its time' summary on
    top of x4_transition_matrix (edeaR process-map edges,
    status-api-traces.R:110-120): 6 synchronous power-iteration rounds
    pi_{k+1} = pi_k·P from a uniform start. Substochastic states
    (traces that end) leak mass, so the vector converges to the
    dominant left eigendirection of the observed chain — exactly what
    the reference's trace reports rank states by.

    Scale shape: the 100 TB work is deriving P — one per-entity window
    pass + one (state, next) count agg, identical to
    x4_transition_matrix; after that the chain is |alphabet|²-sized
    (model-sized, localCheckpoint'd once). Round 12 size dispatch: at
    or below MARKOV_LOCAL_MAX_EDGES transition rows all 6 rounds run
    driver-side in exact Python decimal (the old per-round loop paid 8
    eager scheduling barriers on a ≤|S|-row vector); above it each
    round is a ≤|S|-row checkpointed join-agg — the closure/pagerank
    iterative pattern at its cheapest. The two arms are bit-identical
    (exact integer/decimal arithmetic mirrored op for op; equality
    pinned in tests).
    Determinism: transition probs and the uniform start are exact
    integer half-up divisions to DECIMAL(14,12) (``ratio_dec`` — the
    round-8 driver flip proved ROUND(double, 12) is not portable when
    a count ratio lands on an exact 12-dp tie); every round multiplies
    decimals exactly and sums order-free, rounding back to 12 dp, so
    the final vector hash-matches DuckDB digit for digit."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = (
        seq.groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "next_type",
            ratio_dec(
                F.col("n"),
                F.sum("n").over(Window.partitionBy("event_type")),
            )
            .cast("decimal(14,12)")
            .alias("p"),
        )
        .localCheckpoint()
    )
    # Size dispatch (round 12): trans is already materialized (eager
    # checkpoint), so its count is a free runtime statistic. Small
    # chains run all 6 rounds driver-side in exact decimal — the old
    # shape paid 8 eager barriers (pi0 + 6 rounds + n_states) of pure
    # scheduling floor on a ≤|S|-row vector. The collects are bounded
    # by construction: |alphabet| states and |alphabet|² transition
    # rows under the 100k dispatch bound.
    if trans.count() <= MARKOV_LOCAL_MAX_EDGES:
        states = [r[0] for r in e.select("event_type").distinct().collect()]
        trows = [
            (r["event_type"], r["next_type"], r["p"]) for r in trans.collect()
        ]
        pi_map = _markov_pi_local(states, trows)
        # final projection leaves DECIMAL behind (same rationale as the
        # distributed arm below); float(Decimal) is correctly rounded,
        # identical to Spark's decimal->double cast
        return spark.createDataFrame(
            sorted((s, float(v)) for s, v in pi_map.items()),
            "state string, pi double",
        ).orderBy("state")
    n_states = e.select("event_type").distinct().agg(
        F.count("*").alias("ns")
    )
    pi = (
        e.select(F.col("event_type").alias("state"))
        .distinct()
        .crossJoin(F.broadcast(n_states))
        .select(
            "state",
            ratio_dec(F.lit(1), F.col("ns"))
            .cast("decimal(14,12)")
            .alias("pi"),
        )
        .localCheckpoint()
    )
    pi = _markov_rounds_distributed(pi, trans, 6)
    # final projection leaves DECIMAL behind: the driver's typed
    # hasher is only green on double/int/string/date output classes
    # (r8+r9 evidence) — the 12-dp pinned value is identical bits in
    # both engines after the correctly-rounded decimal->double cast
    return pi.select(
        "state", F.col("pi").cast("double").alias("pi")
    ).orderBy("state")


# Bind the unrolled oracle (materialized CTEs: each round references
# the previous one from a join — inlining would re-evaluate the chain
# exponentially).
REGISTRY["x4_markov_stationary"].oracle = materialize_ctes(
    _stationary_oracle(6)
)
