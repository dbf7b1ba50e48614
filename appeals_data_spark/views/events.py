"""The derived event-log view — the reference's core abstraction.

`R/events.R` converts wide tables into a long
(entity, event_type, ts) stream via ~10 per-source extractors unioned
at the end (events.R:923-991, SURVEY §1.4, R1, U1). Here each
extractor is a lazy DataFrame builder; `events_all` is a single
unionByName so Catalyst sees ONE plan covering extraction + union —
scan sharing and pushdown happen across extractors, unlike the
reference's 10 separate Oracle round trips (SURVEY §3.1).

Canonical schema: (entity_id long, event_type string, ts timestamp_ntz,
amount double nullable). Unpivot-style extractors use
``DataFrame.unpivot`` — the direct analog of tidyr `gather`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import literal_dim, load_table, sized_for_compute

EVENT_SCHEMA_COLS = ["entity_id", "event_type", "ts", "amount"]


def _conform(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("entity_id").cast("long"),
        F.col("event_type").cast("string"),
        F.col("ts").cast("timestamp_ntz"),
        F.col("amount").cast("double"),
    ).filter(F.col("ts").isNotNull())


def order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order placement is an event on the customer."""
    o = load_table(spark, sf_dir, "orders")
    return _conform(
        o.select(
            F.col("o_custkey").alias("entity_id"),
            F.lit("order_placed").alias("event_type"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_totalprice").alias("amount"),
        )
    )


def shipment_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each line shipment is an event on the supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    return _conform(
        li.select(
            F.col("l_suppkey").alias("entity_id"),
            F.lit("line_shipped").alias("event_type"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_extendedprice").alias("amount"),
        )
    )


def user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw clickstream table, conformed."""
    e = load_table(spark, sf_dir, "events")
    return _conform(
        e.select(
            F.col("user_id").alias("entity_id"),
            F.col("event_type"),
            F.col("ts"),
            F.col("value").alias("amount"),
        )
    )


def return_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned lines are events on the supplier (filter-extractor
    shape: most of the reference's extractors are base table + WHERE,
    events.R:38-43)."""
    li = load_table(spark, sf_dir, "lineitem")
    return _conform(
        li.filter(F.col("l_returnflag") == "R").select(
            F.col("l_suppkey").alias("entity_id"),
            F.lit("line_returned").alias("event_type"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_extendedprice").alias("amount"),
        )
    )


# End-state classifier: code -> event label, inner join => also filters
# (the reference's EventEndStateClassifier merge, R/events.R:863-865 +
# constants.R:15-18 — J14). A literal broadcast dim, not a when-chain,
# so adding end states is data, not code.
END_STATE_CLASSIFIER = (("F", "order_finished"), ("P", "order_in_process"))


def end_state_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    classifier = literal_dim(
        spark, END_STATE_CLASSIFIER, "o_orderstatus string, event_type string"
    )
    return _conform(
        o.join(F.broadcast(classifier), "o_orderstatus").select(
            F.col("o_custkey").alias("entity_id"),
            F.col("event_type"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_totalprice").alias("amount"),
        )
    )


def session_start_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-parsed extractor: a 'session_started' event wherever a
    user's gap from the previous raw event exceeds 30 minutes (or the
    stream begins). Mirrors the reference's derived extractors, which
    parse the PRIORLOC history with lag/lead windows rather than
    projecting stored columns (events.R:106-268, W1-W2).

    Null-ts rows are dropped BEFORE the window (the event-log contract
    excludes undated rows, so they must not act as run/gap neighbors —
    and Spark's nulls-first vs DuckDB's nulls-last ordering would
    otherwise diverge)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return _conform(
        e.withColumn("_prev", prev)
        .filter(
            F.col("_prev").isNull()
            | (F.col("ts") >= F.col("_prev") + F.expr("interval 30 minutes"))
        )
        .select(
            F.col("user_id").alias("entity_id"),
            F.lit("session_started").alias("event_type"),
            F.col("ts"),
            F.lit(None).cast("double").alias("amount"),
        )
    )


def hearing_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relabel+patch extractor (events.R:540-549):
    ``EVENT_TYPE = ifelse(HEARING_DISP == "H", "HEARING",
    "HEARING_EXCEPTION")`` with R's NA-PROPAGATING ifelse — a NULL
    disposition yields a NULL label, never the else branch (the
    when/otherwise trap; see functions.scalars.r_ifelse) — then the
    CLSDATE patch: exceptions with a non-null close date take it as
    their event date. NULL-labelled rows are NOT patched (R's
    ``EVENT_TYPE == "HEARING_EXCEPTION"`` is NA for them; dplyr-style
    NA-as-false — the literal base-R subscript-assignment would error
    on NA subscripts, so the reference implicitly never sees NULL
    dispositions with close dates; we pin the defined behavior).

    The synthetic tables have no nullable disposition column, so one is
    derived deterministically from the clickstream: 'signup' rows act
    as hearing records, disp = H/X/NULL banded on value, close date =
    ts+3d for value>10.
    """
    from ..functions.scalars import r_ifelse

    e = load_table(spark, sf_dir, "events")
    h = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        "value",
        F.when(F.col("value") > 30, "H").when(F.col("value") > 20, "X").alias("disp"),
        F.when(
            F.col("value") > 10, F.col("ts") + F.expr("interval 3 days")
        ).alias("clsdate"),
    )
    label = r_ifelse(
        F.col("disp") == "H", F.lit("HEARING"), F.lit("HEARING_EXCEPTION")
    )
    patched = F.when(
        (label == "HEARING_EXCEPTION") & F.col("clsdate").isNotNull(),
        F.col("clsdate"),
    ).otherwise(F.col("ts"))
    return _conform(
        h.select(
            F.col("user_id").alias("entity_id"),
            label.alias("event_type"),
            patched.alias("ts"),
            F.col("value").alias("amount"),
        )
    )


def transcription_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired from/to location extractor (events.R:116-126 abeyance
    gather; also .parseAbeyanceLocs:164-180): one location-log row
    emits TWO events — TO_X at the check-out date and FROM_X at the
    check-in date — via ``DataFrame.unpivot`` (tidyr ``gather``).
    'error' rows stand in for transcription-loc rows; the check-in
    date is derived as ts + floor(value) minutes.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("entity_id"),
        F.col("value").alias("amount"),
        F.col("ts").alias("to_transcript"),
        (
            F.col("ts")
            + F.make_interval(mins=F.floor("value").cast("int"))
        ).alias("from_transcript"),
    )
    return _conform(
        base.unpivot(
            ids=["entity_id", "amount"],
            values=["to_transcript", "from_transcript"],
            variableColumnName="event_type",
            valueColumnName="ts",
        )
    )


def milestone_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's workhorse extractor shape: N wide date columns
    gathered into labeled events with a column->label map and a
    non-null filter (event_getDateCols, events.R:22-53; used for
    NOD/SOC/FORM9/CERTIFICATION/DOCKET and six more types,
    events.R:934-946,960-971). ``o_orderstatus <> 'P'`` mirrors the
    ``BFAC = '1'`` original-action gate.

    The synthetic orders table has one date column, so the extra
    milestone dates are derived deterministically (as hearing_events
    does for dispositions): DOCKET always at +7d, SOC at +30d for
    orders over 50k, CERTIFICATION at +60d for finished orders — the
    NULL branches exercise getDateCols' is-not-null drop."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderstatus") != "P").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_totalprice").alias("amount"),
        (F.col("o_orderdate") + F.expr("interval 7 days")).alias("DOCKET"),
        F.when(
            F.col("o_totalprice") > 50000,
            F.col("o_orderdate") + F.expr("interval 30 days"),
        ).alias("SOC"),
        F.when(
            F.col("o_orderstatus") == "F",
            F.col("o_orderdate") + F.expr("interval 60 days"),
        ).alias("CERTIFICATION"),
    )
    return _conform(
        base.unpivot(
            ids=["entity_id", "amount"],
            values=["DOCKET", "SOC", "CERTIFICATION"],
            variableColumnName="event_type",
            valueColumnName="ts",
        )
    )


def _first_event_mins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entity_id, ts) of each user's first raw event. Shared by the
    creation and substitution extractors so the two branches of the
    events_all union canonicalize to the SAME aggregate subtree and
    Spark's ReuseExchange runs the shuffle once. Undated rows are
    excluded up front (same contract as the window extractors)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return e.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.min("ts").alias("ts")
    )


def creation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-child-timestamp shape (event_vacolsCreation, events.R:
    310-316: ``min(LOCDOUT) per LOCKEY`` subquery joined to the
    parent): a user's first raw event becomes 'account_created'.
    Map-side-combinable min, no join needed for the unfiltered form."""
    return _conform(
        _first_event_mins(spark, sf_dir).select(
            "entity_id",
            F.lit("account_created").alias("event_type"),
            "ts",
            F.lit(None).cast("double").alias("amount"),
        )
    )


def substitution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same child-min aggregate gated on a parent flag
    (event_substitution, events.R:331-340: ``BFSUB = 'S'``): users
    whose customer row sits in the BUILDING segment. The flag filter
    is a broadcast semi-join against the filtered parent — pushdown
    keeps the parent scan two columns wide."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("entity_id"))
    )
    return _conform(
        _first_event_mins(spark, sf_dir)
        .join(F.broadcast(c), "entity_id", "left_semi")
        .select(
            "entity_id",
            F.lit("segment_substitution").alias("event_type"),
            "ts",
            F.lit(None).cast("double").alias("amount"),
        )
    )


def ssoc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gather + uniform relabel + per-(entity, date) dedup
    (event_ssoc, events.R:397-409: five SSOC date columns gathered,
    EVENT_TYPE overwritten to one label, uniqued by BFCORLID+DATE).
    Follow-up statement dates are derived at +90d/+120d tiers; the
    dedup is a single shuffle on (entity_id, ts)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").alias("entity_id"),
        F.when(
            F.col("o_totalprice") > 100000,
            F.col("o_orderdate") + F.expr("interval 90 days"),
        ).alias("ssoc1"),
        F.when(
            F.col("o_totalprice") > 150000,
            F.col("o_orderdate") + F.expr("interval 120 days"),
        ).alias("ssoc2"),
    )
    long = base.unpivot(
        ids=["entity_id"],
        values=["ssoc1", "ssoc2"],
        variableColumnName="_src",
        valueColumnName="ts",
    )
    return _conform(
        long.select(
            "entity_id",
            F.lit("SSOC").alias("event_type"),
            "ts",
            F.lit(None).cast("double").alias("amount"),
        ).dropDuplicates(["entity_id", "ts"])
    )


def assignment_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-attributed date gather — the reference's DECASS shape
    (events.R:963-971: ``event_getDateCols(con, c("DEASSIGN",
    "DERECEIVE"), c("ASSIGNMENT", "DRAFT_DECISION"), join = "DECASS on
    BFKEY = DEFOLDER")``): the date columns live on a CHILD table and
    the entity id on the parent, so the gather rides a join. Synthetic
    analog: line-level dates attributed to the order's customer —
    ASSIGNMENT a week before ship, DRAFT_DECISION two days after for
    large lines (the NULL branch exercises getDateCols' non-null drop).

    At 100 TB this is the fact-fact join of the union — co-partitioned
    sort-merge on the order key (bucket both tables on it and the
    shuffle disappears; see tests/test_bucketing.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    base = j.select(
        F.col("o_custkey").alias("entity_id"),
        F.col("l_extendedprice").alias("amount"),
        (F.col("l_shipdate") - F.expr("interval 7 days")).alias("ASSIGNMENT"),
        F.when(
            F.col("l_quantity") > 25,
            F.col("l_shipdate") + F.expr("interval 2 days"),
        ).alias("DRAFT_DECISION"),
    )
    return _conform(
        base.unpivot(
            ids=["entity_id", "amount"],
            values=["ASSIGNMENT", "DRAFT_DECISION"],
            variableColumnName="event_type",
            valueColumnName="ts",
        )
    )


def review_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Location-run parser emitting paired TO/FROM events — the
    reference's .parseVSOLocs / .parseQRLocs / .parseOMOLocs shape
    (events.R:127-161, 244-268): segment each entity's history into
    runs of consecutive same-typed rows; a run of the tracked type
    yields TO_X at its first row and FROM_X at its last. Synthetic
    analog: runs of 'view' rows in the clickstream become
    to_review/from_review (a length-1 run emits both at the same ts,
    exactly like a same-day checkout/checkin).

    lag/lead over one (user, ts) window find run boundaries without a
    per-run aggregation — one shuffle, no second pass. Null-ts rows
    are dropped BEFORE the window (event-log contract: undated rows
    neither emit events nor split runs)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.withColumn("_prev_t", F.lag("event_type").over(w)).withColumn(
        "_next_t", F.lead("event_type").over(w)
    )
    is_view = F.col("event_type") == "view"
    starts = base.filter(
        is_view & (F.col("_prev_t").isNull() | (F.col("_prev_t") != "view"))
    ).select(
        F.col("user_id").alias("entity_id"),
        F.lit("to_review").alias("event_type"),
        F.col("ts"),
        F.lit(None).cast("double").alias("amount"),
    )
    ends = base.filter(
        is_view & (F.col("_next_t").isNull() | (F.col("_next_t") != "view"))
    ).select(
        F.col("user_id").alias("entity_id"),
        F.lit("from_review").alias("event_type"),
        F.col("ts"),
        F.lit(None).cast("double").alias("amount"),
    )
    return _conform(starts.unionByName(ends))


EXTRACTORS = (
    order_events,
    shipment_events,
    user_events,
    return_events,
    end_state_events,
    session_start_events,
    hearing_events,
    transcription_events,
    milestone_events,
    creation_events,
    substitution_events,
    ssoc_events,
    assignment_events,
    review_window_events,
)


# ---------------------------------------------------------------------------
# Fused per-table extraction. unionByName of the granular extractors
# re-scans each source once per branch (15 scans for the 14-extractor
# log); the narrow per-row extractors that share a table are instead
# computed from ONE scan as an array of conditional event structs,
# exploded and null-filtered — the same multiset from 6 scans. At 100 TB
# the duplicate fact-table scans are the dominant cost of the union,
# so events_all() uses this path when no caller predicate needs
# per-branch pushdown. Parity with the granular union is pinned in
# tests (and the shared EVENTS_ALL_SQL oracle checks both).
# ---------------------------------------------------------------------------


def _ev(entity: Column, event_type: Column, ts: Column, amount: Column) -> Column:
    """One event-candidate struct with the canonical field types, so
    every element of the conditional array agrees on shape. The entity
    rides in the struct because fused branches of one scan can
    attribute events to different entities (supplier for shipments,
    customer for assignments)."""
    return F.struct(
        entity.cast("long").alias("entity_id"),
        event_type.cast("string").alias("event_type"),
        ts.cast("timestamp_ntz").alias("ts"),
        amount.cast("double").alias("amount"),
    )


def _explode_events(base: DataFrame) -> DataFrame:
    """(_evs) -> conformed long events. Null slots (branch gate false)
    and null-ts events drop AFTER the generate — explode emits null
    elements as rows, and both predicates stay inside whole-stage
    codegen."""
    return (
        base.select(F.explode("_evs").alias("_e"))
        .where(F.col("_e").isNotNull() & F.col("_e.ts").isNotNull())
        .select("_e.entity_id", "_e.event_type", "_e.ts", "_e.amount")
    )


def _orders_narrow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order_events + end_state_events + milestone_events from one
    orders scan. The end-state classifier stays a broadcast literal dim
    (J14's merge-as-data design) — joined left so unmatched statuses
    just contribute a null slot."""
    # sized_for_compute: the 5-slot conditional explode is per-row
    # compute that must not be serialized onto one task when the export
    # arrives as a single split; no-op on a properly-split layout.
    o = sized_for_compute(load_table(spark, sf_dir, "orders"))
    classifier = literal_dim(
        spark, END_STATE_CLASSIFIER, "o_orderstatus string, event_type string"
    )
    oc = o.join(F.broadcast(classifier), "o_orderstatus", "left")
    ent = F.col("o_custkey")
    od, tp, st = F.col("o_orderdate"), F.col("o_totalprice"), F.col("o_orderstatus")
    not_p = st != "P"
    evs = F.array(
        _ev(ent, F.lit("order_placed"), od, tp),
        F.when(
            F.col("event_type").isNotNull(), _ev(ent, F.col("event_type"), od, tp)
        ),
        F.when(
            not_p, _ev(ent, F.lit("DOCKET"), od + F.expr("interval 7 days"), tp)
        ),
        F.when(
            not_p,
            _ev(
                ent,
                F.lit("SOC"),
                F.when(tp > 50000, od + F.expr("interval 30 days")),
                tp,
            ),
        ),
        F.when(
            not_p,
            _ev(
                ent,
                F.lit("CERTIFICATION"),
                F.when(st == "F", od + F.expr("interval 60 days")),
                tp,
            ),
        ),
    )
    return _explode_events(oc.select(evs.alias("_evs")))


def _lineitem_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shipment_events + return_events + assignment_events from one
    lineitem scan. The assignment gather needs the order's customer, so
    the scan rides a LEFT join to orders (left, not inner, so the
    supplier-attributed branches keep every line even if a dangling
    order key ever appeared); the customer-attributed structs gate on
    the join matching. Bucket both tables on the order key and this
    join shuffles nothing."""
    # sized_for_compute: the probe side carries the 4-slot explode and
    # the interval arithmetic; a single-split export would run all of
    # it on one task (measured 3x the branch cost at sf0.1). No-op when
    # the lake layout already gives the scan enough splits.
    li = sized_for_compute(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left")
    supp, cust = F.col("l_suppkey"), F.col("o_custkey")
    sd, ep = F.col("l_shipdate"), F.col("l_extendedprice")
    evs = F.array(
        _ev(supp, F.lit("line_shipped"), sd, ep),
        F.when(
            F.col("l_returnflag") == "R",
            _ev(supp, F.lit("line_returned"), sd, ep),
        ),
        F.when(
            cust.isNotNull(),
            _ev(cust, F.lit("ASSIGNMENT"), sd - F.expr("interval 7 days"), ep),
        ),
        F.when(
            cust.isNotNull(),
            _ev(
                cust,
                F.lit("DRAFT_DECISION"),
                F.when(
                    F.col("l_quantity") > 25, sd + F.expr("interval 2 days")
                ),
                ep,
            ),
        ),
    )
    return _explode_events(j.select(evs.alias("_evs")))


def _clickstream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL seven clickstream extractors (user, hearing, transcription,
    session_start, creation, substitution, review run-parser) from ONE
    events scan and ONE shuffle.

    The per-row shapes (raw projection, NA-propagating relabel+patch,
    from/to fan-out) are conditional struct slots. The window shapes
    ride the same lag: `prev IS NULL | gap > 30min` marks a session
    start, and because the window orders by (ts, event_id), the
    first-row-per-user condition `prev IS NULL` lands exactly on
    min(ts) — so the creation/substitution aggregates become two more
    conditional slots on the first row instead of two scans + two
    groupBy shuffles. The substitution gate (customer BUILDING
    segment) joins broadcast before the window.

    The ts-not-null pre-filter is exactly _conform's postcondition
    hoisted to the scan (every granular branch drops null-ts rows),
    and it keeps the nulls-first window ordering from electing a
    null-ts row as a user's first event."""
    from pyspark.sql.window import Window

    from ..functions.scalars import r_ifelse

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bld = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("user_id"), F.lit(True).alias("_bld"))
    )
    e = e.join(F.broadcast(bld), "user_id", "left")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = (
        e.withColumn("_prev", F.lag("ts").over(w))
        .withColumn("_prev_t", F.lag("event_type").over(w))
        .withColumn("_next_t", F.lead("event_type").over(w))
    )

    ts, v = F.col("ts"), F.col("value")
    is_signup = F.col("event_type") == "signup"
    is_error = F.col("event_type") == "error"
    is_view = F.col("event_type") == "view"
    is_first = F.col("_prev").isNull()
    new_sess = is_first | (
        ts >= F.col("_prev") + F.expr("interval 30 minutes")
    )
    run_start = is_view & (F.col("_prev_t").isNull() | (F.col("_prev_t") != "view"))
    run_end = is_view & (F.col("_next_t").isNull() | (F.col("_next_t") != "view"))
    disp = F.when(v > 30, "H").when(v > 20, "X")
    clsdate = F.when(v > 10, ts + F.expr("interval 3 days"))
    label = r_ifelse(disp == "H", F.lit("HEARING"), F.lit("HEARING_EXCEPTION"))
    patched = F.when(
        (label == "HEARING_EXCEPTION") & clsdate.isNotNull(), clsdate
    ).otherwise(ts)
    null_amt = F.lit(None).cast("double")
    ent = F.col("user_id")
    evs = F.array(
        _ev(ent, F.col("event_type"), ts, v),
        F.when(is_signup, _ev(ent, label, patched, v)),
        F.when(is_error, _ev(ent, F.lit("to_transcript"), ts, v)),
        F.when(
            is_error,
            _ev(
                ent,
                F.lit("from_transcript"),
                ts + F.make_interval(mins=F.floor(v).cast("int")),
                v,
            ),
        ),
        F.when(new_sess, _ev(ent, F.lit("session_started"), ts, null_amt)),
        F.when(is_first, _ev(ent, F.lit("account_created"), ts, null_amt)),
        F.when(
            is_first & F.col("_bld").isNotNull(),
            _ev(ent, F.lit("segment_substitution"), ts, null_amt),
        ),
        F.when(run_start, _ev(ent, F.lit("to_review"), ts, null_amt)),
        F.when(run_end, _ev(ent, F.lit("from_review"), ts, null_amt)),
    )
    return _explode_events(base.select(evs.alias("_evs")))


# Same multiset as EXTRACTORS from 6 source scans (orders x2 narrow+
# ssoc, orders-for-assignment x1 inside the lineitem join, lineitem,
# events, customer) and ONE events-table shuffle instead of three.
# Only ssoc keeps its own branch: its (entity_id, ts) dedup shuffles a
# small conditional subset, which fusing would inflate to the full
# orders event set.
FUSED_EXTRACTORS = (
    _orders_narrow_events,
    _lineitem_events,
    _clickstream_events,
    ssoc_events,
)

# DuckDB twin of events_all(): one branch per extractor, same order,
# columns (entity_id, event_type, ts, amount). Interpolated into every
# oracle that consumes the event view (u1_union_event_log,
# comp_backlog_reconstruction) so extractor changes can't silently
# diverge from a hand-copied union.
EVENTS_ALL_SQL = """
      SELECT o_custkey AS entity_id, 'order_placed' AS event_type,
             o_orderdate AS ts, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT l_suppkey, 'line_shipped', l_shipdate, l_extendedprice FROM lineitem
      UNION ALL
      SELECT user_id, event_type, ts, value FROM events
      UNION ALL
      SELECT l_suppkey, 'line_returned', l_shipdate, l_extendedprice
      FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT o_custkey,
             CASE o_orderstatus WHEN 'F' THEN 'order_finished'
                                WHEN 'P' THEN 'order_in_process' END,
             o_orderdate, o_totalprice
      FROM orders WHERE o_orderstatus IN ('F', 'P')
      UNION ALL
      SELECT user_id, 'session_started', ts, CAST(NULL AS DOUBLE)
      FROM (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE ts IS NOT NULL
      ) WHERE prev_ts IS NULL
           OR ts >= prev_ts + INTERVAL 30 MINUTE
      UNION ALL
      SELECT user_id,
             CASE WHEN disp = 'H' THEN 'HEARING'
                  WHEN disp <> 'H' THEN 'HEARING_EXCEPTION' END,
             CASE WHEN disp IS NOT NULL AND disp <> 'H'
                       AND clsdate IS NOT NULL THEN clsdate ELSE ts END,
             value
      FROM (
        SELECT user_id, ts, value,
               CASE WHEN value > 30 THEN 'H'
                    WHEN value > 20 THEN 'X' END AS disp,
               CASE WHEN value > 10 THEN ts + INTERVAL 3 DAY END AS clsdate
        FROM events WHERE event_type = 'signup'
      )
      UNION ALL
      SELECT user_id, 'to_transcript', ts, value
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, 'from_transcript',
             ts + to_minutes(CAST(FLOOR(value) AS BIGINT)), value
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT o_custkey, lab, d, o_totalprice
      FROM (
        SELECT o_custkey, o_totalprice, lab,
               CASE lab
                 WHEN 'DOCKET' THEN o_orderdate + INTERVAL 7 DAY
                 WHEN 'SOC' THEN CASE WHEN o_totalprice > 50000
                      THEN o_orderdate + INTERVAL 30 DAY END
                 ELSE CASE WHEN o_orderstatus = 'F'
                      THEN o_orderdate + INTERVAL 60 DAY END
               END AS d
        FROM orders
        CROSS JOIN (SELECT UNNEST(['DOCKET', 'SOC', 'CERTIFICATION']) AS lab)
        WHERE o_orderstatus <> 'P'
      )
      UNION ALL
      SELECT user_id, 'account_created', MIN(ts), CAST(NULL AS DOUBLE)
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
      UNION ALL
      SELECT user_id, 'segment_substitution', MIN(ts), CAST(NULL AS DOUBLE)
      FROM events
      WHERE ts IS NOT NULL AND user_id IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      GROUP BY user_id
      UNION ALL
      SELECT DISTINCT o_custkey, 'SSOC', d, CAST(NULL AS DOUBLE)
      FROM (
        SELECT o_custkey, CASE WHEN o_totalprice > 100000
               THEN o_orderdate + INTERVAL 90 DAY END AS d FROM orders
        UNION ALL
        SELECT o_custkey, CASE WHEN o_totalprice > 150000
               THEN o_orderdate + INTERVAL 120 DAY END FROM orders
      ) WHERE d IS NOT NULL
      UNION ALL
      SELECT o_custkey, lab, d, l_extendedprice
      FROM (
        SELECT o_custkey, l_extendedprice, lab,
               CASE lab
                 WHEN 'ASSIGNMENT' THEN l_shipdate - INTERVAL 7 DAY
                 ELSE CASE WHEN l_quantity > 25
                      THEN l_shipdate + INTERVAL 2 DAY END
               END AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        CROSS JOIN (SELECT UNNEST(['ASSIGNMENT', 'DRAFT_DECISION']) AS lab)
      ) WHERE d IS NOT NULL
      UNION ALL
      SELECT user_id, 'to_review', ts, CAST(NULL AS DOUBLE)
      FROM (
        SELECT user_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_t
        FROM events WHERE ts IS NOT NULL
      ) WHERE event_type = 'view' AND (prev_t IS NULL OR prev_t <> 'view')
      UNION ALL
      SELECT user_id, 'from_review', ts, CAST(NULL AS DOUBLE)
      FROM (
        SELECT user_id, ts, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_t
        FROM events WHERE ts IS NOT NULL
      ) WHERE event_type = 'view' AND (next_t IS NULL OR next_t <> 'view')
"""

# Global case exclusions (constants.R:1-7: the reference prepends a
# WHERE clause dropping two dummy-data BFKEYs and merged cases to EVERY
# event log). The synthetic analog drops two designated dummy entities;
# the merged-case predicate rides the same hook. Applied by events_all
# and interpolated into EVENTS_ALL_SQL, so every consumer — Spark and
# oracle — stays in lockstep.
EXCLUDED_ENTITIES = (13, 77)

_EXCL = ", ".join(str(e) for e in EXCLUDED_ENTITIES)
# ts IS NOT NULL is part of events_all's contract (_conform drops
# null-ts rows in every extractor), so the shared SQL twin must apply
# it too — otherwise a consumer that forgets its own ts filter
# silently diverges for branches whose gathered date can be NULL.
EVENTS_ALL_SQL = f"""
      SELECT * FROM ({EVENTS_ALL_SQL})
      WHERE entity_id NOT IN ({_EXCL}) AND ts IS NOT NULL
"""


def events_all(
    spark: SparkSession, sf_dir: str, where: Column | None = None
) -> DataFrame:
    """Union of all extractors — one Catalyst plan, one pass.

    ``where`` mirrors the reference's ``event_all(con, join, where)``
    composability hook (events.R:923-991): an optional predicate pushed
    over the unified log (Catalyst pushes it into every union branch,
    so a selective predicate prunes each source scan). The global
    dummy-entity exclusions (constants.R:1-7) are always applied.

    Physical strategy: with a caller ``where`` the granular
    per-extractor union is used — Catalyst pushes the predicate into
    every branch, so a selective filter prunes each scan (u5's
    documented behavior). Without one, the full log is being
    materialized anyway, and the fused per-table form (6 scans, not
    15) wins; an event_type/ts predicate cannot be pushed below a
    generate, but an entity_id one still reaches the fused scans
    (entity_id passes through the explode untouched).
    """
    extractors = EXTRACTORS if where is not None else FUSED_EXTRACTORS
    ev = reduce(
        DataFrame.unionByName, (ex(spark, sf_dir) for ex in extractors)
    ).filter(~F.col("entity_id").isin(*EXCLUDED_ENTITIES))
    return ev.filter(where) if where is not None else ev
