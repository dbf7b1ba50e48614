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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import literal_dim, load_table

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
    projecting stored columns (events.R:106-268, W1-W2)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
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


EXTRACTORS = (
    order_events,
    shipment_events,
    user_events,
    return_events,
    end_state_events,
    session_start_events,
    hearing_events,
    transcription_events,
)


def events_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of all extractors — one Catalyst plan, one pass."""
    return reduce(
        DataFrame.unionByName, (ex(spark, sf_dir) for ex in EXTRACTORS)
    )
