"""PipelineConfig — one parameterized dataflow subsuming both reference
scripts (SURVEY §3.2: main.py and deltaweekly.py are ~95% duplicated
parameter variants).

    hourly  = PipelineConfig(expiry_policy="nearest3",    strike_pct=7)
    weekly  = PipelineConfig(expiry_policy="friday_w1w2", strike_pct=25)

``snapshot(...)`` is the reference's fetch_eth_options_data
(main.py:89-250) as ONE lazy plan: a single cached scan feeds (a) the
spot-price scalar, (b) the distinct-expiry ladder branch, and (c) the
main filter/project branch semi-joined with (b).
``run(...)`` adds the previous-state join (calculate_open_and_oi_change,
main.py:266-330) and the final sort/projection.
"""

from __future__ import annotations

import datetime as dt
import itertools
from dataclasses import dataclass

_OBSERVE_SEQ = itertools.count()

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import expiry as expiry_ops
from eth_options_data_pipeline_spark.operators.dedup import keep_last, with_ingest_order
from eth_options_data_pipeline_spark.operators.filters import expiry_membership, null_guard, strike_band
from eth_options_data_pipeline_spark.operators.parse import parse_tickers
from eth_options_data_pipeline_spark.operators.snapshot import derive_open_oi_change, tail_n
from eth_options_data_pipeline_spark.schemas import OPTIONS_CHAIN_COLUMNS


@dataclass(frozen=True)
class PipelineConfig:
    expiry_policy: str = "nearest3"   # "nearest3" (E0-E2) | "friday_w1w2" (W1/W2)
    strike_pct: float = 7.0           # ±7% hourly, ±25% weekly
    state_tail: int = 300             # previous-state row bound (main.py:260)
    sink_table: str = "options_hourly"


HOURLY = PipelineConfig("nearest3", 7.0, 300, "options_hourly")
WEEKLY = PipelineConfig("friday_w1w2", 25.0, 300, "options_weekly")


def target_expiries(parsed: DataFrame, config: PipelineConfig, as_of_date: dt.date) -> DataFrame:
    """W1/W2 ladder over the distinct parsed expiries."""
    expiries = parsed.select("Expiry_Date").where(F.col("Expiry_Date").isNotNull())
    if config.expiry_policy == "nearest3":
        return expiry_ops.nearest_expiries(expiries, as_of_date, k=3)
    if config.expiry_policy == "friday_w1w2":
        return expiry_ops.friday_expiries(expiries, as_of_date).select("expiry")
    raise ValueError(f"unknown expiry_policy: {config.expiry_policy}")


def snapshot(raw_tickers: DataFrame, config: PipelineConfig, as_of_ts: dt.datetime,
             observation=None, caches: list | None = None) -> DataFrame:
    """Parse → guard → band → ladder semi-join → project → keep-last
    dedup → sort. Produces options_chain rows with Open/OI_Change
    defaulted to 0 (pre-join state, main.py:210-211).

    Pass a ``pyspark.sql.Observation`` to collect the parse telemetry
    (A4 counters, reference main.py:153-155,225-226) during the normal
    action — no extra scan. Default is a uniquified string observation
    (chained runs embed several snapshots in ONE plan, and Spark
    requires distinct observation names within a query).

    Pass ``caches=[]`` to receive the DataFrames this plan caches, so
    long-running callers (the streaming foreachBatch path, which builds
    a fresh plan per micro-batch) can unpersist them once the batch's
    action completes instead of accumulating cache-manager entries.
    """
    as_of_date = as_of_ts.date()

    ordered = with_ingest_order(raw_tickers)
    parsed = parse_tickers(ordered, passthrough=("_ingest_order",))
    obs = observation if observation is not None else f"parse_telemetry_{next(_OBSERVE_SEQ)}"
    parsed = parsed.observe(
        obs,
        F.count(F.lit(1)).alias("rows_fetched"),
        F.sum(F.when(F.col("Expiry_Date").isNotNull(), 1).otherwise(0)).alias("successful_parses"),
        F.sum(F.when(F.col("Expiry_Date").isNull(), 1).otherwise(0)).alias("failed_parses"),
    )
    parsed = parsed.where(
        null_guard(F.col("symbol"), F.col("Strike"), F.col("contract_type"), F.col("spot"))
    )
    # Both the ladder branch and the main branch consume the parsed
    # scan; cache once (SURVEY §3.3 — two-pass reuse).
    parsed = parsed.cache()
    if caches is not None:
        caches.append(parsed)

    targets = target_expiries(parsed, config, as_of_date)

    # P3 strike band: applied per-row against each ticker's own spot,
    # exactly the reference's filter_strikes_by_percentage
    # (main.py:168-172). (The A1 first-non-null *scalar* spot exists
    # only for logging in the reference; trap 5's determinism note
    # applies there, not here.)
    filtered = parsed.where(strike_band(F.col("Strike"), F.col("spot"), config.strike_pct))
    filtered = filtered.where(F.col("Expiry_Date").isNotNull())
    filtered = expiry_membership(filtered, "Expiry_Date", targets)

    projected = filtered.select(
        F.col("symbol").alias("SYMBOL"),
        F.lit(as_of_date).cast("date").alias("Date"),
        F.lit(as_of_ts).cast("timestamp").alias("Time"),
        F.col("spot").alias("Future_Price"),
        F.col("Expiry_Date"),
        F.col("Strike"),
        F.col("Option_Type"),
        F.col("Close"),
        F.col("OI"),
        F.lit(0.0).alias("Open"),
        F.lit(0).cast("long").alias("OI_Change"),
        F.col("_ingest_order"),
    )
    deduped = keep_last(projected, keys=["SYMBOL"], order_col="_ingest_order").drop("_ingest_order")
    return deduped.orderBy("Expiry_Date", "Time", "SYMBOL")


def run(raw_tickers: DataFrame, history: DataFrame | None, config: PipelineConfig,
        as_of_ts: dt.datetime, observation=None) -> DataFrame:
    """Full per-run dataflow: snapshot + previous-state join + final
    11-column projection sorted by (Expiry_Date, Time, SYMBOL)
    (main.py:353-399 minus the I/O boundaries, which live in sinks.py).
    """
    snap = snapshot(raw_tickers, config, as_of_ts, observation=observation)
    if history is not None and len(history.columns) > 0:
        state = tail_n(history, config.state_tail)
        snap = derive_open_oi_change(snap, state)
    return snap.select(*OPTIONS_CHAIN_COLUMNS).orderBy("Expiry_Date", "Time", "SYMBOL")
