"""Symbol/ticker parsing (SURVEY §2 P1, P4, F1-F5).

The reference parses ``{C|P}-ETH-{strike}-{DDMMYY}`` symbols with
per-row Python string slicing inside try/except (main.py:177-190);
here the same semantics are single declarative expressions so Catalyst
keeps them inside whole-stage codegen. ``try_to_date``-style null-on-
failure gives the reference's skip-bad-row behavior without exceptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbol_parts(symbol: Column) -> Column:
    return F.split(symbol, "-")


def expiry_token(symbol: Column) -> Column:
    """Last dash-separated token (reference main.py:131-133 parts[-1])."""
    return F.element_at(symbol_parts(symbol), -1)


def parse_expiry(symbol: Column) -> Column:
    """DDMMYY token -> DateType, NULL on any malformation.

    Mirrors main.py:134-138: 6-char guard, int() parses, 2000+yy pivot.
    ``to_date(_, 'ddMMyy')`` applies the same century pivot; the
    try_to_date wrapper converts parse failure to NULL (skip-not-fail,
    main.py:220-223).
    """
    tok = expiry_token(symbol)
    return F.when(
        (F.length(tok) == 6) & tok.rlike(r"^\d{6}$"),
        F.try_to_date(tok, "ddMMyy"),
    )


def is_well_formed_symbol(symbol: Column) -> Column:
    """P4 malformed-row predicate: >=4 dash parts AND parseable expiry
    (main.py:177-190)."""
    return (F.size(symbol_parts(symbol)) >= 4) & parse_expiry(symbol).isNotNull()


def option_type(contract_type: Column) -> Column:
    """F4 CASE: call_options -> 'Call' else 'Put' (main.py:196)."""
    return F.when(contract_type == "call_options", F.lit("Call")).otherwise(F.lit("Put"))


def parse_tickers(raw: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """P1 projection of the semi-structured ticker rows into typed
    columns (main.py:159-169,196-212). All casts are try_cast-style:
    failure -> NULL, later coalesced to defaults (F5).
    """
    return raw.select(
        *[F.col(c) for c in passthrough],
        F.col("symbol"),
        F.col("contract_type"),
        (F.col("strike_price")).try_cast("double").alias("Strike"),
        (F.col("spot_price")).try_cast("double").alias("spot"),
        F.coalesce((F.col("mark_price")).try_cast("double"), F.lit(0.0)).alias("Close"),
        F.coalesce((F.col("oi_contracts")).try_cast("long"), F.lit(0)).alias("OI"),
        parse_expiry(F.col("symbol")).alias("Expiry_Date"),
        option_type(F.col("contract_type")).alias("Option_Type"),
    )
