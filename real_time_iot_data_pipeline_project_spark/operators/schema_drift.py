"""Schema-drift tolerance (SURVEY.md §1.4 regime 3): fuzzy-map arbitrary
uploaded CSV columns to canonical names, coerce types, synthesize a
timestamp when absent — the dashboards' ``detect_columns``
(``Solar_Dashboard.py:63-85``, ``Wind_Dashboard.py:66-93``) re-done as a
driver-side pre-pass over ``df.columns`` (no Catalyst work, no data scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical name → lowercase substring patterns (first match wins,
# mirroring the reference's pattern lists)
SOLAR_PATTERNS: dict[str, list[str]] = {
    "timestamp": ["timestamp", "datetime", "date", "time"],
    "station": ["station", "site", "farm", "plant"],
    "power_output": ["power", "output_kw", "generation"],
    "irradiance": ["irradiance", "radiation", "ghi"],
    "temperature": ["temp"],
    "voltage": ["volt"],
    "current": ["current", "amp"],
    "energy": ["energy", "kwh"],
}

WIND_PATTERNS: dict[str, list[str]] = {
    "timestamp": ["timestamp", "datetime", "date", "time"],
    "station": ["station", "site", "farm"],
    "wind_speed": ["wind_speed", "windspeed", "speed"],
    "power_output": ["power", "output"],
    "air_density": ["density"],
    "temperature": ["temp"],
    "humidity": ["humid"],
    "pressure": ["press"],
    "energy": ["energy"],
}


def _norm(name: str) -> str:
    return name.strip().lower().replace(" ", "_").replace("-", "_")


def detect_columns(columns: list[str],
                   patterns: dict[str, list[str]]) -> dict[str, str]:
    """canonical name → actual column name, by substring match on the
    normalized header (F28). First canonical wins a column; a column maps
    to at most one canonical name."""
    taken: set[str] = set()
    out: dict[str, str] = {}
    for canon, pats in patterns.items():
        for col in columns:
            if col in taken:
                continue
            n = _norm(col)
            if any(p in n for p in pats):
                out[canon] = col
                taken.add(col)
                break
    return out


def display_name(name: str) -> str:
    """F29 — display-name prettifier (``Solar_Dashboard.py:447``,
    ``Wind_Dashboard.py:437``: ``col.replace('_',' ').title()``).
    Driver-side string op for chart labels; ``display_name_col`` is the
    exact Column-expression twin."""
    return name.replace("_", " ").title()


def display_name_col(c: str | F.Column) -> F.Column:
    """F29 as a Column expression (for labeling rows, not columns).

    Emulates Python ``str.title()`` exactly — NOT ``initcap``, which
    only capitalizes after whitespace and so diverges on tokens with
    digits/apostrophes ('output_2kw'.title() → 'Output 2Kw' but initcap
    → 'Output 2kw'). title() capitalizes any letter that follows a
    non-letter: done here as a JVM-side ``transform`` over the char
    array (no Python UDF)."""
    col = F.col(c) if isinstance(c, str) else c
    s = F.lower(F.replace(col, F.lit("_"), F.lit(" ")))
    chars = F.split(s, "")
    capped = F.transform(
        chars,
        lambda ch, i: F.when(
            # first char, or previous char is not a (lowercased) letter
            (i == F.lit(0))
            | ~F.element_at(chars, F.greatest(i, F.lit(1))).rlike("[a-z]"),
            F.upper(ch),
        ).otherwise(ch),
    )
    return F.concat_ws("", capped)


def normalize_schema(df: DataFrame, patterns: dict[str, list[str]],
                     numeric_cols: list[str] | None = None,
                     synthesize_ts: bool = True,
                     ts_start: str = "2024-01-01 00:00:00",
                     ts_step_minutes: int = 15) -> DataFrame:
    """Rename fuzzy-matched columns to canonical names, numeric-coerce
    (bad values → null, pandas ``errors='coerce'`` semantics), synthesize
    an evenly-spaced timestamp when none was detected
    (Solar_Dashboard.py:106-108)."""
    mapping = detect_columns(df.columns, patterns)
    for canon, actual in mapping.items():
        df = df.withColumnRenamed(actual, canon)
    for c in numeric_cols or []:
        if c in df.columns:
            # try_cast: bad numeric → null (pandas errors='coerce'; plain
            # cast would throw under Spark 4 ANSI mode)
            df = df.withColumn(c, F.expr(f"try_cast(`{c}` AS DOUBLE)"))
    if "timestamp" in df.columns:
        df = df.withColumn("timestamp", F.try_to_timestamp(F.col("timestamp").cast("string")))
    elif synthesize_ts:
        # deterministic row index → start + idx·step. row_number over a
        # constant ordering is the batch equivalent of pd.date_range.
        from pyspark.sql import Window

        w = Window.partitionBy().orderBy(F.monotonically_increasing_id())
        df = df.withColumn("__idx", F.row_number().over(w) - 1).withColumn(
            "timestamp",
            F.to_timestamp(F.lit(ts_start))
            + F.make_interval(mins=F.col("__idx") * ts_step_minutes),
        ).drop("__idx")
    return df
