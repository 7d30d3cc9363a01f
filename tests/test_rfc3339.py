"""canon.parse_rfc3339_nano — the Alice-LG variable-precision timestamp
fixup (ref alice_lg/__init__.py:213-238)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from iyp_spark.canon import parse_rfc3339_nano

UTC = datetime.timezone.utc

CASES = [
    # Go RFC3339Nano: 9-digit fraction, Z suffix → truncate to micros
    ("2026-01-05T10:00:00.123456789Z",
     datetime.datetime(2026, 1, 5, 10, 0, 0, 123456, UTC)),
    # short fraction + explicit offset → pad to micros, shift to UTC
    ("2026-01-05T11:30:00.5+02:00",
     datetime.datetime(2026, 1, 5, 9, 30, 0, 500000, UTC)),
    # no fraction at all
    ("2026-01-05T12:00:00Z", datetime.datetime(2026, 1, 5, 12, 0, 0, 0, UTC)),
    ("2026-01-05T12:00:00-05:00",
     datetime.datetime(2026, 1, 5, 17, 0, 0, 0, UTC)),
    # fraction but no timezone → the reference raises + warns → null
    ("2026-01-05T13:00:00.123456", None),
    # NO fraction and NO timezone → the reference's datetime.fromisoformat
    # accepts the naive form (its fixup only fires when a fraction is
    # present) → parse as UTC (ADVICE r2)
    ("2026-01-05T14:00:00", datetime.datetime(2026, 1, 5, 14, 0, 0, 0, UTC)),
    ("not a timestamp", None),
    (None, None),
]


def test_parse_rfc3339_nano(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i int, raw string"
    )
    got = {
        r["i"]: r["us"]
        for r in df.select(
            "i", F.unix_micros(parse_rfc3339_nano(F.col("raw"))).alias("us")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        want_us = None if want is None else int(want.timestamp() * 1_000_000)
        assert got[i] == want_us, f"{raw}: {got[i]} != {want_us}"


def test_parse_http_last_modified(spark):
    """P9 residual: ref iyp/__init__.py:93-107 — Last-Modified headers."""
    from iyp_spark.canon import parse_http_last_modified

    cases = [
        ("Mon, 15 Aug 2022 10:00:00 GMT",
         datetime.datetime(2022, 8, 15, 10, 0, 0, 0, UTC)),
        ("Sat, 01 Feb 2025 23:59:59 GMT",
         datetime.datetime(2025, 2, 1, 23, 59, 59, 0, UTC)),
        ("15 Aug 2022 10:00:00", None),       # missing weekday + zone
        ("Mon, 15 Aug 2022 10:00:00 PST", None),  # non-UTC zone rejected
        ("not a date", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i int, raw string")
    from pyspark.sql import functions as F
    got = {r["i"]: r["us"] for r in df.select(
        "i", F.unix_micros(parse_http_last_modified(F.col("raw"))).alias("us")
    ).collect()}
    for i, (raw, want) in enumerate(cases):
        want_us = None if want is None else int(want.timestamp() * 1_000_000)
        assert got[i] == want_us, f"{raw}: {got[i]} != {want_us}"
