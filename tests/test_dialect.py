"""Pins for the r16 regex/locale/split dialect audit (SURVEY §2.49).

scripts/probe_regex_dialect.py measured (P1) that the fixtures never
exercise the string-dialect edges these oracles cross, then probed
both engines at crafted points (P2-P4). These tests pin the probe
results so an engine upgrade (Spark regex/collation or DuckDB RE2 /
case tables) fails a named test loudly instead of flaking a driver
hash — the same treatment the stream/event-time (r13-r15) and batch
(r15) boundary classes got.

Findings pinned here:
- split empty-token placement: Spark F.split (Java, limit -1) and
  DuckDB string_split / string_split_regex AGREE at every edge
  (leading/trailing/interior empties, empty input, all-delimiter
  input) — the split-family oracles are robust by probe, not by
  fixture luck (the documents fixture has ZERO such edges).
- q_pii_scrub: the fixture's props contain ZERO email-shaped
  substrings at all three scales, so the oracle's email branch was
  vacuously green — the crafted-case pin below is the non-vacuous
  evidence for that branch (Java and RE2 agree on the shared
  patterns, including greedy trailing-'.'/'-' absorption into the
  domain match).
- q_collation: UTF8_LCASE grouping and DuckDB LOWER() grouping agree
  on ASCII (the measured fixture shape: 0 non-ASCII segments at all
  scales) and DIVERGE beyond it in both directions — Spark folds
  Greek final sigma (ΣΟΦΙΑΣ = σοφιας) where DuckDB's lower() does
  not; DuckDB's lower('İ') drops the combining dot (merging
  İstanbul = istanbul) where Spark's does not; neither side folds
  ß = SS. The oracle is therefore SCOPED to ASCII keys, and the
  fixture-scope guard below keeps that scoping measured.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from louvain_modularity_spark.textprep import _EMAIL_RE, _NUM_RE

TOKEN_RE = "[^a-z0-9]+"

SPLIT_SPACE_CASES = ["", " ", "  ", "a", " a", "a ", "a  b", " a b ", "a b"]
SPLIT_RE_CASES = ["a,b", ",a", "a,", "a,,b", ",", "A,b", "a1!?2b", "!!!", ""]
PII_CASES = [
    "contact a@b.com today",
    "end-of-sentence a@b.com.",
    "dash a@b-c.org- tail",
    "double a@b..c dots",
    "at a@@b twice",
    "UPPER A@B.COM case",
    "plus user+tag%x_y.z@ex-ample.co 42",
    "adjacent a@b.c123 digits",
    "unicode é@x.com and ١٢٣ digits",
    "bare %_@-. symbols",
    "digits 007 and 42x9",
]


def test_split_empty_token_dialect_agrees(spark):
    """Both split dialects place empty tokens identically at every
    crafted edge (probe P2, 18/18 AGREE)."""
    con = duckdb.connect()
    rows = [Row(i=i, s=s) for i, s in enumerate(SPLIT_SPACE_CASES)]
    got = {
        r["i"]: (r["lit"], r["re"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.split("s", " ").alias("lit"),
            F.split("s", TOKEN_RE).alias("re"),
        )
        .collect()
    }
    for i, s in enumerate(SPLIT_SPACE_CASES):
        d = con.execute("SELECT string_split(?, ' ')", [s]).fetchone()[0]
        assert got[i][0] == d, f"split(' ') dialect drift on {s!r}"
    rows = [Row(i=i, s=s) for i, s in enumerate(SPLIT_RE_CASES)]
    got = {
        r["i"]: r["re"]
        for r in spark.createDataFrame(rows)
        .select("i", F.split("s", TOKEN_RE).alias("re"))
        .collect()
    }
    for i, s in enumerate(SPLIT_RE_CASES):
        d = con.execute(
            f"SELECT string_split_regex(?, '{TOKEN_RE}')", [s]
        ).fetchone()[0]
        assert got[i] == d, f"split(regex) dialect drift on {s!r}"


def test_pii_scrub_email_branch_not_vacuous(spark):
    """The fixture carries ZERO emails (probe P1) — this crafted-case
    pin is the non-vacuous evidence for q_pii_scrub's email branch:
    Spark's Java regex and DuckDB's RE2 must agree on the exact
    shared patterns, counts AND scrubbed output (probe P3, 11/11)."""
    con = duckdb.connect()
    rows = [Row(i=i, props=s) for i, s in enumerate(PII_CASES)]
    got = {
        r["i"]: (r["nd"], r["ne"], r["scrubbed"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.size(F.expr(f"regexp_extract_all(props, '{_NUM_RE}', 0)")).alias("nd"),
            F.size(F.expr(f"regexp_extract_all(props, '{_EMAIL_RE}', 0)")).alias("ne"),
            F.regexp_replace(
                F.regexp_replace("props", _EMAIL_RE, "<EMAIL>"), _NUM_RE, "<NUM>"
            ).alias("scrubbed"),
        )
        .collect()
    }
    saw_email = 0
    for i, s in enumerate(PII_CASES):
        d = con.execute(
            f"""
            SELECT CAST(len(regexp_extract_all(?, '{_NUM_RE}')) AS INTEGER),
                   CAST(len(regexp_extract_all(?, '{_EMAIL_RE}')) AS INTEGER),
                   regexp_replace(regexp_replace(?, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_NUM_RE}', '<NUM>', 'g')
            """,
            [s, s, s],
        ).fetchone()
        assert got[i] == tuple(d), f"pii regex dialect drift on {s!r}"
        saw_email += d[1]
    assert saw_email >= 5, "crafted cases must exercise the email branch"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_collation_oracle_ascii_scope_guard(sf_dir):
    """q_collation's oracle (LOWER() grouping) equals UTF8_LCASE
    grouping ONLY on ASCII keys — probe P4 showed real divergence in
    both directions beyond ASCII (final sigma, dotted capital I).
    Guard the measured scoping: the fixture's c_mktsegment must stay
    pure ASCII at both oracle scales, so a fixture regeneration that
    introduces non-ASCII segments fails HERE with the explanation
    instead of flaking the driver hash."""
    con = duckdb.connect()
    n = con.execute(
        f"""
        SELECT COUNT(*) FROM read_parquet('{sf_dir}/customer.parquet')
        WHERE regexp_matches(c_mktsegment, '[^\\x00-\\x7F]')
        """
    ).fetchone()[0]
    assert n == 0, (
        f"{sf_dir}: {n} non-ASCII segments — q_collation's LOWER() oracle "
        "is only calibrated for ASCII (see scripts/probe_regex_dialect.py P4)"
    )


def test_utf8_lcase_fold_rules_pinned(spark):
    """Pin the Spark-side UTF8_LCASE fold behavior the P4 probe
    discovered, so a Spark collation change is caught by name:
    - ASCII tri-case merges (the fixture shape);
    - Greek capital/final-sigma pair MERGES (full case fold);
    - dotted-capital-İ does NOT merge with plain 'i...' (fold keeps
      the combining dot);
    - ß does NOT merge with SS (no full ß->ss expansion)."""
    cases = [
        "STREET", "Street", "street",
        "straße", "STRASSE",
        "İstanbul", "istanbul",
        "ΣΟΦΙΑΣ", "σοφιας",
    ]
    rows = [Row(s=s) for s in cases]
    groups = sorted(
        tuple(sorted(r["members"]))
        for r in spark.createDataFrame(rows)
        .groupBy(F.expr("collate(s, 'UTF8_LCASE')").alias("k"))
        .agg(F.collect_list("s").alias("members"))
        .collect()
    )
    assert groups == [
        ("STRASSE",),
        ("STREET", "Street", "street"),
        ("istanbul",),
        ("straße",),
        ("İstanbul",),
        ("ΣΟΦΙΑΣ", "σοφιας"),
    ], f"UTF8_LCASE fold rules drifted: {groups}"


# ---------------------------------------------------------------------------
# class-4 pins (r16 head start on the JSON-path / URL-parse dialect —
# scripts/probe_json_url_dialect.py; SURVEY §2.51)
# ---------------------------------------------------------------------------

JSON_SCOPE_SQL = """
SELECT COUNT(*) FROM read_parquet('{d}/events.parquet')
WHERE NOT json_valid(props)
   OR (props->>'k') IS NULL
   OR json_type(props, '$.k') NOT IN ('UBIGINT', 'BIGINT', 'INTEGER')
"""


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_json_oracle_scope_guard(sf_dir):
    """ORACLE_FN_JSON casts props->>'k' with a PLAIN CAST, which
    THROWS on any non-integer token where Spark's from_json("k INT")
    quietly NULLs (probe P2: strings, objects, arrays, booleans all
    ConversionException on the DuckDB side; '1.0'/'1e2'/'\"1\"'
    lenient-cast to ints Spark's strict JSON schema rejects). The
    oracle is valid because every fixture props document is valid
    JSON whose k is an integer token — keep that measured, so a
    fixture regeneration fails HERE with the explanation instead of
    aborting (or silently skewing) the driver compare. A registry
    scan (r16) found exactly TWO oracles in the throwing-CAST class,
    ORACLE_FN_JSON and ORACLE_FN_MAP — both cast the same
    events.props->>'k' this guard measures, so one guard covers the
    class."""
    con = duckdb.connect()
    n = con.execute(JSON_SCOPE_SQL.format(d=sf_dir)).fetchone()[0]
    assert n == 0, (
        f"{sf_dir}: {n} props rows outside the integer-k JSON scope — "
        "see scripts/probe_json_url_dialect.py P2 before trusting "
        "ORACLE_FN_JSON on this fixture"
    )


def test_json_extraction_dialect_rules(spark):
    """Pin the Spark-side JSON extraction rules probe P2 discovered,
    so an engine upgrade is caught by name:
    - from_json('k INT') is STRICT on the JSON token type: float
      tokens (1.0, 1e2) and numeric strings ("1") extract as NULL
      (DuckDB's text-cast path lenient-casts all three — the
      documented dialect divergence the scope guard above confines);
    - duplicate keys: get_json_object returns the FIRST occurrence,
      from_json returns the LAST — Spark disagrees with itself, so an
      oracle over duplicate-key documents could not use both;
    - invalid JSON and missing keys NULL (never throw) in both Spark
      expressions."""
    cases = [
        '{"k": 1}',
        '{"k": 1.0}',
        '{"k": 1e2}',
        '{"k": "1"}',
        '{"k": 1, "k": 2}',
        "not json",
        "",
        '{"x": 1}',
    ]
    rows = [Row(i=i, props=s) for i, s in enumerate(cases)]
    got = {
        r["i"]: (r["k_str"], r["k_int"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.from_json("props", "k INT")["k"].alias("k_int"),
        )
        .collect()
    }
    assert got == {
        0: ("1", 1),
        1: ("1.0", None),   # strict: float token is not INT
        2: ("100.0", None),  # strict: exponent token is not INT
        3: ("1", None),      # strict: string is not INT
        4: ("1", 2),         # first (path) vs last (schema) on dup keys
        5: (None, None),     # invalid json NULLs, never throws
        6: (None, None),
        7: (None, None),     # missing key
    }, got
    # and the DuckDB side of the divergence (the reason for the scope
    # guard): the lenient text-cast path accepts what Spark rejects
    con = duckdb.connect()
    assert con.execute("SELECT CAST('{\"k\": 1.0}'->>'k' AS INTEGER)").fetchone()[0] == 1
    assert con.execute("SELECT CAST('{\"k\": 1e2}'->>'k' AS INTEGER)").fetchone()[0] == 100


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_url_parse_oracle_alphabet_scope_guard(sf_dir):
    """q_url_parse's oracle reconstructs URL components from the
    source columns, which is valid only if parse_url INVERTS the
    construction. Probe P3: the inversion BREAKS outside
    ^[a-z0-9-]+$ — underscore (Java URI rejects '_' in a hostname →
    HOST is NULL), space (whole parse NULL; plain parse_url THROWS),
    '?'/'#' (host truncation + query loss), '@' (userinfo
    reinterpretation), non-ASCII (NULL). Keep the fixture alphabet
    measured so a regeneration fails HERE with the explanation."""
    con = duckdb.connect()
    n = con.execute(
        f"""
        SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE regexp_matches(source, '[^a-z0-9-]')
           OR regexp_matches(lang, '[^a-z0-9-]')
        """
    ).fetchone()[0]
    assert n == 0, (
        f"{sf_dir}: {n} documents outside the URL-safe alphabet — see "
        "scripts/probe_json_url_dialect.py P3 before trusting "
        "ORACLE_URL_PARSE on this fixture"
    )


def test_url_parse_hostile_host_rules(spark):
    """Pin the Spark-side parse_url failure modes probe P3 found (so
    an engine upgrade that starts accepting them is caught and the
    scope guard's alphabet can be relaxed deliberately):
    underscore and space hosts parse to NULL host via try_parse_url,
    and '@' reassigns the host past the userinfo. Also pins that
    plain parse_url THROWS on the space case — the reason q_url_parse
    oracles must stay inside the alphabet rather than lean on NULLs."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import IllegalArgumentException

    urls = {
        1: "https://a_b.example.org/en/doc-1?ref=1&k=1",
        2: "https://has space.example.org/en/doc-1?ref=1&k=1",
        3: "https://user@host.example.org/en/doc-1?ref=1&k=1",
    }
    rows = [Row(i=i, url=u) for i, u in urls.items()]
    got = {
        r["i"]: r["host"]
        for r in spark.createDataFrame(rows)
        .select("i", F.try_parse_url("url", F.lit("HOST")).alias("host"))
        .collect()
    }
    assert got == {1: None, 2: None, 3: "host.example.org"}, got
    with _pytest.raises(IllegalArgumentException):
        spark.createDataFrame([Row(url=urls[2])]).select(
            F.parse_url("url", F.lit("HOST"))
        ).collect()


def test_round_midpoint_dialect_and_decimal_convention(spark):
    """Pin the repo-wide money-rounding convention's REASON with
    concrete witnesses (the rule was documented atop relational.py
    since r1 but never pinned): plain ROUND(double, 2) DISAGREES
    between Spark (exact BigDecimal HALF_UP on the binary value) and
    DuckDB (FP path) at .xx5 midpoints whose double sits just below
    the decimal midpoint — 1.005 rounds to 1.01 in Spark but 1.0 in
    DuckDB; 10.075 to 10.08 vs 10.07 — while the decimal-domain
    pattern every money oracle uses (CAST to DECIMAL, ROUND in the
    decimal domain, CAST back) agrees on every probed midpoint. If an
    engine upgrade changes either side, this fails by name and the
    convention note must be revisited."""
    cases = [2.675, 0.125, 1.005, 3.335, 0.015, 2.665, 7.775, 0.625, 10.075]
    rows = [Row(i=i, x=x) for i, x in enumerate(cases)]
    sp = {
        r["i"]: (r["r2"], r["d2"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.round("x", 2).alias("r2"),
            F.round(F.col("x").cast("decimal(12,3)"), 2)
            .cast("double")
            .alias("d2"),
        )
        .collect()
    }
    con = duckdb.connect()
    double_disagreements = []
    for i, x in enumerate(cases):
        dd = con.execute(
            "SELECT ROUND(?, 2),"
            " CAST(ROUND(CAST(? AS DECIMAL(12,3)), 2) AS DOUBLE)",
            [x, x],
        ).fetchone()
        # the convention path must agree on EVERY midpoint
        assert sp[i][1] == dd[1], f"decimal-domain ROUND drifted on {x}"
        if sp[i][0] != dd[0]:
            double_disagreements.append(x)
    # the plain-double path must still exhibit the documented
    # divergence — if it stops, the convention's cost/benefit changed
    assert double_disagreements == [1.005, 10.075], (
        f"plain ROUND(double) midpoint dialect changed: "
        f"disagreements now {double_disagreements}"
    )


# ---------------------------------------------------------------------------
# r17 class-5 pins: date/time dialect (scripts/probe_datetime_dialect.py)
# ---------------------------------------------------------------------------

MONTH_CASES = [
    ("2020-01-31", 1),   # into leap Feb -> clamp to 29
    ("2019-01-31", 1),   # into plain Feb -> clamp to 28
    ("2020-02-29", 12),  # leap day + 1y -> clamp to 2021-02-28
    ("2019-02-28", 1),   # month-END source: stickiness would give Mar 31
    ("2019-03-31", 1),   # 31 -> 30-day month clamp
    ("2019-12-31", 2),   # year rollover + clamp into leap Feb
    ("2020-08-31", 6),   # 31 -> plain Feb across year boundary
    ("2019-06-15", 1),   # mid-month control: no clamp
    ("2020-01-31", -2),  # negative months, clamp into Nov 30
    ("2020-03-31", -1),  # negative into leap Feb
]

WEEK_CASES = [
    "2024-01-01", "2024-01-04", "2024-01-07",  # Mon / Thu / Sun
    "2021-01-01",  # Fri of ISO week 53 of 2020
    "2020-12-31",  # Thu of ISO week 53 of 2020
    "2024-12-30",  # Mon of ISO week 1 of 2025
    "2016-01-03",  # Sun of ISO week 53 of 2015
]


def test_month_arithmetic_clamp_dialect(spark):
    """Pin the r17 class-5 probe's month-arithmetic agreement: Spark
    add_months and DuckDB (m)*INTERVAL 1 MONTH clamp END-OF-MONTH
    identically (leap and plain Feb, 30-day months, negative months)
    and NEITHER has last-day stickiness (Feb 28 + 1mo = Mar 28, not
    Mar 31). This is the convention q_fn_date's plus2m column rides
    on — and P1 measured the clamp branch IS fixture-exercised (12 /
    154 / 1444 clamped rows at sf0.001/0.01/0.1, incl. leap-Feb-29
    targets), so the driver green is calibrated, not lucky. An engine
    upgrade that changes either side fails here by name."""
    import datetime as dt

    rows = [
        Row(i=i, d=dt.date.fromisoformat(d), m=m)
        for i, (d, m) in enumerate(MONTH_CASES)
    ]
    got = {
        r["i"]: r["out"]
        for r in spark.createDataFrame(rows)
        .select("i", F.add_months("d", F.col("m")).alias("out"))
        .collect()
    }
    con = duckdb.connect()
    for i, (d, m) in enumerate(MONTH_CASES):
        dd = con.execute(
            f"SELECT CAST(DATE '{d}' + ({m}) * INTERVAL 1 MONTH AS DATE)"
        ).fetchone()[0]
        assert got[i] == dd, f"month-arith dialect drift on {d} {m:+d}mo"


def test_week_convention_dialect(spark):
    """Pin the week-convention agreement the r17 probe measured:
    Spark weekday() = DuckDB isodow-1 (0=Monday), Spark dayofweek()
    = DuckDB dayofweek()+1 (1=Sunday), date_trunc('week') starts
    Monday in BOTH engines, and weekofyear is ISO in both (incl. the
    week-53 year-boundary cases). Only 'month'/'hour' truncs are
    load-bearing in oracles today; this pin means a future week-grain
    oracle starts calibrated."""
    import datetime as dt

    rows = [Row(i=i, d=dt.date.fromisoformat(d)) for i, d in enumerate(WEEK_CASES)]
    got = {
        r["i"]: (r["wd"], r["dow"], r["wk"], r["woy"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.weekday("d").alias("wd"),
            F.dayofweek("d").alias("dow"),
            F.date_trunc("week", "d").cast("date").alias("wk"),
            F.weekofyear("d").alias("woy"),
        )
        .collect()
    }
    con = duckdb.connect()
    for i, d in enumerate(WEEK_CASES):
        dd = con.execute(
            f"""SELECT CAST(isodow(DATE '{d}') - 1 AS INT),
                       CAST(dayofweek(DATE '{d}') + 1 AS INT),
                       CAST(date_trunc('week', DATE '{d}') AS DATE),
                       CAST(weekofyear(DATE '{d}') AS INT)"""
        ).fetchone()
        assert got[i] == tuple(dd), f"week-convention dialect drift on {d}"


def test_interval_day_boundary_dialect(spark):
    """Pin the TPC-H q21 INTERVAL-DAY boundary convention: DuckDB's
    date + INTERVAL 60 DAY yields a midnight-aligned TIMESTAMP while
    Spark yields a DATE, but the strict comparison agrees EXACTLY at
    the boundary (order+60d is NOT greater in either engine). P1
    measured the boundary is fixture-HIT (3 / 33 / 244 lineitems ship
    exactly order+60d at sf0.001/0.01/0.1), so q21's green depends on
    this agreement on real rows."""
    import datetime as dt

    base = dt.date(2020, 1, 1)
    rows = [
        Row(i=i, o=base, s=base + dt.timedelta(days=k))
        for i, k in enumerate([59, 60, 61])
    ]
    got = {
        r["i"]: r["gt"]
        for r in spark.createDataFrame(rows)
        .select("i", (F.col("s") > F.expr("o + INTERVAL 60 DAY")).alias("gt"))
        .collect()
    }
    con = duckdb.connect()
    for i, k in enumerate([59, 60, 61]):
        dd = con.execute(
            f"""SELECT DATE '2020-01-01' + {k}
                       > DATE '2020-01-01' + INTERVAL 60 DAY"""
        ).fetchone()[0]
        assert got[i] == dd, f"INTERVAL DAY boundary drift at +{k}d"
    assert [got[0], got[1], got[2]] == [False, False, True]


def test_ns_to_us_truncation_dialect(spark, tmp_path):
    """Pin the events ns->us path on a crafted TIMESTAMP_NS parquet:
    Spark's nanos-as-long ``ts div 1000`` (sources.ts_us_expr) and
    DuckDB's ``epoch_us(ts)`` BOTH truncate toward zero — including
    pre-1970 negatives (-1 ns -> 0 us, -1500 ns -> -1 us) — so the
    oracle convention holds even off the fixture's range. The r17 P1
    measurement: the generated fixtures are 100% us-aligned and
    post-1970 at every scale, so this crafted pin is the ONLY
    non-vacuous evidence for the truncation branch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nanos = [0, 1, 999, 1000, 1500, -1, -999, -1000, -1500,
             1_000_000_001, -86_400_000_000_000]
    path = str(tmp_path / "ns_probe.parquet")
    pq.write_table(
        pa.table({
            "i": pa.array(range(len(nanos)), pa.int32()),
            "ts": pa.array(nanos, pa.timestamp("ns")),
        }),
        path,
    )
    sdf = spark.read.parquet(path)
    # nanosAsLong (session.ensure_conf) must surface the column as long
    from pyspark.sql.types import LongType

    assert isinstance(sdf.schema["ts"].dataType, LongType)
    got = {
        r["i"]: r["us"]
        for r in sdf.select("i", F.expr("ts div 1000").alias("us")).collect()
    }
    con = duckdb.connect()
    duck = dict(con.execute(
        f"SELECT i, CAST(epoch_us(ts) AS BIGINT) FROM read_parquet('{path}') ORDER BY i"
    ).fetchall())
    for i, ns in enumerate(nanos):
        assert got[i] == duck[i], f"ns->us truncation drift at ns={ns}"
    # the toward-zero (NOT floor) direction, pinned explicitly
    assert got[5] == 0 and got[8] == -1


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_events_ts_us_aligned_scope_guard(sf_dir):
    """Scope guard for the ns->us truncation class: the generated
    events fixtures are exactly us-aligned and post-1970 (r17 P1:
    sub_us_nanos=0, pre_1970=0 at every scale), so no oracle hash can
    depend on sub-us truncation TODAY. If a fixture regeneration
    introduces sub-us nanos or pre-1970 instants, this fails HERE
    with the pointer to the crafted calibration
    (test_ns_to_us_truncation_dialect) instead of flaking a driver
    hash."""
    con = duckdb.connect()
    sub_us, pre = con.execute(
        f"""SELECT SUM(CASE WHEN epoch_ns(ts) % 1000 != 0 THEN 1 ELSE 0 END),
                   SUM(CASE WHEN epoch_ns(ts) < 0 THEN 1 ELSE 0 END)
            FROM read_parquet('{sf_dir}/events.parquet')"""
    ).fetchone()
    assert (sub_us, pre) == (0, 0), (
        f"{sf_dir}: events ts no longer us-aligned/post-1970 "
        f"(sub_us={sub_us}, pre_1970={pre}) — the ns->us truncation "
        "branch is now live; see scripts/probe_datetime_dialect.py P5"
    )


def test_round6_shortest_repr_midpoint_witness(spark):
    """Pin the r17 ROUND(x,6) bit-compare probe's finding
    (scripts/probe_round_bits.py; SURVEY §2.53): the §2.51
    "measure-zero" rule for the continuous-score ROUND(...,6)
    inventory holds for TRANSCENDENTAL families (ln/sqrt/exp/
    cosines — shortest decimal repr never terminates at 7 digits) but
    NOT for terminating-decimal ratios: a money amount divided by a
    2^a·5^b denominator can produce a double whose SHORTEST repr ends
    exactly ...5 at the 7th fractional digit while the binary value
    sits just below the true midpoint. There Spark's BigDecimal
    HALF_UP (on the shortest repr) rounds UP and DuckDB's FP path
    (on the binary value) rounds DOWN — the same mechanism as the
    pinned ROUND(1.005, 2) money witness, at the 6th decimal.
    Measured rate: 2 / 68,056 on deliberately ratio-rich fixture
    sampling; ZERO occurrences in any actual oracle output across 16
    rounds of two-scale hash history (the load-bearing evidence for
    the 60-oracle pure-arithmetic subclass). If either engine changes
    its rounding path, this fails by name."""
    # fixture-derived witness: l_extendedprice 33377.395 / 16 lineitems
    witnesses = [2086.0871875, 0.1250005]
    rows = [Row(i=i, x=x) for i, x in enumerate(witnesses)]
    sp = {
        r["i"]: r["r"]
        for r in spark.createDataFrame(rows)
        .select("i", F.round("x", 6).alias("r"))
        .collect()
    }
    con = duckdb.connect()
    assert sp[0] == 2086.087188, "Spark shortest-repr HALF_UP path changed"
    assert con.execute("SELECT round(?, 6)", [2086.0871875]).fetchone()[0] == 2086.087187, (
        "DuckDB binary-value rounding path changed"
    )
    assert sp[1] == 0.125001
    assert con.execute("SELECT round(?, 6)", [0.1250005]).fetchone()[0] == 0.125
    # and the transcendental family stays bit-identical (spot sample)
    import math

    vals = [math.log(33377.395), math.sqrt(2086.0871875), math.exp(0.07)]
    rows = [Row(i=i, x=x) for i, x in enumerate(vals)]
    sp = {
        r["i"]: r["r"]
        for r in spark.createDataFrame(rows)
        .select("i", F.round("x", 6).alias("r"))
        .collect()
    }
    for i, v in enumerate(vals):
        dd = con.execute("SELECT round(?, 6)", [v]).fetchone()[0]
        assert sp[i] == dd, f"transcendental ROUND(,6) drift on {v!r}"


# ---------------------------------------------------------------------------
# r17 class-6 pins: float special values (scripts/probe_float_edges.py)
# ---------------------------------------------------------------------------


def test_float_special_value_dialect_rules(spark):
    """Pin the class-6 probe's AGREEMENTS (SURVEY §2.54): NaN groups
    as one key, sorts greatest (above +Inf), and absorbs MIN/MAX/SUM
    identically in both engines; -0.0 survives projection with its
    sign in BOTH engines and both NORMALIZE a grouped -0.0 key to
    +0.0. P1 measured zero NaN/Inf/-0.0 cells across all 321 float
    columns of the 297 oracle outputs at both scales, so these
    conventions are fixture-unexercised — this pin is the evidence
    (and scripts/vacuity_sweep.py now re-measures the zero-occurrence
    fact every round as the special_value_cell net). DuckDB client
    gotchas the probe measured: binding a LIST of floats converts NaN
    members to NULL, and a bare -0.0 literal is DECIMAL and loses its
    sign — NaN/-0.0 are constructed in SQL below."""
    nan, inf = float("nan"), float("inf")
    cases = [nan, -inf, -1.0, -0.0, 0.0, 1.0, inf, nan]
    sdf = spark.createDataFrame([(v,) for v in cases], "x DOUBLE")
    con = duckdb.connect()
    dd_list = ("['nan'::DOUBLE, '-inf'::DOUBLE, -1.0::DOUBLE, -(0.0::DOUBLE), "
               "0.0::DOUBLE, 1.0::DOUBLE, 'inf'::DOUBLE, 'nan'::DOUBLE]")
    # grouping: NaN is one key and ±0.0 merge into one group in BOTH
    # engines — but the merged ZERO KEY's sign differs: Spark always
    # normalizes it to +0.0 (NormalizeFloatingNumbers) while DuckDB
    # keeps the FIRST-SEEN value (-0.0 here, since the crafted list
    # leads with it) — a third silent -0.0 class, caught when this
    # pin's first draft asserted exact key equality. Guarded by the
    # same zero-occurrence net as the round-sign class.
    sp = sorted(
        (repr(r["x"]), r["n"])
        for r in sdf.groupBy("x").agg(F.count("*").alias("n")).collect()
    )
    dd = sorted(
        (repr(x), n)
        for x, n in con.execute(
            f"SELECT x, COUNT(*) FROM (SELECT unnest({dd_list}) AS x) GROUP BY x"
        ).fetchall()
    )
    norm = lambda groups: sorted((k.lstrip("-") if k in ("0.0", "-0.0") else k, n)
                                 for k, n in groups)
    assert norm(sp) == norm(dd), f"special-value grouping drift: {sp} vs {dd}"
    assert ("nan", 2) in sp and ("0.0", 2) in sp  # Spark key normalized
    assert ("-0.0", 2) in dd, (
        "DuckDB's merged zero key stopped being first-seen -0.0 — the "
        "order-sensitivity rule changed; update SURVEY §2.54"
    )
    # ordering: NaN greatest in both
    sp_sorted = [repr(r["x"]) for r in sdf.orderBy("x").collect()]
    dd_sorted = [repr(r[0]) for r in con.execute(
        f"SELECT x FROM (SELECT unnest({dd_list}) AS x) ORDER BY x"
    ).fetchall()]
    assert sp_sorted == dd_sorted, "special-value sort drift"
    assert sp_sorted[-1] == "nan" and sp_sorted[0] == "-inf"
    # MIN/MAX/SUM: NaN is the MAX and poisons SUM in both
    agg = sdf.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()[0]
    dd_mn, dd_mx = con.execute(
        f"SELECT MIN(x), MAX(x) FROM (SELECT unnest({dd_list}) AS x)"
    ).fetchone()
    assert (repr(agg["mn"]), repr(agg["mx"])) == (repr(dd_mn), repr(dd_mx)) == ("-inf", "nan")
    # projected -0.0 keeps its sign in both engines
    sp0 = spark.createDataFrame([(-0.0,)], "x DOUBLE").collect()[0]["x"]
    dd0 = con.execute("SELECT -(0.0::DOUBLE)").fetchone()[0]
    import math as _m

    assert _m.copysign(1.0, sp0) < 0 and _m.copysign(1.0, dd0) < 0


def test_round_zero_sign_witness(spark):
    """Pin the class-6 probe's one SILENT divergence: rounding a tiny
    NEGATIVE double to 6 places crosses zero with DIFFERENT signs —
    Spark's BigDecimal path yields +0.0, DuckDB's FP path yields
    -0.0. The local canonicalizer collapses both to "0" but the
    driver's value-hash need not, so a continuous score that goes
    tiny-negative by floating cancellation (a near-zero correlation,
    a centered mean) is a latent one-sided -0.0 flake. Exposure today
    is ZERO — the r17 P1 scan found no -0.0 cell in any oracle output
    and scripts/vacuity_sweep.py re-measures that every round — so no
    oracle was changed; this witness fails by name if either engine's
    rounding path changes."""
    sp = {}
    for v in (-1e-9, -4.9e-7):
        sp[v] = (
            spark.createDataFrame([(v,)], "x DOUBLE")
            .select(F.round("x", 6).alias("r"))
            .collect()[0]["r"]
        )
    import math as _m

    con = duckdb.connect()
    for v, got in sp.items():
        dd = con.execute("SELECT round(?::DOUBLE, 6)", [v]).fetchone()[0]
        assert got == 0.0 and _m.copysign(1.0, got) > 0, "Spark round sign changed"
        assert dd == 0.0 and _m.copysign(1.0, dd) < 0, "DuckDB round sign changed"


def test_fractional_cast_direction_witness(spark):
    """Pin the other SILENT class-6 divergence: casting an in-range
    FRACTIONAL double to an integral type TRUNCATES in Spark
    (2.7 -> 2, -2.7 -> -2) but ROUNDS in DuckDB (2.7 -> 3,
    -2.7 -> -3). A mechanical scan of all 297 oracle strings (r17)
    found zero integral-CAST sites with a possibly-fractional
    argument — every CAST arg is integer arithmetic (DuckDB `//`,
    integer SUMs, epoch divisions) or explicitly FLOOR/ROUND-ed — and
    the scan is replayed here so a new oracle that introduces one
    fails loudly with the convention note instead of hash-flaking."""
    got = spark.sql(
        "SELECT CAST(CAST(2.7 AS DOUBLE) AS BIGINT), "
        "CAST(CAST(-2.7 AS DOUBLE) AS BIGINT)"
    ).collect()[0]
    assert (got[0], got[1]) == (2, -2), "Spark cast truncation changed"
    con = duckdb.connect()
    dd = con.execute("SELECT CAST(2.7 AS BIGINT), CAST(-2.7 AS BIGINT)").fetchone()
    assert dd == (3, -3), "DuckDB cast rounding changed"
    # replay the registry scan: no possibly-fractional integral casts
    import re

    from louvain_modularity_spark.registry import all_oracles

    pat = re.compile(r"CAST\s*\(", re.I)
    frac_hint = re.compile(
        r"[/]|avg|median|quantile|stddev|corr|covar|ln\(|log|sqrt|exp\(|power"
        r"|\*\s*1\.0|0\.5|percent",
        re.I,
    )
    offenders = []
    for name, sql in sorted(all_oracles().items()):
        for m in pat.finditer(sql):
            i, depth = m.end(), 1
            while depth and i < len(sql):
                depth += {"(": 1, ")": -1}.get(sql[i], 0)
                i += 1
            inner = sql[m.end(): i - 1]
            mm = re.search(
                r"\s+AS\s+(BIGINT|INTEGER|INT|SMALLINT|TINYINT|HUGEINT)\s*$",
                inner,
                re.I,
            )
            if not mm:
                continue
            arg = inner[: mm.start()]
            # integer division `a // b` is integral; strip it before
            # the fractional-division heuristic fires on its slashes
            arg_stripped = arg.replace("//", "")
            if frac_hint.search(arg_stripped) and not re.search(
                r"\b(floor|ceil|ceiling|round)\s*\(", arg, re.I
            ):
                offenders.append((name, arg.strip()[:80]))
    assert not offenders, (
        "oracle casts a possibly-fractional double to an integral type — "
        "Spark truncates where DuckDB rounds; FLOOR/ROUND it explicitly: "
        f"{offenders}"
    )


def test_ansi_and_zero_division_conventions(spark):
    """Pin the LOUD class-6 conventions so a conf or engine drift is
    caught by name: this engine's sessions run Spark 4's ANSI default
    (division by zero THROWS; overflowing double->int casts THROW),
    while DuckDB 1.0 returns NULL for x/0 and throws OutOfRange for
    ln(0)/sqrt(-1) where Spark returns NULL/NaN. Every such
    divergence is LOUD (one side errors, the driver records a
    failure, 16 rounds have recorded none) — the pins here are what
    keeps the 'loud' classification true."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.sql("SELECT 1/0").collect()
    con = duckdb.connect()
    assert con.execute("SELECT 1/0").fetchone()[0] is None
    assert con.execute("SELECT 1.0::DOUBLE / 0.0::DOUBLE").fetchone()[0] is None
    # Spark NULL / NaN where DuckDB throws
    row = spark.sql(
        "SELECT ln(CAST(0.0 AS DOUBLE)), sqrt(CAST(-1.0 AS DOUBLE))"
    ).collect()[0]
    import math as _m

    assert row[0] is None and _m.isnan(row[1])
    with _pytest.raises(Exception):
        con.execute("SELECT ln(0.0::DOUBLE)")
    with _pytest.raises(Exception):
        con.execute("SELECT sqrt(-1.0::DOUBLE)")


def test_special_value_counters_on_crafted_rows():
    """Exercise every branch of the two special-value net kernels on
    crafted rows (the r16 detector-condition pattern: a net whose
    trigger has never fired needs crafted-input evidence that it CAN):
    determinism_sweep.count_special_cells (Spark-side collected rows)
    must count NaN, ±Inf and -0.0 but not +0.0 / ints / None /
    strings; the vacuity_sweep DuckDB-side condition is the same
    predicate inline."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ds_mod", "/root/repo/scripts/determinism_sweep.py"
    )
    ds = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ds)
    rows = [
        (float("nan"), 1, "x"),          # 1 hit (NaN)
        (float("inf"), float("-inf")),   # 2 hits
        (-0.0, 0.0),                     # 1 hit (-0.0 only)
        (None, 7, "nan"),                # 0 hits (not floats)
        (1e-300, -1e-300),               # 0 hits (tiny but normal)
    ]
    assert ds.count_special_cells(rows) == 4
    assert ds.count_special_cells([]) == 0
    assert ds.count_special_cells([(0.0, 1.0)]) == 0
    # r18 (ADVICE item 3): the kernel recurses into composite cells —
    # arrays, structs (Row is a tuple subclass), and map values — so a
    # future composite-typed output column cannot bypass the net.
    from pyspark.sql import Row

    nested = [
        ([1.0, float("nan"), -0.0], "x"),             # 2 hits in an array
        (Row(a=float("inf"), b=0.0), 3),              # 1 hit in a struct
        ({"k": float("-inf"), "j": 1.0}, None),       # 1 hit in a map value
        ([[-0.0], [0.0, float("nan")]], "y"),         # 2 hits, doubly nested
        ([], {}, ()),                                 # 0 hits (empties)
        # r19 (ADVICE item 1): float map KEYS count too — a future
        # map<double,...> output must not bypass through the key slot
        ({float("nan"): 1.0, 2.0: -0.0}, "z"),        # 2 hits (NaN key, -0.0 value)
        ({-0.0: float("inf")}, None),                 # 2 hits (key and value)
    ]
    assert ds.count_special_cells(nested) == 10
    # and the vacuity twin counts the same crafted cells identically
    spec_v = importlib.util.spec_from_file_location(
        "vs_mod", "/root/repo/scripts/vacuity_sweep.py"
    )
    vs = importlib.util.module_from_spec(spec_v)
    spec_v.loader.exec_module(vs)
    for row in rows + nested:
        assert sum(vs._special_cells_in(v) for v in row) == sum(
            ds._special_cells_in(v) for v in row
        )


# ---------------------------------------------------------------------------
# r17 class-7 pins: array/struct ordering (scripts/probe_array_dialect.py)
# ---------------------------------------------------------------------------


def test_array_sort_dialect_rules(spark):
    """Pin the class-7 probe results (SURVEY §2.56). Scope fact
    measured first: ZERO of the 308 queries output an ARRAY/MAP/
    STRUCT column (the q_fn_array fold-to-scalar rule holds
    registry-wide, verified schema-by-schema), so the driver hash
    never sees element order — these pins protect the FOLDED
    intermediates (top3_sorted, segments). Agreements pinned: binary
    UTF-8 string order incl. non-ASCII (ß sorts after z in BOTH),
    empty/digit strings, float special values (-0.0 before 0.0, NaN
    last), DESC NULL placement, and collect_set+array_sort =
    string_agg(DISTINCT..ORDER BY). The ONE silent divergence:
    ASC sort of a NULL-bearing array — Spark sort_array puts NULLs
    FIRST, DuckDB list_sort puts them LAST. Exposure is zero by
    construction: split() never yields NULL elements and Spark
    collect_set DROPS NULLs (both pinned below), so no oracle sorts
    a NULL-bearing array."""
    con = duckdb.connect()
    cases = [
        ["b", "A", "a", "", "Z", "10", "2"],
        ["é", "e", "ß", "ss", "Z", "z"],
        ["the", "The", "THE"],
    ]
    for case in cases:
        sp = (
            spark.createDataFrame([Row(a=case)])
            .select(F.sort_array("a").alias("s"))
            .collect()[0]["s"]
        )
        dd = con.execute("SELECT list_sort(?)", [case]).fetchone()[0]
        assert sp == dd, f"in-array string sort drift on {case}"
    # the ASC-NULL divergence witness (DESC agrees)
    nullcase = ["b", None, "a", None, ""]
    sp_asc = (
        spark.createDataFrame([Row(a=nullcase)])
        .select(F.sort_array("a").alias("s"))
        .collect()[0]["s"]
    )
    dd_asc = con.execute("SELECT list_sort(?)", [nullcase]).fetchone()[0]
    assert sp_asc == [None, None, "", "a", "b"], "Spark NULLS-FIRST changed"
    assert dd_asc == ["", "a", "b", None, None], "DuckDB NULLS-LAST changed"
    sp_desc = (
        spark.createDataFrame([Row(a=nullcase)])
        .select(F.sort_array("a", asc=False).alias("s"))
        .collect()[0]["s"]
    )
    dd_desc = con.execute("SELECT list_sort(?, 'DESC')", [nullcase]).fetchone()[0]
    assert sp_desc == dd_desc == ["b", "a", "", None, None]
    # the zero-exposure facts: split never yields NULL elements
    # (empty input -> ['']) and collect_set drops NULLs
    sp_split = spark.sql("SELECT split('', ' ')").collect()[0][0]
    dd_split = con.execute("SELECT string_split('', ' ')").fetchone()[0]
    assert sp_split == dd_split == [""]
    sp_set = (
        spark.createDataFrame([("a",), (None,), ("a",)], "s STRING")
        .agg(F.sort_array(F.collect_set("s")).alias("x"))
        .collect()[0]["x"]
    )
    assert sp_set == ["a"], "collect_set stopped dropping NULLs"
    # distinct + order interplay
    vals = ["b", "a", "b", "A", "a", "c"]
    sp = (
        spark.createDataFrame([(v,) for v in vals], "s STRING")
        .agg(F.array_join(F.array_sort(F.collect_set("s")), "|").alias("j"))
        .collect()[0]["j"]
    )
    dd = con.execute(
        "SELECT string_agg(DISTINCT s, '|' ORDER BY s) FROM (SELECT unnest(?) AS s)",
        [vals],
    ).fetchone()[0]
    assert sp == dd == "A|a|b|c"


def test_array_indexing_dialect_rules(spark):
    """Pin the indexing conventions (class-7 P3): 1-based agreement,
    negative index = from-the-end in both, slice-beyond-length
    truncates identically (the q_fn_array top3 path). The LOUD
    divergence: out-of-range (and empty-array) access THROWS in Spark
    under this engine's ANSI default but returns NULL in DuckDB — an
    oracle that indexed past an array's length would fail loudly on
    the Spark side, and none can today: every indexed array is a
    split() result (never empty — split('') = [''], pinned in the
    sort test)."""
    con = duckdb.connect()
    sp = spark.sql(
        "SELECT element_at(array('x','y'), 1), element_at(array('x','y'), -1), "
        "slice(array('x','y'), 1, 3), slice(array('a','b','c','d'), 1, 3)"
    ).collect()[0]
    dd = con.execute(
        "SELECT (['x','y'])[1], (['x','y'])[-1], (['x','y'])[1:3], "
        "(['a','b','c','d'])[1:3]"
    ).fetchone()
    assert (sp[0], sp[1], sp[2], sp[3]) == (dd[0], dd[1], dd[2], dd[3]) == (
        "x", "y", ["x", "y"], ["a", "b", "c"]
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.sql("SELECT element_at(array('x','y'), 5)").collect()
    assert con.execute("SELECT (['x','y'])[5]").fetchone()[0] is None


def test_window_frame_peer_semantics(spark):
    """Class-8 (window frames) closed at pin-scale rather than a full
    probe session (SURVEY §2.57): the three RANGE-frame oracle pairs
    (q_rolling_7d, q_bollinger, q_rolling_median) all ORDER BY a
    key that is UNIQUE within the partition by groupBy construction,
    so value-peer edges are structurally unexercised — this crafted
    pin is the evidence that the peer rules agree anyway:
    - RANGE frames include ALL peers of the current row's order value
      in BOTH engines (2 PRECEDING here means value-distance);
    - the DEFAULT frame of a windowed aggregate with ORDER BY is
      peer-inclusive RANGE UNBOUNDED..CURRENT in BOTH (the classic
      cumulative-sum-with-duplicates trap);
    - ROWS peer ambiguity (physical order within equal keys) is
      netted LIVE by the determinism lanes: the partition
      perturbation would flip a peer-ambiguous ROWS cumulative, and
      Lane A/C read 308/308 byte-identical at both scales."""
    rows = [(1, 10.0), (1, 20.0), (2, 1.0), (4, 2.0), (4, 3.0), (5, 4.0)]
    sdf = spark.createDataFrame(rows, "x INT, v DOUBLE")
    from pyspark.sql import Window

    w_range = Window.orderBy("x").rangeBetween(-2, Window.currentRow)
    w_default = Window.orderBy("x")
    sp = sorted(
        (r["x"], r["v"], r["rsum"], r["csum"])
        for r in sdf.select(
            "x", "v",
            F.sum("v").over(w_range).alias("rsum"),
            F.sum("v").over(w_default).alias("csum"),
        ).collect()
    )
    con = duckdb.connect()
    dd = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT x, v,
                   SUM(v) OVER (ORDER BY x RANGE BETWEEN 2 PRECEDING
                                AND CURRENT ROW) AS rsum,
                   SUM(v) OVER (ORDER BY x) AS csum
            FROM (VALUES (1, 10.0::DOUBLE), (1, 20.0::DOUBLE),
                         (2, 1.0::DOUBLE), (4, 2.0::DOUBLE),
                         (4, 3.0::DOUBLE), (5, 4.0::DOUBLE)) t(x, v)
            """
        ).fetchall()
    )
    assert sp == dd, f"window peer-semantics drift: {sp} vs {dd}"
    # both engines: x=1 rows see BOTH x=1 peers in every frame
    assert sp[0][2] == sp[1][2] == 30.0   # range frame, peers included
    assert sp[0][3] == sp[1][3] == 30.0   # default frame, peer-inclusive
    # x=4 rows: range(-2) covers x in [2,4] = 1+2+3; cumulative covers
    # both x=4 peers
    assert sp[3][2] == sp[4][2] == 6.0
    assert sp[3][3] == sp[4][3] == 36.0


# ---------------------------------------------------------------------------
# r18 class-9 pins: DECIMAL precision/scale inference
# (scripts/probe_decimal_inference.py)
# ---------------------------------------------------------------------------


def test_decimal_inference_rules(spark):
    """Pin the class-9 probe results (SURVEY §2.59). Measured scope
    first: the registry's decimal domain sees only CAST, 1±d, d*d
    chains (<=3 factors), SUM and ROUND — every division site casts to
    double BEFORE dividing. The value risk is an inferred result scale
    BELOW the exact product scale (silent intermediate rounding).
    Probe result: neither engine truncates — Spark widens precision
    (hitting the 38 cap at (38,6) for the 3-factor TPC-H revenue
    shape, scale preserved), DuckDB stays at INT64 width (18,s) which
    holds every registry-exercised magnitude. Folded doubles are
    bit-equal on crafted max-precision money. An engine upgrade that
    changes either inference rule fails here by name."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r AS SELECT CAST(c0 AS DECIMAL(12,2)) p, "
        "CAST(c1 AS DECIMAL(12,2)) d, CAST(c2 AS DECIMAL(12,2)) t "
        "FROM (VALUES (9999999999.99, 0.99, 0.99), (0.01, 0.01, 0.01), "
        "(12345678.91, 0.07, 0.08)) v(c0,c1,c2)"
    )
    sdf = spark.createDataFrame(
        [("9999999999.99", "0.99", "0.99"), ("0.01", "0.01", "0.01"),
         ("12345678.91", "0.07", "0.08")],
        "p0 string, d0 string, t0 string",
    ).select(
        F.col("p0").cast("decimal(12,2)").alias("p"),
        F.col("d0").cast("decimal(12,2)").alias("d"),
        F.col("t0").cast("decimal(12,2)").alias("t"),
    )
    shapes = {
        "one_minus": (F.lit(1) - F.col("d"), "1 - d", "DecimalType(13,2)",
                      "DECIMAL(13,2)"),
        "mul2": (F.col("p") * (F.lit(1) - F.col("d")), "p * (1 - d)",
                 "DecimalType(26,4)", "DECIMAL(18,4)"),
        "mul3": (F.col("p") * (F.lit(1) - F.col("d"))
                 * (F.lit(1) + F.col("t")),
                 "p * (1 - d) * (1 + t)", "DecimalType(38,6)",
                 "DECIMAL(18,6)"),
        "small_mul": (F.lit("0.5").cast("decimal(3,2)") * F.col("p"),
                      "CAST('0.5' AS DECIMAL(3,2)) * p",
                      "DecimalType(16,4)", "DECIMAL(15,4)"),
    }
    for name, (sx, dx, s_expect, d_expect) in shapes.items():
        s_type = str(sdf.select(sx.alias("x")).schema["x"].dataType)
        d_type = con.execute(f"SELECT typeof({dx}) FROM r LIMIT 1").fetchone()[0]
        assert s_type == s_expect, f"{name}: Spark inference moved to {s_type}"
        assert d_type == d_expect, f"{name}: DuckDB inference moved to {d_type}"
        s_vals = sorted(
            r["v"] for r in sdf.select(sx.cast("double").alias("v")).collect()
        )
        d_vals = sorted(
            r[0] for r in con.execute(
                f"SELECT CAST(({dx}) AS DOUBLE) FROM r"
            ).fetchall()
        )
        assert s_vals == d_vals, f"{name}: folded doubles diverge"
        s_sum = sdf.select(
            F.round(F.sum(sx), 2).cast("double").alias("v")
        ).collect()[0]["v"]
        d_sum = con.execute(
            f"SELECT CAST(ROUND(SUM({dx}), 2) AS DOUBLE) FROM r"
        ).fetchone()[0]
        assert s_sum == d_sum, f"{name}: sum+round diverges"


def test_ts_us_adapter_drives_both_branches(spark, tmp_path):
    """Mutation-audit corrective (r18, S16): the crafted ns->us pin
    above verifies the CONVENTION with an inline expression, so a unit
    error inside sources.ts_us_expr's dormant legacy-nanos branch
    survived every net (dead code on today's TIMESTAMP_NTZ fixtures).
    This test drives the ADAPTER itself — sources.load attaching ts_us
    — on a crafted ns-encoded events.parquet, asserting equality with
    DuckDB's epoch_us on every crafted instant, and re-checks the live
    NTZ branch against the real fixture. A unit/rounding defect in
    EITHER branch of ts_us_expr now fails here by name."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from louvain_modularity_spark.sources import load

    nanos = [0, 1, 999, 1000, 1500, -1, -999, -1000, -1500,
             1_000_000_001, -86_400_000_000_000]
    path = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(nanos)), pa.int64()),
            "ts": pa.array(nanos, pa.timestamp("ns")),
        }),
        path,
    )
    got = {
        r["event_id"]: r["ts_us"]
        for r in load(spark, str(tmp_path), "events")
        .select("event_id", "ts_us")
        .collect()
    }
    con = duckdb.connect()
    want = dict(con.execute(
        f"SELECT event_id, CAST(epoch_us(ts) AS BIGINT) "
        f"FROM read_parquet('{path}') ORDER BY event_id"
    ).fetchall())
    assert got == want, "legacy-nanos adapter branch drifted from epoch_us"
    # live NTZ branch, against the real fixture (999/1000 rows carry
    # sub-ms micros, so a ms-truncation defect cannot hide)
    sf = "/root/testdata/sf0.001"
    got_live = {
        r["event_id"]: r["ts_us"]
        for r in load(spark, sf, "events").select("event_id", "ts_us").collect()
    }
    want_live = dict(con.execute(
        f"SELECT event_id, CAST(epoch_us(ts) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall())
    assert got_live == want_live, "live NTZ adapter branch drifted from epoch_us"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_fixture_strings_pure_ascii_scope_guard(sf_dir):
    """Class-10 zero-surface negative, held as a standing guard (r18,
    SURVEY §2.61): Unicode normalization (NFC vs NFD — visually equal
    keys with different codepoints that both engines would group
    apart, and that Spark's UTF8_LCASE vs DuckDB's lower() would fold
    differently) has ZERO registry surface because every string column
    of every fixture table is pure ASCII at both oracle scales
    (measured: 0 non-ASCII rows anywhere). ASCII has no normalization
    forms, so the class is fenced BY THIS FACT — which therefore must
    be a standing measurement, not a snapshot: a fixture regeneration
    that introduces non-ASCII text fails here with the explanation
    (and would also need the q_collation ASCII-scope guard above
    re-derived)."""
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    offenders = []
    for t in tables:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchall()
        for c, typ, *_ in cols:
            if typ == "VARCHAR":
                n = con.execute(
                    f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/{t}.parquet') "
                    f"WHERE regexp_matches(\"{c}\", '[^\\x00-\\x7F]')"
                ).fetchone()[0]
                if n:
                    offenders.append(f"{t}.{c}: {n} non-ASCII rows")
    assert not offenders, (
        f"{sf_dir}: fixture strings are no longer pure ASCII — the "
        f"Unicode-normalization zero-surface fence (SURVEY §2.61) no "
        f"longer holds: {offenders}"
    )


def test_intdiv_modulo_sign_dialect(spark):
    """Class-11 pin (r18, SURVEY §2.62): integer division direction.
    Spark's BIGINT ``DIV`` truncates toward zero; DuckDB's INTEGER
    ``//`` ALSO truncates toward zero (floor-division semantics apply
    only to its FLOAT ``//``) — probed on the full sign grid plus the
    int64 extreme, engines agree on quotient AND remainder at every
    point. The registry's two money DIV sites (q_allocation,
    q_cohort_ltv) pair Spark DIV with DuckDB // — valid for ANY sign,
    not just the fixtures' positive totalprice domain. An engine
    change to floor semantics on either side fails here by name."""
    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (-6, 3),
             (-9223372036854775807, 2)]
    con = duckdb.connect()
    for a, b in cases:
        s = spark.sql(
            f"SELECT CAST({a} AS BIGINT) DIV {b} AS d, "
            f"CAST({a} AS BIGINT) % {b} AS m"
        ).collect()[0]
        d = con.execute(
            f"SELECT CAST({a} AS BIGINT) // {b}, CAST({a} AS BIGINT) % {b}"
        ).fetchone()
        assert (s["d"], s["m"]) == (d[0], d[1]), (
            f"intdiv/modulo sign dialect drift at ({a}, {b}): "
            f"spark=({s['d']}, {s['m']}) duckdb={d}"
        )
    # the truncation (NOT floor) direction, pinned explicitly on both
    assert spark.sql("SELECT CAST(-7 AS BIGINT) DIV 2 AS d").collect()[0]["d"] == -3
    assert con.execute("SELECT CAST(-7 AS BIGINT) // 2").fetchone()[0] == -3


def test_nan_equality_join_semantics(spark):
    """Class-13 pin (r19, SURVEY §2.67; probe:
    scripts/probe_nan_semantics.py). The class-6 pin above covers NaN
    as a GROUP key and in ORDER BY; this pins the remaining
    set-operator axes the probe measured: both engines deviate from
    IEEE-754 the SAME way for equality-driven operators — NaN = NaN
    evaluates TRUE in a plain predicate AND in join matching, and
    COUNT(DISTINCT) collapses NaNs to one value (with ±0.0 also
    merged). P1 measured ZERO NaN/Inf cells in every float/double
    INPUT column of every fixture table at both oracle scales
    (including the embeddings float arrays), so the class has no live
    surface; this pin is the calibrated rule for any future oracle
    whose join/filter keys could carry NaN."""
    nan = float("nan")
    rows = [(nan, 1), (nan, 2), (float("inf"), 3), (-0.0, 4), (0.0, 5), (1.5, 6)]
    sdf = spark.createDataFrame(rows, "k DOUBLE, v INT")
    sdf.createOrReplaceTempView("nan_probe")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nan_probe AS SELECT * FROM (VALUES "
        "('nan'::DOUBLE, 1), ('nan'::DOUBLE, 2), ('inf'::DOUBLE, 3), "
        "(-(0.0::DOUBLE), 4), (0.0::DOUBLE, 5), (1.5::DOUBLE, 6)) t(k, v)"
    )
    # self-join on the double key: NaN matches NaN (4 pairs), ±0.0
    # cross-match (4 pairs), inf and 1.5 self-match (1 each) = 10
    s_join = spark.sql(
        "SELECT COUNT(*) AS n FROM nan_probe a JOIN nan_probe b ON a.k = b.k"
    ).collect()[0]["n"]
    d_join = con.execute(
        "SELECT COUNT(*) FROM nan_probe a JOIN nan_probe b ON a.k = b.k"
    ).fetchone()[0]
    assert s_join == d_join == 10, (
        f"NaN/±0 join-matching drift: spark={s_join} duckdb={d_join} "
        "(expected 10 = 4 NaN + 4 zero-cross + inf + 1.5)"
    )
    # plain equality predicate keeps NaN rows in BOTH engines
    s_eq = spark.sql(
        "SELECT COUNT(*) AS n FROM nan_probe WHERE k = k"
    ).collect()[0]["n"]
    d_eq = con.execute(
        "SELECT COUNT(*) FROM nan_probe WHERE k = k"
    ).fetchone()[0]
    assert s_eq == d_eq == 6, (
        f"NaN self-equality drift: spark={s_eq} duckdb={d_eq} — an "
        "engine moved toward IEEE NaN != NaN; re-run "
        "scripts/probe_nan_semantics.py and re-audit join oracles"
    )
    # COUNT DISTINCT collapses the two NaNs and the two zeros
    s_d = spark.sql(
        "SELECT COUNT(DISTINCT k) AS n FROM nan_probe"
    ).collect()[0]["n"]
    d_d = con.execute("SELECT COUNT(DISTINCT k) FROM nan_probe").fetchone()[0]
    assert s_d == d_d == 4, f"NaN distinct drift: spark={s_d} duckdb={d_d}"


def test_string_to_number_cast_dialect(spark):
    """Class-12(b) pin (r19, SURVEY §2.64; probe:
    scripts/probe_cast_dialect.py). The hypothesized whitespace/sign
    dialect is EMPTY: both engines trim leading/trailing
    space/tab/newline, accept a leading +/-, reject inner spaces, and
    map ''/' ' to NULL — on BIGINT and DOUBLE alike. The REAL
    divergence is the numeric-FORMAT class on string->BIGINT only:
    DuckDB routes integer casts through a numeric parse that accepts
    exponents ('1e3'->1000), fractional forms with round-half-away
    ('42.7'->43, '.5'->1), and hex ('0x1A'->26), where Spark's
    try_cast returns NULL for every one of those. string->DOUBLE
    agrees on the entire grid (including NaN/Infinity spellings).
    Rule for future oracles: a Spark string->integer cast may only be
    paired with DuckDB TRY_CAST(s AS BIGINT) when s is scoped to
    plain optionally-signed digit strings — which every registry site
    is, by measurement (q_fn_try's str(custkey)/'x'+str(custkey),
    engine-written edgelist fields, TPC-H CSV round-trips); otherwise
    the oracle must TRY_CAST via DOUBLE or pre-filter the format."""
    con = duckdb.connect()
    agree_grid = [
        " 42", "42 ", "\t42", "42\n", "  42  ", "+42", "-42",
        "+ 42", "- 42", "4 2", "", " ", "-0", "9223372036854775807",
        "9223372036854775808",
    ]
    diverge_grid = {
        "1e3": 1000, "1E3": 1000, "1e-2": 0, ".5": 1, "5.": 5,
        "+.5": 1, "0x1A": 26, "42.7": 43, "-42.7": -43, "42.": 42,
    }
    rows = spark.createDataFrame(
        [(s,) for s in agree_grid + list(diverge_grid)], "s STRING"
    ).select(
        "s",
        F.col("s").try_cast("long").alias("l"),
        F.col("s").try_cast("double").alias("d"),
    ).collect()
    by_s = {r["s"]: r for r in rows}
    for s in agree_grid:
        dl = con.execute("SELECT TRY_CAST(? AS BIGINT)", [s]).fetchone()[0]
        dd = con.execute("SELECT TRY_CAST(? AS DOUBLE)", [s]).fetchone()[0]
        assert by_s[s]["l"] == dl, (
            f"BIGINT whitespace/sign drift at {s!r}: "
            f"spark={by_s[s]['l']} duckdb={dl}"
        )
        assert by_s[s]["d"] == dd, (
            f"DOUBLE whitespace/sign drift at {s!r}: "
            f"spark={by_s[s]['d']} duckdb={dd}"
        )
    for s, duck_expected in diverge_grid.items():
        dl = con.execute("SELECT TRY_CAST(? AS BIGINT)", [s]).fetchone()[0]
        assert by_s[s]["l"] is None, (
            f"Spark now parses {s!r} as BIGINT ({by_s[s]['l']}) — the "
            "measured format-divergence rule changed; re-run "
            "scripts/probe_cast_dialect.py"
        )
        assert dl == duck_expected, (
            f"DuckDB BIGINT parse of {s!r} changed: {dl} != "
            f"{duck_expected} — re-run scripts/probe_cast_dialect.py"
        )
        # DOUBLE stays the agreement domain even for the format edges
        dd = con.execute("SELECT TRY_CAST(? AS DOUBLE)", [s]).fetchone()[0]
        assert by_s[s]["d"] == dd, (
            f"DOUBLE drift at {s!r}: spark={by_s[s]['d']} duckdb={dd}"
        )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_topk_cut_tie_exposure(sf_dir):
    """Class-12(a) scope guard (r19, SURVEY §2.64; probe:
    scripts/probe_topk_ties.py). Spark defaults NULLS FIRST on
    ascending sorts where DuckDB defaults NULLS LAST, and an ordered
    cut whose full sort key ties across the boundary is
    engine-defined. Measured zero-surface at both oracle scales:
    every declared-unique tie-break is genuinely unique within its
    partition with zero NULL sort keys (q_sort_limit, q_window_rank,
    q_lateral_topk, q_latest_per_key, q_reservoir_group — receipts in
    the probe), and the ONE cut with no tie-break — q_approx_topk's
    ORDER BY cnt DESC LIMIT 20 — has a strict count drop at the
    rank-20 boundary (917>913 at sf0.001, 888>886 at sf0.01). This
    guard re-measures the two fixture-luck-dependent facts so a
    regenerated testdata set with a tie at a cut fails HERE by name
    (with the probe pointer) instead of flaking a driver hash. The
    O22 oracle-mutant adjudication (tie-break flip value-neutral)
    rests on the q_sort_limit fact."""
    con = duckdb.connect()
    # q_sort_limit: top-100 rounded prices must stay tie-free at the
    # cut (the O22 adjudication's measured receipt)
    cut_ties, n_distinct = con.execute(
        f"""
        WITH t AS (SELECT ROUND(l_extendedprice, 2) AS price
                   FROM read_parquet('{sf_dir}/lineitem.parquet')
                   ORDER BY price DESC LIMIT 100)
        SELECT (SELECT COUNT(*) FROM t
                WHERE price = (SELECT MIN(price) FROM t)),
               COUNT(DISTINCT price) FROM t
        """
    ).fetchone()
    assert (cut_ties, n_distinct) == (1, 100), (
        f"{sf_dir}: q_sort_limit top-100 prices now tie "
        f"(cut_ties={cut_ties}, distinct={n_distinct}) — the oracle "
        "tie-break clause is now load-bearing; re-run "
        "scripts/probe_topk_ties.py and re-adjudicate O22"
    )
    # q_approx_topk: the ONLY ordered cut with no tie-break — the
    # rank-20/21 counts must stay strictly ordered, else the oracle's
    # selected set is under-determined vs the sketch's
    cnt20, cnt21 = con.execute(
        f"""
        WITH counts AS (
          SELECT token, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM read_parquet('{sf_dir}/documents.parquet')
          ) WHERE token <> '' GROUP BY token
        ), ranked AS (
          SELECT cnt, row_number() OVER (ORDER BY cnt DESC) AS rn
          FROM counts
        )
        SELECT (SELECT cnt FROM ranked WHERE rn = 20),
               (SELECT cnt FROM ranked WHERE rn = 21)
        """
    ).fetchone()
    assert cnt20 > cnt21, (
        f"{sf_dir}: q_approx_topk rank-20 boundary is now a tie "
        f"({cnt20} == {cnt21}) — the oracle's LIMIT 20 set is "
        "under-determined; add a tie-break or re-scope the oracle "
        "(scripts/probe_topk_ties.py)"
    )
