"""Round-17 boundary audit, class 7 (pulled forward from the r18
candidate list): array / struct ordering semantics.

Seventh installment of the per-round oracle-semantics audit
(SURVEY §2.45/§2.49/§2.51/§2.53/§2.54). The registry's array surface
is deliberately narrow — array-valued intermediates are FOLDED to
scalars before output (q_fn_array's docstring rule), struct
comparisons are mirrored by ROW_NUMBER oracles (q_fn_struct), and
string_agg carries an explicit in-aggregate ORDER BY (q_string_agg).
What the pairs still share across the dialect boundary:

- **element order produced by sort**: Spark sort_array / array_sort
  vs DuckDB list_sort — STRING collation (binary vs locale), NULL
  placement asc/desc, float special values inside arrays;
- **indexing conventions**: Spark element_at / arr[i] vs DuckDB
  list[i] — 1-based agreement, out-of-range, negative index, empty
  array, and slice-beyond-length behavior (q_fn_array's
  slice(sort_array(..), 1, 3) / LIST_SORT(..)[1:3] rides on this);
- **DISTINCT + ORDER interplay**: collect_set + array_sort vs
  string_agg(DISTINCT .. ORDER BY ..) on duplicates and case pairs.

Method (same as the prior classes):
  1. P1 MEASURE scope: which SPARK queries output ARRAY/STRUCT/MAP
     columns at all (schema-only, no execution); do the shared-edge
     inputs ever hit the edges (empty texts, short token lists,
     non-ASCII tokens) at the oracle scales;
  2. P2-P4 PROBE both engines at crafted points, print
     AGREE/DISAGREE per case;
  3. pin rules / scope guards in tests/test_dialect.py.

Run:  python scripts/probe_array_dialect.py           # probes only
      python scripts/probe_array_dialect.py --scope   # + P1 scope scan
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Row  # noqa: E402

SCALES = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}


def p1_scope(spark) -> None:
    """Which queries OUTPUT complex-typed columns (driver hash over
    element order), and do the fixtures hit the shared indexing/sort
    edges?"""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from louvain_modularity_spark.registry import all_queries

    print("== P1: complex-typed output columns (schema-only, no execution)")
    complex_out = []
    for name, fn in sorted(all_queries().items()):
        try:
            schema = fn(spark, SCALES["sf0.001"]).schema
        except Exception as e:
            print(f"  SCHEMA-ERROR {name}: {type(e).__name__}: {e}")
            continue
        cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if cols:
            complex_out.append(f"{name}:{','.join(cols)}")
    print(f"  queries with ARRAY/MAP/STRUCT output columns: "
          f"{len(complex_out)} -> {complex_out}")
    con = duckdb.connect()
    for sf_name, sf_dir in SCALES.items():
        row = con.execute(
            f"""
            SELECT COUNT(*),
                   SUM(CASE WHEN text = '' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN len(string_split(text, ' ')) < 3
                            THEN 1 ELSE 0 END),
                   SUM(CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]')
                            THEN 1 ELSE 0 END)
            FROM read_parquet('{sf_dir}/documents.parquet')
            """
        ).fetchone()
        print(f"  {sf_name}: docs={row[0]} empty_text={row[1]} "
              f"under3_tokens={row[2]} non_ascii={row[3]}")


STR_SORT_CASES = [
    ["b", "A", "a", "", "Z", "10", "2"],     # case + empty + digit strings
    ["é", "e", "ß", "ss", "Z", "z"],          # non-ASCII vs binary order
    ["the", "The", "THE"],                      # fixture-ish case triple
]

NULL_SORT_CASE = ["b", None, "a", None, ""]

FLOAT_SORT_CASE_SQL = (
    "['nan'::DOUBLE, '-inf'::DOUBLE, -(0.0::DOUBLE), 0.0::DOUBLE, "
    "1.0::DOUBLE, 'inf'::DOUBLE]"
)


def p2_sort_order(spark) -> None:
    """sort_array vs list_sort element order."""
    print("== P2: in-array sort order")
    con = duckdb.connect()
    rows = [Row(i=i, a=a) for i, a in enumerate(STR_SORT_CASES)]
    got = {
        r["i"]: r["s"]
        for r in spark.createDataFrame(rows)
        .select("i", F.sort_array("a").alias("s"))
        .collect()
    }
    for i, a in enumerate(STR_SORT_CASES):
        dd = con.execute("SELECT list_sort(?)", [a]).fetchone()[0]
        verdict = "AGREE" if got[i] == dd else "DISAGREE"
        print(f"  {verdict}: sort {a} -> spark={got[i]} duckdb={dd}")
    # NULL placement asc and desc
    rows = [Row(a=NULL_SORT_CASE)]
    sp_asc = spark.createDataFrame(rows).select(
        F.sort_array("a").alias("s")
    ).collect()[0]["s"]
    sp_desc = spark.createDataFrame(rows).select(
        F.sort_array("a", asc=False).alias("s")
    ).collect()[0]["s"]
    dd_asc = con.execute("SELECT list_sort(?)", [NULL_SORT_CASE]).fetchone()[0]
    dd_desc = con.execute(
        "SELECT list_sort(?, 'DESC')", [NULL_SORT_CASE]
    ).fetchone()[0]
    print(f"  {'AGREE' if sp_asc == dd_asc else 'DISAGREE'}: "
          f"NULLs asc spark={sp_asc} duckdb={dd_asc}")
    print(f"  {'AGREE' if sp_desc == dd_desc else 'DISAGREE'}: "
          f"NULLs desc spark={sp_desc} duckdb={dd_desc}")
    # float special values inside an array
    sp = spark.sql(
        "SELECT sort_array(array(cast('NaN' as double), "
        "cast('-Infinity' as double), -cast(0.0 as double), "
        "cast(0.0 as double), 1.0d, cast('Infinity' as double)))"
    ).collect()[0][0]
    dd = con.execute(f"SELECT list_sort({FLOAT_SORT_CASE_SQL})").fetchone()[0]
    verdict = "AGREE" if repr(sp) == repr(dd) else "DISAGREE"
    print(f"  {verdict}: special-value sort spark={sp!r} duckdb={dd!r}")


def p3_indexing(spark) -> None:
    """element_at / bracket indexing / slice conventions."""
    print("== P3: indexing and slicing")
    con = duckdb.connect()
    cases = [
        ("first of ['x','y']", "element_at(array('x','y'), 1)", "(['x','y'])[1]"),
        ("beyond length [5]", "element_at(array('x','y'), 5)", "(['x','y'])[5]"),
        ("negative [-1]", "element_at(array('x','y'), -1)", "(['x','y'])[-1]"),
        ("first of empty", "element_at(array(), 1)",
         "([]::VARCHAR[])[1]"),
        ("slice 1..3 of 2", "slice(array('x','y'), 1, 3)", "(['x','y'])[1:3]"),
        ("slice 1..3 of 4", "slice(array('a','b','c','d'), 1, 3)",
         "(['a','b','c','d'])[1:3]"),
    ]
    for label, ssql, dsql in cases:
        try:
            sp = repr(spark.sql(f"SELECT {ssql}").collect()[0][0])
        except Exception as e:
            sp = f"THROWS({type(e).__name__})"
        try:
            dd = repr(con.execute(f"SELECT {dsql}").fetchone()[0])
        except Exception as e:
            dd = f"THROWS({type(e).__name__})"
        verdict = "AGREE" if sp == dd else "DISAGREE"
        print(f"  {verdict}: {label} -> spark={sp} duckdb={dd}")


def p4_distinct_order(spark) -> None:
    """collect_set + array_sort vs string_agg(DISTINCT .. ORDER BY)."""
    print("== P4: DISTINCT + ORDER interplay")
    con = duckdb.connect()
    vals = ["b", "a", "b", "A", "a", "c"]
    sp = (
        spark.createDataFrame([(v,) for v in vals], "s STRING")
        .agg(F.array_join(F.array_sort(F.collect_set("s")), "|").alias("j"))
        .collect()[0]["j"]
    )
    dd = con.execute(
        "SELECT string_agg(DISTINCT s, '|' ORDER BY s) "
        "FROM (SELECT unnest(?) AS s)",
        [vals],
    ).fetchone()[0]
    verdict = "AGREE" if sp == dd else "DISAGREE"
    print(f"  {verdict}: distinct+order over {vals} -> spark={sp!r} duckdb={dd!r}")


def main() -> None:
    from louvain_modularity_spark.session import get_spark

    spark = get_spark()
    if "--scope" in sys.argv:
        p1_scope(spark)
    p2_sort_order(spark)
    p3_indexing(spark)
    p4_distinct_order(spark)


if __name__ == "__main__":
    main()
