"""Differential fuzzing: Spark vs DuckDB on hypothesis-generated tables.

The curated oracle catalog (tests/test_oracle.py) checks 200+ queries on
FIXED testdata — it can't reach the adversarial corners where engines
classically diverge: NULLs in join keys, NULLs in agg inputs, empty
groups, bag-semantics set ops, ties in window ordering. This fuzzer
generates small tables WITH nulls and replays the same relational core
(agg / join / null-safe filter / set ops / window) through both engines.

Values are integers and short strings only — no floats, so every
mismatch is a semantic bug, never a rounding artifact. Each comparison
is order-insensitive (sorted repr rows), mirroring the driver's check.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# keys: small domain forces collisions; nullable. vals: nullable ints.
rows_st = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    ),
    min_size=0,
    max_size=30,
)

SCHEMA = "k BIGINT, s STRING, v BIGINT"
DUCK_SCHEMA = [("k", "BIGINT"), ("s", "VARCHAR"), ("v", "BIGINT")]

FUZZ = settings(
    max_examples=10,  # each example runs several Spark jobs; derandomized
    deadline=None,    # generation front-loads the adversarial smalls
    derandomize=True,  # CI-stable: failures reproduce, never flake
    suppress_health_check=[HealthCheck.too_slow],
)


def duck_with(tables: dict[str, list[tuple]]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, rows in tables.items():
        cols = ", ".join(f"{c} {t}" for c, t in DUCK_SCHEMA)
        con.execute(f"CREATE TABLE {name} ({cols})")
        if rows:
            con.executemany(
                f"INSERT INTO {name} VALUES (?, ?, ?)", [list(r) for r in rows]
            )
    return con


def canon(rows) -> list[tuple]:
    return sorted(tuple(repr(v) for v in r) for r in rows)


def assert_same(sdf, con, sql: str) -> None:
    got = canon(tuple(r) for r in sdf.collect())
    want = canon(con.execute(sql).fetchall())
    assert got == want, f"spark={got[:5]} duck={want[:5]}"


@FUZZ
@given(rows=rows_st)
def test_fuzz_groupby_agg(spark, rows):
    # NULL group keys form their own group; count(v) skips NULLs while
    # count(*) doesn't; sum/min/max of all-NULL groups are NULL
    from pyspark.sql import functions as F

    sdf = (
        spark.createDataFrame(rows, SCHEMA)
        .groupBy("k", "s")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_v"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )
    con = duck_with({"t": rows})
    assert_same(
        sdf,
        con,
        """SELECT k, s, count(*) AS n_rows, count(v) AS n_v,
                  sum(v) AS sum_v, min(v) AS min_v, max(v) AS max_v
           FROM t GROUP BY k, s""",
    )


@FUZZ
@given(left=rows_st, right=rows_st)
def test_fuzz_joins(spark, left, right):
    # NULL keys never match (SQL three-valued =) in inner/left/semi/anti;
    # left join fans out on duplicate right keys
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA).selectExpr(
        "k", "v AS rv"
    )
    con = duck_with({"l": left, "r": right})
    cases = {
        "inner": (
            ldf.join(rdf, "k"),
            "SELECT l.k, l.s, l.v, r.v AS rv FROM l JOIN r ON l.k = r.k",
        ),
        "left": (
            ldf.join(rdf, "k", "left"),
            "SELECT l.k, l.s, l.v, r.v AS rv FROM l LEFT JOIN r ON l.k = r.k",
        ),
        "semi": (
            ldf.join(rdf, "k", "left_semi"),
            "SELECT * FROM l WHERE EXISTS"
            " (SELECT 1 FROM r WHERE r.k = l.k)",
        ),
        "anti": (
            ldf.join(rdf, "k", "left_anti"),
            "SELECT * FROM l WHERE NOT EXISTS"
            " (SELECT 1 FROM r WHERE r.k = l.k)",
        ),
    }
    for how, (sdf, sql) in cases.items():
        try:
            assert_same(sdf, con, sql)
        except AssertionError as e:
            raise AssertionError(f"{how} join diverged: {e}") from e


@FUZZ
@given(rows=rows_st)
def test_fuzz_null_safe_predicates(spark, rows):
    # eqNullSafe is IS NOT DISTINCT FROM; plain = drops NULL rows
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(rows, SCHEMA)
    con = duck_with({"t": rows})
    assert_same(
        sdf.filter(F.col("v").eqNullSafe(F.lit(None).cast("bigint"))),
        con,
        "SELECT * FROM t WHERE v IS NOT DISTINCT FROM NULL",
    )
    assert_same(
        sdf.filter(F.col("k").eqNullSafe(F.col("v"))),
        con,
        "SELECT * FROM t WHERE k IS NOT DISTINCT FROM v",
    )
    assert_same(
        sdf.filter(F.col("k") == F.col("v")),
        con,
        "SELECT * FROM t WHERE k = v",
    )


@FUZZ
@given(left=rows_st, right=rows_st)
def test_fuzz_bag_set_ops(spark, left, right):
    # exceptAll/intersectAll are BAG ops (multiplicity-aware), matching
    # SQL EXCEPT ALL / INTERSECT ALL — NULL rows compare equal here,
    # unlike join keys
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA)
    con = duck_with({"l": left, "r": right})
    assert_same(
        ldf.exceptAll(rdf), con, "SELECT * FROM l EXCEPT ALL SELECT * FROM r"
    )
    assert_same(
        ldf.intersectAll(rdf),
        con,
        "SELECT * FROM l INTERSECT ALL SELECT * FROM r",
    )
    assert_same(ldf.distinct(), con, "SELECT DISTINCT * FROM l")


@FUZZ
@given(rows=rows_st)
def test_fuzz_window_rank(spark, rows):
    # total deterministic order (v NULLS FIRST to match both engines'
    # default ASC NULL placement, uid tiebreak) -> row_number and
    # running sum must agree exactly
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    uid_rows = [(i, *r) for i, r in enumerate(rows)]
    sdf = spark.createDataFrame(uid_rows, "uid BIGINT, " + SCHEMA)
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc_nulls_first("v"), F.asc("uid"))
    )
    out = sdf.select(
        "uid",
        "k",
        F.row_number().over(w).alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_v"),
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (uid BIGINT, k BIGINT, s VARCHAR, v BIGINT)")
    if uid_rows:
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?, ?)", [list(r) for r in uid_rows]
        )
    assert_same(
        out,
        con,
        """SELECT uid, k,
                  row_number() OVER w AS rn,
                  sum(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS run_v
           FROM t
           WINDOW w AS (PARTITION BY k ORDER BY v ASC NULLS FIRST, uid)""",
    )


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_join_null_key_never_matches(spark, how):
    # pin the classic trap explicitly (not just via fuzz): NULL = NULL
    # is UNKNOWN, so a NULL key matches nothing in any join flavor
    l = spark.createDataFrame([(None, "x", 1), (1, "y", 2)], SCHEMA)
    r = spark.createDataFrame([(None, "z", 9), (1, "w", 8)], SCHEMA)
    joined = l.join(r.selectExpr("k", "v AS rv"), "k", how)
    ks = [row.k for row in joined.collect()]
    if how == "left_anti":
        assert ks == [None]
    elif how == "left":
        assert sorted(ks, key=lambda x: (x is None, x)) == [1, None]
    else:
        assert ks == [1]


# --------------------------------------------------------------------------
# Custom-operator differentials: as-of and interval joins vs DuckDB's
# native forms (an oracle independent of the pandas merge_asof property
# tests in test_properties.py)
# --------------------------------------------------------------------------

import datetime as dt

_BASE = dt.datetime(2024, 1, 1)

ts_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # key
        st.integers(min_value=0, max_value=600),    # seconds offset
        st.integers(min_value=-50, max_value=50),   # payload
    ),
    min_size=0,
    max_size=25,
)


def _t(off: int) -> dt.datetime:
    return _BASE + dt.timedelta(seconds=off)


@FUZZ
@given(left=ts_rows, right=ts_rows)
def test_fuzz_asof_join_vs_duckdb(spark, left, right):
    from chicago_crime_spark_ml_spark.operators.relational import asof_join

    lrows = [(k, _t(o), i) for i, (k, o, _) in enumerate(left)]
    # distinct right ts per key: DuckDB ASOF picks an arbitrary row among
    # exact-tie timestamps while asof_join uses a deterministic payload
    # rule — dedup ties so the comparison is well-defined
    seen, rrows = set(), []
    for k, o, v in right:
        if (k, o) not in seen:
            seen.add((k, o))
            rrows.append((k, _t(o), v))
    ldf = spark.createDataFrame(lrows, "k BIGINT, lts TIMESTAMP, lid BIGINT")
    rdf = spark.createDataFrame(rrows, "k BIGINT, rts TIMESTAMP, rv BIGINT")
    got = canon(
        tuple(r)
        for r in asof_join(ldf, rdf, "k", "lts", "rts")
        .select("k", "lts", "lid", "rv")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, lts TIMESTAMP, lid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, rts TIMESTAMP, rv BIGINT)")
    if lrows:
        con.executemany("INSERT INTO l VALUES (?,?,?)", [list(x) for x in lrows])
    if rrows:
        con.executemany("INSERT INTO r VALUES (?,?,?)", [list(x) for x in rrows])
    want = canon(
        con.execute(
            """SELECT l.k, l.lts, l.lid, r.rv
               FROM l ASOF LEFT JOIN r
               ON l.k = r.k AND l.lts >= r.rts"""
        ).fetchall()
    )
    assert got == want


@FUZZ
@given(left=ts_rows, right=ts_rows)
def test_fuzz_interval_join_vs_duckdb(spark, left, right):
    from chicago_crime_spark_ml_spark.operators.relational import interval_join

    lrows = [(k, _t(o), i) for i, (k, o, _) in enumerate(left)]
    rrows = [(k, _t(o), i) for i, (k, o, _) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "k BIGINT, lts TIMESTAMP, lid BIGINT")
    rdf = spark.createDataFrame(rrows, "k BIGINT, rts TIMESTAMP, rid BIGINT")
    got = canon(
        tuple(r)
        for r in interval_join(ldf, rdf, "k", "lts", "rts", 0.0, 90.0)
        .select("k", "lid", "rid")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, lts TIMESTAMP, lid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, rts TIMESTAMP, rid BIGINT)")
    if lrows:
        con.executemany("INSERT INTO l VALUES (?,?,?)", [list(x) for x in lrows])
    if rrows:
        con.executemany("INSERT INTO r VALUES (?,?,?)", [list(x) for x in rrows])
    want = canon(
        con.execute(
            """SELECT l.k, l.lid, r.rid
               FROM l JOIN r ON l.k = r.k
               AND r.rts BETWEEN l.lts AND l.lts + INTERVAL 90 SECOND"""
        ).fetchall()
    )
    assert got == want


@FUZZ
@given(rows=rows_st)
def test_fuzz_cube_rollup_grouping(spark, rows):
    # subtotal rows mark rolled-up columns with NULL — colliding with
    # REAL null keys; grouping() disambiguates and must agree with
    # DuckDB's GROUPING() bit for every row. Empty input is excluded:
    # that's a pinned engine divergence (test_cube_empty_input_divergence)
    from hypothesis import assume
    from pyspark.sql import functions as F

    assume(rows)
    sdf = spark.createDataFrame(rows, SCHEMA)
    con = duck_with({"t": rows})
    cube = sdf.cube("k", "s").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("k").cast("int").alias("gk"),
        F.grouping("s").cast("int").alias("gs"),
    )
    assert_same(
        cube,
        con,
        """SELECT k, s, count(*) AS n,
                  CAST(GROUPING(k) AS INTEGER) AS gk,
                  CAST(GROUPING(s) AS INTEGER) AS gs
           FROM t GROUP BY CUBE (k, s)""",
    )
    roll = sdf.rollup("k", "s").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("s").cast("int").alias("gs"),
    )
    assert_same(
        roll,
        con,
        """SELECT k, s, count(*) AS n,
                  CAST(GROUPING(s) AS INTEGER) AS gs
           FROM t GROUP BY ROLLUP (k, s)""",
    )


@FUZZ
@given(rows=rows_st)
def test_fuzz_range_frame_window(spark, rows):
    # RANGE frames group PEERS (equal order values) — different from ROWS
    # under ties; nulls form their own peer group in both engines
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sdf = spark.createDataFrame(rows, SCHEMA)
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc_nulls_first("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = sdf.select("k", "v", F.count(F.lit(1)).over(w).alias("n_peers_le"))
    con = duck_with({"t": rows})
    assert_same(
        out,
        con,
        """SELECT k, v,
                  count(*) OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS n_peers_le
           FROM t""",
    )


@FUZZ
@given(rows=rows_st)
def test_fuzz_sliding_frames_and_offsets(spark, rows):
    # Bounded sliding frames + offset functions — the window semantics
    # engines classically get subtly different: ROWS frames ignore
    # peer-ness (exact physical neighbors), lead's default fires only
    # past the partition edge, first_value(IGNORE NULLS) must skip
    # leading nulls not rows, and a bounded RANGE frame widens over
    # peers. Order is totalized over (v, s) with explicit NULLS FIRST on
    # both engines (Spark asc = nulls-first, DuckDB asc = nulls-LAST —
    # spelled out so the frames align); rows equal in (k, v, s) are
    # fully identical, so every output multiset is deterministic.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sdf = spark.createDataFrame(rows, SCHEMA)
    w = Window.partitionBy("k").orderBy(
        F.asc_nulls_first("v"), F.asc_nulls_first("s")
    )
    out = sdf.select(
        "k",
        "s",
        "v",
        F.sum("v").over(w.rowsBetween(-1, 1)).alias("roll3"),
        F.lag("v", 1).over(w).alias("lag1"),
        F.lead("v", 2, -999).over(w).alias("lead2"),
        F.first("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("first_nn"),
    )
    con = duck_with({"t": rows})
    assert_same(
        out,
        con,
        """SELECT k, s, v,
                  sum(v) OVER w_rows AS roll3,
                  lag(v, 1) OVER w_base AS lag1,
                  lead(v, 2, -999) OVER w_base AS lead2,
                  first_value(v IGNORE NULLS) OVER w_cum AS first_nn
           FROM t
           WINDOW
             w_base AS (PARTITION BY k
                        ORDER BY v ASC NULLS FIRST, s ASC NULLS FIRST),
             w_rows AS (w_base ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
             w_cum  AS (w_base ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)""",
    )
    # bounded numeric RANGE frame (peers widen the frame): non-null order
    # keys only — null-ordering-key frames are engine-defined
    w2 = Window.partitionBy("k").orderBy("v").rangeBetween(-2, 1)
    nn = sdf.filter(F.col("v").isNotNull())
    out2 = nn.select(
        "k", "v", F.sum("v").over(w2).alias("win_sum")
    )
    assert_same(
        out2,
        con,
        """SELECT k, v,
                  sum(v) OVER (PARTITION BY k ORDER BY v
                               RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING)
                    AS win_sum
           FROM t WHERE v IS NOT NULL""",
    )


@FUZZ
@given(rows=rows_st)
def test_fuzz_distinct_aggs_and_variance(spark, rows):
    # DISTINCT aggregates under NULLs + the sample-variance edge: DuckDB
    # var_samp/stddev_samp of a single value is NULL; Spark returns NaN.
    # The catalog normalizes that edge with nullif(isnan(...)) — this
    # fuzz replays the same normalization so any OTHER divergence
    # (distinct counting, NULL skipping, integer-avg typing) surfaces.
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(rows, SCHEMA)
    out = sdf.groupBy("k").agg(
        F.countDistinct("v").alias("nd_v"),
        F.countDistinct("s").alias("nd_s"),
        F.sum_distinct(F.col("v")).alias("sd_v"),
        F.round(F.avg("v"), 6).alias("avg_v"),
        F.round(
            F.when(
                F.isnan(F.var_samp("v")), F.lit(None)
            ).otherwise(F.var_samp("v")),
            6,
        ).alias("var_v"),
    )
    con = duck_with({"t": rows})
    assert_same(
        out,
        con,
        """SELECT k,
                  count(DISTINCT v) AS nd_v,
                  count(DISTINCT s) AS nd_s,
                  sum(DISTINCT v) AS sd_v,
                  round(avg(v), 6) AS avg_v,
                  round(var_samp(v), 6) AS var_v
           FROM t GROUP BY k""",
    )


def test_cube_empty_input_divergence(spark):
    # Pinned engine divergence found by the fuzzer: ANSI semantics (and
    # DuckDB/Postgres) emit the grand-total grouping set's row even on
    # EMPTY input — the () set degenerates to a global aggregate, which
    # returns one row with count 0. Spark implements cube/rollup via
    # Expand + grouped agg, so empty input yields NO rows. Catalog
    # queries over cube/rollup therefore never rely on the empty-input
    # grand-total row; this test documents the trap and fails if Spark
    # ever changes behavior (then the fuzzer exclusion can be dropped).
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], SCHEMA)
    spark_rows = empty.cube("k").agg(F.count(F.lit(1)).alias("n")).collect()
    assert spark_rows == []  # Spark: nothing
    con = duck_with({"t": []})
    duck_rows = con.execute(
        "SELECT k, count(*) AS n FROM t GROUP BY CUBE (k)"
    ).fetchall()
    assert duck_rows == [(None, 0)]  # DuckDB: ANSI grand-total row


@FUZZ
@given(
    days=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=25
    )
)
def test_fuzz_date_arithmetic(spark, days):
    # date_add / date_trunc / month extraction / date_diff across engines
    # over a wide offset range (leap years, month ends, negatives)
    from pyspark.sql import functions as F

    sdf = (
        spark.createDataFrame([(d,) for d in days], "off BIGINT")
        .select(
            "off",
            F.date_add(F.lit("2024-02-29").cast("date"), F.col("off").cast("int")).alias("d"),
        )
        .select(
            "off",
            "d",
            F.date_trunc("month", "d").cast("date").alias("m_start"),
            F.month("d").alias("m"),
            F.dayofmonth("d").alias("dom"),
            F.datediff(F.lit("2025-01-01").cast("date"), F.col("d")).alias("dd"),
            F.last_day("d").alias("eom"),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (off BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [[d] for d in days])
    assert_same(
        sdf,
        con,
        """SELECT off,
                  DATE '2024-02-29' + CAST(off AS INTEGER) AS d,
                  date_trunc('month', DATE '2024-02-29' + CAST(off AS INTEGER)) AS m_start,
                  CAST(month(DATE '2024-02-29' + CAST(off AS INTEGER)) AS INTEGER) AS m,
                  CAST(day(DATE '2024-02-29' + CAST(off AS INTEGER)) AS INTEGER) AS dom,
                  date_diff('day', DATE '2024-02-29' + CAST(off AS INTEGER),
                            DATE '2025-01-01') AS dd,
                  last_day(DATE '2024-02-29' + CAST(off AS INTEGER)) AS eom
           FROM t""",
    )


@FUZZ
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab -_.😀é\t"), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fuzz_string_functions(spark, texts):
    # length is CHARACTERS (not bytes) in both engines — 😀 and é count 1;
    # substr is 1-indexed; trim strips spaces only (not tabs); upper/lower
    # agree on ASCII+accents; concat with NULL propagates
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(t,) for t in texts], "s STRING").select(
        "s",
        F.length("s").alias("len"),
        F.substring("s", 2, 3).alias("sub"),
        F.trim(F.col("s")).alias("tr"),
        F.upper("s").alias("up"),
        F.reverse("s").alias("rev"),
        F.concat(F.col("s"), F.lit("|"), F.col("s")).alias("cc"),
        F.replace(F.col("s"), F.lit("a"), F.lit("XY")).alias("rep"),
        F.split(F.col("s"), " ").alias("parts"),
    ).withColumn("n_parts", F.size("parts")).drop("parts")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [[t] for t in texts])
    assert_same(
        sdf,
        con,
        """SELECT s, length(s) AS len, substr(s, 2, 3) AS sub,
                  trim(s, ' ') AS tr, upper(s) AS up, reverse(s) AS rev,
                  s || '|' || s AS cc, replace(s, 'a', 'XY') AS rep,
                  CAST(len(str_split_regex(s, ' ')) AS INTEGER) AS n_parts
           FROM t""",
    )


@FUZZ
@given(rows=rows_st)
def test_fuzz_pivot_vs_conditional_agg(spark, rows):
    # pivot == conditional aggregation; NULL group keys keep their row,
    # values outside the pivot list fall out, empty cells are NULL (count
    # pivots yield NULL, not 0, for absent combinations in Spark — match
    # DuckDB by using sum of CASE with no ELSE)
    from pyspark.sql import functions as F

    sdf = (
        spark.createDataFrame(rows, SCHEMA)
        .groupBy("k")
        .pivot("s", ["a", "b"])
        .agg(F.sum("v"))
    )
    con = duck_with({"t": rows})
    assert_same(
        sdf,
        con,
        """SELECT k,
                  sum(CASE WHEN s = 'a' THEN v END) AS a,
                  sum(CASE WHEN s = 'b' THEN v END) AS b
           FROM t GROUP BY k""",
    )


# ---------------------------------------------------------------------------
# Array/set algebra — the dedup-rescore primitives (array_distinct /
# array_intersect / array_min and the exact set-Jaccard built from them).
# The minhash band-seeding bug showed this layer can break in
# order-dependent ways invisible on curated data; fuzz the algebra
# against DuckDB's list functions on adversarial small arrays
# (duplicates, empties, disjoint, identical).
# ---------------------------------------------------------------------------

arrays_st = st.lists(
    st.tuples(
        st.lists(st.integers(min_value=-3, max_value=6), max_size=8),
        st.lists(st.integers(min_value=-3, max_value=6), max_size=8),
    ),
    min_size=0,
    max_size=15,
)


@FUZZ
@given(rows=arrays_st)
def test_fuzz_array_set_algebra(spark, rows):
    from pyspark.sql import functions as F

    data = [(i, a, b) for i, (a, b) in enumerate(rows)]
    sdf = spark.createDataFrame(
        data, "i BIGINT, a ARRAY<BIGINT>, b ARRAY<BIGINT>"
    )
    da = F.array_distinct("a")
    db = F.array_distinct("b")
    inter = F.size(F.array_intersect(da, db))
    out = sdf.select(
        "i",
        F.size(da).alias("na"),
        F.size(db).alias("nb"),
        inter.alias("ni"),
        # exact set Jaccard scaled to integers (x10000, floor) — no floats
        F.when(
            F.size(da) + F.size(db) - inter > 0,
            F.floor(inter * 10000 / (F.size(da) + F.size(db) - inter)),
        ).otherwise(F.lit(None)).alias("jac4"),
        F.array_min(da).alias("mn"),
        F.array_sort(F.array_union(da, db)).alias("u"),
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a BIGINT[], b BIGINT[])")
    if data:
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)", [list(r) for r in data]
        )
    sql = """
    WITH s AS (SELECT i, list_distinct(a) AS da, list_distinct(b) AS db
               FROM t),
    m AS (SELECT i, len(da) AS na, len(db) AS nb,
                 len(list_intersect(da, db)) AS ni, da, db
          FROM s)
    SELECT i, na, nb, ni,
           CASE WHEN na + nb - ni > 0
                THEN CAST(floor(ni * 10000 / (na + nb - ni)) AS BIGINT)
                END AS jac4,
           list_min(da) AS mn,
           list_sort(list_distinct(list_concat(da, db))) AS u
    FROM m
    """
    assert_same(out, con, sql)
    con.close()
