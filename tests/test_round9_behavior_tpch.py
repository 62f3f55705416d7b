"""Round-9 behavior tests: the TPC-H-style battery over a planted world.

COVERAGE.md inventory class D -> B for the TPC-H family: until now these
queries were verified by the Spark/DuckDB twin running the same
transcribed specification, which cannot catch a mis-transcription made
identically in both engines. Here a small hand-built TPC-H world
(5 parts, 5 suppliers, 5 customers, 12 orders, 20 lineitems across
4 nations / 2 regions) is written to parquet, the REGISTERED query runs
on it, and the expected answer is recomputed by a third implementation:
plain Python loops over the planted tuples, written from the TPC-H
functional specification (and, for the partsupp-free adaptations, from
the registry docstrings' stated semantics), sharing no code with either
engine's formula.

The world is deliberately adversarial: every filter has rows on both
sides (a lineitem shipped after 1998-09-02 for q1, a 1-URGENT order for
q13's exclusion, a supplier with suppkey % 13 == 0 for q16's NOT IN, an
equal-acctbal supplier pair for q2's tiebreak, an equal-shipdate
supplier pair for q21's sole-latest test, a >480k order for q22's
NOT EXISTS, a 150-qty order crossing q18's 250 threshold).
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# --- the planted world ----------------------------------------------------------

REGION = [(0, "ASIA"), (1, "EUROPE")]

NATION = [  # (n_nationkey, n_name, n_regionkey)
    (1, "NATION_1", 0),
    (2, "NATION_2", 0),
    (3, "NATION_3", 0),
    (4, "NATION_4", 1),
    (5, "NATION_5", 1),  # suppliers only -> full-outer right-only row
    (6, "NATION_6", 1),  # customers only -> full-outer left-only row
]

SUPPLIER = [  # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (1, "Supp#1", 1, 100.0),
    (2, "Supp#2", 2, 50.0),
    (3, "Supp#3", 3, 75.0),
    (13, "Supp#13", 4, 5.0),  # suppkey % 13 == 0 -> q16 NOT IN exclusion
    (5, "Supp#5", 1, 50.0),  # acctbal ties Supp#2 -> q2 suppkey tiebreak
    (6, "Supp#6", 5, 20.0),  # nation with no customers; ships nothing
]

PART = [  # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (1, "small red widget", "Brand#1", "STANDARD", 5, 100.0),
    (2, "large blue gear", "Brand#9", "PROMO POLISHED", 9, 110.0),
    (3, "medium red cog", "Brand#20", "STANDARD", 13, 120.0),
    (4, "small green bolt", "Brand#2", "ECONOMY BRUSHED", 2, 90.0),
    (5, "tiny yellow nut", "Brand#9", "STANDARD", 9, 95.0),
]

CUSTOMER = [  # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (1, "Cust#1", 1, 500.0, "BUILDING"),
    (2, "Cust#2", 2, 9000.0, "AUTOMOBILE"),
    (3, "Cust#3", 3, -50.0, "BUILDING"),  # negative -> out of q22 threshold avg
    (4, "Cust#4", 4, 7000.0, "MACHINERY"),
    (5, "Cust#5", 1, 6000.0, "BUILDING"),
    (6, "Cust#6", 6, 100.0, "HOUSEHOLD"),  # nation with no suppliers; no orders
]

ORDERS = [  # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (100, 1, "F", 1000.0, "1997-02-10", "1-URGENT"),
    (101, 2, "F", 500000.0, "1997-03-01", "3-MEDIUM"),  # >480k -> q22 NOT EXISTS
    (102, 3, "O", 2000.0, "1997-06-15", "2-HIGH"),
    (103, 1, "F", 3000.0, "1996-05-20", "3-MEDIUM"),
    (104, 4, "O", 4000.0, "1998-02-01", "1-URGENT"),
    (105, 2, "F", 6000.0, "1997-09-10", "2-HIGH"),
    (106, 3, "F", 7000.0, "1995-11-05", "3-MEDIUM"),
    (107, 1, "F", 8000.0, "1998-02-20", "2-HIGH"),
    (108, 4, "F", 9000.0, "1997-08-01", "3-MEDIUM"),  # 300 qty -> q18 big order
    (109, 2, "F", 1500.0, "1996-03-01", "1-URGENT"),
    (110, 5, "O", 2500.0, "1997-11-20", "2-HIGH"),
    (111, 3, "O", 3200.0, "1998-03-01", "1-URGENT"),
    # 1999 block: outside every TPC-H date window; no lineitems. Gives
    # agg_having a >5 group, makes sort_limit's LIMIT 20 bite (24 orders),
    # and plants 'P' status rows for the pivot.
    (120, 4, "O", 100.0, "1999-01-05", "5-LOW"),
    (121, 4, "O", 200.0, "1999-01-10", "5-LOW"),
    (122, 4, "O", 300.0, "1999-02-01", "5-LOW"),
    (123, 4, "O", 400.0, "1999-02-15", "5-LOW"),
    (124, 4, "O", 500.0, "1999-03-01", "5-LOW"),
    (125, 4, "O", 600.0, "1999-03-10", "5-LOW"),
    (126, 5, "O", 700.0, "1999-04-01", "5-LOW"),
    (127, 5, "O", 800.0, "1999-04-15", "5-LOW"),
    (128, 1, "O", 900.0, "1999-05-01", "5-LOW"),
    (129, 2, "O", 1000.0, "1999-05-10", "5-LOW"),
    (130, 5, "P", 1100.0, "1999-06-01", "4-NOT SPECIFIED"),
    (131, 3, "P", 1200.0, "1999-06-15", "4-NOT SPECIFIED"),
]

LINEITEM = [  # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    (100, 1, 1, 1, 5.0, 1000.0, 0.05, 0.0, "N", "O", "1997-03-01"),
    (100, 2, 2, 2, 15.0, 2000.0, 0.10, 0.0, "N", "O", "1997-02-20"),
    (101, 3, 3, 1, 25.0, 3000.0, 0.06, 0.0, "R", "F", "1997-04-01"),
    (101, 1, 5, 2, 30.0, 1500.0, 0.00, 0.0, "N", "F", "1997-03-15"),
    (102, 4, 13, 1, 10.0, 800.0, 0.05, 0.0, "R", "O", "1997-07-01"),
    (103, 5, 1, 1, 3.0, 600.0, 0.00, 0.0, "A", "F", "1996-06-01"),
    (103, 3, 2, 2, 8.0, 900.0, 0.25, 0.0, "N", "F", "1996-07-10"),
    (104, 2, 3, 1, 12.0, 2500.0, 0.05, 0.0, "N", "O", "1998-03-20"),
    (105, 2, 1, 1, 7.0, 1200.0, 0.05, 0.0, "N", "F", "1997-09-15"),
    (105, 1, 5, 2, 1.0, 700.0, 0.00, 0.0, "N", "F", "1997-09-20"),
    (106, 5, 5, 1, 40.0, 5000.0, 0.10, 0.0, "R", "F", "1995-12-01"),
    (107, 1, 1, 1, 9.0, 1100.0, 0.05, 0.0, "N", "O", "1998-04-01"),
    (107, 4, 2, 2, 50.0, 4000.0, 0.00, 0.0, "N", "O", "1998-09-10"),  # > q1 cutoff
    (108, 5, 3, 1, 150.0, 3000.0, 0.00, 0.0, "N", "F", "1997-08-15"),
    (108, 3, 3, 2, 150.0, 2000.0, 0.05, 0.0, "N", "F", "1997-08-20"),
    (109, 1, 1, 1, 4.0, 500.0, 0.00, 0.0, "N", "F", "1996-04-01"),
    (109, 2, 2, 2, 6.0, 800.0, 0.05, 0.0, "N", "F", "1996-04-01"),  # q21 tie
    (110, 3, 13, 1, 11.0, 1300.0, 0.05, 0.0, "N", "O", "1997-12-01"),
    (110, 2, 5, 2, 5.0, 900.0, 0.00, 0.0, "N", "O", "1997-12-05"),
    (111, 5, 2, 1, 6.0, 2000.0, 0.10, 0.0, "N", "O", "1998-05-01"),
]

# convenient lookups for the loop implementations
NATION_NAME = {nk: name for nk, name, _ in NATION}
NATION_REGION = {nk: rk for nk, _, rk in NATION}
REGION_NAME = dict(REGION)
SUPP_NATION = {sk: nk for sk, _, nk, _ in SUPPLIER}
SUPP_NAME = {sk: name for sk, name, _, _ in SUPPLIER}
SUPP_BAL = {sk: bal for sk, _, _, bal in SUPPLIER}
PART_BY_KEY = {p[0]: p for p in PART}
CUST_BY_KEY = {c[0]: c for c in CUSTOMER}
ORDER_BY_KEY = {o[0]: o for o in ORDERS}


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _rev(price: float, disc: float) -> float:
    return price * (1.0 - disc)


def _write_world(tmp) -> None:
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([r[0] for r in REGION], pa.int32()),
                "r_name": pa.array([r[1] for r in REGION], pa.string()),
            }
        ),
        str(tmp / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([n[0] for n in NATION], pa.int32()),
                "n_name": pa.array([n[1] for n in NATION], pa.string()),
                "n_regionkey": pa.array([n[2] for n in NATION], pa.int32()),
            }
        ),
        str(tmp / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([s[0] for s in SUPPLIER], pa.int64()),
                "s_name": pa.array([s[1] for s in SUPPLIER], pa.string()),
                "s_nationkey": pa.array([s[2] for s in SUPPLIER], pa.int32()),
                "s_acctbal": pa.array([s[3] for s in SUPPLIER], pa.float64()),
            }
        ),
        str(tmp / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([p[0] for p in PART], pa.int64()),
                "p_name": pa.array([p[1] for p in PART], pa.string()),
                "p_brand": pa.array([p[2] for p in PART], pa.string()),
                "p_type": pa.array([p[3] for p in PART], pa.string()),
                "p_size": pa.array([p[4] for p in PART], pa.int32()),
                "p_retailprice": pa.array([p[5] for p in PART], pa.float64()),
            }
        ),
        str(tmp / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in CUSTOMER], pa.int64()),
                "c_name": pa.array([c[1] for c in CUSTOMER], pa.string()),
                "c_nationkey": pa.array([c[2] for c in CUSTOMER], pa.int32()),
                "c_acctbal": pa.array([c[3] for c in CUSTOMER], pa.float64()),
                "c_mktsegment": pa.array([c[4] for c in CUSTOMER], pa.string()),
            }
        ),
        str(tmp / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in ORDERS], pa.int64()),
                "o_custkey": pa.array([o[1] for o in ORDERS], pa.int64()),
                "o_orderstatus": pa.array([o[2] for o in ORDERS], pa.string()),
                "o_totalprice": pa.array([o[3] for o in ORDERS], pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime.fromisoformat(o[4]) for o in ORDERS],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array([o[5] for o in ORDERS], pa.string()),
            }
        ),
        str(tmp / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in LINEITEM], pa.int64()),
                "l_partkey": pa.array([r[1] for r in LINEITEM], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in LINEITEM], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in LINEITEM], pa.int32()),
                "l_quantity": pa.array([r[4] for r in LINEITEM], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in LINEITEM], pa.float64()),
                "l_discount": pa.array([r[6] for r in LINEITEM], pa.float64()),
                "l_tax": pa.array([r[7] for r in LINEITEM], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in LINEITEM], pa.string()),
                "l_linestatus": pa.array([r[9] for r in LINEITEM], pa.string()),
                "l_shipdate": pa.array(
                    [dt.datetime.fromisoformat(r[10]) for r in LINEITEM],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp / "lineitem.parquet"),
    )


def _run(spark, name, sf_dir):
    from dynamodb_stream_processor_2_0_spark.plans import registry

    registry._load()
    return registry.REGISTRY[name].fn(spark, str(sf_dir)).collect()


def _rows_by(rows, *cols):
    """Index collected Rows by a tuple of column values."""
    return {tuple(r[c] for c in cols): r for r in rows}


# --- q1: pricing summary --------------------------------------------------------


def test_q1_pricing_summary_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q1_pricing_summary", tmp_path)

    expected = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # qty, base, disc, n
    for row in LINEITEM:
        if _d(row[10]) <= _d("1998-09-02"):
            acc = expected[(row[8], row[9])]
            acc[0] += row[4]
            acc[1] += row[5]
            acc[2] += _rev(row[5], row[6])
            acc[3] += 1
    assert len(got) == len(expected)
    for r in got:
        qty, base, disc, n = expected[(r["l_returnflag"], r["l_linestatus"])]
        assert r["sum_qty"] == pytest.approx(qty)
        assert r["sum_base_price"] == pytest.approx(base)
        assert r["sum_disc_price"] == pytest.approx(disc)
        assert r["avg_qty"] == pytest.approx(qty / n)
        assert r["count_order"] == n
    # the late-shipped line (order 107, 1998-09-10) must be excluded
    assert sum(r["count_order"] for r in got) == len(LINEITEM) - 1


# --- q3: shipping priority ------------------------------------------------------


def test_q3_shipping_priority_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q3_shipping_priority", tmp_path)

    cutoff = _d("1998-03-15")
    building = {c[0] for c in CUSTOMER if c[4] == "BUILDING"}
    rev = defaultdict(float)
    for row in LINEITEM:
        o = ORDER_BY_KEY[row[0]]
        if o[1] in building and _d(o[4]) < cutoff and _d(row[10]) > cutoff:
            rev[row[0]] += _rev(row[5], row[6])
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r["o_orderkey"] for r in got] == [k for k, _ in ranked]
    for r, (k, v) in zip(got, ranked):
        assert r["revenue"] == pytest.approx(v)
        o = ORDER_BY_KEY[k]
        assert r["o_orderdate"] == dt.datetime.fromisoformat(o[4])
        assert r["o_orderpriority"] == o[5]


# --- q4: order priority checking ------------------------------------------------


def test_q4_order_priority_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q4_order_priority", tmp_path)

    lines_by_order = defaultdict(list)
    for row in LINEITEM:
        lines_by_order[row[0]].append(row)
    counts = defaultdict(int)
    for o in ORDERS:
        od = _d(o[4])
        if not (_d("1997-01-01") <= od < _d("1997-04-01")):
            continue
        if any(_d(l[10]) > od for l in lines_by_order[o[0]]):
            counts[o[5]] += 1
    assert [(r["o_orderpriority"], r["order_count"]) for r in got] == sorted(
        counts.items()
    )


# --- q5: region revenue ---------------------------------------------------------


def test_q5_region_revenue_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q5_region_revenue", tmp_path)

    rev = defaultdict(float)
    for row in LINEITEM:
        o = ORDER_BY_KEY[row[0]]
        c = CUST_BY_KEY[o[1]]
        if REGION_NAME[NATION_REGION[c[2]]] != "ASIA":
            continue
        if not (_d("1996-01-01") <= _d(o[4]) < _d("1998-01-01")):
            continue
        rev[NATION_NAME[c[2]]] += _rev(row[5], row[6])
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["n_name"],) for r in got] == [(k,) for k, _ in ranked]
    for r, (_, v) in zip(got, ranked):
        assert r["revenue"] == pytest.approx(v)


# --- q6: forecast revenue -------------------------------------------------------


def test_q6_forecast_revenue_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q6_forecast_revenue", tmp_path)

    revenue, n = 0.0, 0
    for row in LINEITEM:
        if (
            _d("1997-01-01") <= _d(row[10]) < _d("1998-01-01")
            and 0.05 <= row[6] <= 0.07
            and row[4] < 24
        ):
            revenue += row[5] * row[6]
            n += 1
    assert n == 4  # planted: exactly the four .05/.06-discount 1997 small lines
    assert got[0]["revenue"] == pytest.approx(revenue)
    assert got[0]["n_items"] == n


# --- q7: volume shipping --------------------------------------------------------


def test_q7_volume_shipping_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q7_volume_shipping", tmp_path)

    rev = defaultdict(float)
    for row in LINEITEM:
        o = ORDER_BY_KEY[row[0]]
        sn = NATION_NAME[SUPP_NATION[row[2]]]
        cn = NATION_NAME[CUST_BY_KEY[o[1]][2]]
        if {sn, cn} == {"NATION_1", "NATION_2"}:
            rev[(sn, cn, _d(row[10]).year)] += _rev(row[5], row[6])
    assert [(r["supp_nation"], r["cust_nation"], r["l_year"]) for r in got] == sorted(
        rev
    )
    for r in got:
        assert r["revenue"] == pytest.approx(
            rev[(r["supp_nation"], r["cust_nation"], r["l_year"])]
        )


# --- q8: national market share --------------------------------------------------


def test_q8_national_market_share_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q8_national_market_share", tmp_path)

    by_year = defaultdict(lambda: [None, 0.0, 0])  # nation_3 volume, total, n
    for row in LINEITEM:
        p = PART_BY_KEY[row[1]]
        if p[3] != "STANDARD":
            continue
        o = ORDER_BY_KEY[row[0]]
        c = CUST_BY_KEY[o[1]]
        if REGION_NAME[NATION_REGION[c[2]]] != "ASIA":
            continue
        acc = by_year[_d(o[4]).year]
        vol = _rev(row[5], row[6])
        if NATION_NAME[SUPP_NATION[row[2]]] == "NATION_3":
            # SQL sum(CASE WHEN ... END) over zero matches is NULL, not 0
            acc[0] = vol if acc[0] is None else acc[0] + vol
        acc[1] += vol
        acc[2] += 1
    assert [r["o_year"] for r in got] == sorted(by_year)
    for r in got:
        n3, tot, n = by_year[r["o_year"]]
        if n3 is None:
            assert r["mkt_share"] is None
        else:
            assert r["mkt_share"] == pytest.approx(n3 / tot)
        assert r["n_items"] == n
    # the planted world has NATION_3 supply only in 1997
    assert [r["o_year"] for r in got if r["mkt_share"] is not None] == [1997]


# --- q9: profit by nation/year --------------------------------------------------


def test_q9_profit_by_nation_year_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q9_profit_by_nation_year", tmp_path)

    profit = defaultdict(float)
    for row in LINEITEM:
        if "red" not in PART_BY_KEY[row[1]][1]:
            continue
        o = ORDER_BY_KEY[row[0]]
        nation = NATION_NAME[SUPP_NATION[row[2]]]
        profit[(nation, _d(o[4]).year)] += _rev(row[5], row[6])
    assert [(r["nation"], r["o_year"]) for r in got] == sorted(
        profit, key=lambda k: (k[0], -k[1])
    )
    for r in got:
        assert r["sum_profit"] == pytest.approx(profit[(r["nation"], r["o_year"])])


# --- q10: returned items --------------------------------------------------------


def test_q10_returned_items_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q10_returned_items", tmp_path)

    rev = defaultdict(float)
    for row in LINEITEM:
        if row[8] != "R":
            continue
        o = ORDER_BY_KEY[row[0]]
        if _d("1997-01-01") <= _d(o[4]) < _d("1997-07-01"):
            rev[o[1]] += _rev(row[5], row[6])
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [r["c_custkey"] for r in got] == [k for k, _ in ranked]
    for r, (k, v) in zip(got, ranked):
        c = CUST_BY_KEY[k]
        assert r["revenue"] == pytest.approx(v)
        assert r["c_name"] == c[1]
        assert r["c_acctbal"] == pytest.approx(c[3])
        assert r["n_name"] == NATION_NAME[c[2]]
        assert r["c_mktsegment"] == c[4]


# --- q11: important balance (partsupp-free adaptation) --------------------------


def test_q11_important_balance_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q11_important_balance", tmp_path)

    total = sum(SUPP_BAL.values())
    by_nation = defaultdict(float)
    for sk, nk in SUPP_NATION.items():
        by_nation[nk] += SUPP_BAL[sk]
    kept = {nk: bal for nk, bal in by_nation.items() if bal > total * 0.03}
    # planted: Supp#13's nation (5.0 of 280.0 = 1.8%) must be dropped
    assert SUPP_NATION[13] not in kept and len(kept) == len(by_nation) - 1
    assert [(r["s_nationkey"],) for r in got] == [
        (nk,) for nk, _ in sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    for r in got:
        assert r["nation_bal"] == pytest.approx(kept[r["s_nationkey"]])


# --- q12: ship delay priority (shipmode-free adaptation) -------------------------


def test_q12_ship_delay_priority_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q12_ship_delay_priority", tmp_path)

    counts = defaultdict(lambda: [0, 0])  # high, low
    for row in LINEITEM:
        o = ORDER_BY_KEY[row[0]]
        late = (_d(row[10]) - _d(o[4])).days >= 90
        cls = "late" if late else "ontime"
        if o[5] in ("1-URGENT", "2-HIGH"):
            counts[cls][0] += 1
        else:
            counts[cls][1] += 1
    assert [(r["delay_class"],) for r in got] == [(k,) for k in sorted(counts)]
    for r in got:
        high, low = counts[r["delay_class"]]
        assert r["high_line_count"] == high
        assert r["low_line_count"] == low
    assert sum(r["high_line_count"] + r["low_line_count"] for r in got) == len(
        LINEITEM
    )


# --- q13: order-count distribution ----------------------------------------------


def test_q13_order_count_distribution_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q13_order_count_distribution", tmp_path)

    per_cust = {c[0]: 0 for c in CUSTOMER}  # LEFT JOIN: zero-order custs kept
    for o in ORDERS:
        if o[5] != "1-URGENT":
            per_cust[o[1]] += 1
    dist = defaultdict(int)
    for n in per_cust.values():
        dist[n] += 1
    assert [(r["c_count"], r["custdist"]) for r in got] == sorted(
        ((c, d) for c, d in dist.items()), key=lambda kv: (-kv[1], -kv[0])
    )


# --- q14: promo revenue ---------------------------------------------------------


def test_q14_promo_revenue_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q14_promo_revenue", tmp_path)

    promo, total, n = 0.0, 0.0, 0
    for row in LINEITEM:
        if _d("1997-09-01") <= _d(row[10]) < _d("1997-10-01"):
            v = _rev(row[5], row[6])
            if PART_BY_KEY[row[1]][3].startswith("PROMO"):
                promo += v
            total += v
            n += 1
    assert n == 2  # planted: one promo line + one non-promo line in the window
    assert got[0]["promo_pct"] == pytest.approx(100.0 * promo / total)
    assert got[0]["n_items"] == n


# --- q15: top supplier ----------------------------------------------------------


def test_q15_top_supplier_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q15_top_supplier", tmp_path)

    rev = defaultdict(float)
    for row in LINEITEM:
        if _d("1997-01-01") <= _d(row[10]) < _d("1997-04-01"):
            rev[row[2]] += _rev(row[5], row[6])
    best = max(rev.values())
    winners = sorted(sk for sk, v in rev.items() if v == pytest.approx(best))
    assert [r["s_suppkey"] for r in got] == winners
    for r in got:
        assert r["s_name"] == SUPP_NAME[r["s_suppkey"]]
        assert r["total_revenue"] == pytest.approx(best)


# --- q17: small-quantity revenue ------------------------------------------------


def test_q17_small_quantity_revenue_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q17_small_quantity_revenue", tmp_path)

    qty = defaultdict(list)
    for row in LINEITEM:
        qty[row[1]].append(row[4])
    total, n = 0.0, 0
    for row in LINEITEM:
        if PART_BY_KEY[row[1]][2] != "Brand#1":
            continue
        if row[4] < 0.2 * (sum(qty[row[1]]) / len(qty[row[1]])):
            total += row[5]
            n += 1
    assert n == 1  # planted: exactly the qty-1 line of order 105
    assert got[0]["avg_yearly"] == pytest.approx(total / 7.0)
    assert got[0]["n_items"] == n


# --- q18: large-volume customers ------------------------------------------------


def test_q18_large_volume_customer_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q18_large_volume_customer", tmp_path)

    order_qty = defaultdict(float)
    for row in LINEITEM:
        order_qty[row[0]] += row[4]
    big = {k for k, q in order_qty.items() if q > 250}
    assert big == {108}  # planted: the 150+150 order crosses the threshold
    expected = sorted(
        ((ORDER_BY_KEY[k], order_qty[k]) for k in big),
        key=lambda t: (-t[0][3], t[0][0]),
    )[:20]
    assert len(got) == len(expected)
    for r, (o, q) in zip(got, expected):
        c = CUST_BY_KEY[o[1]]
        assert (r["c_name"], r["c_custkey"], r["o_orderkey"]) == (c[1], c[0], o[0])
        assert r["o_totalprice"] == pytest.approx(o[3])
        assert r["total_qty"] == pytest.approx(q)


# --- q19: disjunctive revenue ---------------------------------------------------


def test_q19_disjunctive_revenue_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q19_disjunctive_revenue", tmp_path)

    bands = [("Brand#1", 1, 5, 1, 11), ("Brand#9", 1, 10, 10, 20), ("Brand#20", 1, 15, 20, 30)]
    revenue, n = 0.0, 0
    for row in LINEITEM:
        p = PART_BY_KEY[row[1]]
        if any(
            p[2] == brand and lo_s <= p[4] <= hi_s and lo_q <= row[4] <= hi_q
            for brand, lo_s, hi_s, lo_q, hi_q in bands
        ):
            revenue += _rev(row[5], row[6])
            n += 1
    assert n == 7  # every band matches: 4 (Brand#1) + 2 (Brand#9) + 1 (Brand#20)
    assert got[0]["revenue"] == pytest.approx(revenue)
    assert got[0]["n_items"] == n


# --- q2: min-cost supplier (window-decorrelated adaptation) ----------------------


def test_q2_min_cost_supplier_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q2_min_cost_supplier", tmp_path)

    pairs = sorted({(row[1], row[2]) for row in LINEITEM})
    per_part = defaultdict(list)
    for pk, sk in pairs:
        per_part[pk].append(sk)
    expected = {}
    for pk, sks in per_part.items():
        if PART_BY_KEY[pk][4] > 10:
            continue
        best = min(sks, key=lambda sk: (SUPP_BAL[sk], sk))
        expected[pk] = best
    # planted tiebreaks: parts 2 and 5 both see Supp#2/Supp#5 at acctbal 50
    assert expected[2] == 2 and expected[5] == 2
    by_part = _rows_by(got, "p_partkey")
    assert set(by_part) == {(pk,) for pk in expected}
    for pk, sk in expected.items():
        r = by_part[(pk,)]
        assert r["s_suppkey"] == sk
        assert r["s_name"] == SUPP_NAME[sk]
        assert r["s_acctbal"] == pytest.approx(SUPP_BAL[sk])
        assert r["p_brand"] == PART_BY_KEY[pk][2]


# --- q16: supplier variety ------------------------------------------------------


def test_q16_supplier_variety_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q16_supplier_variety", tmp_path)

    sizes = {1, 5, 9, 13, 17, 21, 25, 29}
    variety = defaultdict(set)
    for pk, sk in {(row[1], row[2]) for row in LINEITEM}:
        p = PART_BY_KEY[pk]
        if p[2] == "Brand#1" or p[3].startswith("PROMO") or p[4] not in sizes:
            continue
        if sk % 13 == 0:
            continue
        variety[(p[2], p[3], p[4])].add(sk)
    # planted: Supp#13 ships part 3 but must not be counted
    assert 13 not in variety[("Brand#20", "STANDARD", 13)]
    expected = sorted(
        ((k, len(v)) for k, v in variety.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [
        ((r["p_brand"], r["p_type"], r["p_size"]), r["supplier_cnt"]) for r in got
    ] == expected


# --- q20: dominant supplier (availqty-free adaptation) ---------------------------


def test_q20_dominant_supplier_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q20_dominant_supplier", tmp_path)

    shipped = defaultdict(float)
    for row in LINEITEM:
        if PART_BY_KEY[row[1]][1].startswith("small"):
            shipped[(row[1], row[2])] += row[4]
    part_total = defaultdict(float)
    for (pk, _), q in shipped.items():
        part_total[pk] += q
    dominated = defaultdict(int)
    for (pk, sk), q in shipped.items():
        if q * 2 > part_total[pk]:
            dominated[sk] += 1
    expected = sorted(
        (SUPP_NAME[sk], NATION_NAME[SUPP_NATION[sk]], n)
        for sk, n in dominated.items()
    )
    assert [(r["s_name"], r["nation"], r["n_parts_dominated"]) for r in got] == expected
    # planted: Supp#5 dominates part 1 (31 of 49), Supp#2 part 4 (50 of 60)
    assert dict(dominated) == {5: 1, 2: 1}


# --- q21: sole-blocking supplier (commitdate-free adaptation) --------------------


def test_q21_last_supplier_wait_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q21_last_supplier_wait", tmp_path)

    last = defaultdict(lambda: defaultdict(lambda: dt.date.min))
    for row in LINEITEM:
        if ORDER_BY_KEY[row[0]][2] != "F":
            continue
        d = _d(row[10])
        if d > last[row[0]][row[2]]:
            last[row[0]][row[2]] = d
    numwait = defaultdict(int)
    for ok, supps in last.items():
        if len(supps) < 2:
            continue
        mx = max(supps.values())
        at_max = [sk for sk, d in supps.items() if d == mx]
        if len(at_max) == 1:
            numwait[SUPP_NAME[at_max[0]]] += 1
    expected = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["s_name"], r["numwait"]) for r in got] == expected
    # planted: order 109's two suppliers tie on 1996-04-01 -> neither waits,
    # and Supp#2 is the sole latest shipper on two orders (103, 107)
    assert dict(numwait)["Supp#2"] == 2


# --- q22: idle rich customers ---------------------------------------------------


def test_q22_idle_rich_customers_planted(spark, tmp_path):
    _write_world(tmp_path)
    got = _run(spark, "q22_idle_rich_customers", tmp_path)

    positive = [c[3] for c in CUSTOMER if c[3] > 0]
    threshold = sum(positive) / len(positive)
    big_spenders = {o[1] for o in ORDERS if o[3] > 480000}
    assert big_spenders == {2}  # planted: the 500k order belongs to Cust#2
    seg = defaultdict(lambda: [0, 0.0])
    for c in CUSTOMER:
        if c[3] > threshold and c[0] not in big_spenders:
            seg[c[4]][0] += 1
            seg[c[4]][1] += c[3]
    assert [(r["c_mktsegment"],) for r in got] == [(k,) for k in sorted(seg)]
    for r in got:
        n, bal = seg[r["c_mktsegment"]]
        assert r["numcust"] == n
        assert r["totacctbal"] == pytest.approx(bal)
