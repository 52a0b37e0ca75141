"""Deterministic dual-dialect TPC-DS data generator.

The reference's primary workload is the TPC-DS query set over dsdgen
output (TPCDSDataLoad.scala:91-129 load; TPCDSBenchmarkQueries.scala
query bank). The driver's testdata is TPC-H-shaped, so to make the real
TPC-DS query texts EXECUTABLE — on Spark and on the DuckDB oracle, over
identical data — this module generates the 12 tables those queries touch
from a single column-expression spec rendered into BOTH dialects:

- Spark: ``spark.range(n).selectExpr(...)`` per table, written once per
  (process, sf_dir) to parquet and registered as temp views — queries
  then scan parquet like any other fact table (pushdown, pruning, AQE).
- DuckDB: the same expressions as CTEs over ``range(n)`` / the ``orders``
  view, prepended to the oracle query text (``compose_oracle``) — the
  oracle never depends on Spark-side writes.

Determinism rules that make the two renders value-identical:
- Row identity is ``id`` (0-based). Dimensions use a constant row count;
  facts scale with SF by deriving ``n = COUNT(orders)`` (Spark: one
  count job + ``spark.range(n)``; DuckDB: ``row_number() OVER (ORDER BY
  o_orderkey) - 1`` — constant-free, so one oracle string serves every
  SF).
- Integer arithmetic only (multiplier mixing ``(id*p) % m``), except one
  explicit ``CAST(… AS DOUBLE)/100`` per money column: bare decimal
  literals like ``/100.0`` trigger DECIMAL-typed arithmetic whose
  precision propagation differs between engines, while integer-cents →
  one double division → ``DECIMAL(12,2)`` cast is bit-identical in both.
- The only dialect-split expression is date arithmetic
  (``date_add(d, n)`` vs ``d + n``), handled by the ``@`` spec entries.

This is generation of synthetic TEST data, mirroring the technique the
reference's own micro-benchmarks use to synthesize inputs
(MergeMicroBenchmark.scala:225-229: spark.range + column expressions);
100 TB scale concerns apply to the registered queries, not to this
harness-side generator. Columns are the subset the registered
``tpcds_q*`` queries read (types conforming to the full TPCDS_TABLES
spec in tpcds.py); extending a table is one line per column.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Spec helpers: every expression is a portable SQL string over `id`, or a
# ("@date", "<int expr>") pair for the one dialect-split operation.


def _mix(mult: int, mod: int, off: int = 1) -> str:
    """1 + (id*mult) % mod — a decorrelated deterministic column mixer."""
    return f"({off} + (id*{mult}) % {mod})"


def _cents(cents_expr: str) -> str:
    """Money column: integer cents → one double division → DECIMAL(12,2).
    Exact and engine-identical (see module docstring)."""
    return f"CAST(CAST({cents_expr} AS DOUBLE)/100 AS DECIMAL(12,2))"


def _int(e: str) -> str:
    return f"CAST({e} AS INT)"


def _nullable(e: str, null_every: int, mult: int = 7) -> str:
    """NULL one row in ~null_every (deterministic), else e."""
    return f"CASE WHEN (id*{mult}) % {null_every} = 0 THEN NULL ELSE {e} END"


def _pick_int(selector: str, values: list[int]) -> str:
    """CASE over integer values — integer sibling of _case."""
    arms = " ".join(
        f"WHEN ({selector}) = {i} THEN {v}" for i, v in enumerate(values)
    )
    return f"(CASE {arms} END)"


# q91's returning-customer pool: the 25 customer sks whose full dimension
# chain satisfies the query's filter conjunction — c_current_cdemo_sk →
# (M, 'Unknown') or (W, 'Advanced Degree'), c_current_hdemo_sk →
# hd_buy_potential 'Unknown', c_current_addr_sk → ca_gmt_offset = -7.
# Derived from the customer mixers (cid*29 % 7200 / cid*31 % 720 /
# cid*23 % 5000) and the floor(id/2) gmt formula; 1-in-61 catalog
# returns are routed to this pool with a November-1998 return date so
# the query's month slice has mass.
_Q91_CUSTOMER_SKS = [
    900, 924, 1500, 1524, 1980, 2580, 2604, 3660, 3684, 4260, 4284,
    5340, 5364, 5964, 6420, 6444, 7020, 7044, 8100, 8124, 8700, 8724,
    9180, 9780, 9804,
]


# q58 "contract" anchor rows: 1-in-101 ids are pinned, in ALL THREE
# sales channels, to the week of 1999-02-22 (date_sk 2451231..2451237)
# and to items 1991..2000. The three channels draw from the same id
# stream with the SAME _sales_money formulas, so an anchored id carries
# an identical ext_sales_price in every channel — per anchor item the
# weekly revenues are exactly equal, satisfying q58's three-way ±10%
# band by construction (a synthetic stand-in for dsdgen's cross-channel
# item/price correlation, which independent per-channel mixers cannot
# produce). The returns tables reuse the anchored item expression so
# return rows keep joining their sale by construction.
# Date offset derives from (j%10)%7, NOT j%7: pairing the date to the
# item residue collapses the (item, d_date) cell space from 70 to 10,
# so q23's frequent-items HAVING COUNT(*) > 1 is reachable even at
# sf0.001 (~15 anchors → 5 cells with 2 rows) instead of only at
# sf0.01+. q58 is indifferent — any day inside the anchor week works,
# and the three channels stay identical by construction.
_Q58_DATE = "(2451231 + (CAST(FLOOR(id/101) AS BIGINT) % 10) % 7)"
_Q58_ITEM = "(1991 + (CAST(FLOOR(id/101) AS BIGINT) % 10))"


def _q58_anchored(expr: str, anchor: str) -> str:
    return f"CASE WHEN id % 101 = 7 THEN {anchor} ELSE {expr} END"


# ---------------------------------------------------------------------------
# Cross-channel anchor classes for the join-chain-starved queries (q25,
# q29, q23b, q54). Like the q58 contract rows, one residue class of the
# shared fact id stream is pinned in EVERY table the query's join chain
# touches, so the chain exists by construction at every SF (a synthetic
# stand-in for dsdgen's cross-channel correlation, which independent
# per-channel mixers cannot produce). All classes live on id % 600 —
# divisible by 3, so the two "item flow" classes survive store_returns'
# `id % 3 = 0` subset filter and catalog_returns' `id % 5 = 0` filter
# (120 and 420 are ≡ 0 mod 5 too, hence the cr item/customer mirrors).
# Ladders are wrapped INSIDE _q58_anchored where both apply, so the q58
# class keeps precedence on the ~1/60600 collisions.
#
#   120: q25 item flow — ss sale April 2000 → sr return ≤ Jun 2000 →
#        cs rebuy May–Oct 2000, same customer + item (the cs row at the
#        SAME raw id replicates ss's customer/item mixers).
#   420: q29 item flow — ss April 1999 → sr ≤ Jun 1999 → cs 1999–2001.
#   540: q17 item flow — ss in 2000Q1 → sr ≤ May 2000 → cs Apr–Aug
#        2000 (d2/d3 within the query's 2000Q1–Q3 window).
#   253: q23b best-customer rows — cs in Feb 2000, billed to one of the
#        ss quadratic mixer's heavy-hitter customers (the mixer
#        (7t²+41t) % 2000 has period 2000 in the ticket index t, so its
#        multiplicity profile — and hence the best-customer set — is
#        SF-independent; 549/1549/299/1799 sit at ≥0.85× the max store
#        spend at every SF, far above q23's 0.5× HAVING bar), with cs
#        items 1991..2000 (frequent by the q58 anchors' repeated
#        (item, d_date) cells). No ss-side pinning needed.
#   91:  q54 seed — cs in Dec 1998 of a Music/class5 item (item id ≡ 18
#        mod 50 ⇔ sk ≡ 19 mod 50), billed to a _Q54_CUSTOMER_SKS member.
#   317: q54 revenue — ss in Jan–Mar 1999 (d_month_seq 1188..1190) by
#        the same customer pool.
#   266: November star-probe rows (ss only; 266 % 3 ≠ 0 so no
#        store_returns mirror exists) — k cycles three (month, item)
#        arms: Nov 1998 × manager-8 items (sk ≡ 40 mod 100) for q19,
#        Nov 1999 × manager-28 items (sk ≡ 80 mod 100) for q55,
#        Nov 2000 × manufact-128 items (sk 558/1558) for q03 — the
#        month × item-attribute slices those brand probes group on,
#        empty below sf0.01 under uniform mixers. Customer/store pinned
#        non-null so the single sf0.001 anchor row can't be the
#        nullable arm.
#   30:  q83/q71 three-channel rows (30 ≡ 0 mod 3, 5 AND 6 — the one
#        residue family present in ALL THREE returns subsets) — every
#        channel's sale gets a manager-1 item (sk ≡ 1 mod 100), a Dec
#        1999 sale date and a breakfast/dinner sold-time (q71's month ×
#        manager × meal-time slice), and each channel's RETURN is
#        pinned to one of q83's three probe weeks (1999-06-30 /
#        1999-08-28 / 1999-11-18 cycling on k%3) with the same item in
#        sr, cr and wr, so q83's three-way i_item_id join intersects by
#        construction. Item arms mirror into the returns tables to keep
#        the return→sale join-back invariant.
#   94:  q31 web-growth rows — ws in Q3 2000, billed to Walker-County
#        addresses (addr id ≡ 4 mod 5). Walker's Q1→Q2 web growth beats
#        its store growth naturally (wg12 1.003 vs sg12 0.924 at
#        sf0.01); the ~30% Q3 value bump closes the one failing leg
#        (wg23 1.03 vs sg23 1.15), restoring the single-county result
#        the flow classes' April-2000 store rows had perturbed to zero.
#        The bump fraction is SF-independent (class mass and natural
#        county-quarter mass both scale with n). Residue 94 chosen for
#        its quantity: every id % 600 class has CONSTANT ws_quantity
#        (17·600 ≡ 0 mod 100), and 94's is 99 — a residue like 530
#        (qty 11) carries too little value per row to move the ratio.
#        94 % 6 ≠ 0, so web_returns needs no mirror.
#
# _Q54_CUSTOMER_SKS: 8 spread customers from the 537 of 1..2000 whose
# c_current_addr_sk resolves to a (ca_county, ca_state) pair that some
# store's (s_county, s_state) covers — q54's my_revenue requires the
# county+state correlated join to hit.
_Q54_CUSTOMER_SKS = [1, 246, 500, 751, 1004, 1250, 1504, 1750]
_Q23_CUSTOMER_SKS = [549, 1549, 299, 1799]

_K600 = "CAST(FLOOR(id/600) AS BIGINT)"
# Natural (non-null) store_sales mixers, reused verbatim by the anchored
# arms of sr (same id space) and cs (cross-channel replication).
_TK = "CAST(FLOOR(id/4) AS BIGINT)"
_SS_CUST_RAW = f"(1 + ({_TK}*{_TK}*7 + {_TK}*41) % 2000)"
_SS_ITEM_RAW = f"(1 + ({_TK}*{_TK}*11 + {_TK}*37 + (id % 4)*499) % 2000)"
_SS_STORE_RAW = "(1 + (" + _TK + "*59) % 12)"

# Date-sk anchors (all constants are offsets from d_date_sk 2450815 =
# 1998-01-01): April 2000 = 2451636..2451665, April 1999 = 2451270..,
# Feb 2000 = 2451576..2451604, Dec 1998 = 2451149.., Jan–Mar 1999 =
# 2451180..2451269. Returns land 1..60 days after the anchored sale, so
# q25's return window (moy 4..10 / 2000) and q29's (moy 4..7 / 1999)
# both hold by construction.
_FLOW_SS_DATE = {120: f"(2451636 + ({_K600}*7) % 30)",
                 420: f"(2451270 + ({_K600}*7) % 30)",
                 540: f"(2451545 + ({_K600}*7) % 90)"}
_FLOW_SR_DATE = {r: f"({d} + 1 + (id*3) % 60)" for r, d in _FLOW_SS_DATE.items()}
_FLOW_CS_DATE = {120: f"(2451676 + ({_K600}*11) % 120)",
                 420: f"(2451310 + ({_K600}*11) % 300)",
                 540: f"(2451640 + ({_K600}*11) % 150)"}
_Q23_DATE = f"(2451576 + ({_K600}*5) % 29)"
_Q54_CS_DATE = f"(2451149 + ({_K600}*7) % 31)"
_Q54_SS_DATE = f"(2451180 + ({_K600}*13) % 90)"
_Q23_CS_ITEM = f"(1991 + ({_K600} % 10))"
_Q54_CS_ITEM = f"(19 + 50*({_K600} % 40))"
# q83/q71 class-30 anchors: Dec 1999 sales (offsets 699..729), manager-1
# items, breakfast (7h) / dinner (18h) sold-times, returns on q83's
# three probe dates (offsets 545 / 604 / 686).
_MGR1_ITEM = f"(1 + 100*({_K600} % 20))"
_DEC99_DATE = f"(2451514 + ({_K600}*7) % 31)"
_MEAL_TIME = f"(CASE WHEN {_K600} % 2 = 0 THEN 25200 ELSE 64800 END + id % 3600)"
_Q83_RET_DATE = "(2450815 + " + _pick_int(f"{_K600} % 3", [545, 604, 686]) + ")"

# November probes: Nov 1998 = offsets 304..333, Nov 1999 = 669..698,
# Nov 2000 = 1035..1064 (all 2450815-based date_sks).
_NOV_DATE = (f"CASE {_K600} % 3 WHEN 0 THEN 2451119 + ({_K600}*7) % 30 "
             f"WHEN 1 THEN 2451484 + ({_K600}*7) % 30 "
             f"ELSE 2451850 + ({_K600}*7) % 30 END")
_NOV_ITEM = (f"CASE {_K600} % 3 "
             f"WHEN 0 THEN 40 + 100*(CAST(FLOOR(id/1800) AS BIGINT) % 20) "
             f"WHEN 1 THEN 80 + 100*(CAST(FLOOR(id/1800) AS BIGINT) % 20) "
             f"ELSE CASE WHEN {_K600} % 2 = 0 THEN 558 ELSE 1558 END END")
_Q54_CUST = _pick_int(f"{_K600} % 8", _Q54_CUSTOMER_SKS)
_Q23_CUST = _pick_int(f"{_K600} % 4", _Q23_CUSTOMER_SKS)
# Q3 2000 = offsets 912..1003 (92 days). Residue 94 alone closed the
# wg23-vs-sg23 leg at sf0.01 but not at sf0.001 (3 anchored ids against
# ~15 natural Walker Q3 rows left wg23 1.17 vs sg23 1.52), so the family
# is widened to {94, 154, 214, 274, 334} — same Walker-county addresses,
# same Q3 window; the bump fraction stays SF-independent, it is just 5x
# the mass (sf0.001 needs W3 +18% past the sg23 bar; five residues give
# ~+45%, a margin that survives the per-id money variance).
_Q31_RES = (94, 154, 214, 274, 334)
_Q31_WS_DATE = f"(2451727 + ({_K600}*7) % 92)"
_Q31_WS_ADDR = f"(5 + 5*({_K600} % 1000))"

# ---------------------------------------------------------------------------
# The year-over-year family (q4/q11/q74 growth joins, q78's never-returned
# cross-channel triple, q14b's same-week-both-years gate, q46's
# away-from-home weekend walk): five residues A..E = 151/211/271/331/391
# (151 + 60j, all ≡ 1 mod 30, so none has a store/catalog/web return —
# q78's anti-join sides stay NULL by construction). Every class id is one
# sale of item 705 by customer 777 in each channel; the YEAR each channel
# books it follows nested set-dominance
#     ss00 = {B,E} ⊂ ws00 = {B,C,E} ⊂ cs00 = {B,C,D,E}
#     cs99 = {A}   ⊂ ws99 = {A,D}   ⊂ ss99 = {A,C,D}
# which makes catalog growth > web growth > store growth ALGEBRAICALLY —
# each numerator gains a positive term and each denominator loses one, so
# q4/q11/q74's strict ratio comparisons hold for ANY positive money values
# at ANY scale factor (the money columns are the shared per-id formulas).
# The ss dates are pinned to the two q14b probe weeks — 1999-12-11
# (offset 709, a Saturday) and 2000-12-10 (offset 1074, a Sunday) — so the
# item-705 brand group clears q14b's average-sales HAVING in both weeks,
# and both dates satisfy q46's weekend filter; store 1 (Midway),
# hdemo 5 (hd_dep_count = 4) and addr 2 (Riverside ≠ customer 777's
# current Midway) complete q46's chain. ws years use October, cs July
# (away from the Nov/Dec/Feb/April windows other classes probe).
_YOY_RES = (151, 211, 271, 331, 391)  # A B C D E
_YOY_SS_DATE = {151: "2451524", 271: "2451524", 331: "2451524",  # 1999-12-11
                211: "2451889", 391: "2451889"}                  # 2000-12-10
_YOY_WS_DATE = {151: f"(2451453 + ({_K600}*3) % 30)",   # Oct 1999: A, D
                331: f"(2451453 + ({_K600}*3) % 30)",
                211: f"(2451819 + ({_K600}*3) % 30)",   # Oct 2000: B, C, E
                271: f"(2451819 + ({_K600}*3) % 30)",
                391: f"(2451819 + ({_K600}*3) % 30)"}
_YOY_CS_DATE = {151: f"(2451361 + ({_K600}*3) % 30)",   # Jul 1999: A
                211: f"(2451727 + ({_K600}*3) % 30)",   # Jul 2000: B, C, D, E
                271: f"(2451727 + ({_K600}*3) % 30)",
                331: f"(2451727 + ({_K600}*3) % 30)",
                391: f"(2451727 + ({_K600}*3) % 30)"}
_YOY_ITEM, _YOY_CUST = 705, 777

# q6 state anchor: residues 451/511/571 (same no-returns family) put six
# January-2001 (d_month_seq 1212) store sales of item 901 — price $72.01,
# 1.46x the Books category average, clearing the 1.2x gate — on customer
# 778, whose current address resolves to TN, so one state reaches the
# HAVING COUNT(*) >= 5 bar even at sf0.001.
_Q06_RES = (451, 511, 571)
_Q06_SS_DATE = f"(2451911 + ({_K600}*5) % 28)"
_Q06_ITEM, _Q06_CUST = 901, 778

# q64 item-flow: residue 33 (≡ 0 mod 3 ⇒ store_returns row exists; ∤5, ∤6)
# sells item 705 — i_color 'floral' in q64's list, i_current_price $34.77
# inside the 20..70 band — at store 1 in March 1999 (even k) and March
# 2000 (odd k), returned via the mirrored sr arm, by customer 779 whose
# ss_cdemo is pinned to sk 1 ('M') against current-demo 'S' for the
# marital-status inequality. Residue 205 (≡ 0 mod 5 ⇒ catalog_returns row)
# routes catalog sales of the same item through cs⋈cr so cs_ui's
# sale > 2x refund HAVING holds. Together the cross_sales self-join finds
# item 705 at store 1 in both years at every SF.
_Q64_SS_RES, _Q64_CR_RES = 33, 205
_Q64_SS_DATE = (f"CASE WHEN {_K600} % 2 = 0 THEN 2451239 + ({_K600}*3) % 28 "
                f"ELSE 2451605 + ({_K600}*3) % 28 END")
_Q64_CUST = 779

# q85 date pin (_Q85_WS_DATE_BASE): defined after the money formulas it
# references — see below, next to _Q85_CDEMO.


def _ladder(base: str, arms: list[tuple[int, str]]) -> str:
    """CASE ladder over id % 600 residue arms, falling back to base."""
    whens = " ".join(f"WHEN id % 600 = {r} THEN {v}" for r, v in arms)
    return f"CASE {whens} ELSE {base} END"


def _case(selector: str, values: list[str]) -> str:
    arms = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    return f"CASE {selector} {arms} END"


_D0 = "DATE '1998-01-01'"


def _render(expr, dialect: str) -> str:
    if isinstance(expr, tuple) and expr[0] == "@date":
        inner = f"CAST({expr[1]} AS INT)"
        if dialect == "spark":
            return f"date_add({_D0}, {inner})"
        return f"({_D0} + {inner})"
    return expr


# ---------------------------------------------------------------------------
# Table specs. Dimension sizes are SF-constant (like TPC-DS's static dims);
# the three fact tables have n = COUNT(orders) rows each.

_N_DAYS = 1826  # 1998-01-01 .. 2002-12-31
_N_ITEM = 2000
_N_STORE = 12
_N_CUST = 10_000
_N_ADDR = 5_000
_N_CDEMO = 7_200
_N_HDEMO = 720
_N_PROMO = 300
_N_TIME = 86_400
_N_WAREHOUSE = 5
_N_WEBPAGE = 60
_N_INCOME = 20
_N_REASON = 35
_N_SHIPMODE = 20
_N_WEBSITE = 8
_N_CALLCENTER = 6
_N_CATALOGPAGE = 120
_N_INV_WEEKS = 105  # weekly snapshots covering 1999-2000
_N_INV = _N_INV_WEEKS * _N_ITEM * _N_WAREHOUSE  # dense: 1,050,000

_CATEGORIES = [
    "Books", "Home", "Electronics", "Jewelry", "Sports",
    "Women", "Men", "Children", "Music", "Shoes",
]
_DAY_NAMES = [
    "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday",
]
_EDU = [
    "Primary", "Secondary", "College", "2 yr Degree", "4 yr Degree",
    "Advanced Degree", "Unknown",
]
_MARITAL = ["M", "S", "D", "W", "U"]
_CREDIT = ["Low Risk", "Good", "High Risk", "Unknown"]
_BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500", "Unknown"]
_CITIES = [
    "Midway", "Fairview", "Oakland", "Salem", "Georgetown", "Ashland",
    "Marion", "Riverside",
]
_STATES = ["TN", "SC", "CA", "WA", "TX", "GA", "OH", "NY", "VA"]

# 1998-01-01 is a Thursday; dow 0 = Sunday.
_DOW = "((id + 4) % 7)"
_DDATE = ("@date", "id")
_YEAR_S = f"year(date_add({_D0}, CAST(id AS INT)))"
_YEAR_D = f"year({_D0} + CAST(id AS INT))"


def _date_dim(dialect):
    yr = _YEAR_S if dialect == "spark" else _YEAR_D
    mo = yr.replace("year(", "month(", 1)
    dom = yr.replace("year(", "day(", 1)
    qoy = yr.replace("year(", "quarter(", 1)
    return [
        ("d_date_sk", _int("2450815 + id")),
        ("d_date", _DDATE),
        ("d_year", _int(yr)),
        ("d_moy", _int(mo)),
        ("d_dom", _int(dom)),
        ("d_qoy", _int(qoy)),
        ("d_dow", _int(_DOW)),
        ("d_day_name", _case(_DOW, _DAY_NAMES)),
        ("d_month_seq", _int(f"1176 + ({yr} - 1998)*12 + {mo} - 1")),
        ("d_week_seq", _int("5270 + CAST(FLOOR((id + 4)/7) AS INT)")),
        ("d_quarter_name", f"CAST({yr} AS STRING) || 'Q' || CAST({qoy} AS STRING)"),
    ]


_QTY = _mix(17, 100)  # 1..100
_WHOLESALE_C = f"(100 + (id*23) % 9900)"  # cents 1.00..99.99
_LIST_C = f"(200 + (id*29) % 19800)"  # 2.00..199.99
_SALES_C = f"(100 + (id*31) % 19900)"  # 1.00..199.99
_COUPON_C = f"(CASE WHEN (id*67) % 10 = 0 THEN (id*71) % 5000 ELSE 0 END)"
_TAX_C = f"(((({_SALES_C}) * ({_QTY})) * 8) / 100)"  # 8% of ext sales, int cents
_DISC_C = f"(CASE WHEN (id*73) % 5 = 0 THEN ((({_LIST_C}) - ({_SALES_C})) * ({_QTY})) ELSE 0 END)"
# net_profit in integer cents (= _sales_money's net_paid - ext_wholesale
# for the same id) — reused by web_returns' q85 band correlation.
_PROFIT_C = f"(((({_SALES_C}) * ({_QTY})) - ({_COUPON_C})) - (({_WHOLESALE_C}) * ({_QTY})))"
# q85 demo targeting: the cdemo sk whose (marital, education) block
# matches the sale's price band; ELSE arm = the historical mixer.
_Q85_CDEMO = (
    f"CASE WHEN ({_SALES_C}) BETWEEN 10000 AND 15000 THEN 51 + 70*((id*43) % 102) "
    f"WHEN ({_SALES_C}) >= 5000 AND ({_SALES_C}) < 10000 THEN 23 + 70*((id*43) % 102) "
    f"WHEN ({_SALES_C}) > 15000 THEN 37 + 70*((id*43) % 102) "
    "ELSE (1 + (CAST(FLOOR(id/3) AS BIGINT)*43) % 7200) END"
)

# q85 date pin: any web sale whose shared money formulas already land in
# one of q85's (sales_price, net_profit) band pairs — and whose id is in
# web_returns' 1-in-6 subset — is booked in October 2000, so the d_year =
# 2000 slice always contains band-qualified returns (the wr-side demo and
# address targeting key off the same band expressions, making the match
# exact). Natural band hits exist at every SF (4 at sf0.001) but their
# uniform dates put ~1/5 in 2000 — rounding to zero at small SF.
_Q85_WS_DATE_BASE = (
    f"CASE WHEN id % 6 = 0 AND ({_SALES_C}) BETWEEN 5000 AND 20000 "
    f"AND ({_PROFIT_C}) BETWEEN 5000 AND 25000 "
    f"THEN 2451819 + (id*3) % 30 ELSE {{base}} END"
)


def _sales_money(prefix: str) -> list[tuple[str, str]]:
    """Shared money columns for the three fact tables (integer-cents
    composition keeps every derived column exactly 2-decimal)."""
    ext_sales = f"(({_SALES_C}) * ({_QTY}))"
    ext_list = f"(({_LIST_C}) * ({_QTY}))"
    ext_wholesale = f"(({_WHOLESALE_C}) * ({_QTY}))"
    net_paid = f"({ext_sales} - ({_COUPON_C}))"
    net_profit = f"({net_paid} - {ext_wholesale})"
    p = prefix
    return [
        (f"{p}_quantity", _int(_QTY)),
        (f"{p}_wholesale_cost", _cents(_WHOLESALE_C)),
        (f"{p}_list_price", _cents(_LIST_C)),
        (f"{p}_sales_price", _cents(_SALES_C)),
        (f"{p}_ext_discount_amt", _cents(_DISC_C)),
        (f"{p}_ext_sales_price", _cents(ext_sales)),
        (f"{p}_ext_wholesale_cost", _cents(ext_wholesale)),
        (f"{p}_ext_list_price", _cents(ext_list)),
        (f"{p}_ext_tax", _cents(_TAX_C)),
        (f"{p}_coupon_amt", _cents(_COUPON_C)),
        (f"{p}_net_paid", _cents(net_paid)),
        (f"{p}_net_profit", _cents(net_profit)),
    ]


def _specs(dialect: str) -> dict[str, tuple]:
    """{table: (n_rows | None for fact-sized, [(col, expr), ...]) or
    (None, cols, where) — a fact-sized id stream filtered by ``where``
    (store_returns: the returned subset of store_sales' id space, so
    return rows join back to their sale by construction)."""
    return {
        "date_dim": (_N_DAYS, _date_dim(dialect)),
        "time_dim": (
            _N_TIME,
            [
                ("t_time_sk", _int("id")),
                ("t_time", _int("id")),
                ("t_hour", _int("FLOOR(id/3600)")),
                ("t_minute", _int("FLOOR(id/60) % 60")),
                ("t_second", _int("id % 60")),
                ("t_meal_time", "CASE WHEN FLOOR(id/3600) BETWEEN 6 AND 8 THEN 'breakfast' WHEN FLOOR(id/3600) BETWEEN 17 AND 19 THEN 'dinner' ELSE NULL END"),
            ],
        ),
        "item": (
            _N_ITEM,
            [
                ("i_item_sk", _int("1 + id")),
                # item_id is NOT unique (SCD: ~2 sks per id), like TPC-DS
                ("i_item_id", f"'ITEM' || lpad(CAST({_mix(1, 1000)} AS STRING), 8, '0')"),
                ("i_item_desc", f"'Description ' || CAST(id % 997 AS STRING)"),
                ("i_current_price", _cents("(1 + (id*19) % 9900)")),
                ("i_wholesale_cost", _cents("(1 + (id*23) % 6600)")),
                ("i_brand_id", _int(_mix(7, 60))),
                ("i_brand", f"'Brand#' || CAST({_mix(7, 60)} AS STRING)"),
                ("i_class_id", _int(_mix(3, 50))),
                ("i_class", f"'class' || CAST({_mix(3, 50)} AS STRING)"),
                ("i_category_id", _int(_mix(1, 10))),
                ("i_category", _case(f"(id % 10)", _CATEGORIES)),
                ("i_manufact_id", _int(_mix(11, 1000))),
                ("i_manufact", f"'Mfg#' || CAST({_mix(11, 1000)} AS STRING)"),
                ("i_manager_id", _int(_mix(13, 100))),
                ("i_size", _case("((id*29) % 7)", ["petite", "small", "medium", "large", "extra large", "economy", "N/A"])),
                ("i_units", _case("((id*31) % 6)", ["Each", "Dozen", "Case", "Pallet", "Gross", "Box"])),
                ("i_color", _case("((id*23) % 12)", ["purple", "burlywood", "indian", "spring", "floral", "medium", "almond", "azure", "beige", "chartreuse", "cream", "dim"])),
                ("i_product_name", "'Product ' || CAST(1 + id AS STRING)"),
            ],
        ),
        "store": (
            _N_STORE,
            [
                ("s_store_sk", _int("1 + id")),
                ("s_store_id", "'STORE' || lpad(CAST(1 + id AS STRING), 4, '0')"),
                ("s_store_name", "'Store ' || CAST(1 + id AS STRING)"),
                # q24 (s_market_id's only consumer) probes market 8
                # through a 1/12 zip-match and a 1/12 color slice; one
                # market-8 store left ~0.7 expected rows at sf0.01, so
                # every third store is market 8 (ids 0,3,6,9).
                ("s_market_id", _int("CASE WHEN id % 3 = 0 THEN 8 ELSE 1 + id % 10 END")),
                ("s_company_name", "'Company ' || CAST(1 + id % 2 AS STRING)"),
                ("s_number_employees", _int("200 + id*7")),
                ("s_floor_space", _int("5000000 + id*250000")),
                ("s_city", _case("(id % 4)", _CITIES[:4])),
                ("s_county", _case("(id % 3)", ["Williamson County", "Ziebach County", "Walker County"])),
                ("s_state", _case("(id % 5)", _STATES[:5])),
                ("s_zip", "CAST(10000 + id*37 AS STRING)"),
                ("s_gmt_offset", "CAST(CASE WHEN id % 2 = 0 THEN -5 ELSE -6 END AS DECIMAL(5,2))"),
            ],
        ),
        "customer": (
            _N_CUST,
            [
                ("c_customer_sk", _int("1 + id")),
                ("c_customer_id", "'CUST' || lpad(CAST(1 + id AS STRING), 10, '0')"),
                ("c_salutation", _case("(id % 6)", ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"])),
                ("c_first_name", f"'First' || CAST({_mix(3, 500)} AS STRING)"),
                ("c_last_name", f"'Last' || CAST({_mix(7, 750)} AS STRING)"),
                ("c_preferred_cust_flag", "CASE WHEN (id*11) % 3 = 0 THEN 'N' ELSE 'Y' END"),
                ("c_current_addr_sk", _int(_mix(23, _N_ADDR))),
                ("c_current_cdemo_sk", _int(_mix(29, _N_CDEMO))),
                ("c_current_hdemo_sk", _int(_mix(31, _N_HDEMO))),
                ("c_first_sales_date_sk", _int("2450815 + (id*17) % 1826")),
                ("c_first_shipto_date_sk", _int("2450815 + (id*19) % 1826")),
                ("c_login", "'login' || CAST(1 + id AS STRING)"),
                ("c_email_address", "'c' || CAST(1 + id AS STRING) || '@example.com'"),
                ("c_birth_month", _int(_mix(5, 12))),
                ("c_birth_year", _int("1950 + (id*7) % 45")),
                ("c_birth_country", _case("((id*13) % 6)", ["UNITED STATES", "CANADA", "MEXICO", "GERMANY", "JAPAN", "BRAZIL"])),
            ],
        ),
        "customer_address": (
            _N_ADDR,
            [
                ("ca_address_sk", _int("1 + id")),
                ("ca_street_number", "CAST(1 + (id*13) % 999 AS STRING)"),
                ("ca_street_name", "'Street ' || CAST(1 + (id*11) % 200 AS STRING)"),
                ("ca_city", _case("((id*7) % 8)", _CITIES)),
                ("ca_county", _case("((id*3) % 5)", ["Williamson County", "Ziebach County", "Walker County", "Luce County", "Dauphin County"])),
                ("ca_state", _case("((id*11) % 9)", _STATES)),
                # 444 = 12*37: the zip domain is exactly the 12 store
                # zips (10000 + 37k), so q24's s_zip = ca_zip correlated
                # join matches 1-in-12 instead of 1-in-500. q8/q15/q45's
                # literal zip lists are 37-step members of this domain;
                # q19's <> predicate still keeps 11/12.
                ("ca_zip", "CAST(10000 + (id*37) % 444 AS STRING)"),
                ("ca_country", "'United States'"),
                # floor(id/3), not raw id: gmt must be parity-decoupled
                # from the demo mixers — with `-5 - (id % 4)`, gmt = -7
                # forced an even customer id while hd_buy_potential =
                # 'Unknown' forced an odd one, so q91's filter chain was
                # structurally empty (no customer could ever qualify).
                ("ca_gmt_offset", "CAST(-5 - (CAST(FLOOR(id/2) AS BIGINT) % 4) AS DECIMAL(5,2))"),
            ],
        ),
        "customer_demographics": (
            _N_CDEMO,
            [
                ("cd_demo_sk", _int("1 + id")),
                ("cd_gender", "CASE WHEN id % 2 = 0 THEN 'M' ELSE 'F' END"),
                ("cd_marital_status", _case("CAST(FLOOR(id/2) AS INT) % 5", _MARITAL)),
                ("cd_education_status", _case("CAST(FLOOR(id/10) AS INT) % 7", _EDU)),
                ("cd_purchase_estimate", _int(f"500 * {_mix(7, 20)}")),
                ("cd_credit_rating", _case("((id*11) % 4)", _CREDIT)),
                ("cd_dep_count", _int("(id*13) % 7")),
                ("cd_dep_employed_count", _int("(id*17) % 7")),
                ("cd_dep_college_count", _int("(id*19) % 7")),
            ],
        ),
        "household_demographics": (
            _N_HDEMO,
            [
                ("hd_demo_sk", _int("1 + id")),
                ("hd_income_band_sk", _int(_mix(1, 20))),
                ("hd_buy_potential", _case("((id*7) % 6)", _BUY_POTENTIAL)),
                ("hd_dep_count", _int("id % 10")),
                ("hd_vehicle_count", _int("(id*3) % 5")),
            ],
        ),
        "promotion": (
            _N_PROMO,
            [
                ("p_promo_sk", _int("1 + id")),
                ("p_promo_id", "'PROMO' || lpad(CAST(1 + id AS STRING), 6, '0')"),
                ("p_channel_dmail", "CASE WHEN id % 2 = 0 THEN 'Y' ELSE 'N' END"),
                ("p_channel_email", "CASE WHEN CAST(FLOOR(id/2) AS INT) % 2 = 0 THEN 'Y' ELSE 'N' END"),
                ("p_channel_tv", "CASE WHEN CAST(FLOOR(id/4) AS INT) % 2 = 0 THEN 'Y' ELSE 'N' END"),
                ("p_channel_event", "CASE WHEN CAST(FLOOR(id/8) AS INT) % 2 = 0 THEN 'Y' ELSE 'N' END"),
            ],
        ),
        "store_sales": (
            None,
            [
                ("ss_sold_date_sk", _q58_anchored(_ladder(
                    _nullable(_int(f"2450815 + (CAST(FLOOR(id/4) AS BIGINT)*131) % {_N_DAYS}"), 97),
                    [(120, _int(_FLOW_SS_DATE[120])), (420, _int(_FLOW_SS_DATE[420])),
                     (540, _int(_FLOW_SS_DATE[540])),
                     (266, _int(_NOV_DATE)), (30, _int(_DEC99_DATE)),
                     (317, _int(_Q54_SS_DATE))]
                    + [(r, _int(_YOY_SS_DATE[r])) for r in _YOY_RES]
                    + [(r, _int(_Q06_SS_DATE)) for r in _Q06_RES]
                    + [(_Q64_SS_RES, _int(_Q64_SS_DATE))]), _Q58_DATE)),
                ("ss_sold_time_sk", _ladder(
                    _int("(CAST(FLOOR(id/4) AS BIGINT)*7919) % 86400"),
                    [(30, _int(_MEAL_TIME))])),
                ("ss_item_sk", _q58_anchored(_ladder(
                    _int(_SS_ITEM_RAW),
                    [(266, _int(_NOV_ITEM)), (30, _int(_MGR1_ITEM))]
                    + [(r, str(_YOY_ITEM)) for r in _YOY_RES]
                    + [(r, str(_Q06_ITEM)) for r in _Q06_RES]
                    + [(_Q64_SS_RES, str(_YOY_ITEM))]), _Q58_ITEM)),
                ("ss_customer_sk", _ladder(
                    _nullable(_int(_SS_CUST_RAW), 89, mult=11),
                    [(120, _int(_SS_CUST_RAW)), (420, _int(_SS_CUST_RAW)),
                     (540, _int(_SS_CUST_RAW)), (266, _int(_SS_CUST_RAW)),
                     (317, _int(_Q54_CUST))]
                    + [(r, str(_YOY_CUST)) for r in _YOY_RES]
                    + [(r, str(_Q06_CUST)) for r in _Q06_RES]
                    + [(_Q64_SS_RES, str(_Q64_CUST))])),
                ("ss_cdemo_sk", _ladder(
                    _int("(1 + (CAST(FLOOR(id/4) AS BIGINT)*43) % " + str(_N_CDEMO) + ")"),
                    [(_Q64_SS_RES, "1")])),
                ("ss_hdemo_sk", _ladder(
                    _int("(1 + (CAST(FLOOR(id/4) AS BIGINT)*47) % " + str(_N_HDEMO) + ")"),
                    [(r, "5") for r in _YOY_RES])),
                ("ss_addr_sk", _ladder(
                    _int("(1 + (CAST(FLOOR(id/4) AS BIGINT)*53) % " + str(_N_ADDR) + ")"),
                    [(r, "2") for r in _YOY_RES])),
                ("ss_store_sk", _ladder(
                    _nullable(_int(_SS_STORE_RAW), 101, mult=13),
                    [(120, _int(_SS_STORE_RAW)), (420, _int(_SS_STORE_RAW)),
                     (540, _int(_SS_STORE_RAW)), (266, _int(_SS_STORE_RAW))]
                    + [(r, "1") for r in _YOY_RES]
                    + [(_Q64_SS_RES, "1")])),
                ("ss_promo_sk", _int(_mix(61, _N_PROMO))),
                ("ss_ticket_number", "CAST(1 + FLOOR(id/4) AS BIGINT)"),
            ]
            + _sales_money("ss"),
        ),
        "web_sales": (
            None,
            [
                ("ws_sold_date_sk", _q58_anchored(_ladder(
                    _int(_Q85_WS_DATE_BASE.format(
                        base=_nullable(f"2450815 + (id*139) % {_N_DAYS}", 89))),
                    [(r, _int(_Q31_WS_DATE)) for r in _Q31_RES]
                    + [(30, _int(_DEC99_DATE))]
                    + [(r, _int(_YOY_WS_DATE[r])) for r in _YOY_RES]), _Q58_DATE)),
                ("ws_sold_time_sk", _ladder(
                    _int("(id*7877) % 86400"),
                    [(30, _int(_MEAL_TIME))])),
                ("ws_item_sk", _q58_anchored(_ladder(
                    _int(_mix(149, _N_ITEM)),
                    [(30, _int(_MGR1_ITEM))]
                    + [(r, str(_YOY_ITEM)) for r in _YOY_RES]), _Q58_ITEM)),
                ("ws_bill_customer_sk", _ladder(
                    _nullable(_int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*CAST(FLOOR(id/3) AS BIGINT)*11 + CAST(FLOOR(id/3) AS BIGINT)*151) % 2000)"), 83, mult=11),
                    [(r, str(_YOY_CUST)) for r in _YOY_RES])),
                ("ws_ship_customer_sk", _int(_mix(157, _N_CUST))),
                ("ws_bill_addr_sk", _ladder(
                    _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*223) % " + str(_N_ADDR) + ")"),
                    [(r, _int(_Q31_WS_ADDR)) for r in _Q31_RES])),
                ("ws_ship_addr_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*229) % " + str(_N_ADDR) + ")")),
                ("ws_ship_date_sk", _int(f"2450815 + ((CAST(FLOOR(id/3) AS BIGINT)*139) % {_N_DAYS} + 1 + (id*5) % 60) % {_N_DAYS}")),
                ("ws_warehouse_sk", _int(_mix(7, _N_WAREHOUSE))),
                ("ws_ship_mode_sk", _int(_mix(11, _N_SHIPMODE))),
                ("ws_web_site_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*233) % " + str(_N_WEBSITE) + ")")),
                ("ws_ext_ship_cost", _cents("(50 + (id*37) % 4950)")),
                ("ws_ship_hdemo_sk", _int(_mix(193, _N_HDEMO))),
                ("ws_web_page_sk", _int(_mix(197, _N_WEBPAGE))),
                ("ws_promo_sk", _int(_mix(163, _N_PROMO))),
                ("ws_order_number", "CAST(1 + FLOOR(id/3) AS BIGINT)"),
            ]
            + _sales_money("ws"),
        ),
        "catalog_sales": (
            None,
            [
                ("cs_sold_date_sk", _q58_anchored(_ladder(
                    _nullable(_int(f"2450815 + (id*127) % {_N_DAYS}"), 93),
                    [(120, _int(_FLOW_CS_DATE[120])), (420, _int(_FLOW_CS_DATE[420])),
                     (540, _int(_FLOW_CS_DATE[540])), (30, _int(_DEC99_DATE)),
                     (253, _int(_Q23_DATE)), (91, _int(_Q54_CS_DATE))]
                    + [(r, _int(_YOY_CS_DATE[r])) for r in _YOY_RES]), _Q58_DATE)),
                ("cs_sold_time_sk", _ladder(
                    _int("(id*7873) % 86400"),
                    [(30, _int(_MEAL_TIME))])),
                ("cs_item_sk", _q58_anchored(_ladder(
                    _int(_mix(167, _N_ITEM)),
                    [(120, _int(_SS_ITEM_RAW)), (420, _int(_SS_ITEM_RAW)),
                     (540, _int(_SS_ITEM_RAW)), (30, _int(_MGR1_ITEM)),
                     (253, _int(_Q23_CS_ITEM)), (91, _int(_Q54_CS_ITEM))]
                    + [(r, str(_YOY_ITEM)) for r in _YOY_RES]
                    + [(_Q64_CR_RES, str(_YOY_ITEM))]), _Q58_ITEM)),
                ("cs_bill_customer_sk", _ladder(
                    _nullable(_int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*CAST(FLOOR(id/3) AS BIGINT)*13 + CAST(FLOOR(id/3) AS BIGINT)*173) % 2000)"), 87, mult=11),
                    [(120, _int(_SS_CUST_RAW)), (420, _int(_SS_CUST_RAW)),
                     (540, _int(_SS_CUST_RAW)),
                     (253, _int(_Q23_CUST)), (91, _int(_Q54_CUST))]
                    + [(r, str(_YOY_CUST)) for r in _YOY_RES])),
                ("cs_bill_cdemo_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*179) % " + str(_N_CDEMO) + ")")),
                ("cs_bill_hdemo_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*251) % " + str(_N_HDEMO) + ")")),
                ("cs_ship_customer_sk", _int(_mix(181, _N_CUST))),
                ("cs_bill_addr_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*227) % " + str(_N_ADDR) + ")")),
                ("cs_ship_addr_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*239) % " + str(_N_ADDR) + ")")),
                ("cs_ship_date_sk", _int(f"2450815 + ((CAST(FLOOR(id/3) AS BIGINT)*127) % {_N_DAYS} + 1 + (id*5) % 60) % {_N_DAYS}")),
                ("cs_warehouse_sk", _int(_mix(13, _N_WAREHOUSE))),
                ("cs_ship_mode_sk", _int(_mix(17, _N_SHIPMODE))),
                ("cs_call_center_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*241) % " + str(_N_CALLCENTER) + ")")),
                ("cs_catalog_page_sk", _int(_mix(29, _N_CATALOGPAGE))),
                ("cs_ext_ship_cost", _cents("(50 + (id*41) % 4950)")),
                ("cs_promo_sk", _int(_mix(191, _N_PROMO))),
                ("cs_order_number", "CAST(1 + FLOOR(id/3) AS BIGINT)"),
            ]
            + _sales_money("cs"),
        ),
        # Inventory is DENSE like dsdgen's (one row per snapshot ×
        # item × warehouse), not fact-scaled: sparse random snapshots
        # left every (warehouse, item, month) group with ~0.5 rows, so
        # STDDEV_SAMP was NULL and q39's cov > 1 filter could never
        # fire. 105 weekly snapshots over 1999-2000 × 2000 items × 5
        # warehouses = 1.05M rows at every SF; each item staggers its
        # snapshot weekday by (item % 7) so dates cover all mod-7
        # classes (the refresh delta slices on inv_date_sk % 7).
        # Quantity is SPIKY — mostly 0..29 with a 1-in-9 restock burst
        # of 100..999 — so month groups containing a burst have
        # cov > 1 (q39a/b) while the 100..500 probe bands (q37/q82)
        # and the before/after ratio (q21) keep mass.
        "inventory": (
            _N_INV,
            [
                ("inv_date_sk", _int(f"{2450815 + 365} + 7*(id % {_N_INV_WEEKS}) + CAST(FLOOR(id/{_N_INV_WEEKS}) AS BIGINT) % 7")),
                ("inv_item_sk", _int(f"1 + CAST(FLOOR(id/{_N_INV_WEEKS}) AS BIGINT) % {_N_ITEM}")),
                ("inv_warehouse_sk", _int(f"1 + CAST(FLOOR(id/{_N_INV_WEEKS * _N_ITEM}) AS BIGINT) % {_N_WAREHOUSE}")),
                # Burst gate (id*37) % 97 < 11 ≈ 1-in-8.8 with period 97:
                # a fixed every-9th gate could never put bursts in BOTH
                # January and February (8 consecutive snapshots < 9), so
                # q39's month-paired cov join was structurally empty.
                ("inv_quantity_on_hand", _int("CASE WHEN (id*37) % 97 < 11 THEN 100 + (id*7) % 900 ELSE (id*3) % 30 END")),
            ],
        ),
        # The returned subset of store_sales' id space: every 13th sale,
        # so sr_item_sk/sr_ticket_number reuse the sale's own formulas
        # and return rows join back to their sale by construction.
        "store_returns": (
            None,
            [
                ("sr_returned_date_sk", _ladder(
                    _int(f"2450815 + ((CAST(FLOOR(id/4) AS BIGINT)*131) % {_N_DAYS} + 1 + (id*3) % 90) % {_N_DAYS}"),
                    [(120, _int(_FLOW_SR_DATE[120])), (420, _int(_FLOW_SR_DATE[420])),
                     (540, _int(_FLOW_SR_DATE[540])), (30, _int(_Q83_RET_DATE))])),
                ("sr_item_sk", _q58_anchored(_ladder(
                    _int(_SS_ITEM_RAW),
                    [(266, _int(_NOV_ITEM)), (30, _int(_MGR1_ITEM)),
                     (_Q64_SS_RES, str(_YOY_ITEM))]), _Q58_ITEM)),
                ("sr_customer_sk", _ladder(
                    _nullable(_int(_SS_CUST_RAW), 89, mult=11),
                    [(120, _int(_SS_CUST_RAW)), (420, _int(_SS_CUST_RAW)),
                     (540, _int(_SS_CUST_RAW))])),
                ("sr_cdemo_sk", _int("(1 + (CAST(FLOOR(id/4) AS BIGINT)*43) % " + str(_N_CDEMO) + ")")),
                ("sr_store_sk", _ladder(
                    _nullable(_int(_SS_STORE_RAW), 101, mult=13),
                    [(120, _int(_SS_STORE_RAW)), (420, _int(_SS_STORE_RAW)),
                     (540, _int(_SS_STORE_RAW)), (266, _int(_SS_STORE_RAW))])),
                ("sr_reason_sk", _int(_mix(23, _N_REASON))),
                ("sr_ticket_number", "CAST(1 + FLOOR(id/4) AS BIGINT)"),
                ("sr_return_quantity", f"CAST(1 + (id*5) % (1 + (id*17) % 100) AS INT)"),
                ("sr_return_amt", _cents(f"(({_SALES_C}) * (1 + (id*5) % (1 + (id*17) % 100)))")),
                ("sr_net_loss", _cents("(50 + (id*19) % 4950)")),
            ],
            "id % 3 = 0",
        ),
        # Returned subset of catalog_sales' id space (1-in-5 orders)
        "catalog_returns": (
            None,
            [
                # Item/customer mirrors for the flow classes (120/420 are
                # ≡ 0 mod 5, so every flow order also has a cr row) keep
                # the cr→cs join-back invariant on anchored ids.
                ("cr_item_sk", _q58_anchored(_ladder(
                    _int(_mix(167, _N_ITEM)),
                    [(120, _int(_SS_ITEM_RAW)), (420, _int(_SS_ITEM_RAW)),
                     (540, _int(_SS_ITEM_RAW)), (30, _int(_MGR1_ITEM)),
                     (_Q64_CR_RES, str(_YOY_ITEM))]), _Q58_ITEM)),
                ("cr_order_number", "CAST(1 + FLOOR(id/3) AS BIGINT)"),
                # 1-in-61 returns are seasonal: November 1998 (date_sk
                # 2451119..2451148), from the _Q91_CUSTOMER_SKS pool.
                ("cr_returned_date_sk", _ladder(
                    _int(f"CASE WHEN id % 61 = 0 THEN 2451119 + (id*7) % 30 ELSE 2450815 + ((CAST(FLOOR(id/3) AS BIGINT)*127) % {{_N_DAYS}} + 1 + (id*7) % 90) % {{_N_DAYS}} END".format(_N_DAYS=1826)),
                    [(30, _int(_Q83_RET_DATE))])),
                ("cr_catalog_page_sk", _int(_mix(29, _N_CATALOGPAGE))),
                ("cr_call_center_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*241) % " + str(_N_CALLCENTER) + ")")),
                ("cr_returning_customer_sk", "CASE WHEN id % 61 = 0 THEN " + _int(_pick_int("CAST(FLOOR(id/61) AS BIGINT) % 25", _Q91_CUSTOMER_SKS)) + " ELSE " + _ladder(
                    _nullable(_int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*CAST(FLOOR(id/3) AS BIGINT)*13 + CAST(FLOOR(id/3) AS BIGINT)*173) % 2000)"), 87, mult=11),
                    [(120, _int(_SS_CUST_RAW)), (420, _int(_SS_CUST_RAW)),
                     (540, _int(_SS_CUST_RAW))]) + " END"),
                ("cr_return_quantity", f"CAST(1 + (id*7) % (1 + (id*17) % 100) AS INT)"),
                ("cr_returning_addr_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*239) % " + str(_N_ADDR) + ")")),
                ("cr_return_amount", _cents("((id*43) % 9900)")),
                ("cr_net_loss", _cents("(50 + (id*23) % 4950)")),
                ("cr_refunded_cash", _cents("(100 + (id*7) % 2900)")),
                ("cr_reversed_charge", _cents("((id*11) % 1500)")),
                ("cr_store_credit", _cents("((id*13) % 1000)")),
            ],
            "id % 5 = 0",
        ),
        # Returned subset of web_sales' id space (1-in-6 orders)
        "web_returns": (
            None,
            [
                ("wr_item_sk", _q58_anchored(_ladder(
                    _int(_mix(149, _N_ITEM)),
                    [(30, _int(_MGR1_ITEM))]), _Q58_ITEM)),
                ("wr_order_number", "CAST(1 + FLOOR(id/3) AS BIGINT)"),
                ("wr_return_quantity", f"CAST(1 + (id*7) % (1 + (id*17) % 100) AS INT)"),
                ("wr_reason_sk", _int(_mix(31, _N_REASON))),
                ("wr_refunded_cash", _cents("(100 + (id*13) % 2900)")),
                ("wr_fee", _cents("(10 + (id*17) % 990)")),
                # wr_refunded/returning_cdemo_sk and wr_refunded_addr_sk
                # are q85-exclusive FKs, and q85's predicate is two
                # independent disjunct-conjuncts: (price-band_k AND both
                # demos = pair_k) AND (state-list_j AND profit-band_j).
                # Independent mixers made the dual-demo match ~1/1225 —
                # structurally zero rows. Instead, refunds are
                # demographically targeted: the refunded cdemo lands in
                # the 70-period (marital, education) block matching the
                # sale's own price band (sk 51/23/37 + 70k → (M,
                # Advanced Degree)/(S, College)/(W, 2 yr Degree)), the
                # returner is the refunder, and the refund address'
                # state matches the sale's profit band (addr_id ≡ 0 mod
                # 9 → TN for profit 100..200, ≡ 4 mod 9 → VA for
                # 50..250). Same raw id ⇒ same money columns as the
                # joined web_sales row, so the correlation is exact.
                ("wr_refunded_cdemo_sk", _int(_Q85_CDEMO)),
                ("wr_returning_cdemo_sk", _int(_Q85_CDEMO)),
                ("wr_refunded_addr_sk", _int(
                    f"CASE WHEN ({_PROFIT_C}) BETWEEN 10000 AND 20000 THEN 1 + 9*((id*53) % 555) "
                    f"WHEN ({_PROFIT_C}) BETWEEN 5000 AND 25000 THEN 5 + 9*((id*53) % 555) "
                    "ELSE (1 + (CAST(FLOOR(id/3) AS BIGINT)*53) % " + str(_N_ADDR) + ") END")),
                ("wr_returning_customer_sk", _nullable(_int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*CAST(FLOOR(id/3) AS BIGINT)*11 + CAST(FLOOR(id/3) AS BIGINT)*151) % 2000)"), 83, mult=11)),
                ("wr_returning_addr_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*229) % " + str(_N_ADDR) + ")")),
                ("wr_returned_date_sk", _ladder(
                    _int(f"2450815 + ((CAST(FLOOR(id/3) AS BIGINT)*139) % {{_N_DAYS}} + 1 + (id*11) % 90) % {{_N_DAYS}}".format(_N_DAYS=1826)),
                    [(30, _int(_Q83_RET_DATE))])),
                ("wr_web_page_sk", _int("(1 + (CAST(FLOOR(id/3) AS BIGINT)*197) % " + str(_N_WEBPAGE) + ")")),
                ("wr_return_amt", _cents("((id*43) % 9900)")),
                ("wr_net_loss", _cents("(50 + (id*29) % 4950)")),
            ],
            "id % 6 = 0",
        ),
        "ship_mode": (
            _N_SHIPMODE,
            [
                ("sm_ship_mode_sk", _int("1 + id")),
                ("sm_ship_mode_id", "'SHIP' || lpad(CAST(1 + id AS STRING), 4, '0')"),
                ("sm_type", _case("(id % 5)", ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY"])),
                ("sm_code", _case("(id % 4)", ["AIR", "SURFACE", "SEA", "RAIL"])),
                ("sm_carrier", _case("(id % 6)", ["UPS", "FEDEX", "USPS", "DHL", "AIRBORNE", "TBS"])),
            ],
        ),
        "web_site": (
            _N_WEBSITE,
            [
                ("web_site_sk", _int("1 + id")),
                ("web_site_id", "'SITE' || lpad(CAST(1 + id AS STRING), 4, '0')"),
                ("web_name", "'site_' || CAST(id % 4 AS STRING)"),
                ("web_company_name", _case("(id % 3)", ["pri", "ese", "able"])),
            ],
        ),
        "call_center": (
            _N_CALLCENTER,
            [
                ("cc_call_center_sk", _int("1 + id")),
                ("cc_call_center_id", "'CC' || lpad(CAST(1 + id AS STRING), 4, '0')"),
                ("cc_name", "'Call Center ' || CAST(1 + id AS STRING)"),
                ("cc_county", _case("(id % 3)", ["Williamson County", "Ziebach County", "Walker County"])),
                ("cc_manager", "'Manager ' || CAST(1 + (id*7) % 20 AS STRING)"),
            ],
        ),
        "catalog_page": (
            _N_CATALOGPAGE,
            [
                ("cp_catalog_page_sk", _int("1 + id")),
                ("cp_catalog_page_id", "'PAGE' || lpad(CAST(1 + id AS STRING), 6, '0')"),
                ("cp_catalog_number", _int("1 + (id*3) % 10")),
                ("cp_catalog_page_number", _int("1 + id % 100")),
                ("cp_type", _case("(id % 3)", ["bi-annual", "quarterly", "monthly"])),
            ],
        ),
        "dbgen_version": (
            1,
            [
                ("dv_version", "'lhbench-spark-tpcds-gen 1.0'"),
                ("dv_create_date", ("@date", "0")),
                ("dv_create_time", "'00:00:00'"),
                ("dv_cmdline_args", "'deterministic dual-dialect spec'"),
            ],
        ),
        "warehouse": (
            _N_WAREHOUSE,
            [
                ("w_warehouse_sk", _int("1 + id")),
                ("w_warehouse_name", "'Warehouse ' || CAST(1 + id AS STRING)"),
                ("w_warehouse_sq_ft", _int("100000 + id*50000")),
                ("w_city", _case("(id % 4)", _CITIES[:4])),
                ("w_county", _case("(id % 3)", ["Williamson County", "Ziebach County", "Walker County"])),
                ("w_state", _case("(id % 5)", _STATES[:5])),
                ("w_country", "'United States'"),
            ],
        ),
        "web_page": (
            _N_WEBPAGE,
            [
                ("wp_web_page_sk", _int("1 + id")),
                ("wp_web_page_id", "'PAGE' || lpad(CAST(1 + id AS STRING), 4, '0')"),
                ("wp_char_count", _int("2500 + (id*131) % 5000")),
                ("wp_link_count", _int("2 + (id*3) % 25")),
                ("wp_autogen_flag", "CASE WHEN id % 3 = 0 THEN 'Y' ELSE 'N' END"),
            ],
        ),
        "income_band": (
            _N_INCOME,
            [
                ("ib_income_band_sk", _int("1 + id")),
                ("ib_lower_bound", _int("id * 10000")),
                ("ib_upper_bound", _int("(id + 1) * 10000")),
            ],
        ),
        "reason": (
            _N_REASON,
            [
                ("r_reason_sk", _int("1 + id")),
                ("r_reason_id", "'REASON' || lpad(CAST(1 + id AS STRING), 4, '0')"),
                ("r_reason_desc", "'reason ' || CAST(1 + id AS STRING)"),
            ],
        ),
    }


TPCDS_GEN_TABLES = tuple(_specs("spark").keys())


# ---------------------------------------------------------------------------
# Spark side: generate → parquet (once per process+sf_dir) → temp views.

_MATERIALIZED: dict[str, str] = {}


def _fact_rows(spark: SparkSession, sf_dir: str) -> int:
    from lhbench_spark.catalog import table

    return table(spark, sf_dir, "orders").count()


def generate_frame(spark: SparkSession, name: str, n_fact: int) -> DataFrame:
    spec = _specs("spark")[name]
    n, cols = spec[0], spec[1]
    where = spec[2] if len(spec) > 2 else None
    df = spark.range(n if n is not None else n_fact)
    if where:
        df = df.where(where)
    exprs = [f"{_render(e, 'spark')} AS {c}" for c, e in cols]
    return df.selectExpr(*exprs)


def materialize(spark: SparkSession, sf_dir: str) -> str:
    """Write all generated tables as parquet once per (process, sf_dir);
    returns the directory. Facts get a handful of files so scans
    parallelize; dims one file each."""
    key = os.path.abspath(sf_dir)
    if key in _MATERIALIZED:
        return _MATERIALIZED[key]
    out = tempfile.mkdtemp(prefix="lhbench_tpcds_")
    n_fact = _fact_rows(spark, sf_dir)
    for name in TPCDS_GEN_TABLES:
        df = generate_frame(spark, name, n_fact)
        n = _specs("spark")[name][0]
        rows = n if n is not None else n_fact
        files = 1 if rows <= 100_000 else max(4, min(32, rows // 50_000 + 1))
        df.repartition(files).write.mode("overwrite").parquet(f"{out}/{name}")
    _MATERIALIZED[key] = out
    return out


# Daily-partitioned store_sales slice for the DPP query: the reference's
# fact tables are Hive-partitioned on their date surrogate key
# (TPCDSDataLoad.scala:676-702 `PARTITIONED BY (ss_sold_date_sk)`), the
# layout dynamic partition pruning exists for. A 90-day slice (90 daily
# partition dirs) keeps the per-process write cheap at test SFs while
# exercising the exact production layout.
DPP_SLICE_END_SK = 2450815 + 90

_MATERIALIZED_DPP: dict[str, str] = {}


def materialize_partitioned_store_sales(spark: SparkSession, sf_dir: str) -> str:
    """store_sales rows with ss_sold_date_sk in the first 90 days,
    written PARTITIONED BY (ss_sold_date_sk); once per (process, sf_dir)."""
    key = os.path.abspath(sf_dir)
    if key in _MATERIALIZED_DPP:
        return _MATERIALIZED_DPP[key]
    out = tempfile.mkdtemp(prefix="lhbench_tpcds_dpp_")
    n_fact = _fact_rows(spark, sf_dir)
    # NULL partition keys are excluded explicitly, the reference loader's
    # rule for every partitioned table (TPCDSDataLoad.scala:104-107 adds
    # "WHERE <key> IS NOT NULL"): dsdgen emits null date FKs, and writing
    # them would create a __HIVE_DEFAULT_PARTITION__ no TPC-DS filter
    # ever prunes. (The slice predicate already drops NULLs implicitly;
    # stating it keeps the parity visible and slice-independent.)
    df = generate_frame(spark, "store_sales", n_fact).where(
        f"ss_sold_date_sk IS NOT NULL AND ss_sold_date_sk < {DPP_SLICE_END_SK}"
    )
    (
        df.repartition("ss_sold_date_sk")
        .write.mode("overwrite")
        .partitionBy("ss_sold_date_sk")
        .parquet(f"{out}/store_sales_daily")
    )
    _MATERIALIZED_DPP[key] = out
    return out


# Zipf-head skew variant: dsdgen's real output has heavily skewed join
# keys (a few hot items dominate sales), which the uniform modular
# mixers above never produce — so bench plans at test SF would miss the
# shuffle-skew behavior a 100 TB run hits. This opt-in variant reroutes
# store_sales' item key through a Zipf-like head (55% → item 558, 20% →
# item 1558, 10% → item 58, 15% natural tail) for the AQE skew-split
# plan assertion (tests/test_plans.py); it never replaces the default
# materialization, so every oracle still sees the uniform tables. The
# two biggest hot sks are the manufact-128 items (item id ≡ 557 mod
# 1000 ⇒ 1+(id*11)%1000 = 128), so tpcds_q03's item filter keeps the
# hot join output non-empty — otherwise AQE collapses the whole plan to
# EmptyRelation before any skew split can appear.
SKEW_HOT_SHARES = ((55, 558), (75, 1558), (85, 58))

_MATERIALIZED_SKEW: dict[str, str] = {}


def materialize_skewed_store_sales(spark: SparkSession, sf_dir: str) -> str:
    """store_sales with ss_item_sk rerouted through the Zipf head,
    written once per (process, sf_dir); returns the parquet path."""
    key = os.path.abspath(sf_dir)
    if key in _MATERIALIZED_SKEW:
        return _MATERIALIZED_SKEW[key]
    out = tempfile.mkdtemp(prefix="lhbench_tpcds_skew_")
    spec = _specs("spark")["store_sales"]
    exprs = []
    for c, e in spec[1]:
        r = _render(e, "spark")
        if c == "ss_item_sk":
            arms = " ".join(
                f"WHEN id % 100 < {cut} THEN {sk}" for cut, sk in SKEW_HOT_SHARES
            )
            # BIGINT literals on purpose: the default table's ss_item_sk
            # is BIGINT (its q58 anchor arm is uncast), and the variant
            # must keep the exact base schema.
            r = f"CASE {arms} ELSE CAST({r} AS BIGINT) END"
        exprs.append(f"{r} AS {c}")
    df = spark.range(_fact_rows(spark, sf_dir)).selectExpr(*exprs)
    # ≥8 files: AQE's skew split re-reads map-output ranges, so the
    # skewed side needs multiple mappers to split across.
    df.repartition(8).write.mode("overwrite").parquet(f"{out}/store_sales")
    _MATERIALIZED_SKEW[key] = out
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for every generated table (parquet-backed scans).

    Idempotent per (session, sf_dir): every tpcds_* spark_fn calls this,
    and re-running the 25 ``spark.read.parquet`` schema inferences on
    each call cost ~1.4 s of py4j/file-listing overhead PER QUERY
    (measured: 83% of the tpcds suite's bench wall). The memo is the
    cross-family one in ``catalog`` — `customer` exists in both the
    TPC-DS and TPC-H view sets, so each family's registration must
    invalidate the other's (see catalog.mark_views_registered)."""
    from lhbench_spark import catalog

    if catalog.views_current("tpcds", spark, sf_dir):
        return
    out = materialize(spark, sf_dir)
    for name in TPCDS_GEN_TABLES:
        spark.read.parquet(f"{out}/{name}").createOrReplaceTempView(name)
    catalog.mark_views_registered("tpcds", spark, sf_dir)


# ---------------------------------------------------------------------------
# DuckDB side: the same tables as CTEs prepended to a query text.


def gen_ctes() -> str:
    """CTE definitions for all generated tables (DuckDB dialect).
    Fact row count derives from the ``orders`` view, so one string is
    correct at every SF."""
    parts = ["_fact_ids AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS id FROM orders)"]
    for name, spec in _specs("duckdb").items():
        n, cols = spec[0], spec[1]
        where = f" WHERE {spec[2]}" if len(spec) > 2 else ""
        sel = ", ".join(f"{_render(e, 'duckdb')} AS {c}" for c, e in cols)
        src = f"range({n}) t(id)" if n is not None else "_fact_ids"
        parts.append(f"{name} AS (SELECT {sel} FROM {src}{where})")
    return ",\n".join(parts)


def compose_oracle(query_text: str) -> str:
    """Prepend the generation CTEs to a (possibly WITH-prefixed) query."""
    stripped = query_text.lstrip()
    if stripped.upper().startswith("WITH"):
        body = stripped[4:].lstrip()
        return f"WITH {gen_ctes()},\n{body}"
    return f"WITH {gen_ctes()}\n{stripped}"
