"""Market-basket pair mining and per-brand Pareto cut
(plans/basket_queries.py): hand-checked support/lift on tiny baskets
(duplicate order lines count once), and the exact-decimal 80% boundary
semantics (row sitting exactly on 80% excluded, crossing row kept)."""

import datetime as _dt

_SHIP_TS = _dt.datetime(2024, 6, 1)

def test_basket_pairs_support_and_lift(spark, tmp_path):
    from retail_sales_analysis_etl_bi_project_spark.plans.basket_queries import (
        bi_market_basket_pairs,
    )

    # orders: {1,2} x3, {1,3} x1, {2,3} x1, plus a repeated line of part
    # 1 in order 10 (must count ONCE) and a singleton order
    rows = []
    lid = 0

    def add(ok, parts):
        nonlocal lid
        for p in parts:
            lid += 1
            rows.append((ok, p, 1, lid, 1.0, 10.0, 0.0, 0.0, "N", "O", _SHIP_TS))

    add(10, [1, 2, 1])
    add(11, [1, 2])
    add(12, [1, 2])
    add(13, [1, 3])
    add(14, [2, 3])
    add(15, [7])
    li = spark.createDataFrame(
        rows,
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    got = {
        (r.part_a, r.part_b): r
        for r in bi_market_basket_pairs(spark, sf).collect()
    }
    # only (1,2) reaches support 2 (3 co-orders); 6 orders total,
    # n_1=4, n_2=4 -> lift = 3*6/(4*4)
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r.n_both, r.n_a, r.n_b) == (3, 4, 4)
    assert r.lift == (3.0 * 6.0) / (4.0 * 4.0)


def test_pareto_cut_includes_crossing_row_excludes_exact_boundary(
    spark, tmp_path
):
    from retail_sales_analysis_etl_bi_project_spark.plans.basket_queries import (
        bi_pareto_brand_products,
    )

    # brand A: revenues 50,30,15,5 (total 100): head 50,30 = 80% EXACTLY
    #   -> part 3 (prev_cum 80 = 0.8*total) must be EXCLUDED
    # brand B: revenues 60,30,10 (total 100): 60 < 80, 60+30=90 crosses
    #   -> parts 1,2 kept (2 is the crossing row), part 3 dropped
    li_rows, pt_rows = [], []
    lid = 0

    def add(brand, part, rev):
        nonlocal lid
        lid += 1
        li_rows.append((lid, part, 1, lid, 1.0, float(rev), 0.0, 0.0, "N", "O", _SHIP_TS))
        pt_rows.append((part, f"part{part}", brand, "t", 1, 1.0))

    for p, rev in [(1, 50), (2, 30), (3, 15), (4, 5)]:
        add("A", p, rev)
    for p, rev in [(11, 60), (12, 30), (13, 10)]:
        add("B", p, rev)
    li = spark.createDataFrame(
        li_rows,
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )
    pt = spark.createDataFrame(
        set(pt_rows),
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    pt.write.parquet(f"{sf}/part.parquet")
    got = {
        (r.brand, r.part_key): r
        for r in bi_pareto_brand_products(spark, sf).collect()
    }
    assert set(got) == {("A", 1), ("A", 2), ("B", 11), ("B", 12)}
    assert got[("B", 12)].cum_revenue == 90.0
    assert got[("A", 2)].brand_revenue == 100.0
