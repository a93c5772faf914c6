"""SQL API surface: the engine's operators are equally expressible as Spark
SQL strings over registered views (Catalyst produces the same results either
way) — exercised for a representative subset."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

TABLES = ["lineitem", "orders", "customer", "documents", "events"]


@pytest.fixture(scope="module")
def views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_q1_sql_equals_dataframe(views, spark):
    from samu_ocr_extraction_poc_spark.contract import q1_pricing_summary

    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS STRING) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS STRING) AS sum_base_price,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS STRING) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    assert _rows(sql) == _rows(q1_pricing_summary(spark, SF))


def test_window_sql_equals_dataframe(views, spark):
    from samu_ocr_extraction_poc_spark.contract import topk_orders_per_customer

    sql = spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
        """
    )
    assert _rows(sql) == _rows(topk_orders_per_customer(spark, SF))


def test_array_hof_sql_page_grouping(views, spark):
    """A1 page grouping expressed purely in Spark SQL (array HOFs +
    posexplode) equals the DataFrame formulation."""
    from samu_ocr_extraction_poc_spark.contract import page_group_concat

    sql = spark.sql(
        r"""
        WITH base AS (SELECT doc_id, split(trim(text), ' ') AS words FROM documents),
        l AS (SELECT doc_id,
                transform(sequence(1, CAST(ceil(size(words)/8.0) AS INT)),
                          i -> array_join(slice(words, (i-1)*8+1, 8), ' ')) AS lines
              FROM base),
        p AS (SELECT doc_id,
                transform(sequence(1, CAST(ceil(size(lines)/5.0) AS INT)),
                          q -> concat(' \n ', array_join(slice(lines, (q-1)*5+1, 5), ' \n '))) AS pages
              FROM l)
        SELECT doc_id, CAST(pos + 1 AS INT) AS page, col AS page_text
        FROM p LATERAL VIEW posexplode(pages) t AS pos, col
        """
    )
    assert _rows(sql) == _rows(page_group_concat(spark, SF))
