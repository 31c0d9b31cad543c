"""Physical-plan assertions: filters push to the scan, columns prune,
small dims broadcast — the properties that make the 100 TB plan right."""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_and_prunes(spark):
    from hinbox_spark.plans.queries import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: untouched columns must not be read
    assert "l_partkey" not in plan.split("ReadSchema")[-1]
    assert "l_tax" not in plan.split("ReadSchema")[-1]


def test_revenue_by_nation_broadcasts_dims(spark):
    from hinbox_spark.plans.queries import q_revenue_by_nation

    plan = _plan(q_revenue_by_nation(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_doc_token_stats_prunes_text_scan(spark):
    from hinbox_spark.plans.queries import q_doc_token_stats

    plan = _plan(q_doc_token_stats(spark, "/root/testdata/sf0.001"))
    read = plan.split("ReadSchema")[-1]
    assert "doc_id" not in read and "source" not in read


def test_knn_broadcasts_queries(spark):
    from hinbox_spark.plans.queries import q_knn_top5

    plan = _plan(q_knn_top5(spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan


def test_wholestage_codegen_in_agg_path(spark):
    from hinbox_spark.plans.queries import q_pricing_summary

    df = q_pricing_summary(spark, "/root/testdata/sf0.001")
    df.collect()  # AQE finalizes the physical plan on execution
    plan = _plan(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string;
    # both the partial and final aggregates must be inside one
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan
    # map-side partial aggregation (combine before shuffle)
    assert "partial_sum" in plan
