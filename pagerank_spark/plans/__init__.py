from pagerank_spark.plans.inspect import explain_summary, plan_has

__all__ = ["explain_summary", "plan_has"]
