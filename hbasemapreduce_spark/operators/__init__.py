"""Benchmark/contract queries, one module per SURVEY.md §2 category.

Every public query is a pure function ``(spark, sf_dir) -> DataFrame``
registered via ``hbasemapreduce_spark.registry.query``.
"""
