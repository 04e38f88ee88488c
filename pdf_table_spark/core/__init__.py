"""Pure-python/numpy page decoders (no Spark imports).

Every function here is deterministic and order-stable: the Spark stages
in ``pdf_table_spark.spark`` call these per Arrow batch, and the golden
oracle in ``pdf_table_spark.fixtures`` calls the very same functions in
a single process, which is what makes span-sequence equality testable.
"""
