"""Relational + LLM-pipeline operators, each expressed Spark-first.

Every operator here is a DataFrame→DataFrame transform built from
declarative ``pyspark.sql`` primitives so Catalyst keeps pushdown /
pruning / join-selection freedom; nothing collects to the driver.
"""
