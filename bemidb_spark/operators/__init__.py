"""Operator library: the engine's query capability surface.

Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir) -> DataFrame) and
``ORACLES`` (name -> equivalent ANSI SQL for the DuckDB oracle). The union over all
modules is the engine's verified operator inventory (SURVEY.md §2).
"""
