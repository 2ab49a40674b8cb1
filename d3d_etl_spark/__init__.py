"""d3d_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query/data-processing capabilities of the
reference ETL repo (`jack-kelly-12/d3d-etl`, surveyed in SURVEY.md) as an
idiomatic Spark engine: declarative DataFrame plans, Catalyst-optimized
operators, explicit schemas, partition-aware sinks, plus the
large-scale-training-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Layout:
    session     — SparkSession factory (AQE, dynamic partition overwrite)
    schemas     — first-class StructType schemas for every table
    io          — partitioned parquet/CSV readers & upsert writers
    functions/  — column-expression libraries (math, money, strings, dates,
                  text, vectors, sabermetrics)
    operators/  — reusable DataFrame->DataFrame operators (windows, dedup,
                  similarity, fuzzy join, sessionize, grouped FSM)
    queries/    — the registered query surface checked against the DuckDB
                  oracle (one entry per SURVEY.md §2 operator)
"""

__version__ = "0.1.0"
