"""PySpark-native analytics engine with the query/data-processing
capabilities of dhruviladani/Real_Time_Data_Pipeline_for_Restaurant_Analytics.

The reference is a Snowflake-SQL three-layer (stage/clean/consumption)
medallion warehouse with CDC streams, SCD1/SCD2 merges, and a 26-KPI
analytical surface (see SURVEY.md). This package re-expresses that
capability surface Spark-first:

- ``session``    — SparkSession factory tuned for scale (AQE, shuffle
                   partitions, Arrow).
- ``sources``    — CSV/JSON readers honoring the reference file-format
                   contract, audit columns, processed-file ledger,
                   date-partitioned path builder.
- ``functions``  — scalar operator library (safe casts, CASE
                   enrichments, hash surrogate keys, masking).
- ``operators``  — relational + incremental operators (SCD1/SCD2
                   merge, snapshot CDC diff, dedup family, similarity
                   search, text analysis, multimodal plumbing).
- ``plans``      — the analytical query surface (KPI family) as
                   DataFrame builders with ANSI-SQL oracles.
- ``pipeline``   — per-entity three-layer load pipelines + run_all
                   orchestration (reference ``final_proc.sql``).
- ``streaming``  — Structured Streaming ingest (foreachBatch SCD loop)
                   and watermarked windowed KPIs.
"""

__version__ = "0.1.0"
