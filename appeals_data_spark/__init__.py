"""appeals_data_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference corpus (department-of-veterans-affairs/
appeals-data) as an idiomatic Spark engine:

- ``session``   — SparkSession factory (AQE, broadcast, shuffle sizing)
- ``catalog``   — parquet table loading + temp-view registration
- ``registry``  — declarative query registry (Spark builder + ANSI-SQL oracle)
- ``functions`` — scalar/aggregate helpers (exact-decimal sums, fiscal year,
  text metrics, vector math)
- ``operators`` — reusable composite operators (fuzzy as-of join,
  point-in-time backlog, sessionization, survival curves, transitive
  closure, dedup, similarity search)
- ``views``     — derived data models (the long event log)
- ``queries``   — the registered query inventory (SURVEY.md §2 coverage)
- ``streaming`` — Structured Streaming derivations of the event log

Everything is built on the public PySpark DataFrame API; heavy lifting
stays JVM-side (whole-stage codegen), Python UDFs only where semantics
require (Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
