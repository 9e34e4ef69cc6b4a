"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's own capability surface (SURVEY §2), these are the
operations a large-scale training-data pipeline needs — deduplication,
similarity search, text analysis — each written twice:

* a Spark implementation (JVM expressions wherever possible — the hot
  path stays inside whole-stage codegen; pandas UDFs only where built-in
  operators genuinely can't express the semantics), and
* a DuckDB ANSI-SQL twin (``*_sql``) so the driver's side-by-side
  correctness harness value-hash-checks every operator.
"""
