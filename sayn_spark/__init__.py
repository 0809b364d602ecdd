"""sayn-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of 173TECH/sayn, rebuilt Spark-first.

Layout:
  core/       project/settings config, Jinja compiler, DbObject stringify, app
  plans/      DAG build/toposort/query, materialisation planner (table/view/incremental)
  operators/  task types: dummy, sql, autosql, copy, test, python
  sources/    data-source registry (parquet/csv/json/jdbc) + testdata loader
  functions/  relational helpers + LLM-data-pipeline ops (dedup/similarity/text/multimodal)
  streaming/  Structured Streaming equivalents of incremental loads
"""

__version__ = "0.1.0"

from sayn_spark.session import get_spark  # noqa: F401
