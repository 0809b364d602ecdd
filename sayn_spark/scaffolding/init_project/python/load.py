"""Source loader: registers the testdata parquet tables as temp views
(the reference scaffold's python logs-loader analog,
scaffolding/data/init_project/python/load_data.py)."""

from sayn_spark.operators import task
from sayn_spark.sources import load_tables


@task(
    name="load_sources",
    outputs=[
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ],
)
def load_sources(context, spark, sf_dir):
    # register under out() names so profile stringify (e.g. the dev
    # table prefix in settings.yaml) rewrites sources and models
    # consistently
    for name, df in load_tables(spark, sf_dir, register=False).items():
        df.createOrReplaceTempView(context.out(name))
