"""Lifecycle tests for the mixture and pack tasks: both must reproduce
their registered oracle-verified queries' decisions over the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.functions import REGISTRY
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.mixture import MixtureTask
from sayn_spark.operators.pack import PackTask

SF = "/root/testdata/sf0.001"


@pytest.fixture
def ctx(spark, tmp_path):
    return TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(parameters={}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=tmp_path,
    )


def _run(task_cls, ctx, name, cfg):
    t = task_cls(name, cfg, ctx)
    t.config()
    t.run()
    return t


@pytest.fixture
def docs_table(ctx, spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("mp_src", df)
    return df


def test_mixture_uniform_matches_registered_query(ctx, spark, docs_table):
    """ratio=0.5, uniform weights == q_token_budget_mix's kept set
    (same per-mille rates, same hash buckets)."""
    _run(
        MixtureTask,
        ctx,
        "mx",
        {
            "source": "mp_src",
            "destination": "mx_out",
            "group_column": "lang",
            "token_budget_ratio": 0.5,
        },
    )
    got = (
        spark.table("mx_out")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    got_map = {r.lang: r.n_kept for r in got.collect()}
    want_map = {
        r.lang: r.n_kept for r in REGISTRY["q_token_budget_mix"].fn(spark, SF).collect()
    }
    assert got_map == {k: v for k, v in want_map.items() if v > 0}
    assert sum(got_map.values()) > 0


def test_mixture_weights_shift_the_budget(ctx, spark, docs_table):
    """A group with weight 0 is dropped entirely; heavier weights keep
    more of their group's tokens (rates still capped at 1000)."""
    langs = [r.lang for r in docs_table.select("lang").distinct().collect()]
    assert len(langs) >= 2
    heavy, zero = langs[0], langs[1]
    weights = {heavy: 3, zero: 0}
    for other in langs[2:]:
        weights[other] = 1
    _run(
        MixtureTask,
        ctx,
        "mx_w",
        {
            "source": "mp_src",
            "destination": "mx_w_out",
            "group_column": "lang",
            "token_budget_ratio": 0.5,
            "weights": weights,
        },
    )
    out = spark.table("mx_w_out")
    assert out.where(F.col("lang") == zero).count() == 0
    assert out.where(F.col("lang") == heavy).count() > 0


def test_mixture_is_deterministic(ctx, spark, docs_table):
    cfg = {
        "source": "mp_src",
        "destination": "mx_d_out",
        "group_column": "lang",
        "token_budget_ratio": 0.3,
    }
    _run(MixtureTask, ctx, "mx_d1", cfg)
    first = sorted(r.doc_id for r in spark.table("mx_d_out").collect())
    _run(MixtureTask, ctx, "mx_d2", cfg)
    assert sorted(r.doc_id for r in spark.table("mx_d_out").collect()) == first


def test_pack_matches_registered_query_bins(ctx, spark, docs_table):
    """Global packing at 2048 == q_sequence_packing's bin stats."""
    _run(
        PackTask,
        ctx,
        "pk",
        {"source": "mp_src", "destination": "pk_out", "context_window": 2048},
    )
    got = {
        r.bin_id: (r.n_docs, r.bin_tokens)
        for r in spark.table("pk_out")
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
        .collect()
    }
    want = {
        r.bin_id: (r.n_docs, r.bin_tokens)
        for r in REGISTRY["q_sequence_packing"].fn(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 1


def test_pack_sharded_windows_fill(ctx, spark, docs_table):
    """shard_column packs per shard: every bin except possibly each
    shard's LAST stays within one shard and fills past the window once
    the next doc wouldn't fit (cumsum semantics)."""
    _run(
        PackTask,
        ctx,
        "pk_s",
        {
            "source": "mp_src",
            "destination": "pk_s_out",
            "context_window": 512,
            "shard_column": "lang",
        },
    )
    out = spark.table("pk_s_out")
    # bins are per-shard: (lang, bin_id) bins with docs from one lang only
    stats = out.groupBy("lang", "bin_id").agg(F.sum("n_tokens").alias("t"))
    last_bin = stats.groupBy("lang").agg(F.max("bin_id").alias("mx"))
    non_last = stats.join(
        last_bin, (stats.lang == last_bin.lang) & (stats.bin_id == last_bin.mx), "left_anti"
    )
    # a non-last bin's cumsum spans the window boundary by construction
    assert non_last.where(F.col("t") < 1).count() == 0
    assert out.count() == docs_table.count()


def test_mixture_pack_config_validation(ctx):
    for cls, cfg in (
        (MixtureTask, {}),
        (MixtureTask, {"source": "t", "destination": "o"}),  # no group
        (MixtureTask, {"source": "t", "destination": "o", "group_column": "g", "token_budget_ratio": 0}),
        (MixtureTask, {"source": "t", "destination": "o", "group_column": "g", "weights": {"a": -1}}),
        (PackTask, {}),
        (PackTask, {"source": "t", "destination": "o", "context_window": 0}),
    ):
        t = cls("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_mixture_temperature_matches_registered_query(ctx, spark, docs_table):
    """temperature_alpha=0.5 over source == q_mixture_temperature's
    kept set (same isqrt weights, same rate solve, same md5 buckets)."""
    _run(
        MixtureTask,
        ctx,
        "mx_t",
        {
            "source": "mp_src",
            "destination": "mx_t_out",
            "group_column": "source",
            "token_budget_ratio": 0.5,
            "temperature_alpha": 0.5,
        },
    )
    out = spark.table("mx_t_out")
    got = out.groupBy("source").count().collect()
    want = {
        r.source: r.n_kept
        for r in REGISTRY["q_mixture_temperature"].fn(spark, SF).collect()
    }
    assert {r.source: r["count"] for r in got} == {
        s: n for s, n in want.items() if n > 0
    }
    assert 0 < out.count() < docs_table.count()


def test_mixture_temperature_flattens_vs_proportional(ctx, spark, docs_table):
    """alpha=0.5 must allocate a LARGER keep share to small groups than
    alpha=1.0 (proportional) does — the whole point of temperature
    sampling.  Build a skewed corpus: one giant group, one tiny."""
    big = docs_table.limit(180).withColumn("source", F.lit("big"))
    small = (
        docs_table.orderBy(F.col("doc_id").desc())
        .limit(12)
        .withColumn("source", F.lit("small"))
    )
    ctx.db.replace_table("mx_skew_src", big.unionByName(small))
    rates = {}
    for alpha, dest in ((1.0, "mx_a1_out"), (0.5, "mx_a5_out")):
        _run(
            MixtureTask,
            ctx,
            f"mx_a{alpha}",
            {
                "source": "mx_skew_src",
                "destination": dest,
                "group_column": "source",
                "token_budget_ratio": 0.5,
                "temperature_alpha": alpha,
            },
        )
        kept = {
            r.source: r["count"]
            for r in spark.table(dest).groupBy("source").count().collect()
        }
        rates[alpha] = kept.get("small", 0)
    assert rates[0.5] > rates[1.0]


def test_mixture_temperature_config_validation(ctx):
    base = {
        "source": "mp_src",
        "destination": "mx_bad_out",
        "group_column": "source",
    }
    t = MixtureTask("mx_bad1", {**base, "temperature_alpha": 0.3}, ctx)
    with pytest.raises(ValueError, match="integer-exact"):
        t.config()
    t = MixtureTask(
        "mx_bad2", {**base, "temperature_alpha": 0.5, "weights": {"a": 1}}, ctx
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.config()
