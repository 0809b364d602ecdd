"""Lifecycle tests for the sample task: both methods recompute exactly
from the seed (the q_stratified_sample / q_weighted_sample_es designs
applied as writes)."""

from __future__ import annotations

import hashlib
import math

import pytest

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.sample import SampleTask

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


def _run(ctx, name, cfg):
    t = SampleTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


def _bucket(seed, doc_id):
    return int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16)


def _es_key(seed, doc_id, w):
    u_int = int(hashlib.md5(f"{seed}ws|{doc_id}".encode()).hexdigest()[:8], 16)
    nlnu_i8 = round(-math.log((u_int + 1) / 4294967296.0) * 100000000)
    return (nlnu_i8 * 1000000) // max(int(w), 1)


def test_hash_sample_is_the_seeded_filter(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("smp_src", docs)
    _run(
        ctx,
        "s1",
        {"source": "smp_src", "destination": "smp_out", "rate_in": 5, "seed": 7},
    )
    got = {r.doc_id for r in spark.table("smp_out").collect()}
    want = {
        r.doc_id for r in docs.select("doc_id").collect() if _bucket(7, r.doc_id) % 5 == 0
    }
    assert got == want and got  # non-empty, exact membership
    # schema passes through untouched
    assert spark.table("smp_out").columns == docs.columns


def test_hash_sample_per_stratum_rates(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("smp_src2", docs)
    _run(
        ctx,
        "s2",
        {
            "source": "smp_src2",
            "destination": "smp_out2",
            "rate_in": 10,
            "stratify_by": "lang",
            "rates": {"en": 1, "zh": 2},
            "seed": 7,
        },
    )
    rows = spark.table("smp_out2").select("doc_id", "lang").collect()
    src = docs.select("doc_id", "lang").collect()
    rate = {"en": 1, "zh": 2}
    want = {
        r.doc_id for r in src if _bucket(7, r.doc_id) % rate.get(r.lang, 10) == 0
    }
    assert {r.doc_id for r in rows} == want
    # rate 1 keeps every 'en' doc
    assert {r.doc_id for r in rows if r.lang == "en"} == {
        r.doc_id for r in src if r.lang == "en"
    }


def test_weighted_sample_matches_pure_python(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("smp_src3", docs)
    _run(
        ctx,
        "s3",
        {
            "source": "smp_src3",
            "destination": "smp_out3",
            "method": "weighted",
            "weight_column": "n_chars",
            "k": 25,
            "seed": 3,
        },
    )
    rows = spark.table("smp_out3").collect()
    assert len(rows) == 25
    src = docs.select("doc_id", "n_chars").collect()
    want = sorted(src, key=lambda r: (_es_key(3, r.doc_id, r.n_chars), r.doc_id))[:25]
    assert {r.doc_id for r in rows} == {r.doc_id for r in want}
    for r in rows:
        assert r.sample_key == _es_key(3, r.doc_id, r.n_chars)


def test_weighted_sample_group_by(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("smp_src4", docs)
    _run(
        ctx,
        "s4",
        {
            "source": "smp_src4",
            "destination": "smp_out4",
            "method": "weighted",
            "weight_column": "n_chars",
            "k": 3,
            "group_by": "lang",
            "seed": 3,
        },
    )
    rows = spark.table("smp_out4").select("doc_id", "lang").collect()
    src = docs.select("doc_id", "lang", "n_chars").collect()
    by_lang: dict[str, list] = {}
    for r in src:
        by_lang.setdefault(r.lang, []).append(r)
    want = set()
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (_es_key(3, r.doc_id, r.n_chars), r.doc_id))
        want |= {r.doc_id for r in rs[:3]}
    assert {r.doc_id for r in rows} == want
    counts: dict[str, int] = {}
    for r in rows:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    assert all(v == 3 for v in counts.values())


def test_sample_config_validation(ctx):
    bad = [
        {},
        {"source": "t"},
        {"source": "t", "destination": "o", "method": "nope"},
        {"source": "t", "destination": "o", "rate_in": 0},
        {"source": "t", "destination": "o", "rates": {"en": 2}},  # no stratify_by
        {"source": "t", "destination": "o", "rate_in": 5, "stratify_by": "lang",
         "rates": {"en": 0}},
        {"source": "t", "destination": "o", "method": "weighted"},
        {"source": "t", "destination": "o", "method": "weighted",
         "weight_column": "w", "k": 0},
    ]
    for cfg in bad:
        t = SampleTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_sample_missing_column_raises_before_write(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("smp_src5", docs)
    t = SampleTask(
        "s5",
        {
            "source": "smp_src5",
            "destination": "smp_out5",
            "method": "weighted",
            "weight_column": "no_such",
            "k": 5,
        },
        ctx,
    )
    t.config()
    with pytest.raises(ValueError, match="no_such"):
        t.run()
    assert not spark.catalog.tableExists("smp_out5")


def test_hash_sample_incremental_equals_full_over_union(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wave1 = docs.where("doc_id % 3 != 0")
    ctx.db.replace_table("smp_inc_src", wave1)
    base = {
        "source": "smp_inc_src",
        "destination": "smp_inc_out",
        "rate_in": 3,
        "seed": 5,
        "mode": "incremental",
    }
    _run(ctx, "si1", base)  # first run: no destination yet -> full build
    n1 = spark.table("smp_inc_out").count()
    assert n1 > 0

    ctx.db.replace_table("smp_inc_src", docs)
    _run(ctx, "si2", base)  # second wave appends only unseen ids
    got = {r.doc_id for r in spark.table("smp_inc_out").collect()}
    want = {
        r.doc_id for r in docs.select("doc_id").collect() if _bucket(5, r.doc_id) % 3 == 0
    }
    assert got == want  # incremental == full rebuild over the union

    _run(ctx, "si3", base)  # replay: no-op
    assert spark.table("smp_inc_out").count() == len(want)


def test_weighted_sample_rejects_incremental(ctx):
    t = SampleTask(
        "bad_inc",
        {
            "source": "t",
            "destination": "o",
            "method": "weighted",
            "weight_column": "w",
            "k": 5,
            "mode": "incremental",
        },
        ctx,
    )
    with pytest.raises(ValueError, match="corpus-relative"):
        t.config()
