"""Lifecycle tests for the filter task (operators/filter.py): each
scorer's keep set must equal the registered oracle-verified query's
decision over the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.functions import REGISTRY
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.filter import FilterTask

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
    t = FilterTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


@pytest.fixture
def docs_table(ctx, spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("ft_src", df)
    return df


def test_filter_quality_matches_registered_query(ctx, spark, docs_table):
    _run(
        ctx,
        "ft_q",
        {
            "source": "ft_src",
            "destination": "ft_q_out",
            "scorer": "quality",
            "min_score": 0.55,
            "with_score": True,
        },
    )
    got = {r.doc_id for r in spark.table("ft_q_out").collect()}
    want = {
        r.doc_id
        for r in REGISTRY["q_text_quality"].fn(spark, SF).collect()
        if r.quality_score >= 0.55
    }
    assert got == want
    assert 0 < len(got) < docs_table.count()
    # with_score carried the exact registered score values
    scores = {r.doc_id: r.quality_score for r in spark.table("ft_q_out").collect()}
    reg = {
        r.doc_id: r.quality_score
        for r in REGISTRY["q_text_quality"].fn(spark, SF).collect()
    }
    assert all(scores[d] == reg[d] for d in scores)


def test_filter_langid_matches_registered_query(ctx, spark, docs_table):
    _run(
        ctx,
        "ft_l",
        {
            "source": "ft_src",
            "destination": "ft_l_out",
            "scorer": "langid",
            "languages": ["en", "zh"],
        },
    )
    got = {r.doc_id for r in spark.table("ft_l_out").collect()}
    preds = {r.doc_id: r.predicted_lang for r in REGISTRY["q_text_langid"].fn(spark, SF).collect()}
    want = {d for d, lang in preds.items() if lang in ("en", "zh")}
    assert got == want
    assert len(got) > 0
    # output schema untouched (helper columns dropped)
    assert spark.table("ft_l_out").columns == docs_table.columns
    # discrimination: plant unambiguous es / zh docs among the corpus
    # and allow-list only Spanish — exactly the planted es doc survives
    planted = spark.createDataFrame(
        [
            (900001, "el la los gatos el la", "es", "planted", 22),
            (900002, "\u4e2d\u6587\u6587\u672c", "zh", "planted", 4),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    ctx.db.replace_table("ft_l2_src", docs_table.unionByName(planted))
    _run(
        ctx,
        "ft_l2",
        {
            "source": "ft_l2_src",
            "destination": "ft_l2_out",
            "scorer": "langid",
            "languages": ["es"],
        },
    )
    got2 = {r.doc_id for r in spark.table("ft_l2_out").collect()}
    assert 900001 in got2 and 900002 not in got2
    assert got2 - {900001} == {d for d, lang in preds.items() if lang == "es"}


def test_filter_length_bounds(ctx, spark, docs_table):
    _run(
        ctx,
        "ft_n",
        {
            "source": "ft_src",
            "destination": "ft_n_out",
            "scorer": "length",
            "min_tokens": 10,
            "max_tokens": 40,
        },
    )
    got = spark.table("ft_n_out")
    n = F.expr("size(filter(split(lower(text), ' '), x -> x != ''))")
    assert got.where((n < 10) | (n > 40)).count() == 0
    outside = docs_table.where((n < 10) | (n > 40)).count()
    assert got.count() == docs_table.count() - outside


def test_filter_config_validation(ctx):
    for cfg in (
        {},
        {"source": "t"},
        {"source": "t", "destination": "o", "scorer": "nope"},
        {"source": "t", "destination": "o", "scorer": "quality"},  # no min_score
        {"source": "t", "destination": "o", "scorer": "langid"},  # no languages
        {"source": "t", "destination": "o", "scorer": "length"},  # no bounds
    ):
        t = FilterTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_filter_preserves_unrelated_text_column(ctx, spark):
    """text_column=body while an unrelated `text` column exists: the
    original text data must survive untouched (the scorer aliases the
    body column internally)."""
    rows = [
        (1, "keep this text intact", "alpha beta gamma delta epsilon " * 8),
        (2, "another original", "a a a a a"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string, body string")
    ctx.db.replace_table("ft_c_src", df)
    _run(
        ctx,
        "ft_c",
        {
            "source": "ft_c_src",
            "destination": "ft_c_out",
            "scorer": "length",
            "text_column": "body",
            "min_tokens": 10,
        },
    )
    out = {r.doc_id: (r.text, r.body) for r in spark.table("ft_c_out").collect()}
    assert set(out) == {1}  # doc 2's body has 5 tokens
    assert out[1][0] == "keep this text intact"
    assert sorted(spark.table("ft_c_out").columns) == ["body", "doc_id", "text"]


def test_filter_destination_table_properties(ctx, spark):
    """table_properties on a pipeline task flow through to the catalog
    writer (same keys the sql task honours)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx.db.replace_table("ft_p_src", docs)
    _run(
        ctx,
        "ft_p",
        {
            "source": "ft_p_src",
            "destination": "ft_p_out",
            "scorer": "length",
            "min_tokens": 1,
            "table_properties": {"partition": ["lang"]},
        },
    )
    desc = [r.col_name for r in spark.sql("DESCRIBE TABLE ft_p_out").collect()]
    assert "# Partition Information" in desc
    assert spark.table("ft_p_out").count() > 0


def test_filter_gopher_matches_registered_query(ctx, spark, docs_table):
    # corpus-fit bounds: word-count floor at the corpus interquartile
    # range so the rule suite genuinely discriminates at sf0.001
    _run(
        ctx,
        "ft_g",
        {
            "source": "ft_src",
            "destination": "ft_g_out",
            "scorer": "gopher",
            "min_words": 30,
            "with_score": True,
        },
    )
    got = {r.doc_id for r in spark.table("ft_g_out").collect()}
    reg = {r.doc_id: r for r in REGISTRY["q_quality_gopher_rules"].fn(spark, SF).collect()}
    # the registered query uses the published floor of 50; re-derive
    # the decision at the test's floor of 30 from its signal columns
    want = {
        d
        for d, r in reg.items()
        if 30 <= r.n_words <= 100_000
        and 3 * r.n_words <= r.sum_word_chars <= 10 * r.n_words
        and 1000 * r.n_symbol_words <= 100 * r.n_words
        and 1000 * r.n_alpha_words >= 800 * r.n_words
        and r.n_stop_distinct >= 2
    }
    assert got == want
    assert 0 < len(got) < docs_table.count()
    # with_score carried the exact signal values the query computed
    sigs = {r.doc_id: r for r in spark.table("ft_g_out").collect()}
    for d, r in sigs.items():
        assert (r.n_words, r.sum_word_chars, r.n_stop_distinct) == (
            reg[d].n_words,
            reg[d].sum_word_chars,
            reg[d].n_stop_distinct,
        )


def test_filter_gopher_symbol_and_alpha_rules_discriminate(ctx, spark, docs_table):
    # the corpus has no symbol/non-alpha words, so plant degenerate
    # docs that fail exactly those two rules and assert they drop
    planted = spark.createDataFrame(
        [
            # >10% symbol words (hash/ellipsis boilerplate)
            (900101, "the a " + " ".join(["#tag"] * 20) + " of and word more words here", "en", "planted", 120),
            # <80% alphabetic words (numeric table dump)
            (900102, "the a of " + " ".join(str(i) for i in range(40)), "en", "planted", 130),
            # control: same shape, clean text — must survive
            (900103, "the a of and " + " ".join(f"w{i}x" for i in range(40)), "en", "planted", 140),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    ctx.db.replace_table("ft_g2_src", planted)
    _run(
        ctx,
        "ft_g2",
        {
            "source": "ft_g2_src",
            "destination": "ft_g2_out",
            "scorer": "gopher",
            "min_words": 10,
        },
    )
    got = {r.doc_id for r in spark.table("ft_g2_out").collect()}
    assert got == {900103}
    # helper columns dropped without with_score
    assert spark.table("ft_g2_out").columns == planted.columns


def test_filter_gopher_incremental_appends_only_new_ids(ctx, spark, docs_table):
    cfg = {
        "source": "ft_g3_src",
        "destination": "ft_g3_out",
        "scorer": "gopher",
        "min_words": 30,
        "mode": "incremental",
    }
    ctx.db.replace_table("ft_g3_src", docs_table)
    _run(ctx, "ft_g3", cfg)
    first = {r.doc_id for r in spark.table("ft_g3_out").collect()}
    # re-run on the same source: row-local scorer, no duplicates
    _run(ctx, "ft_g3", cfg)
    assert {r.doc_id for r in spark.table("ft_g3_out").collect()} == first
    counts = spark.table("ft_g3_out").groupBy("doc_id").count()
    assert counts.where(F.col("count") > 1).count() == 0
    # a new passing doc arrives -> exactly it is appended
    extra = spark.createDataFrame(
        [(900201, "the a of and " + " ".join(f"w{i}x" for i in range(40)), "en", "p", 140)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    ctx.db.replace_table("ft_g3_src", docs_table.unionByName(extra))
    _run(ctx, "ft_g3", cfg)
    assert {r.doc_id for r in spark.table("ft_g3_out").collect()} == first | {900201}


def test_filter_repetition_ngram_coverage_gates(ctx, spark, docs_table):
    """The MassiveText coverage bounds must drop exactly the docs the
    registered query's signals exceed, and a planted looping doc must
    fail while its clean twin survives."""
    planted = spark.createDataFrame(
        [
            # top-2-gram loop: "spam ham" covers ~all characters
            (900301, " ".join(["spam ham"] * 25), "en", "planted", 200),
            # clean twin: same length, no repetition
            (900302, " ".join(f"w{i}x" for i in range(50)), "en", "planted", 200),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    ctx.db.replace_table("ft_ng_src", docs_table.unionByName(planted))
    _run(
        ctx,
        "ft_ng",
        {
            "source": "ft_ng_src",
            "destination": "ft_ng_out",
            "scorer": "repetition",
            "max_top2_ppm": 200_000,
            "max_dup5_ppm": 150_000,
        },
    )
    got = {r.doc_id for r in spark.table("ft_ng_out").collect()}
    assert 900302 in got and 900301 not in got
    # corpus rows match the registered signals under the same bounds;
    # <2-token docs have no signal row and must be kept
    sig = {r.doc_id: r for r in REGISTRY["q_repetition_top_ngram"].fn(spark, SF).collect()}
    corpus_ids = {r.doc_id for r in docs_table.select("doc_id").collect()}
    want = {
        d
        for d in corpus_ids
        if d not in sig
        or (sig[d].top2_ppm <= 200_000 and sig[d].dup5_ppm <= 150_000)
    }
    assert got - {900301, 900302} == want
    # helper signal columns dropped without with_score
    assert spark.table("ft_ng_out").columns == docs_table.columns


def test_filter_pii_drop_and_redact(ctx, spark):
    planted = spark.createDataFrame(
        [
            (1, "contact me at bob@example.com for details", "en", "p", 40),
            (2, "call +1-555-0000 or mail eve@test.org now", "en", "p", 40),
            (3, "clean document with no contact information", "en", "p", 42),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    ctx.db.replace_table("ft_pii_src", planted)
    _run(
        ctx,
        "ft_pii_d",
        {"source": "ft_pii_src", "destination": "ft_pii_d_out", "scorer": "pii"},
    )
    assert {r.doc_id for r in spark.table("ft_pii_d_out").collect()} == {3}
    # redact keeps all rows, replaces matches in place, zero residue
    _run(
        ctx,
        "ft_pii_r",
        {
            "source": "ft_pii_src",
            "destination": "ft_pii_r_out",
            "scorer": "pii",
            "pii_action": "redact",
            "with_score": True,
        },
    )
    rows = {r.doc_id: r for r in spark.table("ft_pii_r_out").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].text == "contact me at [EMAIL] for details"
    assert rows[2].text == "call [PHONE] or mail [EMAIL] now"
    assert rows[3].text == planted.collect()[2].text
    assert (rows[1].n_pii, rows[2].n_pii, rows[3].n_pii) == (1, 2, 0)
    # max_pii loosens the drop threshold
    _run(
        ctx,
        "ft_pii_m",
        {
            "source": "ft_pii_src",
            "destination": "ft_pii_m_out",
            "scorer": "pii",
            "max_pii": 1,
        },
    )
    assert {r.doc_id for r in spark.table("ft_pii_m_out").collect()} == {1, 3}


def test_filter_bigram_surprisal_keep_fraction(ctx, spark, docs_table):
    """lm_order 2 self-trained: the kept set is exactly the lowest
    avg_nll_i8 permille share under the library's own scoring."""
    from pyspark.sql import functions as F

    from sayn_spark.functions.text import bigram_lm_frames, score_against_bigram_lm

    _run(
        ctx,
        "ft_b",
        {
            "source": "ft_src",
            "destination": "ft_b_out",
            "scorer": "surprisal",
            "lm_order": 2,
            "keep_fraction": 0.5,
            "with_score": True,
        },
    )
    got = {r.doc_id: r.avg_nll_i8 for r in spark.table("ft_b_out").collect()}
    work = docs_table.where(F.col("text").isNotNull()).select("doc_id", "text")
    nll_bi, nll_uni = bigram_lm_frames(work.select("text"))
    sc = score_against_bigram_lm(work, nll_bi, nll_uni)
    scored = sorted(
        (r.avg_nll_i8, r.doc_id) for r in sc.collect()
    )
    n = len(scored)
    want = {d: a for i, (a, d) in enumerate(scored, start=1) if 1000 * i <= 500 * n}
    assert got == want and got


def test_filter_bigram_frozen_reference_incremental(ctx, spark, docs_table):
    """reference_table + max_avg_nll is per-row (frozen LM), so
    incremental ingest is allowed and equals the full rebuild."""
    from pyspark.sql import functions as F

    ref = docs_table.where("lang = 'en'").select("text")
    ctx.db.replace_table("ft_ref", ref)
    wave1 = docs_table.where("doc_id % 2 = 0")
    ctx.db.replace_table("ft_inc_src", wave1)
    cfg = {
        "source": "ft_inc_src",
        "destination": "ft_inc_out",
        "scorer": "surprisal",
        "lm_order": 2,
        "reference_table": "ft_ref",
        # the synthetic corpus scores 3.2-3.8 nats under the en LM
        # (languages share the generator vocabulary); 3.44 ~ median
        "max_avg_nll": 3.44,
        "mode": "incremental",
        "with_score": True,
    }
    _run(ctx, "ft_i1", cfg)
    n1 = spark.table("ft_inc_out").count()
    assert n1 > 0
    ctx.db.replace_table("ft_inc_src", docs_table)
    _run(ctx, "ft_i2", cfg)
    got = {r.doc_id for r in spark.table("ft_inc_out").collect()}
    # full rebuild over the union gives the same keep set
    ctx.db.replace_table("ft_full_src", docs_table)
    _run(ctx, "ft_full", {**cfg, "source": "ft_full_src",
                          "destination": "ft_full_out", "mode": "full"})
    want = {r.doc_id for r in spark.table("ft_full_out").collect()}
    assert got == want and 0 < len(got) < docs_table.count()
    # replay: no-op
    _run(ctx, "ft_i3", cfg)
    assert spark.table("ft_inc_out").count() == len(got)
    # the frozen-LM score is the same in both runs (spot check)
    a = {r.doc_id: r.avg_nll_i8 for r in spark.table("ft_inc_out").collect()}
    b = {r.doc_id: r.avg_nll_i8 for r in spark.table("ft_full_out").collect()}
    assert a == b


def test_filter_unigram_frozen_reference_scores_oov_max(ctx, spark, docs_table):
    """lm_order 1 + reference_table scores through score_against_vocab:
    a doc of entirely unseen tokens gets the vocabulary's max nll."""
    from pyspark.sql import functions as F

    ref = docs_table.where("lang = 'en'").select("text")
    ctx.db.replace_table("ft_ref1", ref)
    planted = spark.createDataFrame(
        [(900001, "zzqq zzqq wwxx yyvv")], ["doc_id", "text"]
    )
    ctx.db.replace_table(
        "ft_u_src",
        docs_table.select("doc_id", "text").unionByName(planted),
    )
    _run(
        ctx,
        "ft_u",
        {
            "source": "ft_u_src",
            "destination": "ft_u_out",
            "scorer": "surprisal",
            "reference_table": "ft_ref1",
            "max_avg_nll": 1000.0,  # keep everything; we check scores
            "with_score": True,
        },
    )
    out = {r.doc_id: r.avg_nll for r in spark.table("ft_u_out").collect()}
    assert 900001 in out
    assert out[900001] == max(out.values())  # all-OOV doc = max surprisal


def test_filter_lm_options_validation(ctx):
    import pytest as _pytest

    for cfg in (
        {"source": "s", "destination": "d", "scorer": "surprisal",
         "lm_order": 3, "keep_fraction": 0.5},
        {"source": "s", "destination": "d", "scorer": "quality",
         "min_score": 0.5, "lm_order": 2},
        {"source": "s", "destination": "d", "scorer": "quality",
         "min_score": 0.5, "reference_table": "r"},
        # corpus-relative incremental still rejected: keep_fraction
        {"source": "s", "destination": "d", "scorer": "surprisal",
         "lm_order": 2, "reference_table": "r", "keep_fraction": 0.5,
         "mode": "incremental"},
        # ... and self-trained incremental too
        {"source": "s", "destination": "d", "scorer": "surprisal",
         "max_avg_nll": 5.0, "mode": "incremental"},
    ):
        t = FilterTask("bad_lm", cfg, ctx)
        with _pytest.raises(ValueError):
            t.config()


def test_filter_entropy_matches_registered_query(ctx, spark):
    """scorer: entropy must keep exactly the docs q_text_char_entropy
    scores at/above the floor, and must actually drop a planted
    low-entropy page."""
    from sayn_spark.functions.text import q_text_char_entropy

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    planted = spark.createDataFrame(
        [(990001, "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa")],
        schema="doc_id long, text string",
    )
    corpus = docs.unionByName(planted)
    ctx.db.replace_table("fe_src", corpus)
    _run(
        ctx,
        "fe",
        {
            "source": "fe_src",
            "destination": "fe_out",
            "scorer": "entropy",
            "min_entropy": 2.0,
            "with_score": True,
        },
    )
    out = {r.doc_id: r.entropy_e8 for r in spark.table("fe_out").collect()}
    assert 990001 not in out  # the mash page is below 2.0 nats
    scored = {
        r.doc_id: r.entropy_e8 for r in q_text_char_entropy(spark, SF).collect()
    }
    want = {d: e for d, e in scored.items() if e >= 200000000}
    assert {d: e for d, e in out.items() if d != 990001} == want
    assert len(out) > 0
    for t in ("fe_src", "fe_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_filter_entropy_validation_and_incremental(ctx, spark):
    t = FilterTask("bad_ent", {"source": "s", "destination": "d", "scorer": "entropy"}, ctx)
    with pytest.raises(ValueError):
        t.config()
    # row-local: incremental mode is accepted and replays are no-ops
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("fei_src", docs.where("doc_id % 2 = 0"))
    cfg = {
        "source": "fei_src",
        "destination": "fei_out",
        "scorer": "entropy",
        "min_entropy": 2.0,
        "mode": "incremental",
    }
    spark.sql("DROP TABLE IF EXISTS fei_out")
    _run(ctx, "fei", cfg)
    n1 = spark.table("fei_out").count()
    _run(ctx, "fei", cfg)
    assert spark.table("fei_out").count() == n1
    ctx.db.replace_table("fei_src", docs)
    _run(ctx, "fei", cfg)
    got = {r.doc_id for r in spark.table("fei_out").collect()}
    _run(ctx, "fef", {**cfg, "mode": "full", "destination": "fef_out"})
    assert got == {r.doc_id for r in spark.table("fef_out").collect()}
    for t2 in ("fei_src", "fei_out", "fef_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
