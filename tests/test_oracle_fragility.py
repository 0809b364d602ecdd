"""Measured FP-boundary margins for the rounding-over-transcendental
oracles (VERDICT r6 item 3).

A final oracle column of the form ROUND(f(x), n) where f involves a
transcendental (LN) is cross-engine fragile IFF some actual value lands
within ~1 ulp of a half-boundary at n decimal places: libm log() is not
correctly rounded, so Spark (JVM Math.log) and DuckDB (C libm) can
differ by 1 ulp, flipping the rounded digit only near a boundary.
sqrt/division/multiplication are IEEE-correctly-rounded, so those
compositions are bit-identical across engines given identical inputs;
their only residual risk is an EXACT half at the rounding digit, where
engine round-half conventions could diverge.

This test measures, on the real corpus at the driver's gate SF, the
minimum distance of every pre-round value to its nearest half-boundary,
and asserts a margin orders of magnitude above the 1-ulp discrepancy
scale.  The measured numbers are documented in PARITY.md §FRAGILITY.

Audited oracles (the complete transcendental-rounding set, found by
grepping LN/EXP/LOG/POW/sqrt inside oracle strings):
  - q_text_unigram_surprisal / q_perplexity_buckets: per-token
    ROUND(-LN(c/total), 8) and per-doc ROUND(s/n_toks, 6)
  - q_events_anomalies: ROUND(zscore, 4) (sqrt is IEEE-exact; margin
    still measured against exact-half ties)
  - q_kmeans_refine: ROUND(sumsq, 8) and ROUND(sqrt(.), 6)
"""

from __future__ import annotations

import os

from tests.oracle import duckdb_con

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_DIR", "/root/testdata/sf0.01")

# distance of v*10^n to the nearest half-boundary, in grid units
_MARGIN = "MIN(ABS(({v}) * {scale} - FLOOR(({v}) * {scale}) - 0.5))"


def _min_margin(con, with_sql: str, value_expr: str, scale: float, from_sql: str):
    q = f"WITH {with_sql} SELECT {_MARGIN.format(v=value_expr, scale=scale)} {from_sql}"
    return con.sql(q).fetchone()[0]


_TOK = """
tok AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
  FROM documents
),
freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT COUNT(*) AS total FROM tok),
nll AS (
  SELECT t, CAST(ROUND(-LN(CAST(c AS DOUBLE) / total), 8) AS DECIMAL(20,8)) AS nll
  FROM freq, tot
),
doc AS (
  SELECT doc_id, COUNT(*) AS n_toks, SUM(nll) AS s
  FROM tok JOIN nll USING (t) GROUP BY doc_id
)
"""


def test_token_nll_8dp_margin():
    # 1-ulp libm discrepancy in LN is ~1e-16 relative; at nll~10 the
    # pre-round value *1e8 carries ~1e-7 absolute slack.  Require the
    # corpus to sit 1000x further from any half-boundary than that.
    con = duckdb_con(SF_DIR)
    m = _min_margin(
        con, _TOK, "-LN(CAST(c AS DOUBLE) / total)", 1e8, "FROM freq, tot"
    )
    assert m > 1e-4, f"token nll within {m} grid units of an 8dp half-boundary"


def test_doc_avg_nll_6dp_margin():
    # s is an exact DECIMAL sum; s/n_toks is one correctly-rounded IEEE
    # division, identical in both engines — the only hazard is an exact
    # half at 6dp where round-half conventions could differ.
    con = duckdb_con(SF_DIR)
    m = _min_margin(
        con, _TOK, "CAST(s AS DOUBLE) / n_toks", 1e6, "FROM doc"
    )
    assert m > 1e-6, f"doc avg_nll within {m} grid units of a 6dp half-boundary"


def test_events_zscore_4dp_margin():
    con = duckdb_con(SF_DIR)
    with_sql = """
stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_sq
  FROM events GROUP BY event_type
),
z AS (
  SELECT (e.value - s.mean_v) / sqrt(s.mean_sq - s.mean_v * s.mean_v) AS zs
  FROM events e JOIN stats s ON s.event_type = e.event_type
  WHERE ABS((e.value - s.mean_v) / sqrt(s.mean_sq - s.mean_v * s.mean_v)) > 3
)
"""
    m = _min_margin(con, with_sql, "zs", 1e4, "FROM z")
    assert m > 1e-6, f"zscore within {m} grid units of a 4dp half-boundary"


def test_kmeans_shift_margins():
    from sayn_spark.functions.similarity import _SQL_CENTROIDS, _SQL_EMB

    con = duckdb_con(SF_DIR)
    with_sql = f"""{_SQL_EMB}, {_SQL_CENTROIDS},
assigned AS (
  SELECT vec_id, c_label, ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY ROUND(list_aggregate(list_transform(list_zip(v.e, c.ce),
                          p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 8), c_label) AS rk
  FROM emb v, cent_arr c
),
cells AS (SELECT vec_id, c_label AS cell FROM assigned WHERE rk = 1),
comp1 AS (
  SELECT cell, i, e[i] AS x
  FROM emb JOIN cells USING (vec_id), (SELECT unnest(generate_series(1, 64)) AS i)
),
cent1 AS (
  SELECT cell, i,
         ROUND(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 8) AS c1
  FROM comp1 GROUP BY cell, i
),
cent1_arr AS (SELECT cell, list(c1 ORDER BY i) AS ce1 FROM cent1 GROUP BY cell),
shifts AS (
  SELECT list_aggregate(list_transform(list_zip(n1.ce1, c0.ce),
         p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS ss
  FROM cent1_arr n1 JOIN cent_arr c0 ON c0.c_label = n1.cell
)
"""
    m8 = _min_margin(con, with_sql, "ss", 1e8, "FROM shifts")
    m6 = _min_margin(con, with_sql, "sqrt(ROUND(ss, 8))", 1e6, "FROM shifts")
    assert m8 > 1e-4, f"kmeans sumsq within {m8} grid units of an 8dp half-boundary"
    assert m6 > 1e-4, f"kmeans shift within {m6} grid units of a 6dp half-boundary"


def test_dsir_log_ratio_margin():
    # q_dsir_selection rounds each per-bucket ln(p/q) ONCE to integer
    # 1e-8 units; a flip needs the pre-round value within ~1 ulp of a
    # half at that grid.  256 buckets, so measure them all.
    import math

    con = duckdb_con(SF_DIR)
    from sayn_spark.functions.content_filter import _DSIR_B, _DSIR_FEATS_SQL

    rows = con.sql(
        f"""WITH {_DSIR_FEATS_SQL},
tb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM docb WHERE lang = 'en' GROUP BY b),
rb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM docb WHERE lang <> 'en' GROUP BY b),
tot AS (SELECT (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tb) AS nt,
               (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) FROM rb) AS nr),
spine AS (SELECT unnest(generate_series(0, {_DSIR_B - 1})) AS b)
SELECT COALESCE(tb.ct, 0), COALESCE(rb.cr, 0), t.nt, t.nr
FROM spine s LEFT JOIN tb ON tb.b = s.b LEFT JOIN rb ON rb.b = s.b CROSS JOIN tot t"""
    ).fetchall()
    worst = 1.0
    for ct, cr, nt, nr in rows:
        v = math.log(((ct + 1) * (nr + _DSIR_B)) / ((cr + 1) * (nt + _DSIR_B)))
        g = v * 1e8
        worst = min(worst, abs(g - math.floor(g) - 0.5))
    assert worst > 1e-4, f"dsir log-ratio within {worst} of an integer-round boundary"


_SB_LM = """
tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents WHERE lang = 'en'
),
train_pos AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS g
  FROM tok WHERE doc_id % 2 = 0 AND len(t) >= 2
),
bi AS (SELECT g, COUNT(*) AS c12 FROM train_pos GROUP BY g),
train_tok AS (SELECT unnest(t) AS w FROM tok WHERE doc_id % 2 = 0),
uni AS (SELECT w, COUNT(*) AS c FROM train_tok GROUP BY w),
tot AS (SELECT COUNT(*) AS n FROM train_tok)
"""


def test_bigram_lm_nll_margins():
    # q_text_bigram_surprisal rounds two LN families ONCE into integer
    # 1e-8 units: the bigram tier -ln(c12/c(w1)) and the backoff tier
    # -ln(0.4*c(w2)/N).  Same contract as the dsir log-ratio: every
    # vocabulary entry must sit far from a half-boundary at that grid.
    con = duckdb_con(SF_DIR)
    m_bi = _min_margin(
        con,
        _SB_LM,
        "-LN(CAST(b.c12 AS DOUBLE) / u.c)",
        1e8,
        "FROM bi b JOIN uni u ON u.w = string_split(b.g, ' ')[1] WHERE b.c12 <> u.c",
    )
    assert m_bi > 1e-4, f"bigram nll within {m_bi} grid units of the round boundary"
    m_uni = _min_margin(
        con,
        _SB_LM,
        "-LN(4 * CAST(c AS DOUBLE) / (10 * n))",
        1e8,
        "FROM uni, tot",
    )
    assert m_uni > 1e-4, f"backoff nll within {m_uni} grid units of the round boundary"


def test_weighted_sample_nlnu_margin():
    # q_weighted_sample_es rounds -ln(u) ONCE per document into integer
    # 1e-8 units (u = 32-bit hash fraction in (0, 1]); measure every
    # document's distance to the rounding half-boundary at that grid.
    con = duckdb_con(SF_DIR)
    with_sql = """
keyed AS (
  SELECT -LN((('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
             / 4294967296.0) AS nlnu
  FROM documents
)
"""
    m = _min_margin(con, with_sql, "nlnu", 1e8, "FROM keyed")
    assert m > 1e-4, f"-ln(u) within {m} grid units of the rounding boundary"


def test_nb_classifier_llr_margins():
    # q_quality_nb_classifier: one LN per vocab entry over an IEEE-
    # exact double argument, rounded once into 1e-8 nat units.  The
    # 1-ulp libm slack at |llr| <= ~15 is ~1e-7 grid units; require
    # the whole vocabulary (and the OOV scalar) to sit 1000x further
    # from any half-boundary.
    from sayn_spark.functions.content_filter import _NB_NEG, _NB_POS

    con = duckdb_con(SF_DIR)
    with_sql = f"""
tr AS (
  SELECT CASE WHEN {_NB_POS} THEN 1 ELSE 0 END AS is_pos,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
  FROM documents WHERE ({_NB_POS}) OR ({_NB_NEG})
),
cnt AS (
  SELECT w, CAST(SUM(is_pos) AS BIGINT) AS c_pos,
         CAST(SUM(1 - is_pos) AS BIGINT) AS c_neg
  FROM tr GROUP BY w
),
tot AS (
  SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_neg) AS BIGINT) AS n_neg, COUNT(*) AS v
  FROM cnt
)
"""
    m = _min_margin(
        con,
        with_sql,
        "LN((CAST(c_pos + 1 AS DOUBLE) * (n_neg + v)) / "
        "(CAST(c_neg + 1 AS DOUBLE) * (n_pos + v)))",
        1e8,
        "FROM cnt, tot",
    )
    assert m > 1e-4, f"NB vocab llr within {m} grid units of an 8dp half-boundary"
    m_oov = _min_margin(
        con,
        with_sql,
        "LN(CAST(n_neg + v AS DOUBLE) / (n_pos + v))",
        1e8,
        "FROM tot",
    )
    assert m_oov > 1e-4, f"NB oov llr within {m_oov} grid units of a half-boundary"


def test_char_entropy_ln_margin():
    # q_text_char_entropy rounds LN(k) (character run lengths) and
    # LN(n) (doc lengths) once into 1e-8 integer units; the distinct
    # argument set is every run length and doc length in the corpus
    con = duckdb_con(SF_DIR)
    with_sql = """
ch AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
args AS (
  SELECT COUNT(*) AS k FROM ch GROUP BY doc_id, c
  UNION SELECT length(text) FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
lns AS (SELECT DISTINCT LN(CAST(k AS DOUBLE)) AS lnk FROM args WHERE k > 1)
"""
    m = _min_margin(con, with_sql, "lnk", 1e8, "FROM lns")
    assert m is None or m > 1e-4, f"LN(k) margin {m} too close to a half-boundary"


def test_events_value_micro_round_margin():
    # q_events_mad_anomalies rounds value*1e6 once into integer units;
    # measure the corpus distance to the nearest half-boundary
    con = duckdb_con(SF_DIR)
    with_sql = "v AS (SELECT value FROM events WHERE value IS NOT NULL)"
    m = _min_margin(con, with_sql, "value", 1e6, "FROM v")
    assert m is None or m > 1e-6, f"value*1e6 margin {m} too close to half-boundary"
