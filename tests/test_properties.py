"""Property-based semantics tests (hypothesis): the incremental-merge
and incremental-filter plans must match a pure-Python model of the
reference semantics (merge_tables.sql:1-12, tasks/copy.py:668-675) on
arbitrary small inputs — including NULL keys and empty sides."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sayn_spark.plans.materialise import incremental_filter, merge_dataframes


def nsort(tuples):
    """Sort tuples that may contain None (None sorts first)."""
    return sorted(tuples, key=lambda t: tuple((v is None, 0 if v is None else v) for v in t))

ROWS = st.lists(
    st.fixed_dictionaries(
        {
            "id": st.integers(min_value=0, max_value=9),
            "val": st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        }
    ),
    max_size=8,
)

SCHEMA = "id long, val long"


def model_merge(dst: list[dict], src: list[dict], key: str) -> list[tuple]:
    """Reference semantics: DELETE dst WHERE EXISTS src with equal key
    (NULL never equals), then INSERT all of src."""
    src_keys = {r[key] for r in src if r[key] is not None}
    kept = [r for r in dst if r[key] not in src_keys]
    return nsort((r["id"], r["val"]) for r in kept + src)


def model_filter(rows: list[dict], key: str, last_max) -> list[tuple]:
    """inc_key >= last_max OR inc_key IS NULL."""
    out = [r for r in rows if r[key] is None or (last_max is None or r[key] >= last_max)]
    return nsort((r["id"], r["val"]) for r in out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dst=ROWS, src=ROWS)
def test_merge_matches_model(spark, dst, src):
    dst_df = spark.createDataFrame(dst, schema=SCHEMA)
    src_df = spark.createDataFrame(src, schema=SCHEMA)
    got = nsort(tuple(r) for r in merge_dataframes(dst_df, src_df, "id").collect())
    assert got == model_merge(dst, src, "id")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, last_max=st.one_of(st.none(), st.integers(min_value=-6, max_value=6)))
def test_incremental_filter_matches_model(spark, rows, last_max):
    df = spark.createDataFrame(rows, schema=SCHEMA)
    got = nsort(tuple(r) for r in incremental_filter(df, "val", last_max).collect())
    assert got == model_filter(rows, "val", last_max)


def test_components_edge_cases(spark):
    from sayn_spark.functions.components import connected_components

    # path graph 0-1-2-3-4 (diameter > 1 iteration) + disjoint pair + isolated self-loop
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], schema="src long, dst long"
    )
    iters: list[int] = []
    got = {
        r.node: r.component
        for r in connected_components(edges, _iterations=iters).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 20: 20}
    # min-label propagation spreads one hop per iteration: the path
    # graph's min label reaches node 4 in 4 steps, +1 confirming pass.
    # An off-by-one in the loop (or a broken convergence check) shows up
    # here as 20 (max_iter) or as a wrong fixpoint above.
    assert iters == [5]


def test_components_iteration_count_is_diameter_bound(spark):
    """The planted-mutation near-dup graphs (star-shaped clusters of
    original + 2 mutations) must converge in 2 iterations — 1 to spread
    the min + 1 to confirm via the unchanged label sum — not drift
    toward max_iter.  Guards the one driver-side loop in the engine."""
    from sayn_spark.functions.components import connected_components

    edges = spark.createDataFrame(
        [(1, 101), (1, 201), (101, 201), (2, 102), (2, 202)],
        schema="src long, dst long",
    )
    iters: list[int] = []
    got = {
        r.node: r.component
        for r in connected_components(edges, _iterations=iters).collect()
    }
    assert got == {1: 1, 101: 1, 201: 1, 2: 2, 102: 2, 202: 2}
    assert iters == [2]


def _cc_model(pairs):
    """Union-find ground truth: node -> min reachable node."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min so the root IS the component id
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_star_components_match_union_find(spark, pairs):
    from sayn_spark.functions.components import star_components

    edges = spark.createDataFrame(pairs, schema="src long, dst long")
    got = {r.node: r.component for r in star_components(edges).collect()}
    assert got == _cc_model(pairs)


def test_star_components_log_rounds_on_path(spark):
    """A 200-node path is the adversarial topology for label
    propagation (needs 199 diameter steps — more than the default
    max_iter); star contraction must solve it in O(log^2 n) rounds.
    The generous bound still fails hard if contraction ever degrades
    to per-hop progress."""
    from sayn_spark.functions.components import star_components

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], schema="src long, dst long"
    )
    rounds: list[int] = []
    got = {r.node: r.component for r in star_components(edges, _rounds=rounds).collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds[0] <= 12, f"expected O(log^2 n) rounds, took {rounds[0]}"


def test_star_components_edge_cases(spark):
    from sayn_spark.functions.components import star_components

    # path + disjoint pair + isolated self-loop (same graph the
    # label-propagation edge-case test pins)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], schema="src long, dst long"
    )
    got = {r.node: r.component for r in star_components(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 20: 20}


def test_incremental_minhash_index_append_lifecycle(spark):
    """The incremental near-dup store across TWO ingests: batch 1's
    near-dup of a corpus doc is caught by the signature index, batch
    1's kept (novel) docs are APPENDED to the index as signatures
    only, and batch 2's near-dup of that batch-1 doc is then caught by
    the grown index — no shingles or text ever persisted."""
    from sayn_spark.functions.dedup import (
        _mh_sig_frame,
        incremental_minhash_matches,
    )

    sf = "/root/testdata/sf0.001"

    def corpus(rows):
        return spark.createDataFrame(rows, schema="doc_id long, text string")

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps near the warm fire and the birds sing in the tall trees "
        "outside the old wooden house by the river"
    )
    novel1 = (
        "completely different content about distributed query engines "
        "processing enormous datasets with columnar storage vectorized "
        "execution adaptive optimization and shuffle free joins at scale"
    )
    index = _mh_sig_frame(corpus([(1, base)]), spark, sf).localCheckpoint()

    # ingest 1: a near-dup of doc 1 plus a novel doc
    batch1 = corpus([(101, base + " zz"), (102, novel1)])
    sigs1 = _mh_sig_frame(batch1, spark, sf).localCheckpoint()
    m1 = {(r.batch_id, r.corpus_id) for r in incremental_minhash_matches(sigs1, index).collect()}
    assert m1 == {(101, 1)}

    # append ONLY the kept (unmatched) signatures to the index
    kept1 = sigs1.where(~sigs1.doc_id.isin([b for b, _ in m1]))
    index = index.unionByName(kept1).localCheckpoint()

    # ingest 2: a near-dup of the batch-1 novel doc -> caught by the
    # grown index; an unrelated doc -> passes
    batch2 = corpus([(201, novel1 + " qq"), (202, base.upper().replace("THE", "a"))])
    sigs2 = _mh_sig_frame(batch2, spark, sf).localCheckpoint()
    m2 = {(r.batch_id, r.corpus_id) for r in incremental_minhash_matches(sigs2, index).collect()}
    assert (201, 102) in m2
    assert not any(b == 202 for b, _ in m2)


def test_components_auto_select_falls_over_on_path(spark):
    """components(): a 40-node path exhausts the 4-pass label budget
    and must fall over to star contraction, still producing the exact
    union-find answer; a star-shaped graph stays on label propagation."""
    from sayn_spark.functions.components import components

    n = 40
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], schema="src long, dst long"
    )
    method: list[str] = []
    got = {r.node: r.component for r in components(path, _method=method).collect()}
    assert got == {i: 0 for i in range(n)}
    assert method == ["star"]

    star = spark.createDataFrame(
        [(1, 101), (1, 201), (2, 102)], schema="src long, dst long"
    )
    method = []
    got = {r.node: r.component for r in components(star, _method=method).collect()}
    assert got == {1: 1, 101: 1, 201: 1, 2: 2, 102: 2}
    assert method == ["label_prop"]


def test_components_nonconvergence_raises(spark):
    """Budget exhaustion without a fixpoint must raise, never return
    silently-wrong labels (ADVICE r4): both algorithms."""
    import pytest

    from sayn_spark.functions.components import (
        ComponentsNotConverged,
        connected_components,
        star_components,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], schema="src long, dst long"
    )
    with pytest.raises(ComponentsNotConverged):
        connected_components(path, max_iter=4)
    with pytest.raises(ComponentsNotConverged):
        star_components(path, max_rounds=2)


def _model_containment_pairs(docs, threshold=0.9):
    """Pure-python exact overlap-coefficient pairs over token lists."""
    def shingles(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in docs.items() if len(t) >= 3}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            c = len(sa & sb) / min(len(sa), len(sb))
            if c >= threshold:
                out.add((a, b))
    return out


_VOCAB = [f"w{i}" for i in range(12)]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=12, max_size=26),
        min_size=4,
        max_size=14,
    ),
    snip=st.data(),
)
def test_gated_containment_equals_model_on_random_corpora(spark, data, snip):
    """Property: the LSH-Ensemble gate's output equals the exact
    pure-python overlap model on RANDOM corpora from a dense shared
    vocabulary — including planted sub-slices (containment ~1.0 at
    Jaccard ~0.5).  Token counts 12-26 keep shingle-set sizes inside
    the gate's documented ratio window (< 8).  Structural recall on
    arbitrary data, not just the fixed registered corpus."""
    from sayn_spark.functions.dedup import gated_containment_pairs
    from sayn_spark.functions.registry import release_persisted

    docs = {i: toks for i, toks in enumerate(data)}
    # plant sub-slice snippets of up to 3 docs (ratio ~2: in-window)
    next_id = 1000
    for i in list(docs)[:3]:
        toks = docs[i]
        half = max(12, len(toks) // 2 + 6)  # keep >= 10 shingles
        if half < len(toks):
            start = snip.draw(st.integers(min_value=0, max_value=len(toks) - half))
            docs[next_id] = toks[start : start + half]
            next_id += 1
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], schema="doc_id long, text string"
    )
    try:
        got = {
            (r.id_a, r.id_b)
            for r in gated_containment_pairs(df).collect()
        }
    finally:
        release_persisted()
    assert got == _model_containment_pairs(docs)


def _model_top_ngram(tokens):
    """Pure-python model of top_ngram_signal_frame for one doc."""
    from collections import Counter

    m = len(tokens)
    if m < 2:
        return None
    sum_chars = sum(len(x) for x in tokens)
    out = {"n_tokens": m, "sum_chars": sum_chars}
    for n in (2, 3, 4):
        grams = [" ".join(tokens[i : i + n]) for i in range(m - n + 1)]
        if not grams:
            out[f"top{n}_ppm"] = 0
            continue
        cnt = Counter(grams)
        # tie-break: highest count, then lexicographically smallest g
        bc = max(cnt.values())
        bg = min(g for g, c in cnt.items() if c == bc)
        gram_chars = len(bg) - (n - 1)
        out[f"top{n}_ppm"] = bc * gram_chars * 1_000_000 // sum_chars
    grams5 = [" ".join(tokens[i : i + 5]) for i in range(max(0, m - 4))]
    cnt5 = Counter(grams5)
    covered = set()
    for i, g in enumerate(grams5):
        if cnt5[g] >= 2:
            covered.update(range(i, i + 5))
    dup_chars = sum(len(tokens[p]) for p in covered)
    out["dup5_ppm"] = dup_chars * 1_000_000 // sum_chars
    return out


TOKENS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "d", "q", "zz"]),
    min_size=0,
    max_size=24,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens=TOKENS)
def test_top_ngram_fold_matches_model(spark, tokens):
    """The per-row higher-order-function fold must equal a pure-python
    Counter model on arbitrary token streams — including all-identical
    tokens (maximal overlap), runs ending at the array tail (the final
    flush), and sub-5-token docs (empty gram lists)."""
    from sayn_spark.functions.content_filter import top_ngram_signal_frame

    df = spark.createDataFrame([(1, " ".join(tokens))], "doc_id long, text string")
    got = top_ngram_signal_frame(df).collect()
    want = _model_top_ngram(tokens)
    if want is None:
        assert got == []
        return
    assert len(got) == 1
    r = got[0]
    for k, v in want.items():
        assert getattr(r, k) == v, (k, tokens)


# -- passage rewrite vs pure-Python model (r7) ---------------------------

W3 = 3  # small window so tiny random corpora collide


def model_passage_rewrite(docs: dict[int, list[str]], w: int) -> dict[int, list[str]]:
    """Reference semantics: a w-token window is removed from a doc iff
    the same token sequence occurs in a lower doc_id; covered positions
    are the union of removed-window spans."""
    owner: dict[tuple, int] = {}
    for d in sorted(docs):
        toks = docs[d]
        for i in range(len(toks) - w + 1):
            key = tuple(toks[i : i + w])
            owner.setdefault(key, d)
    out = {}
    for d, toks in docs.items():
        covered = set()
        for i in range(len(toks) - w + 1):
            if owner[tuple(toks[i : i + w])] < d:
                covered.update(range(i, i + w))
        out[d] = [t for j, t in enumerate(toks) if j not in covered]
    return out


DOCS = st.dictionaries(
    st.integers(min_value=0, max_value=7),
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(DOCS)
def test_passage_rewrite_matches_python_model(spark, docs):
    from sayn_spark.functions.dedup import passage_rewrite
    from sayn_spark.functions.registry import release_persisted

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    )
    try:
        got = {
            r.doc_id: (r.n_tokens, r.n_kept_tokens, r.cleaned_text)
            for r in passage_rewrite(df, window=W3).collect()
        }
    finally:
        release_persisted()
    want_kept = model_passage_rewrite(docs, W3)
    for d, toks in docs.items():
        assert got[d] == (len(toks), len(want_kept[d]), " ".join(want_kept[d])), d


# -- boilerplate line rewrite vs pure-Python model (r7) ------------------


def model_boilerplate(docs: dict[int, list[str]], min_docs: int) -> dict[int, list[str]]:
    """Reference semantics: a line occurring in >= min_docs DISTINCT
    documents is removed from every page; surviving lines keep order."""
    from collections import defaultdict

    holders = defaultdict(set)
    for d, lines in docs.items():
        for l in lines:
            holders[l].add(d)
    boiler = {l for l, ds in holders.items() if len(ds) >= min_docs}
    return {d: [l for l in lines if l not in boiler] for d, lines in docs.items()}


PAGES = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.lists(st.sampled_from(["x y.", "y z!", "z w?", "w v", "v u."]),
             min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(PAGES, st.integers(min_value=2, max_value=4))
def test_boilerplate_rewrite_matches_python_model(spark, docs, min_docs):
    from pyspark.sql import functions as F

    from sayn_spark.functions.content_filter import boilerplate_rewrite

    df = spark.createDataFrame(
        [(d, lines) for d, lines in docs.items()],
        "doc_id long, lines array<string>",
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept_lines, r.n_boiler_lines, r.cleaned_text)
        for r in boilerplate_rewrite(df, min_docs=min_docs).collect()
    }
    want = model_boilerplate(docs, min_docs)
    for d, lines in docs.items():
        kept = want[d]
        assert got[d] == (
            len(lines), len(kept), len(lines) - len(kept), "\n".join(kept)
        ), (d, lines, min_docs)
