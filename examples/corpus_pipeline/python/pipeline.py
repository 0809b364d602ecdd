"""Training-data corpus pipeline as engine tasks: the LLM-pipeline
operator library (functions/) driven by the task DAG — ingest ->
quality score -> near-dup dedup -> canonical corpus."""

from pyspark.sql import functions as F

from sayn_spark.functions.dedup import _staged_shingles
from sayn_spark.functions.components import connected_components
from sayn_spark.operators import task
from sayn_spark.sources import load_tables


@task(name="ingest_documents", outputs=["documents"])
def ingest_documents(context, spark, sf_dir):
    load_tables(spark, sf_dir, tables=("documents",), register=True)


@task(name="ingest_embeddings", outputs=["embeddings"])
def ingest_embeddings(context, spark, sf_dir):
    load_tables(spark, sf_dir, tables=("embeddings",), register=True)


@task(name="make_eval_snippets", sources=["documents"], outputs=["eval_snippets"])
def make_eval_snippets(context, spark):
    """Synthesize a held-out eval set: 8-token snippets from every 9th
    document (stand-in for real benchmark prompts)."""
    ev = (
        spark.table("documents")
        .where(F.col("doc_id") % 9 == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.expr(
                "concat_ws(' ', slice(filter(split(lower(text), ' '), "
                "x -> x != ''), 3, 8))"
            ).alias("text"),
        )
    )
    context.default_db.replace_table("eval_snippets", ev)


@task(name="dedup_candidates", sources=["documents"], outputs=["dup_components"])
def dedup_candidates(context, spark):
    """n-gram Jaccard edges (>= 0.5) -> connected components -> one
    canonical doc per cluster."""
    docs = spark.table("documents").select("doc_id", "text")
    shingled = _staged_shingles(docs, persist=True)
    sizes = shingled.select("doc_id", F.size("sh").alias("n"))
    ex = shingled.select("doc_id", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jacc = F.col("common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("common"))
    edges = (
        pairs.join(sizes.alias("sa"), F.col("src") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("dst") == F.col("sb.doc_id"))
        .where(jacc >= 0.5)
        .select("src", "dst")
    )
    # self-edges: docs without near-dups form singleton components
    self_edges = docs.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    comp = connected_components(edges.unionByName(self_edges))
    context.default_db.replace_table("dup_components", comp)


@task(name="compact_corpus", parents=["corpus_final", "test_corpus_no_dups"])
def compact_corpus(context, spark):
    """Post-load maintenance: rewrite the corpus table at its target
    file count (plans/maintenance.py) — the step a recurring ingest
    schedules after each merge so small files never accumulate."""
    from sayn_spark.plans.maintenance import compact_table

    n_files = compact_table(spark, "corpus_final")
    print(f"[compact_corpus] corpus_final -> {n_files} file(s)")


@task(name="corpus_history", sources=["corpus_final"], outputs=["corpus_history"])
def corpus_history(context, spark):
    """SCD-2 history of the canonical corpus (plans/snapshot.py): fold a
    synthetic day-2 snapshot (every 7th doc dropped, every 5th doc's
    quality halved) into a valid_from/valid_to history — the audit
    table a recurring curation run maintains so any past corpus state
    can be reconstructed."""
    from sayn_spark.plans.snapshot import snapshot_apply

    cur = spark.table("corpus_final")
    day1 = cur.select(
        "doc_id",
        "lang",
        "n_tokens",
        "quality_score",
        F.lit("2026-01-01").alias("_valid_from"),
        F.lit(None).cast("string").alias("_valid_to"),
    )
    snap = cur.where(F.col("doc_id") % 7 != 0).withColumn(
        "quality_score",
        F.when(
            F.col("doc_id") % 5 == 0, F.round(F.col("quality_score") / 2, 6)
        ).otherwise(F.col("quality_score")),
    )
    hist = snapshot_apply(day1, snap, keys=["doc_id"], snapshot_ts="2026-01-02")
    context.default_db.replace_table("corpus_history", hist)


@task(name="corpus_checksum", sources=["corpus_final"], outputs=["corpus_checksum"])
def corpus_checksum(context, spark):
    """Anti-entropy fingerprint of the final corpus (same fold as
    q_table_checksum): bit_xor + modular sum of per-row md5 — recompute
    after any re-materialisation/copy and compare one tiny row instead
    of diffing tables."""
    cur = spark.table("corpus_final")
    canon = F.concat_ws(
        "|",
        *[
            F.col(c).cast("string")
            for c in ("doc_id", "lang", "n_tokens", "quality_score")
        ],
    )
    rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    fp = cur.select(rh.alias("rh")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(rh)").alias("xor_h"),
        F.sum(F.col("rh") % 1000000007).alias("sum_mod"),
    )
    context.default_db.replace_table("corpus_checksum", fp)


@task(name="corpus_source_cards", sources=["documents"], outputs=["source_cards"])
def corpus_source_cards(context, spark, sf_dir):
    """Materialise the per-source dataset card (q_source_card's
    oracle-verified engine) — the governance table a curation review
    reads before setting mixture weights."""
    from sayn_spark.functions.content_filter import q_source_card

    context.default_db.replace_table("source_cards", q_source_card(spark, sf_dir))


@task(name="make_doc_thumbnails", sources=["documents"], outputs=["doc_thumbnails"])
def make_doc_thumbnails(context, spark):
    """Synthesize the image side of the corpus: one 16x16 thumbnail
    per 3rd document, groups of 5 sharing a base image with sparse
    pixel noise on non-anchors (the q_multimodal_phash_dedup corpus
    design) — in a MIX of container formats, the way crawl thumbnails
    actually arrive: BMP, grayscale PNG, ANIMATED GIF (a full first
    frame plus a sub-rectangle delta frame — phash hashes the first
    composited canvas), baseline SOF0 JPEG and progressive SOF2 JPEG
    (flat quant: decode error <= 2 gray levels, far under the 24-point
    planted noise), rotating by document.  The downstream phash dedup
    task therefore exercises every decode path the module ships,
    including cross-format near-dup matches inside each group."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from sayn_spark.functions.multimodal import (
        bmp_encode,
        gif_encode_animated,
        jpeg_encode,
        jpeg_encode_progressive,
        png_encode,
    )

    ids = spark.table("documents").where(F.col("doc_id") % 3 == 0).select("doc_id")

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def make(batches):
        import hashlib

        import pandas as pd

        w, h = 16, 16
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                base = hashlib.md5(f"thumb{doc_id // 5}".encode()).digest()
                px = bytearray((base[i % 16] * (i // 16 + 1)) % 200 for i in range(w * h))
                if doc_id % 5 != 0:
                    for i in range(w * h):
                        if hashlib.md5(f"{doc_id}#{i}".encode()).digest()[0] % 37 == 0:
                            px[i] += 24
                px = bytes(px)
                fmt = (doc_id // 3) % 5
                if fmt == 0:
                    payload = bmp_encode(px, w, h)
                elif fmt == 1:
                    payload = png_encode(px, w, h)
                elif fmt == 2:
                    payload = gif_encode_animated(
                        [
                            (px, 0, 0, w, h, 4, 1, None),
                            (px[: 4 * 4], 4, 4, 4, 4, 4, 1, None),
                        ],
                        w,
                        h,
                    )
                elif fmt == 3:
                    payload = jpeg_encode(px, w, h)
                else:
                    payload = jpeg_encode_progressive(px, w, h)
                out["doc_id"].append(doc_id)
                out["payload"].append(payload)
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    context.default_db.replace_table("doc_thumbnails", ids.mapInPandas(make, schema))


@task(name="make_eval_reversed", sources=["documents"], outputs=["eval_reversed"])
def make_eval_reversed(context, spark):
    """Token-reversed copies of every 9th document — the eval-leak
    shape exact n-grams cannot see (zero shared 8-grams, cosine 1.0):
    the planted corpus for the semantic decontamination stage.  Only
    docs of >= 8 tokens qualify (q_decontaminate_semantic's corpus
    design): a 1-2 token eval doc hashes into 1-2 buckets and would
    cosine-match unrelated short or repetitive training docs at 0.95,
    over-dropping."""
    ev = (
        spark.table("documents")
        .where(F.col("doc_id") % 9 == 0)
        .where(
            F.expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 8
        )
        .select(
            F.expr(
                "concat_ws(' ', reverse(filter(split(lower(text), ' '), "
                "x -> x != '')))"
            ).alias("text")
        )
    )
    context.default_db.replace_table("eval_reversed", ev)


@task(name="make_media_payloads", sources=["documents"], outputs=["media_payloads"])
def make_media_payloads(context, spark):
    """Synthesize the media side of the corpus: every 7th document
    becomes an opaque BINARY payload rotating through ALL EIGHT formats
    the router types — spec-framed MP4 (ISO-BMFF box tree), MP3 (Layer
    III frame stream, some with ID3v2 tags), WebP (lossy/lossless/
    extended RIFF), baseline JPEG, PNG, GIF (still + animated), BMP,
    and PCM WAV — the ingest shape of a multimodal crawl, which is
    mostly stills, where media arrives as bytes and nothing downstream
    may assume a format."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from sayn_spark.functions.multimodal import (
        bmp_encode,
        gif_encode,
        gif_encode_animated,
        jpeg_encode,
        mp3_build,
        mp4_build,
        png_encode,
        wav_encode,
        webp_build,
    )

    docs = (
        spark.table("documents")
        .where((F.col("doc_id") % 7 == 0) & (F.length("text") > 0))
        .select("doc_id", F.length("text").alias("n"))
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def make(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
                n = int(n)
                kind = n % 8
                if kind == 0:
                    # real stts + edit-trimmed mdhd so the router's fps
                    # arm has a signal; sample counts are sized so
                    # fps_milli straddles the 5-120 fps admission band
                    # in both directions (a one-sided range would make
                    # the rule and its test vacuous)
                    p = mp4_build(
                        16 * ((n % 40) + 8),
                        16 * (((n * 3) % 30) + 6),
                        n * 37 + 40,
                        with_audio=n % 2 == 1,
                        video_n_samples=(n % 300) + 2,
                        video_duration_ms=(n * 37 + 40) * 3 // 4 + 1,
                    )
                elif kind == 1:
                    # (n % 150) + 5 frames = 130ms..4s at 26.12ms/frame,
                    # STRADDLING media_routed's 2s admission threshold —
                    # a range that never crosses it would make the
                    # routing rule and its test vacuous
                    p = mp3_build(
                        (n % 150) + 5,
                        (64, 128, 192, 320)[n % 4],
                        44100,
                        1 if n % 2 == 1 else 2,
                        id3_bytes=120 if n % 9 < 3 else 0,
                    )
                elif kind == 2:
                    # animated totals ((n%4)+2 frames x (n*17%3000)+10
                    # ms) STRADDLE the router's 2s short-animation
                    # cutoff even on sub-600-char corpora (a one-sided
                    # range makes the rule and its test vacuous —
                    # test_media_router_rules_nonvacuous pins this)
                    animated = n % 9 // 3 == 2 and n % 2 == 0
                    p = webp_build(
                        (n % 1200) + 16,
                        ((n * 3) % 900) + 16,
                        mode=("lossy", "lossless", "extended")[n % 9 // 3],
                        animated=animated,
                        frame_durations=(
                            ((n * 17) % 3000 + 10,) * ((n % 4) + 2)
                            if animated
                            else None
                        ),
                    )
                elif kind == 3:
                    # still dims 8..72 STRADDLE the 32px stills floor
                    # on both axes (jpeg dims must be multiples of 8)
                    w, h = 8 * ((n % 9) + 1), 8 * (((n // 2) % 9) + 1)
                    p = jpeg_encode(
                        bytes((x * 7 + y * 13 + n) % 256
                              for y in range(h) for x in range(w)),
                        w, h,
                    )
                elif kind == 4:
                    w, h = (n % 48) + 8, ((n * 3) % 90) + 40
                    p = png_encode(
                        bytes((x * 5 + y * 11 + n) % 256
                              for y in range(h) for x in range(w)),
                        w, h,
                    )
                elif kind == 5:
                    # half animated: (n%3)+2 frames x (n%120+5) cs
                    # delays -> 100ms..5s totals straddle the 2s
                    # short-animation cutoff
                    w, h = (n % 90) + 8, ((n * 7) % 90) + 8
                    px = bytes((x * 3 + y * 17 + n) % 256
                               for y in range(h) for x in range(w))
                    if (n // 8) % 2 == 0:  # n%8==5 is always odd — parity
                        # must come from a different bit
                        nf = (n % 3) + 2
                        p = gif_encode_animated(
                            [(px, 0, 0, w, h, (n % 120) + 5, 0, None)]
                            * nf,
                            w, h,
                        )
                    else:
                        p = gif_encode(px, w, h)
                elif kind == 6:
                    w, h = (n % 90) + 8, ((n * 5) % 90) + 8
                    p = bmp_encode(
                        bytes((x * 9 + y * 23 + n) % 256
                              for y in range(h) for x in range(w)),
                        w, h,
                    )
                else:
                    # ((n%60)+4)/16 s of 16 kHz mono PCM straddles the
                    # 2s audio admission threshold
                    p = wav_encode(
                        [(i * 997 + n) % 4096 - 2048
                         for i in range(((n % 60) + 4) * 1000)],
                        16000,
                    )
                out["doc_id"].append(doc_id)
                out["payload"].append(p)
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    context.default_db.replace_table("media_payloads", docs.mapInPandas(make, schema))


@task(
    name="route_media_metadata",
    sources=["media_payloads"],
    outputs=["media_metadata"],
)
def route_media_metadata(context, spark):
    """The metadata-routing stage a 100 TB media crawl runs BEFORE any
    decoder: route_media_frame magic-sniffs each opaque payload across
    all eight formats (ftyp -> MP4 box walk, RIFF -> WebP chunk walk
    or WAV header walk, JPEG/PNG/GIF/BMP still signatures, MPEG sync /
    ID3 fallback -> frame-header walk) and emits one typed row per
    asset — media_type, dimensions, duration, animation, frame count,
    fps — having read only headers.  A video's duration_ms prefers the
    track's elst PLAYED time over its mdhd media duration (the
    samples' own clock — the fps denominator) over the container's
    mvhd length; an animated WebP reports its ANMF frame count and
    summed frame durations, an animated GIF its descriptor count and
    summed GCE delays.  Undecodable payloads surface as media_type='unknown'
    rather than kill the run (the skip-vs-fail decision belongs to
    the downstream filter, not the router).  The same frame streams
    as streaming.materialise.stream_route_media."""
    from sayn_spark.functions.multimodal import route_media_frame

    src = spark.table("media_payloads")
    context.default_db.replace_table("media_metadata", route_media_frame(src))
