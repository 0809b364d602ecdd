"""ANN search task: query a catalog index built by ``ann_index``
declaratively — the search half of the similarity pipeline as YAML:

    tasks:
      nearest_docs:
        type: ann_search
        index: corpus_vec_index    # ann_index's table prefix
        queries: probe_vectors     # (id, vector) table
        destination: probe_topk    # (query_id, neighbor_id, cos, rk)
        k: 5
        nprobe: 2
        id_column: vec_id          # queries' id column
        vector_column: embedding
        shortlist: 20              # quantized tiers: re-rank width
        shortlist_binary: 50       # cascade only: Hamming-tier width

The path is chosen from the CATALOG, not the config: an index with
BOTH ``{index}_binwords`` and ``{index}_sq8codes`` (method: cascade)
searches via the three-tier retrieval cascade — packed Hamming to
``shortlist_binary``, symmetric SQ8 to ``shortlist``, exact cosine to
``k`` (functions/similarity.py:ann_index_search_cascade, the
registered q_ann_cascade_topk shape); one with only
``{index}_binwords`` via the packed XOR+popcount scan + exact re-rank
(ann_index_search_binary); one with ``{index}_sq8codes`` via the
symmetric integer SQ8 scan + exact re-rank (ann_index_search_sq8);
one with ``{index}_codes`` via ADC + exact re-rank
(ann_index_search_pq — residual encodings route automatically through
the codebook's enc column); otherwise the exact in-cell scan
(ann_index_search).  Only query rows shuffle; the
bucketed inverted file is read in place.  The destination is a full
rebuild (replace_table), so re-running a search after an incremental
index insert refreshes results idempotently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sayn_spark.operators.base import Task, TaskStatus


class AnnSearchTask(Task):
    def config(self) -> None:
        c = self.config_dict
        self.index = self.compile_property(c.get("index"))
        if not self.index:
            raise ValueError(f"ann_search task {self.name!r} needs index")
        self.queries = self.compile_property(c.get("queries"))
        if not self.queries:
            raise ValueError(f"ann_search task {self.name!r} needs queries")
        dest = self.compile_property(c.get("destination"))
        if not dest:
            raise ValueError(f"ann_search task {self.name!r} needs destination")
        self.k = int(c.get("k", 5))
        self.nprobe = int(c.get("nprobe", 1))
        self.shortlist = int(c.get("shortlist", 20))
        if self.k < 1 or self.nprobe < 1 or self.shortlist < self.k:
            raise ValueError(
                f"ann_search task {self.name!r}: need k >= 1, nprobe >= 1, "
                "shortlist >= k"
            )
        # shortlist_binary is cascade-only; the dispatch is catalog-
        # driven at RUN time, so an unset value must not constrain
        # non-cascade configs (e.g. shortlist: 100 on an ivfsq8 index).
        # Unset default: at least the SQ8 shortlist, so the cascade
        # tier ordering holds for any shortlist without extra config.
        if c.get("shortlist_binary") is None:
            self.shortlist_binary = max(50, self.shortlist)
        else:
            self.shortlist_binary = int(c.get("shortlist_binary"))
            if self.shortlist_binary < self.shortlist:
                raise ValueError(
                    f"ann_search task {self.name!r}: shortlist_binary must be "
                    ">= shortlist (each cascade tier narrows)"
                )
        self.id_column = c.get("id_column", "vec_id")
        self.vector_column = c.get("vector_column", "embedding")

        self.q_obj = self.context.obj_compiler.from_string(self.queries)
        self.sources.add(self.q_obj)
        self.q_value = self.context.obj_compiler.src_value(self.q_obj)
        self.destination = self.context.obj_compiler.from_string(dest)
        self.outputs.add(self.destination)
        self.dst_value = self.context.obj_compiler.out_value(self.destination)
        # PHYSICAL base name, derived exactly like the ann_index writer
        # (src_value so from_prod/--upstream-prod can redirect reads):
        # raw-name reads would hit the prod index from a dev run.  The
        # BASE object is the declared source — it matches ann_index's
        # declared base output under every stringify rule (carrying the
        # DAG edge) and is what --upstream-prod flags for redirect; the
        # stringified _vectors side name is declared too, mirroring
        # ann_index's physically-named side outputs (advice r12).
        self.index_obj = self.context.obj_compiler.from_string(self.index)
        self.sources.add(self.index_obj)
        self.index = self.context.obj_compiler.src_value(self.index_obj)
        self.sources.add(
            self.context.obj_compiler.from_string(f"{self.index}_vectors")
        )
        self.status = TaskStatus.READY

    def setup(self) -> None:
        # secondary source values re-resolve once sources_from_prod is
        # known (see base.Task.setup)
        super().setup()
        self.q_value = self.context.obj_compiler.src_value(self.q_obj)
        self.index = self.context.obj_compiler.src_value(self.index_obj)

    def run(self) -> None:
        from sayn_spark.functions.similarity import ann_catalog_search

        spark = self.context.spark
        db = self.context.db
        for t in (f"{self.index}_centroids", f"{self.index}_vectors"):
            if not db.table_exists(t):
                raise ValueError(
                    f"ann_search task {self.name!r}: index table {t} missing — "
                    "run the ann_index build first"
                )
        qdf = spark.table(self.q_value)
        for col in (self.id_column, self.vector_column):
            if col not in qdf.columns:
                raise ValueError(
                    f"ann_search task {self.name!r}: column {col!r} "
                    f"not in {self.q_value}"
                )
        queries = qdf.select(
            F.col(self.id_column).alias("query_id"),
            F.expr(f"cast({self.vector_column} as array<double>)").alias("e"),
        )
        out = ann_catalog_search(
            spark,
            db,
            self.index,
            queries,
            k=self.k,
            nprobe=self.nprobe,
            shortlist=self.shortlist,
            shortlist_binary=self.shortlist_binary,
        )
        db.replace_table(self.dst_value, out, **self.destination_writer_opts())

    def compile(self) -> None:
        return None
