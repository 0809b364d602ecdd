"""Filter task: content filtering as a YAML-native task — the scoring
heuristics the engine oracle-verifies as queries (functions/text.py),
applied as a declarative keep/drop stage:

    tasks:
      keep_quality_docs:
        type: filter
        source: documents
        destination: documents_clean
        scorer: quality          # quality | langid | length | repetition
        min_score: 0.5
        with_score: true         # add the score column to the output

    tasks:
      keep_english:
        type: filter
        source: documents
        destination: documents_en
        scorer: langid
        languages: [en, zh]

Scorers (each shares its column builders with the registered,
DuckDB-oracle-verified query, so the decision logic carries external
correctness evidence):

- quality: keep rows with quality_score >= min_score
  (q_text_quality's 0.4*diversity + 0.3*(1-stopword) + 0.3*length mix).
- langid:  keep rows whose predicted language is in ``languages``
  (q_text_langid's marker-count heuristic, CJK -> zh).
- length:  keep rows with min_tokens <= n_tokens <= max_tokens.
- repetition: keep rows with repetition_ratio <= max_repetition_ratio
  and/or n_immediate_repeats <= max_immediate_repeats
  (q_repetition_signals' shared builders in functions/content_filter.py;
  docs with fewer than 2 tokens have no signal and are kept).

All scorers are pure JVM column expressions over the text column — the
filter is map-side, pushes through to the scan where possible, and the
destination is a full rebuild (replace_table).  NULL text never passes
any scorer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sayn_spark.operators.base import Task, TaskStatus

_SCORERS = ("quality", "langid", "length", "repetition")


class FilterTask(Task):
    def config(self) -> None:
        c = self.config_dict
        self.source = self.compile_property(c.get("source"))
        if not self.source:
            raise ValueError(f"filter task {self.name!r} needs source")
        dest = self.compile_property(c.get("destination"))
        if not dest:
            raise ValueError(f"filter task {self.name!r} needs destination")
        self.scorer = c.get("scorer", "quality")
        if self.scorer not in _SCORERS:
            raise ValueError(
                f"filter task {self.name!r}: scorer must be one of {_SCORERS}"
            )
        self.text_column = c.get("text_column", "text")
        self.with_score = bool(c.get("with_score", False))
        self.min_score = c.get("min_score")
        self.languages = list(c.get("languages", []))
        self.min_tokens = c.get("min_tokens")
        self.max_tokens = c.get("max_tokens")
        if self.scorer == "quality" and self.min_score is None:
            raise ValueError(f"filter task {self.name!r}: quality needs min_score")
        if self.scorer == "langid" and not self.languages:
            raise ValueError(f"filter task {self.name!r}: langid needs languages")
        if self.scorer == "length" and self.min_tokens is None and self.max_tokens is None:
            raise ValueError(
                f"filter task {self.name!r}: length needs min_tokens and/or max_tokens"
            )
        self.max_repetition_ratio = c.get("max_repetition_ratio")
        self.max_immediate_repeats = c.get("max_immediate_repeats")
        if (
            self.scorer == "repetition"
            and self.max_repetition_ratio is None
            and self.max_immediate_repeats is None
        ):
            raise ValueError(
                f"filter task {self.name!r}: repetition needs "
                "max_repetition_ratio and/or max_immediate_repeats"
            )

        self.src_obj = self.context.obj_compiler.from_string(self.source)
        self.sources.add(self.src_obj)
        self.src_value = self.context.obj_compiler.src_value(self.src_obj)
        self.destination = self.context.obj_compiler.from_string(dest)
        self.outputs.add(self.destination)
        self.dst_value = self.context.obj_compiler.out_value(self.destination)
        self.status = TaskStatus.READY

    def run(self) -> None:
        from sayn_spark.functions.text import (
            langid_columns,
            n_tokens_col,
            predicted_lang_col,
            quality_score_col,
        )

        spark = self.context.spark
        df = spark.table(self.src_value)
        if self.text_column not in df.columns:
            raise ValueError(
                f"filter task {self.name!r}: column {self.text_column!r} "
                f"not in {self.src_value}"
            )
        src_cols = df.columns
        # the shared column builders read a column literally named
        # `text`; alias once, restore after.  If the source ALSO has an
        # unrelated `text` column, stash it first so its data survives.
        clash = self.text_column != "text" and "text" in src_cols
        work = df
        if clash:
            work = work.withColumnRenamed("text", "__sayn_orig_text__")
        work = work.withColumn("text", F.col(self.text_column)).where(
            F.col("text").isNotNull()
        )
        if self.scorer == "quality":
            scored = work.withColumn("_score", quality_score_col())
            kept = scored.where(F.col("_score") >= float(self.min_score))
            out = kept if self.with_score else kept.drop("_score")
            if self.with_score:
                out = out.withColumnRenamed("_score", "quality_score")
        elif self.scorer == "langid":
            scored = work.select("*", *langid_columns()).withColumn(
                "_lang", predicted_lang_col()
            )
            kept = scored.where(F.col("_lang").isin(self.languages))
            out = kept.drop("has_cjk", "c_en", "c_es", "c_fr", "c_de")
            if self.with_score:
                out = out.withColumnRenamed("_lang", "predicted_lang")
            else:
                out = out.drop("_lang")
        elif self.scorer == "repetition":
            from sayn_spark.functions.content_filter import (
                immediate_repeats_col,
                repetition_ratio_col,
                repetition_tokens_col,
            )

            # <2 tokens means nothing can repeat: coalesce the NULL
            # signals to zero so short docs pass (only NULL text drops)
            scored = (
                work.withColumn("_t", repetition_tokens_col())
                .withColumn(
                    "_ratio", F.coalesce(repetition_ratio_col("_t"), F.lit(0.0))
                )
                .withColumn(
                    "_reps", F.coalesce(immediate_repeats_col("_t"), F.lit(0))
                )
                .drop("_t")
            )
            cond = F.lit(True)
            if self.max_repetition_ratio is not None:
                cond = cond & (F.col("_ratio") <= float(self.max_repetition_ratio))
            if self.max_immediate_repeats is not None:
                cond = cond & (F.col("_reps") <= int(self.max_immediate_repeats))
            kept = scored.where(cond)
            if self.with_score:
                out = kept.withColumnRenamed(
                    "_ratio", "repetition_ratio"
                ).withColumnRenamed("_reps", "n_immediate_repeats")
            else:
                out = kept.drop("_ratio", "_reps")
        else:
            scored = work.withColumn("_n", n_tokens_col())
            cond = F.lit(True)
            if self.min_tokens is not None:
                cond = cond & (F.col("_n") >= int(self.min_tokens))
            if self.max_tokens is not None:
                cond = cond & (F.col("_n") <= int(self.max_tokens))
            kept = scored.where(cond)
            out = kept if self.with_score else kept.drop("_n")
            if self.with_score:
                out = out.withColumnRenamed("_n", "n_tokens")
        if self.text_column != "text":
            out = out.drop("text")
            if clash:
                out = out.withColumnRenamed("__sayn_orig_text__", "text")
        self.context.db.replace_table(
            self.dst_value, out, **self.destination_writer_opts()
        )

    def compile(self) -> None:
        return None
