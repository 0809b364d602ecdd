"""Shuffle task: deterministic epoch shuffle + sharding for training
order — the last stage before a dataloader reads the corpus:

    tasks:
      shuffle_epoch_0:
        type: shuffle
        source: corpus_packed
        destination: corpus_epoch0
        seed: 0                  # new seed = new permutation
        n_shards: 64

Every row gets a pseudo-random-but-reproducible position
hv = md5(seed|id); shard = hv mod n_shards; the output is written
repartitioned by shard and sorted by hv within each shard, with the
``shard`` and ``hv`` columns carried so a reader streams shards in hv
order and sees the same global permutation on ANY cluster size —
epoch re-shuffling with no RNG state (the q_epoch_shuffle design,
oracle-verified, applied as a write).

At 100 TB: one hash projection + one repartition on the shard key +
a within-partition sort — no global sort, no skew (md5 spreads ids
uniformly), and each epoch's output is a fresh deterministic layout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sayn_spark.operators.base import Task, TaskStatus


class ShuffleTask(Task):
    def config(self) -> None:
        c = self.config_dict
        self.source = self.compile_property(c.get("source"))
        if not self.source:
            raise ValueError(f"shuffle task {self.name!r} needs source")
        dest = self.compile_property(c.get("destination"))
        if not dest:
            raise ValueError(f"shuffle task {self.name!r} needs destination")
        self.seed = int(c.get("seed", 0))
        self.n_shards = int(c.get("n_shards", 64))
        if self.n_shards < 1:
            raise ValueError(f"shuffle task {self.name!r}: n_shards must be >= 1")
        self.id_column = c.get("id_column", "doc_id")

        self.src_obj = self.context.obj_compiler.from_string(self.source)
        self.sources.add(self.src_obj)
        self.src_value = self.context.obj_compiler.src_value(self.src_obj)
        self.destination = self.context.obj_compiler.from_string(dest)
        self.outputs.add(self.destination)
        self.dst_value = self.context.obj_compiler.out_value(self.destination)
        self.status = TaskStatus.READY

    def run(self) -> None:
        spark = self.context.spark
        df = spark.table(self.src_value)
        if self.id_column not in df.columns:
            raise ValueError(
                f"shuffle task {self.name!r}: column {self.id_column!r} "
                f"not in {self.src_value}"
            )
        hv = F.expr(
            f"cast(conv(substr(md5(concat('{self.seed}|', "
            f"cast({self.id_column} as string))), 1, 15), 16, 10) as bigint)"
        )
        out = (
            df.withColumn("hv", hv)
            .withColumn("shard", F.col("hv") % self.n_shards)
            .repartition(self.n_shards, "shard")
            .sortWithinPartitions("hv")
        )
        self.context.db.replace_table(
            self.dst_value, out, **self.destination_writer_opts()
        )

    def compile(self) -> None:
        return None
