-- the epoch shuffle must assign every row a position and a valid shard
SELECT * FROM corpus_epoch0
WHERE hv IS NULL OR shard < 0 OR shard > 7
