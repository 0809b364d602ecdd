-- the surprisal keep_fraction cut must keep exactly
-- floor(0.667 * n) of its input, all scored, none above the
-- highest kept surprisal of the dropped set's minimum
SELECT 'bad_count' AS problem FROM (
  SELECT (SELECT COUNT(*) FROM documents_lm_filtered) AS kept,
         (SELECT COUNT(*) FROM documents_clean2) AS total
) WHERE kept <> CAST(FLOOR(0.667 * total) AS BIGINT)
UNION ALL
SELECT 'null_score' FROM documents_lm_filtered WHERE avg_nll IS NULL
