-- canonical corpus: one doc per near-dup cluster — the HIGHEST-QUALITY
-- member (ties: lowest doc_id), then quality floor + deterministic sample
-- (same selection semantics as functions/components.py:q_dedup_keep_best)
SELECT doc_id, lang, n_tokens, quality_score
FROM (
    SELECT q.doc_id, q.lang, q.n_tokens, q.quality_score,
           ROW_NUMBER() OVER (
               PARTITION BY c.component
               ORDER BY q.quality_score DESC, q.doc_id
           ) AS rk
    FROM {{ src('doc_quality') }} q
    JOIN {{ src('dup_components') }} c ON c.node = q.doc_id
)
WHERE rk = 1
  AND quality_score >= {{ min_quality }}
  AND cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % {{ sample_mod }} = 0
