-- canonical corpus: quality-filtered docs, one per near-dup cluster,
-- deterministically sampled
SELECT q.doc_id, q.lang, q.n_tokens, q.quality_score
FROM {{ src('doc_quality') }} q
JOIN {{ src('dup_components') }} c ON c.node = q.doc_id
WHERE c.component = q.doc_id           -- cluster canonical (min id labels itself)
  AND q.quality_score >= {{ min_quality }}
  AND cast(conv(substr(md5(cast(q.doc_id as string)), 1, 8), 16, 10) as bigint) % {{ sample_mod }} = 0
