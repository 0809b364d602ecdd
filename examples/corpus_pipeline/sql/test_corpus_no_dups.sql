-- violations: any two final-corpus docs in the same near-dup cluster
SELECT c.component, COUNT(*) AS n
FROM {{ src('corpus_final') }} f
JOIN {{ src('dup_components') }} c ON c.node = f.doc_id
GROUP BY c.component
HAVING COUNT(*) > 1
