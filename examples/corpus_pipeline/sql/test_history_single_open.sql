-- violations: any corpus key with more than one open SCD-2 version
SELECT doc_id, COUNT(*) AS n_open
FROM {{ src('corpus_history') }}
WHERE _valid_to IS NULL
GROUP BY doc_id
HAVING COUNT(*) > 1
