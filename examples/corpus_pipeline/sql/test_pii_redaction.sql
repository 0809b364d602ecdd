-- the pii redact stage must keep EVERY row and leave zero matching
-- PII patterns behind (the synthetic corpus carries none — the test
-- pins the contract, not the corpus)
SELECT 'row_count_changed' AS problem FROM (
  SELECT (SELECT COUNT(*) FROM documents_redacted) AS a,
         (SELECT COUNT(*) FROM documents) AS b
) WHERE a <> b
UNION ALL
SELECT 'residual_pii' FROM documents_redacted
WHERE regexp_like(text, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}')
   OR regexp_like(text, '\\+1-[0-9]{3}-[0-9]{4}')
