-- every source must account for its documents: a card row whose doc
-- count disagrees with the raw corpus is a bad row (test fails on any
-- returned rows)
SELECT c.source FROM source_cards c
JOIN (SELECT source, COUNT(*) AS n FROM documents GROUP BY source) d
  ON d.source = c.source
WHERE c.n_docs != d.n OR c.n_tokens <= 0
