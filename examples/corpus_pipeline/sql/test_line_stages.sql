-- the boilerplate stage must strip the planted footer from EVERY page
-- and keep the page count; the c4 stage must keep a non-empty,
-- punctuation-clean corpus
SELECT 'footer_survived' AS problem FROM corpus_lines_cleaned
WHERE text LIKE '%subscribe to the corpus newsletter%'
UNION ALL
SELECT 'page_count_changed' FROM (
  SELECT (SELECT COUNT(*) FROM corpus_lines_cleaned) AS a,
         (SELECT COUNT(*) FROM paged_documents) AS b
) WHERE a <> b
UNION ALL
SELECT 'c4_output_empty' FROM (
  SELECT COUNT(*) AS n FROM documents_c4
) WHERE n = 0
UNION ALL
SELECT 'c4_kept_unpunctuated_line' FROM (
  SELECT explode(split(text, '\n')) AS line FROM documents_c4
) WHERE line != '' AND right(line, 1) NOT IN ('.', '!', '?', '"')
