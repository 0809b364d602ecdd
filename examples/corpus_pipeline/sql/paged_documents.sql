-- synthesise newline-structured pages from the flat token stream
-- (10-word lines, hash-assigned terminal punctuation — the
-- q_quality_c4_rules page shape) so the line-granular stages
-- (scorer: c4, dedup method: lines) have real pages to work on; a
-- shared footer is planted on every third doc for the boilerplate
-- stage to strip
SELECT doc_id, lang, source,
       concat(
         array_join(
           transform(sequence(0, (size(t) - 1) div 10), i -> concat(
             array_join(slice(t, cast(i * 10 + 1 as int), 10), ' '),
             element_at(array('.', '!', '?', ''),
                        cast((doc_id * 31 + i) % 4 + 1 as int)))),
           '\n'),
         case when doc_id % 3 = 0
              then '\nsubscribe to the corpus newsletter today.'
              else '' end
       ) AS text
FROM (
  SELECT doc_id, lang, source,
         filter(split(lower(text), ' '), x -> x != '') AS t
  FROM {{ src('documents') }}
) WHERE size(t) >= 1
