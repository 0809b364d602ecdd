-- quality scoring: lexical diversity + stopword/punct ratios + length
WITH tok AS (
  SELECT doc_id, text, lang, n_chars,
         filter(split(lower(text), ' '), x -> x != '') AS toks
  FROM {{ src('documents') }}
)
SELECT doc_id, lang, n_chars,
       size(toks) AS n_tokens,
       ROUND(0.4 * (CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks))
           + 0.3 * (1.0 - CAST(size(filter(toks, x -> x IN ('the','a','of','and','is'))) AS DOUBLE) / size(toks))
           + 0.3 * LEAST(1.0, size(toks) / 100.0), 6) AS quality_score
FROM tok
