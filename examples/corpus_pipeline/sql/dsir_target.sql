-- trusted-domain reference slice: the target distribution for DSIR
-- importance resampling (documents_dsir_selected)
SELECT doc_id, text
FROM {{ src('documents') }}
WHERE lang = 'en'
