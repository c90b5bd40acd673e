-- Stage 1: exact dedup — one representative (lowest doc_id) per distinct
-- text, keyed by md5 so the shuffle moves 16-byte keys (operators/dedup.py
-- q_dedup_exact as a model).
SELECT doc_id, text, lang, source, n_chars
FROM (
    SELECT doc_id, text, lang, source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM {{ source('', 'documents') }}
)
WHERE rn = 1
