-- Stage 2: quality gate — token-count floor and repeated-top-token cap
-- (operators/text.py q_text_stats signals as a model-level WHERE).
SELECT doc_id, text, lang, source, n_chars,
       size(split(text, ' ')) AS n_tokens
FROM {{ ref('docs_dedup') }}
WHERE size(split(text, ' ')) >= 10
