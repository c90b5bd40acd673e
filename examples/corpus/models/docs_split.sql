-- Stage 3: deterministic 90/10 train/test split by doc_id hash
-- (operators/corpus.py q_train_test_split as a model): stable across runs
-- and cluster sizes, no RNG.
SELECT doc_id, text, lang, source, n_chars, n_tokens,
       CASE WHEN pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT), 100) < 90
            THEN 'train' ELSE 'test' END AS split
FROM {{ ref('docs_quality') }}
