-- Stage 4b: the corpus manifest — per-split doc/token accounting
-- (operators/corpus.py q_corpus_manifest as a model).
SELECT split,
       COUNT(*) AS n_docs,
       SUM(n_tokens) AS n_tokens,
       SUM(n_chars) AS n_chars
FROM {{ ref('docs_split') }}
GROUP BY split
