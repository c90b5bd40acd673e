-- Stage 4a: training-set vocabulary with frequencies (operators/corpus.py
-- q_vocabulary as a model; explode → groupBy, map-side partials).
SELECT token, COUNT(*) AS freq
FROM (
    SELECT explode(split(text, ' ')) AS token
    FROM {{ ref('docs_split') }}
    WHERE split = 'train'
)
GROUP BY token
