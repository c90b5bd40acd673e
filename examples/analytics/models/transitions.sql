-- Per-user event-type transition counts (q_event_transitions as a model).
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM (
    SELECT event_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM {{ source('', 'events') }}
)
WHERE next_type IS NOT NULL
GROUP BY ALL
