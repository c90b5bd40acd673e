-- Daily activity spine: distinct (user, day) pairs. `::DATE` and
-- GROUP BY ALL are DuckDB dialect, rewritten by dialect.py.
SELECT user_id, ts::DATE AS day
FROM {{ source('', 'events') }}
GROUP BY ALL
