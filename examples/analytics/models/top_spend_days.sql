-- Each user's top-3 purchase days by spend: QUALIFY (DuckDB dialect) is
-- rewritten into a subquery + window filter. The daily rollup sits in its
-- own subquery so the QUALIFY window orders by a real column (Spark
-- rejects lateral select-list aliases inside window expressions).
SELECT user_id, day, spent
FROM (
    SELECT user_id, ts::DATE AS day, SUM(value) AS spent
    FROM {{ source('', 'events') }}
    WHERE event_type = 'purchase'
    GROUP BY ALL
)
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY spent DESC, day) <= 3
