-- Cohort day-N retention triangle over the activity spine
-- (operators/sql_surface2.py q_retention as a model).
WITH cohorts AS (
    SELECT user_id, MIN(day) AS cohort_day
    FROM {{ ref('daily_activity') }}
    GROUP BY user_id
)
SELECT c.cohort_day,
       datediff(a.day, c.cohort_day) AS offset_days,
       COUNT(*) AS n_active
FROM {{ ref('daily_activity') }} a JOIN cohorts c USING (user_id)
GROUP BY ALL
