-- QUALIFY: keep each sensor's latest reading (DuckDB/Snowflake idiom;
-- rewritten to a wrapped subquery by dialect.translate_sql)
SELECT sensor, ts, value
FROM {{ source('', 'readings') }}
QUALIFY row_number() OVER (PARTITION BY sensor ORDER BY ts DESC) = 1
