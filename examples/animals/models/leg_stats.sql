-- Downstream model exercising ref(): per-leg-count rollup.
SELECT n_legs, COUNT(*) AS n_animals
FROM {{ ref('animals_str') }}
GROUP BY n_legs
