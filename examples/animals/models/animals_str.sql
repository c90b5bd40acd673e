-- The reference's flagship model (reference examples/animals/models/animals_str.sql):
-- cast n_legs to string, keep animals.
SELECT CAST(n_legs AS STRING) AS n_legs, animals
FROM {{ source('', 'animals') }}
