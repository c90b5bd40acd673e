-- 1-based list subscript + len() of a list + string_split: the reference's
-- own catalog-macro idioms, translated at the tokenizer level
SELECT sensor,
       string_split(tags, ';')[1] AS first_tag,
       string_split(tags, ';')[len(string_split(tags, ';'))] AS last_tag,
       * EXCLUDE (tags, sensor)
FROM {{ source('', 'readings') }}
