-- violations: any ranking row with non-positive revenue (empty = pass)
SELECT mktsegment, nation, revenue
FROM {{ src('f_rankings') }}
WHERE revenue <= 0
