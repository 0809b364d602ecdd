SELECT c.c_custkey,
       c.c_name AS customer_name,
       c.c_mktsegment AS mktsegment,
       n.n_name AS nation,
       r.r_name AS region
FROM {{ src('customer') }} c
LEFT JOIN {{ src('nation') }} n ON n.n_nationkey = c.c_nationkey
LEFT JOIN {{ src('region') }} r ON r.r_regionkey = n.n_regionkey
