SELECT o.o_orderkey,
       o.o_custkey,
       o.o_orderstatus,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS totalprice,
       COUNT(l.l_orderkey) AS n_lines
FROM {{ src('orders') }} o
LEFT JOIN {{ src('lineitem') }} l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_orderdate, o.o_totalprice
