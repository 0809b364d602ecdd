SELECT d.mktsegment,
       d.nation,
       COUNT(DISTINCT f.o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(f.totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS revenue
FROM {{ src('f_orders') }} f
JOIN {{ src('dim_customer') }} d ON d.c_custkey = f.o_custkey
GROUP BY d.mktsegment, d.nation
