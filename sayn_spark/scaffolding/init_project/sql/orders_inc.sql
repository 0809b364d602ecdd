SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS DATE) AS orderdate
FROM {{ src('orders') }}
{% if not full_load %}
WHERE o_orderdate >= {{ start_dt }} OR o_orderdate IS NULL
{% endif %}
