SELECT extract(year FROM o_orderdate) AS yr, count(*) AS n,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY extract(year FROM o_orderdate)
ORDER BY yr
