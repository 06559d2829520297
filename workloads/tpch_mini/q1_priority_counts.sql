SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
