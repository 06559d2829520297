SELECT n.n_name, count(*) AS num_orders,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r, nation n, customer c, orders o, lineitem l
WHERE r.r_regionkey = n.n_regionkey AND n.n_nationkey = c.c_nationkey
  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
  AND r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
LIMIT 10
