SELECT c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c.c_name
LIMIT 25
