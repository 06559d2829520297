SELECT it.info AS info_kind, COUNT(*) AS n_entries, MIN(mi.info) AS first_value
FROM info_type it, movie_info mi, title t
WHERE it.id = mi.info_type_id AND t.id = mi.movie_id
  AND t.production_year BETWEEN 1995 AND 2010
GROUP BY it.info
HAVING COUNT(*) >= 3
ORDER BY n_entries DESC, info_kind
LIMIT 10;
