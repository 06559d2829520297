SELECT cn.name AS company, COUNT(*) AS n_productions
FROM company_name cn, movie_companies mc, title t
WHERE cn.country_code = '[us]' AND t.production_year > 1990
  AND cn.id = mc.company_id AND t.id = mc.movie_id
GROUP BY cn.name
ORDER BY n_productions DESC, company
LIMIT 10;
