SELECT cn.country_code AS country, COUNT(DISTINCT mc.movie_id) AS n_movies
FROM company_name cn, movie_companies mc, company_type ct
WHERE ct.kind = 'production companies'
  AND cn.id = mc.company_id AND ct.id = mc.company_type_id
GROUP BY cn.country_code
HAVING COUNT(DISTINCT mc.movie_id) > 5
ORDER BY n_movies DESC, country;
