SELECT t.production_year AS movie_year,
       COUNT(DISTINCT mc.company_id) AS n_companies,
       COUNT(DISTINCT mk.keyword_id) AS n_keywords
FROM title t, movie_companies mc, movie_keyword mk
WHERE t.id = mc.movie_id AND t.id = mk.movie_id AND mc.movie_id = mk.movie_id
  AND t.production_year BETWEEN 1995 AND 2010
GROUP BY t.production_year
ORDER BY movie_year;
