SELECT t.production_year AS movie_year,
       SUM(CASE WHEN n.gender = 'f' THEN 1 ELSE 0 END) AS female_roles,
       SUM(CASE WHEN n.gender = 'm' THEN 1 ELSE 0 END) AS male_roles
FROM title t, cast_info ci, name n
WHERE t.production_year BETWEEN 2000 AND 2010
  AND t.id = ci.movie_id AND n.id = ci.person_id
GROUP BY t.production_year
ORDER BY movie_year;
