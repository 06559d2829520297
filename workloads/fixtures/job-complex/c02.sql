SELECT n.gender AS gender, COUNT(*) AS n_roles, MIN(t.production_year) AS first_year, MAX(t.production_year) AS last_year
FROM cast_info ci, name n, title t, role_type rt
WHERE rt.role IN ('actor','actress') AND t.production_year BETWEEN 1980 AND 2015
  AND n.id = ci.person_id AND t.id = ci.movie_id AND rt.id = ci.role_id
GROUP BY n.gender
ORDER BY gender;
