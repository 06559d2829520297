SELECT CASE WHEN t.production_year < 1990 THEN 'classic'
            WHEN t.production_year < 2005 THEN 'modern'
            ELSE 'recent' END AS era,
       n.gender AS gender, COUNT(*) AS n_roles
FROM name n, cast_info ci, title t
WHERE n.id = ci.person_id AND t.id = ci.movie_id AND n.gender IS NOT NULL
GROUP BY CASE WHEN t.production_year < 1990 THEN 'classic'
              WHEN t.production_year < 2005 THEN 'modern'
              ELSE 'recent' END, n.gender
ORDER BY era, gender;
