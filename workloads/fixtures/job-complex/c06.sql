SELECT t.title AS loner_movie, t.production_year AS movie_year
FROM title t
WHERE t.production_year BETWEEN 1990 AND 2000
  AND NOT EXISTS (SELECT 1 FROM movie_companies mc WHERE mc.movie_id = t.id)
ORDER BY movie_year, loner_movie
LIMIT 20;
